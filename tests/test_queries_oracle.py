"""Every registered query with an oracle must match DuckDB on sf0.001.

This mirrors the driver's correctness gate (t2 runs at sf0.01; we use
sf0.001 for speed and rely on the driver for the larger run).
"""

from __future__ import annotations

import pytest

from kdcloganalyzer_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    from tests.oracle_compare import duckdb_con

    return duckdb_con(sf_dir)


def _oracle_sql_for(qid: str, sf_dir: str) -> str:
    """Per-sf oracle path rewrite; implementation shared with the CLI
    ``verify`` subcommand (kdcloganalyzer_spark/oracle.py)."""
    from kdcloganalyzer_spark.oracle import oracle_sql_for

    return oracle_sql_for(qid, sf_dir)


@pytest.mark.parametrize("qid", sorted(registry.ORACLES))
def test_oracle_match(qid, spark, sf_dir, con):
    from tests.oracle_compare import compare

    df = registry.QUERIES[qid](spark, sf_dir)
    ok, msg = compare(df, con, _oracle_sql_for(qid, sf_dir))
    assert ok, f"{qid}: {msg}"


@pytest.mark.parametrize("qid", sorted(registry.QUERIES))
def test_query_runs(qid, spark, sf_dir):
    df = registry.QUERIES[qid](spark, sf_dir)
    assert df.count() >= 0
