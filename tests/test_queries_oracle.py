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
    """Oracle SQL adapted to the test's sf: the registered KDC oracles
    embed the driver's sf0.01 materialized-records / synth-corpus paths
    (static strings); swap in this sf's paths."""
    from kdcloganalyzer_spark.plans import kdc_queries, relational
    from kdcloganalyzer_spark.sources.kdc_synth import synth_path_for_sf

    return (
        registry.ORACLES[qid]
        .replace(
            kdc_queries.DRIVER_RECORDS_GLOB,
            kdc_queries.records_path_for_sf(sf_dir) + "/*.parquet",
        )
        .replace(kdc_queries.DRIVER_SYNTH_DIR, synth_path_for_sf(sf_dir))
        .replace(
            relational.DRIVER_EVO_GLOB,
            relational.evolution_path_for_sf(sf_dir) + "/*/*.parquet",
        )
    )


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
