"""DuckDB oracle compare — the local mirror of the driver's correctness
gate, usable from the CLI (``python -m kdcloganalyzer_spark verify``)
and the pytest suite (tests/oracle_compare.py re-exports this module).

Runs a registered Spark query and its oracle SQL on the same parquet
dir, then compares row count and an order-insensitive value set with the
same normalizations the driver applies (column order by name; floats
compared after the query's own rounding).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from kdcloganalyzer_spark.schemas import DRIVER_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # tolerate engine-level float formatting differences
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v) if v is not None else None


def oracle_sql_for(qid: str, sf_dir: str) -> str:
    """Registered oracle SQL adapted to ``sf_dir``: the KDC / synth /
    schema-evolution oracles embed the DRIVER's sf0.01 staging paths as
    static strings (the driver gate always runs there); for any other
    sf, swap in that sf's deterministic paths. Shared by the CLI
    ``verify`` subcommand and tests/test_queries_oracle.py — without
    the rewrite, a verify at sf0.001 would compare Spark@sf0.001
    against DuckDB@sf0.01 and spuriously fail."""
    from kdcloganalyzer_spark.plans import kdc_queries, registry, relational
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
        .replace(
            relational.DRIVER_MLJSON,
            relational.multiline_json_path_for_sf(sf_dir),
        )
        .replace(
            relational.DRIVER_COMMITLOG,
            relational.commit_log_path_for_sf(sf_dir),
        )
        .replace(
            relational.DRIVER_BINFILES,
            relational.binfiles_path_for_sf(sf_dir),
        )
        .replace(
            relational.DRIVER_NESTED,
            relational.nested_path_for_sf(sf_dir),
        )
    )


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    cols = sorted(spark_df.columns)
    spark_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]

    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    if sorted(duck_cols) != cols:
        return False, f"column mismatch: spark={cols} duck={sorted(duck_cols)}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in duck.fetchall()]

    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    if sorted(spark_rows, key=str) != sorted(duck_rows, key=str):
        s, d = set(spark_rows), set(duck_rows)
        return False, (
            f"values differ; spark-only sample={list(s - d)[:3]} "
            f"duck-only sample={list(d - s)[:3]}"
        )
    return True, "ok"
