"""Parquet table loaders for the driver's synthetic tables.

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown, column
pruning and partition pruning for free on the parquet scan.

One wrinkle: the driver's parquet timestamp encoding has varied across
testdata generations, so the loader dtype-dispatches instead of assuming:

- TIMESTAMP(NANOS) (r1 testdata): Spark has no native nanos type
  (PARQUET_TYPE_ILLEGAL), so read nanos as int64 via the legacy conf and
  floor-divide to microsecond timestamps — exactly the nanos→micros
  truncation DuckDB applies, so oracle comparisons stay bit-identical.
- TIMESTAMP(MICROS, isAdjustedToUTC=false) (r2+ testdata): Spark 4 reads
  this as TIMESTAMP_NTZ, which watermarks (`EVENT_TIME_IS_NOT_ON_
  TIMESTAMP_TYPE`) and `unix_micros` reject. Cast to TIMESTAMP under a
  UTC session timezone — wall-clock values are preserved verbatim
  (DuckDB reads the same file as a naive timestamp with the same wall
  values, so oracle comparisons are unaffected).

Both conversions are codegen'd projections on the scan; column pruning
and predicate pushdown on all other columns are unaffected.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from kdcloganalyzer_spark.schemas import DRIVER_TABLES


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as timestamp[ns] in the parquet footer."""
    schema = pq.read_schema(path)
    return tuple(
        name
        for name, typ in zip(schema.names, schema.types)
        if str(typ).startswith("timestamp[ns")
    )


def ensure_utc_session(spark: SparkSession) -> None:
    """Pin the session timezone to UTC (idempotent, runtime-settable).

    Our sessions (session.py) set this at build; the driver builds its
    own, so every source entry point (load_table, the streaming readers)
    calls this ONCE up front. Unconditional — not keyed on whether an NTZ
    column happens to be present — so behavior is uniform across testdata
    generations, and pure-transform helpers like normalize_ts stay free
    of session-state side effects."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize timestamp-bearing columns to TIMESTAMP (instant) type.

    Dtype-dispatching, so it is safe on any testdata generation (and on
    both batch and streaming DataFrames):
    - int64            → nanos from the legacy-conf read: floor-div to
                         micros, then ``timestamp_micros``
    - TIMESTAMP_NTZ    → cast to TIMESTAMP under a UTC session timezone
                         (wall values preserved; watermark/unix_micros
                         become legal)
    - TIMESTAMP        → already an instant; untouched
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        t = by_name.get(c)
        if t is None:
            continue
        if t.typeName() in ("long", "bigint"):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(t, TimestampNTZType):
            # NTZ→instant is only deterministic under a pinned session
            # timezone; callers own that via ensure_utc_session.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        # Runtime-settable; applied here so the loader works under any
        # SparkSession (the driver builds its own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_cols = [
        f.name
        for f in df.schema.fields
        if f.name in nano_cols or isinstance(f.dataType, TimestampNTZType)
    ]
    return normalize_ts(df, *ts_cols)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views for spark.sql() queries."""
    for name in DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
