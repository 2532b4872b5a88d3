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

#: Spark-inferred read schemas, keyed (applicationId, path) — METADATA
#: only, never data or results. Passing the schema back to
#: ``spark.read.schema(...)`` skips the JVM-side footer
#: inference a bare ``spark.read.parquet`` repeats on every call
#: (measured 0.09 s → 0.018 s per load at sf0.1; queries load 2-7
#: tables, so the saving is per-query-construction-sized, guide §1.2).
#: App-scoped like every other cache here (evict_stale). Deliberately
#: NOT in the eviction registry: the registry exists so the bench's
#: min-of-N COLD protocol can re-pay amortized DATA/INDEX builds, and a
#: registered evictor marks its consumer ids as amortized (min-of-3
#: cold loop). Schema metadata is the same class as the
#: _nano_ts_columns footer cache below (never registered): it exists on
#: any warm cluster catalog, costs ~0.08 s to rebuild, and caching it
#: changes no query's data path.
_SCHEMA_CACHE: dict = {}

#: applicationIds whose session confs (UTC timezone / nanosAsLong) are
#: already pinned — each pin is a py4j round trip per load_table call
#: otherwise. Same metadata class as _SCHEMA_CACHE.
_CONF_PINNED: dict = {}


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
    of session-state side effects. Memoized per applicationId (nothing
    in this repo re-flips the session timezone; the memo is cleared with
    the schema cache on cold eviction)."""
    app = spark.sparkContext.applicationId
    pinned = _CONF_PINNED.setdefault(app, set())
    if "tz" not in pinned:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        pinned.add("tz")


def normalize_ts(df: DataFrame, *cols: str, schema=None) -> DataFrame:
    """Normalize timestamp-bearing columns to TIMESTAMP (instant) type.

    Dtype-dispatching, so it is safe on any testdata generation (and on
    both batch and streaming DataFrames):
    - int64            → nanos from the legacy-conf read: floor-div to
                         micros, then ``timestamp_micros``
    - TIMESTAMP_NTZ    → cast to TIMESTAMP under a UTC session timezone
                         (wall values preserved; watermark/unix_micros
                         become legal)
    - TIMESTAMP        → already an instant; untouched

    ``schema`` (optional) skips the ``df.schema`` JVM round trip when
    the caller already holds the frame's StructType (load_table's
    cached-schema path).
    """
    by_name = {f.name: f.dataType for f in (schema or df.schema).fields}
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
        # SparkSession (the driver builds its own). Pinned once per app
        # (the memo clears with the schema cache on cold eviction).
        pinned = _CONF_PINNED.setdefault(
            spark.sparkContext.applicationId, set()
        )
        if "nanos" not in pinned:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            pinned.add("nanos")
    from kdcloganalyzer_spark import appcache

    appcache.evict_stale(_SCHEMA_CACHE, spark)
    key = (spark.sparkContext.applicationId, path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        df = spark.read.parquet(path)
        # df.schema round-trips the JVM once; every later load of this
        # path skips inference entirely. A fresh DataFrame (fresh
        # attribute ids) is still built per call, so self-joins of two
        # load_table results stay unambiguous.
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(cached).parquet(path)
    schema = _SCHEMA_CACHE[key]
    ts_cols = [
        f.name
        for f in schema.fields
        if f.name in nano_cols or isinstance(f.dataType, TimestampNTZType)
    ]
    return normalize_ts(df, *ts_cols, schema=schema)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views for spark.sql() queries."""
    for name in DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
