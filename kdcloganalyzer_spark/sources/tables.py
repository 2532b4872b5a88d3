"""Parquet table loaders for the driver's synthetic tables.

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown, column
pruning and partition pruning for free on the parquet scan.

One wrinkle: the driver's parquet stores TIMESTAMP(NANOS), which Spark has
no native type for (PARQUET_TYPE_ILLEGAL). We read nanos as int64 via the
legacy conf and convert to microsecond timestamps with a floor-division —
exactly the nanos→micros truncation DuckDB applies, so oracle comparisons
stay bit-identical. The conversion is a codegen'd projection on the scan;
column pruning and predicate pushdown on all other columns are unaffected.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        # Runtime-settable; applied here so the loader works under any
        # SparkSession (the driver builds its own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # Integer `div`, not `/`: int64 nanos overflow double's 53-bit mantissa.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views for spark.sql() queries."""
    for name in DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
