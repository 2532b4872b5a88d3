"""SparkSession factory with scale-appropriate defaults.

The defaults target the driver's bench box (local[32], 128 GiB) but every
knob is chosen to also be the right call on a 1000-executor cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for any Python exchange, and a shuffle-partition count that AQE can
coalesce downward rather than a hardcoded small one it can't raise.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kdcloganalyzer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Adaptive execution: coalesce post-shuffle partitions, split skewed
        # joins, convert to broadcast at runtime. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for any pandas UDF / toPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps: keep everything session-tz independent.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Streaming checkpoint base on tmpfs when available: the bounded
    # bench/test streams are commit-latency-bound (measured −20-25% per
    # stateful query vs /tmp-on-disk), and a checkpoint that must
    # survive a DRIVER restart doesn't belong on local disk either —
    # on a real cluster this conf points at object storage / HDFS and
    # durability comes from that filesystem, not the local one. Each
    # query start gets its own random subdir under the base; the base
    # is removed at interpreter exit (appcache.tempdir), matching the
    # fresh-checkpoint-per-invocation contract every bounded stream
    # here uses. Explicit per-query checkpointLocation options (the
    # restart-semantics tests) override this base and are untouched.
    if not spark.conf.get("spark.sql.streaming.checkpointLocation", None):
        from kdcloganalyzer_spark import appcache

        spark.conf.set(
            "spark.sql.streaming.checkpointLocation",
            appcache.tempdir("kdcspark_ckpt_", fast=True),
        )
    return spark
