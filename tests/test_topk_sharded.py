"""Laws of the sharded approximate top-k (agg_approx_topk_sharded):
reported estimates are EXACT (a key lives in exactly one md5 shard),
and any key the summary does NOT report is provably no bigger than its
shard's residual threshold — the pair of guarantees that make the
O(shards·K) summary trustworthy at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.sources.tables import load_table

registry.load_all()


def _exact_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    key = F.concat_ws("#", "event_type", (F.col("user_id") % 50))
    return (
        ev.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("exact"))
    )


def test_reported_estimates_are_exact(spark, sf_dir):
    out = registry.QUERIES["agg_approx_topk_sharded"](spark, sf_dir)
    j = out.join(_exact_counts(spark, sf_dir), "key")
    assert j.count() == out.count()
    assert j.where(F.col("est") != F.col("exact")).count() == 0


def test_unreported_keys_below_shard_residual(spark, sf_dir):
    out = registry.QUERIES["agg_approx_topk_sharded"](spark, sf_dir)
    exact = _exact_counts(spark, sf_dir).withColumn(
        "pid",
        (
            F.expr("cast(conv(substring(md5(key),1,15),16,10) as bigint)")
            % 8
        ).cast("int"),
    )
    # Residual threshold per shard, recomputed independently: the max
    # exact count among keys the shard-local top-4 dropped.
    w = F.row_number().over(
        __import__(
            "pyspark.sql", fromlist=["Window"]
        ).Window.partitionBy("pid").orderBy(F.desc("exact"), "key")
    )
    ranked = exact.withColumn("rn", w)
    resid = ranked.groupBy("pid").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") > 4, F.col("exact"))), F.lit(0)
        ).alias("resid")
    )
    # An unreported key either missed its shard's top-4 (=> exact <=
    # shard residual) or survived the shard but lost the global top-12
    # cut (=> exact <= the 12th reported estimate). The bound is the
    # max of the two thresholds.
    cutoff = out.agg(F.min("est")).collect()[0][0]
    unreported = (
        ranked.join(out.select("key", "est"), "key", "left_anti")
        .join(resid, "pid")
    )
    bound = F.greatest(F.col("resid"), F.lit(cutoff))
    assert unreported.where(F.col("exact") > bound).count() == 0
