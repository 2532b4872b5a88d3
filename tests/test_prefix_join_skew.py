"""Pin the AQE skew handling the prefix-join docstrings claim
(operators/dedup.py: "hot tokens are AQE-split like any skewed join
key" — VERDICT r5 item 6 asked for evidence, not assertion).

A boilerplate-duplicate block (30% of docs are the same 20-token text)
makes every one of that block's tokens a hot join key in the inverted
index. With skew thresholds scaled DOWN to this fixture's bytes (at
production defaults the same shape trips at 256 MB per partition), the
executed adaptive plan must split the hot partitions: the prefix-token
SortMergeJoin is marked ``skew=true`` and reads skew-split shuffle
partitions, while the verified pair output stays exactly C(1200, 2) —
the split is a physical re-plan, not a semantic change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.operators import dedup

N_DOCS = 4000
HOT = [i for i in range(N_DOCS) if i % 10 < 3]


def _skewed_docs(spark):
    hot_text = " ".join(f"boiler{i}" for i in range(20))
    uniq = F.concat_ws(
        " ",
        F.array(
            *[F.concat(F.lit(f"tok{j}u"), F.col("id")) for j in range(20)]
        ),
    )
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit(hot_text))
        .otherwise(uniq)
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
    )


def test_prefix_join_hot_token_is_aqe_skew_split(spark):
    confs = {
        # force the shuffle join (both sides are small enough to
        # broadcast here; at real scale neither is)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the session fixture runs 4 shuffle partitions for tiny data;
        # skew detection compares a partition against the MEDIAN, so
        # give the hash enough partitions for the hot keys to stand out
        # (the cluster-scale default regime)
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": (
            "8k"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        agg = (
            dedup.ngram_jaccard_pairs_prefix(_skewed_docs(spark), 0.9)
            .groupBy()
            .count()
        )
        n_pairs = agg.collect()[0]["count"]
        plan = agg._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # Semantics unchanged: every unordered pair within the duplicate
    # block, nothing else.
    assert n_pairs == len(HOT) * (len(HOT) - 1) // 2
    # Physical evidence: the adaptive plan really split the hot keys.
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan
    assert "AQEShuffleRead skewed" in plan
