"""Law tests for the round-14 twins — invariants the value oracles
alone do not pin (agreement between the exact forms and the
sketch/approx machinery riding alongside them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_pareto_approx_matches_exact_twin_and_flag_true(spark, sf_dir):
    """The approx twin must emit exactly the exact twin's curve rows
    (the GK boundaries only feed the envelope flag), and the flag must
    be TRUE — GK at accuracy 10000 has rank error far inside the
    max(3, 1%·n) envelope at any test sf."""
    ap = registry.QUERIES["analytics_pareto_concentration_approx"](
        spark, sf_dir
    )
    ex = registry.QUERIES["analytics_pareto_concentration"](
        spark, sf_dir
    )
    assert ap.where(~F.col("approx_in_envelope")).count() == 0
    cols = ["decile", "cum_cents", "cum_share_micro"]
    assert (
        ap.select(*cols).exceptAll(ex.select(*cols)).count() == 0
        and ex.select(*cols).exceptAll(ap.select(*cols)).count() == 0
    )


def test_entropy_cms_laws_vs_exact_twin(spark, sf_dir):
    """Head+tail bucketing laws: per user, n_events matches the exact
    twin, n_buckets <= K+1 and <= the exact n_types, and merging
    buckets can only LOWER entropy (up to micro-nat rounding slack:
    each of <= n_types terms rounds once, so +/- n_types micro-nats)."""
    cm = {
        r["user_id"]: r
        for r in registry.QUERIES["events_user_entropy_cms"](
            spark, sf_dir
        ).collect()
    }
    ex = {
        r["user_id"]: r
        for r in registry.QUERIES["events_user_entropy"](
            spark, sf_dir
        ).collect()
    }
    assert set(cm) == set(ex)
    for uid, r in cm.items():
        e = ex[uid]
        assert r["n_events"] == e["n_events"]
        assert r["n_buckets"] <= 4  # K=3 head + 1 tail
        assert r["n_buckets"] <= e["n_types"]
        assert r["h_head_micro"] <= e["h_micro"] + e["n_types"]


def test_weighted_median_sketch_matches_exact_twin(spark, sf_dir):
    """The sketch twin must emit exactly the exact twin's rows (the
    sketch only feeds the envelope flag), and the flag must be TRUE."""
    sk = registry.QUERIES["agg_weighted_median_sketch"](spark, sf_dir)
    ex = registry.QUERIES["agg_weighted_median"](spark, sf_dir)
    assert sk.where(~F.col("sketch_in_envelope")).count() == 0
    cols = ["flag", "weighted_median_cents", "total_weight"]
    assert (
        sk.select(*cols).exceptAll(ex.select(*cols)).count() == 0
        and ex.select(*cols).exceptAll(sk.select(*cols)).count() == 0
    )


def test_sessionize_rollup_sketch_matches_exact_twin(spark, sf_dir):
    """The sketch twin must emit exactly the exact rollup's single row
    (the GK quantiles only feed the envelope flag), and the flag must
    be TRUE at test scale."""
    sk = registry.QUERIES["sessionize_stats_rollup_sketch"](
        spark, sf_dir
    )
    ex = registry.QUERIES["sessionize_stats_rollup"](spark, sf_dir)
    assert sk.where(~F.col("sketch_in_envelope")).count() == 0
    cols = [
        "n_sessions",
        "n_events",
        "med2_dur_us",
        "p90x10_dur_us",
        "max_dur_us",
        "med2_events",
        "n_bounces",
    ]
    assert [tuple(r) for r in sk.select(*cols).collect()] == [
        tuple(r) for r in ex.select(*cols).collect()
    ]
