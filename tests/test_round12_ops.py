"""Law tests for the round-12 operators — invariants the value oracles
alone do not pin (HLL-twin agreement with the exact forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_running_distinct_hll_matches_exact_twin(spark, sf_dir):
    """The HLL twin must emit exactly the exact twin's rows (same
    running counts) and every sketch estimate must sit inside the
    declared envelope (at the events type domain the sketch is in
    exact coupon mode, so the estimates are the counts)."""
    hll = registry.QUERIES["window_running_distinct_hll"](spark, sf_dir)
    exact = registry.QUERIES["window_running_distinct"](spark, sf_dir)
    assert hll.where(~F.col("hll_in_envelope")).count() == 0
    joined = exact.alias("e").join(
        hll.alias("h"), ["event_id", "user_id"], "full"
    )
    diverged = joined.where(
        (F.col("e.n_types_seen") != F.col("h.n_types_seen"))
        | F.col("e.n_types_seen").isNull()
        | F.col("h.n_types_seen").isNull()
    )
    assert diverged.count() == 0


def test_dau_mau_hll_matches_exact_twin(spark, sf_dir):
    """The HLL twin's reported metric columns must equal the exact
    twin's (the sketch path only feeds the envelope flag), and the
    flag must be TRUE on every month."""
    hll = registry.QUERIES["events_dau_mau_stickiness_hll"](spark, sf_dir)
    exact = registry.QUERIES["events_dau_mau_stickiness"](spark, sf_dir)
    assert hll.where(~F.col("hll_in_envelope")).count() == 0
    cols = ["month", "mau", "sum_dau", "n_days", "stickiness_micro"]
    assert (
        hll.select(*cols).exceptAll(exact.select(*cols)).count() == 0
        and exact.select(*cols).exceptAll(hll.select(*cols)).count() == 0
    )


def test_running_distinct_hll_single_window_node(spark, sf_dir):
    """The sketch and the exact set must share ONE Window operator (the
    swap adds zero shuffles): exactly one Window node in the plan."""
    df = registry.QUERIES["window_running_distinct_hll"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 1, plan


def test_user_entropy_matches_python_replay(spark, sf_dir):
    """h_micro must equal the sequential Python replay of the micro-nat
    idiom (per-term round(ln(c/n)*1e6), integer-weighted sum, one
    trunc-div), be 0 for single-type users, and never exceed ln(types)."""
    import math

    from kdcloganalyzer_spark.sources.tables import load_table

    rows = registry.QUERIES["events_user_entropy"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["count"])
    assert rows and len(rows) == len(by_user)
    for r in rows:
        cs = by_user[r["user_id"]]
        n = sum(cs)
        num = -sum(c * round(math.log(c / n) * 1_000_000) for c in cs)
        assert r["n_events"] == n
        assert r["n_types"] == len(cs)
        assert r["h_micro"] == num // n, r
        if len(cs) == 1:
            assert r["h_micro"] == 0
        assert r["h_micro"] <= math.log(len(cs)) * 1_000_000 + 1


def test_customer_nrr_cross_foots(spark, sf_dir):
    """nrr is the single scaled div of the emitted integers; churned
    cents never exceed the base; every month's base is positive."""
    rows = registry.QUERIES["analytics_customer_nrr"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["base_cents"] > 0
        assert 0 <= r["churned_cents"] <= r["base_cents"]
        assert (
            r["nrr_micro"]
            == r["retained_cents"] * 1_000_000 // r["base_cents"]
        )
        assert r["expansion_cents"] <= r["retained_cents"]


def test_abc_classification_partitions_parts(spark, sf_dir):
    """The 3x3 matrix partitions the part population and the revenue
    mass exactly; class labels stay in their domains."""
    from kdcloganalyzer_spark.sources.tables import load_table

    out = registry.QUERIES["analytics_abc_classification"](
        spark, sf_dir
    ).collect()
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in out) == n_parts
    assert {r["cls_abc"] for r in out} <= {"A", "B", "C"}
    assert {r["cls_xyz"] for r in out} <= {"X", "Y", "Z"}
    from kdcloganalyzer_spark.plans.relational import _rev_e4

    total = li.agg(F.sum(_rev_e4()).cast("bigint").alias("t")).collect()[
        0
    ]["t"]
    assert sum(r["rev_e4"] for r in out) == total


def test_url_suite_component_consistency(spark, sf_dir):
    """Every row's components must reassemble consistently: authority =
    host:8443, path inside the url, decode only rewrites %20."""
    rows = registry.QUERIES["fn_url_suite"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["authority"] == r["host"] + ":8443"
        assert r["proto"] == "https"
        assert r["q_decoded"] == r["q_raw"].replace("%20", " ")
        assert r["path"].startswith("/path/")
        assert r["ref"].startswith("frag")
