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
