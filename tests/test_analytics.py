"""Checks for the event-analytics tier (plans/analytics.py) beyond the
DuckDB oracle: sketch accuracy, funnel monotonicity, session invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.sources.tables import load_table

registry.load_all()


def test_hll_estimate_within_5pct_of_exact(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in registry.QUERIES["agg_hll_sketch_merge"](
            spark, sf_dir
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, e in exact.items():
        assert abs(approx[t] - e) <= max(1, 0.05 * e), (t, approx[t], e)


def test_funnel_stages_monotonic(spark, sf_dir):
    rows = sorted(
        registry.QUERIES["events_funnel"](spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    assert [r.event_type for r in rows] == ["view", "click", "purchase"]
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users


def test_sessions_partition_events(spark, sf_dir):
    sess = registry.QUERIES["sessionize_events_gap"](spark, sf_dir)
    total = sess.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events  # every event lands in exactly one session
    bad = sess.filter(F.col("sess_end") < F.col("sess_start")).count()
    assert bad == 0


def test_latest_by_key_is_unique_per_key(spark, sf_dir):
    df = registry.QUERIES["dedup_latest_by_key"](spark, sf_dir)
    dup = (
        df.groupBy("user_id", "event_type")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
