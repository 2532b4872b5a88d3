"""Round-12 additions: the two named-but-unregistered 100 TB swap twins
(VERDICT r11 item 2) and further coverage widening.

Like every plans module: each operator is a ``@query`` registration with
a DuckDB oracle twin; money/measure aggregates accumulate EXACT INTEGER
units so hashes are summation-order-free (CLAUDE.md convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans.registry import query
from kdcloganalyzer_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# HLL swap twins (VERDICT r11 item 2) — the sketch forms the exact ids'
# docstrings name, registered as runnable queries. Oracle pattern follows
# events_audience_overlap_hll (analytics.py): the registered output carries
# the EXACT values (identical to the exact twin's green oracle) plus an
# ``hll_in_envelope`` flag Spark computes from the live sketch estimates;
# the oracle asserts the literal TRUE, so a sketch regression flips the
# flag and fails the driver hash — the sketch path itself is under test.
# ---------------------------------------------------------------------------


@query(
    "window_running_distinct_hll",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST((SELECT count(DISTINCT e2.event_type) FROM events e2
                 WHERE e2.user_id = e.user_id
                   AND (e2.ts < e.ts OR (e2.ts = e.ts
                        AND e2.event_id <= e.event_id))) AS INT)
             AS n_types_seen,
           TRUE AS hll_in_envelope
    FROM events e
    WHERE e.user_id < 30
    """,
)
def window_running_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING COUNT-DISTINCT, HLL-SKETCH FORM — the unbounded-domain
    swap ``window_running_distinct``'s docstring names (relational.py),
    registered as a runnable query (VERDICT r11 item 2). The exact form
    keeps the per-key distinct SET as window state — fine while the
    domain is small, quadratic memory when it isn't (distinct URLs per
    user). The swap keeps a Datasketches HLL as the running-frame state
    instead: ``hll_sketch_agg(...).over(running frame)`` — constant
    ~16 KB state per row at lgK=14 regardless of domain size, and the
    expanding frame needs only the sketch's update() (no retract), which
    is exactly what Spark's window AggregateProcessor supports.

    Both the exact collect_set and the HLL sketch share ONE window spec,
    so the plan has a single sort+Window node (verified: one Window
    operator computes both _we0/_we1) — the swap adds zero shuffles.

    Output = the exact twin's columns + ``hll_in_envelope``: every
    per-row estimate within max(2, 2%) of the exact running count (the
    lgK=14 envelope tests/test_round7_ops.py pins for the sketch
    family); the oracle asserts the literal TRUE. At the events table's
    type domain the sketch is in exact (coupon) mode, so the estimate is
    exactly the count — the envelope is the regression tripwire."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    est = F.hll_sketch_estimate(
        F.hll_sketch_agg("event_type", F.lit(14)).over(w)
    )
    df = ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("int")
        .alias("n_types_seen"),
        est.alias("_est"),
    )
    in_env = F.abs(
        F.col("_est").cast("double") - F.col("n_types_seen")
    ) <= F.greatest(F.lit(2.0), 0.02 * F.col("n_types_seen"))
    return df.select(
        "event_id",
        "user_id",
        "n_types_seen",
        in_env.alias("hll_in_envelope"),
    )


@query(
    "events_dau_mau_stickiness_hll",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             CAST(sum(dau) AS BIGINT) AS sum_dau,
             CAST(count(*) AS BIGINT) AS n_days
      FROM d GROUP BY 1
    ),
    mu AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY 1
    )
    SELECT m.month, mu.mau, m.sum_dau, m.n_days,
           m.sum_dau * 1000000 // (m.n_days * mu.mau)
             AS stickiness_micro,
           TRUE AS hll_in_envelope
    FROM m JOIN mu ON m.month = mu.month
    """,
)
def events_dau_mau_stickiness_hll(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DAU/MAU STICKINESS, HLL-SKETCH FORM — the per-day-distinct swap
    ``events_dau_mau_stickiness``'s docstring names (analytics.py),
    registered as a runnable query (VERDICT r11 item 2). At true 100 TB
    the per-day exact COUNT(DISTINCT user_id) is the heavy node (a
    user-keyed distinct shuffle per day); the mergeable-summary form
    builds ONE Datasketches HLL per day in a single partial-agg'd pass
    (no distinct materialization ever shuffles raw user ids — sketches
    merge map-side), then rolls days → months two ways: Σ estimate(day)
    for the DAU numerator and estimate(hll_union_agg(day sketches)) for
    the MAU denominator — the union over sketches is exact-over-sketches,
    so the month sketch equals a month-grain sketch without rescanning.

    Output = the exact twin's columns + ``hll_in_envelope``: the per-month
    Σ-of-day-estimates within max(2·n_days, 2% of Σdau) — per-day errors
    are independent, so the summed RELATIVE error shrinks ~1/√n_days and
    2% is a ≫3σ bound — and the union-sketch MAU within max(3, 2.5%)
    (single sketch at lgK=14, RSE ≈0.81%, so 2.5% ≈ 3σ). The oracle
    asserts the literal TRUE; the reported metric stays the exact
    integer-micro stickiness, so the hash also re-verifies the metric."""
    ev = load_table(spark, sf_dir, "events")
    day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk"),
        F.count_distinct("user_id").alias("dau"),
    )
    m = day.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month")
    ).agg(
        F.sum("dau").cast("bigint").alias("sum_dau"),
        F.count("*").alias("n_days"),
        F.sum(F.hll_sketch_estimate("sk")).alias("_sum_dau_est"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "_mau_est"
        ),
    )
    mu = ev.groupBy(
        F.date_trunc("month", "ts").cast("date").alias("month")
    ).agg(F.count_distinct("user_id").alias("mau"))
    in_env = (
        F.abs(F.col("_sum_dau_est").cast("double") - F.col("sum_dau"))
        <= F.greatest(2.0 * F.col("n_days"), 0.02 * F.col("sum_dau"))
    ) & (
        F.abs(F.col("_mau_est").cast("double") - F.col("mau"))
        <= F.greatest(F.lit(3.0), 0.025 * F.col("mau"))
    )
    return m.join(mu, "month").select(
        "month",
        "mau",
        "sum_dau",
        "n_days",
        F.expr("sum_dau * 1000000 div (n_days * mau)").alias(
            "stickiness_micro"
        ),
        in_env.alias("hll_in_envelope"),
    )
