"""Round-15 additions (VERDICT r14 item 7): the per-series
``partitionBy`` twins that four calendar-window docstrings name as
their at-scale form. Each base operator collapses the corpus to ONE
global calendar series and runs its windows over a single-partition
summary — acceptable there because the summary IS the final report,
but the docstrings all promise the same sentence: "per-series X adds
partitionBy [and the shuffle is then keyed, not global]". These ids
register that promise as first-class hash-verified operators:

- ``events_forecast_seasonal_naive_series`` — per-event-type MASE
  backtest (plans/analytics.py:events_forecast_seasonal_naive).
- ``window_drawdown_series`` — per-order-priority monthly revenue
  drawdown curves (plans/round12_ops.py:window_drawdown).
- ``events_bollinger_bands_series`` — per-event-type daily-volume
  ±2σ breach test (plans/round12_ops.py:events_bollinger_bands).
- ``events_peak_detection_series`` — per-event-type local peaks with
  windowed prominence (plans/round12_ops.py:events_peak_detection).

The scale story is the point: the global forms' windows run on a
single partition (fine for an ~80-row report, the unscalable node for
real per-entity series); the series forms key every window by the
series id, so millions of independent series parallelize across the
cluster with the SAME plan shape — the window frame, the exact-integer
arithmetic, and the oracle text gain only a PARTITION BY. Division
idiom follows the r15 overflow audit: micro-ratios whose numerators
are unbounded cent sums go through DECIMAL(38,0) (DuckDB computes them
in HUGEINT natively), and denominators that can be legitimately zero
per series are nullif-guarded IDENTICALLY on both sides.

Reference lineage: the reference has no time-series tier; these extend
the §2.3 north-star calendar-analytics family (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans.registry import query
from kdcloganalyzer_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Per-series seasonal-naive forecast backtest (MASE per event type)
# ---------------------------------------------------------------------------
@query(
    "events_forecast_seasonal_naive_series",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT event_type, day, cents,
             lag(cents, 7) OVER win AS forecast,
             lag(cents, 1) OVER win AS naive
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(cents - forecast)) AS BIGINT)
             AS seasonal_abs_err,
           CAST(sum(abs(cents - naive)) AS BIGINT) AS naive_abs_err,
           CAST(sum(abs(cents - forecast)) * 1000000
             // nullif(sum(abs(cents - naive)), 0) AS BIGINT)
             AS mase_micro
    FROM j WHERE forecast IS NOT NULL AND naive IS NOT NULL
    GROUP BY event_type
    """,
)
def events_forecast_seasonal_naive_series(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SERIES FORECAST BACKTEST — the partitionBy form
    ``events_forecast_seasonal_naive``'s docstring promises ("per-series
    forecasting at scale partitions the same plan by series key; the
    window gains a partitionBy and nothing else changes"): one MASE row
    PER EVENT TYPE, forecast(d) = actual(d−7) vs the 1-day naive,
    exact integer error cents, one scaled division per series.

    Scale: the corpus collapses to (series, day) in one partial-agg'd
    shuffle; both lag forecasts ride ONE window keyed by the series —
    millions of independent series spread across the cluster instead of
    serializing through the global form's single-partition sort. The
    MASE division is DECIMAL(38,0)-widened (error-cent sums are
    unbounded in data volume — r15 overflow audit) and nullif-guarded
    against a perfectly-flat series on BOTH engines."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    j = d.select(
        "event_type",
        "cents",
        F.lag("cents", 7).over(w).alias("forecast"),
        F.lag("cents", 1).over(w).alias("naive"),
    ).where(F.col("forecast").isNotNull() & F.col("naive").isNotNull())
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum(F.abs(F.col("cents") - F.col("forecast")))
        .cast("bigint")
        .alias("seasonal_abs_err"),
        F.sum(F.abs(F.col("cents") - F.col("naive")))
        .cast("bigint")
        .alias("naive_abs_err"),
        F.expr(
            "CAST(CAST(sum(abs(cents - forecast)) AS DECIMAL(38,0))"
            " * 1000000 div nullif(CAST(sum(abs(cents - naive))"
            " AS DECIMAL(38,0)), 0) AS BIGINT)"
        ).alias("mase_micro"),
    )


# ---------------------------------------------------------------------------
# Per-series drawdown curves (running-peak shortfall per order priority)
# ---------------------------------------------------------------------------
@query(
    "window_drawdown_series",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS series,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    ),
    p AS (
      SELECT series, period, rev_cents,
             max(rev_cents) OVER (PARTITION BY series ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak_cents
      FROM d
    )
    SELECT series, period, rev_cents,
           CAST(peak_cents AS BIGINT) AS peak_cents,
           CAST(peak_cents - rev_cents AS BIGINT) AS drawdown_cents,
           CAST((peak_cents - rev_cents) * 1000000 // peak_cents
                AS BIGINT) AS drawdown_micro
    FROM p
    """,
)
def window_drawdown_series(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SERIES DRAWDOWN CURVES — the partitionBy form
    ``window_drawdown``'s docstring promises ("per-series drawdowns
    would add partitionBy and parallelize"): one running-peak shortfall
    curve PER ORDER PRIORITY, monthly revenue in exact cents, relative
    drawdown as a scaled-integer micro ratio.

    Scale: (series, month) collapse in one shuffle; the running-max
    window is keyed by series, so the per-series sorts are independent
    tasks — the global form's single-partition window becomes an
    embarrassingly-parallel keyed window with the same frame. The micro
    ratio is DECIMAL(38,0)-widened (peak cents grow with corpus volume;
    the r15 audit idiom); peak_cents ≥ rev_cents > 0 per construction
    so the denominator needs no guard."""
    o = load_table(spark, sf_dir, "orders")
    from kdcloganalyzer_spark.plans.relational import _cents

    d = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("period"),
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_cents"))
    w = (
        Window.partitionBy("series")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.select(
        "series",
        "period",
        "rev_cents",
        F.max("rev_cents").over(w).cast("bigint").alias("peak_cents"),
    )
    return p.select(
        "series",
        "period",
        "rev_cents",
        "peak_cents",
        (F.col("peak_cents") - F.col("rev_cents"))
        .cast("bigint")
        .alias("drawdown_cents"),
        F.expr(
            "CAST(CAST(peak_cents - rev_cents AS DECIMAL(38,0)) * 1000000"
            " div CAST(peak_cents AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("drawdown_micro"),
    )


# ---------------------------------------------------------------------------
# Per-series Bollinger bands (±2σ breach test per event type)
# ---------------------------------------------------------------------------
@query(
    "events_bollinger_bands_series",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, x,
             CAST(count(*) OVER win AS BIGINT) AS n,
             CAST(sum(x) OVER win AS BIGINT) AS s,
             CAST(sum(x * x) OVER win AS BIGINT) AS q
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, x AS n_events, n AS win_n,
           CAST(s * 1000 // n AS BIGINT) AS mean_milli,
           CAST(n * q - s * s AS BIGINT) AS var_num,
           (x * n - s) > 0
             AND (x * n - s) * (x * n - s) > 4 * (n * q - s * s)
             AS breach_hi,
           (x * n - s) < 0
             AND (x * n - s) * (x * n - s) > 4 * (n * q - s * s)
             AS breach_lo
    FROM w
    """,
)
def events_bollinger_bands_series(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SERIES BOLLINGER BANDS — the partitionBy form
    ``events_bollinger_bands``'s docstring promises ("per-series bands
    add partitionBy to the same window — the shuffle is then keyed, not
    global"): the exact-integer cross-multiplied ±2σ breach test
    ((x·n − S)² > 4·(n·Q − S²), no division/sqrt/float) evaluated per
    EVENT TYPE over each type's own daily-volume series.

    Scale: one (series, day) collapse; the three window aggregates
    share ONE keyed 7-row frame, so every series' envelope is an
    independent task. Counts are calendar-bounded per series (n ≤ 7,
    x ≤ series-day volume), so the breach arithmetic stays comfortably
    in BIGINT — squares of day-count deviations, not cent sums."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    w = d.select(
        "event_type",
        "day",
        "x",
        F.count("*").over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("q"),
    )
    dev = F.col("x") * F.col("n") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return w.select(
        "event_type",
        "day",
        F.col("x").alias("n_events"),
        F.col("n").alias("win_n"),
        F.expr("CAST(s * 1000 div n AS BIGINT)").alias("mean_milli"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
        .cast("bigint")
        .alias("var_num"),
        ((dev > 0) & (dev * dev > var4)).alias("breach_hi"),
        ((dev < 0) & (dev * dev > var4)).alias("breach_lo"),
    )


# ---------------------------------------------------------------------------
# Per-series local peak detection (windowed prominence per event type)
# ---------------------------------------------------------------------------
@query(
    "events_peak_detection_series",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, x,
             lag(x) OVER win AS xp, lead(x) OVER win AS xn,
             min(x) OVER (win ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS lmin,
             min(x) OVER (win ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
               AS rmin
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, x AS n_events,
           CAST(lmin AS BIGINT) AS left_min3,
           CAST(rmin AS BIGINT) AS right_min3,
           CAST(x - greatest(lmin, rmin) AS BIGINT) AS prominence
    FROM w
    WHERE xp IS NOT NULL AND xn IS NOT NULL AND x > xp AND x > xn
    """,
)
def events_peak_detection_series(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SERIES PEAK DETECTION — the partitionBy form
    ``events_peak_detection``'s docstring promises ("per-series peaks
    add partitionBy"): strict local maxima with ±3-day windowed
    prominence, evaluated independently per EVENT TYPE (each series'
    edges are never peaks — the lag/lead NULL guard is now per series,
    which is the semantic difference from slicing the global result).

    Scale: one (series, day) collapse; all four window functions share
    ONE keyed ordered frame spec — per-series sorts are independent
    tasks, and a million series is a million small sorts, not one big
    one. All exact integers."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    win = Window.partitionBy("event_type").orderBy("day")
    w = d.select(
        "event_type",
        "day",
        "x",
        F.lag("x").over(win).alias("xp"),
        F.lead("x").over(win).alias("xn"),
        F.min("x").over(win.rowsBetween(-3, -1)).alias("lmin"),
        F.min("x").over(win.rowsBetween(1, 3)).alias("rmin"),
    )
    return w.where(
        F.col("xp").isNotNull()
        & F.col("xn").isNotNull()
        & (F.col("x") > F.col("xp"))
        & (F.col("x") > F.col("xn"))
    ).select(
        "event_type",
        "day",
        F.col("x").alias("n_events"),
        F.col("lmin").cast("bigint").alias("left_min3"),
        F.col("rmin").cast("bigint").alias("right_min3"),
        (F.col("x") - F.greatest("lmin", "rmin"))
        .cast("bigint")
        .alias("prominence"),
    )
