"""Event-analytics operators over the driver's `events` table: batch
gap-sessionization, CDC latest-per-key compaction, funnel analysis,
cohort retention, and a mergeable HLL sketch rollup.

These extend the reference's "Top N hosts, users, services, etc"
roadmap (/root/reference/README.md:10-13) from per-entity counts to the
session/funnel/retention family a production log-analytics deployment
runs next — all built on window functions and conditional aggregation so
Catalyst plans them as ordinary shuffles.

Timestamp equivalences: the driver parquet carries TIMESTAMP(NANOS);
Spark loads it as micros (integer div — sources/tables.py), DuckDB reads
it natively as TIMESTAMP_NS. Microsecond-exact comparisons therefore use
`unix_micros(ts)` ⇄ `epoch_us(ts)` (both floor), never `unix_timestamp`
(Spark floors to seconds — pinned verify-skill gotcha).
"""

from __future__ import annotations

from kdcloganalyzer_spark import appcache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans.registry import query
from kdcloganalyzer_spark.sources.tables import load_table

_GAP_MIN = 30


# ---------------------------------------------------------------------------
# Batch gap-based sessionization (gaps-and-islands)
# ---------------------------------------------------------------------------
@query(
    "sessionize_events_gap",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(CASE WHEN gap_us IS NULL
                        OR gap_us > {_GAP_MIN} * 60 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    )
    SELECT user_id, CAST(sess_id AS INT) AS sess_id,
           CAST(min(ts) AS TIMESTAMP) AS sess_start,
           CAST(max(ts) AS TIMESTAMP) AS sess_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sess_id
    """,
)
def sessionize_events_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-minute inactivity gap): the
    gaps-and-islands pattern — flag a session start when the gap to the
    previous event exceeds the threshold, running-sum the flags into a
    per-user session id, aggregate per session. The batch twin of
    `stream_session_window` (same semantics, no state store).

    Scale: ONE shuffle on user_id serves both window functions and the
    final aggregation (same partitioning, Catalyst reuses the exchange);
    state is bounded by a user's events in one task. Ties at equal ts
    are gap-0 and land in the same session, so output is order-stable."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(
        gap_us.isNull() | (gap_us > _GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("sess_id"),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# CDC compaction: latest record per key
# ---------------------------------------------------------------------------
@query(
    "dedup_latest_by_key",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
           round(value, 2) AS value
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (the CDC/upsert materialization
    pattern): keep the newest event per (user_id, event_type), total
    order enforced by (ts DESC, event_id DESC) so ties are deterministic.

    Scale: one shuffle on the key; `row_number` keeps a single row of
    state per key within each sorted partition. At 100 TB this is the
    standard log-compaction pass before serving a snapshot — AQE handles
    hot keys, and the same plan incrementalizes under Structured
    Streaming with `flatMapGroupsWithState` if run continuously."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.round("value", 2).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel analysis
# ---------------------------------------------------------------------------
@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'view' AS event_type,
             (SELECT count(*) FROM v) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM c)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM p)
    )
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click. Each stage is
    a groupBy for the stage's first qualifying timestamp, joined to the
    previous stage's result; the final answer is three stage counts.

    Scale: stage results shrink monotonically (users, not events), so
    every join after the first has a small broadcastable right side; the
    events scan is reused across stages by Catalyst (same source, three
    type filters — each scan prunes with a pushed event_type filter)."""
    ev = load_table(spark, sf_dir, "events")

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(n: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("event_type"),
            F.count("*").alias("n_users"),
        )

    return (
        stage(1, "view", v)
        .unionByName(stage(2, "click", c))
        .unionByName(stage(3, "purchase", p))
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------
_MAX_OFFSET = 3


@query(
    "retention_cohort",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
             AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7
          <= {_MAX_OFFSET}
    GROUP BY 1, 2
    """,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event; each later week-of-activity increments that cohort's
    (cohort_week, week_offset) distinct-user count, up to offset 3.
    The standard growth-analytics matrix.

    Scale: one groupBy(user_id) for cohort assignment (small result —
    one row per user), broadcast back onto the events scan, then a
    distinct-count shuffle on (cohort, offset). `count(DISTINCT)` plans
    as a two-stage expand+agg; for 100 TB swap in
    `approx_count_distinct` (the `distinct_exact_approx` query pins that
    variant's semantics)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    offset = (F.datediff(week, F.col("cohort_week")) / 7).cast("int")
    return (
        ev.join(F.broadcast(first_seen), "user_id")
        .select("user_id", "cohort_week", offset.alias("week_offset"))
        .filter(F.col("week_offset") <= _MAX_OFFSET)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketch rollup (rows-only; accuracy pinned by pytest)
# ---------------------------------------------------------------------------
@query("agg_hll_sketch_merge")
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count rollup: per (event_type, day) HLL
    sketches built once, then UNIONED per event_type to answer the
    coarser query from the fine-grained materialization — distinct users
    per event_type without touching raw data again.

    This is the 100 TB pattern the exact `countDistinct` cannot give:
    daily sketch partials are tiny (~KB), mergeable across any date
    range, and each rollup is a sum-shaped shuffle of sketches instead
    of a re-scan. Estimate accuracy vs exact is pinned to <5% by
    tests/test_analytics.py (DuckDB cannot evaluate Spark's sketch
    binary format → rows-only driver check)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_users"
            ),
            F.count("*").alias("n_days"),
        )
        .select("event_type", "approx_users", "n_days")
    )




# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection on daily event volumes
# ---------------------------------------------------------------------------
@query(
    "events_anomaly_zscore",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dayno
      FROM events GROUP BY 1, 2, 4
    ),
    r AS (
      SELECT event_type, day, n,
             sum(n) OVER w AS s1,
             sum(n * n) OVER w AS s2,
             count(*) OVER w AS w_n
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY dayno
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, n,
           round((n - s1 / 7.0)
                 / sqrt((7 * s2 - s1 * s1) / 42.0), 3) AS z
    FROM r WHERE w_n = 7 AND 7 * s2 > s1 * s1
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly scoring: each (event_type, day)'s count z-scored
    against its own trailing 7-CALENDAR-day window (RANGE frame over the
    day number, not a row frame — a quiet day shrinks w_n and the row is
    withheld rather than silently stretching the baseline over weeks).

    Cross-engine determinism: mean/stddev are NEVER taken as float
    aggregates (engines disagree in the last ulp on accumulation order);
    the window carries exact BIGINT sums s1=Σn, s2=Σn², and
    z = (n − s1/7) / sqrt((7·s2 − s1²)/42) is then a chain of
    IEEE-correctly-rounded ops on identical integers — bit-identical in
    Spark and DuckDB, so round(·, 3) is hash-safe.

    Scale: the corpus collapses to event_type × day counts in ONE
    partially-aggregated shuffle; the rolling stats run over that tiny
    rollup (days × types rows), so the window stage costs nothing at any
    corpus size. The same shape extends to hourly buckets + per-client
    partitions without changing the plan."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "dayno"
        ),
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayno")
        .rangeBetween(-6, 0)
    )
    r = d.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("*").over(w).alias("w_n"),
    )
    z = F.round(
        (F.col("n") - F.col("s1") / F.lit(7.0))
        / F.sqrt((7 * F.col("s2") - F.col("s1") * F.col("s1")) / F.lit(42.0)),
        3,
    )
    return (
        r.filter(
            (F.col("w_n") == 7)
            & (7 * F.col("s2") > F.col("s1") * F.col("s1"))
        )
        .select("event_type", "day", "n", z.alias("z"))
    )


# ---------------------------------------------------------------------------
# Count-min sketch (heavy-hitter counts, mergeable, engine-neutral hashes)
# ---------------------------------------------------------------------------
from kdcloganalyzer_spark.operators import cms  # noqa: E402

# One oracle serves the batch query AND the streaming twin
# (stream_count_min_sketch): the bounded stream's final cell table equals
# the batch cell table, so estimates are identical by construction.
CMS_ORACLE = f"""
    WITH h AS (
      SELECT event_type, CAST(r AS INT) AS r,
             {cms.cms_bucket_sql('event_type', 'r')} AS bucket
      FROM events, UNNEST(range(0, {cms.CMS_D})) AS t(r)
    ),
    sk AS (SELECT r, bucket, count(*) AS c FROM h GROUP BY ALL),
    kb AS (
      SELECT event_type, CAST(r AS INT) AS r,
             {cms.cms_bucket_sql('event_type', 'r')} AS bucket
      FROM (SELECT DISTINCT event_type FROM events),
           UNNEST(range(0, {cms.CMS_D})) AS t(r)
    ),
    est AS (SELECT event_type, min(c) AS cms_est
            FROM kb JOIN sk USING (r, bucket) GROUP BY 1),
    ex AS (SELECT event_type, count(*) AS n_exact FROM events GROUP BY 1)
    SELECT event_type, n_exact, cms_est, cms_est - n_exact AS overcount
    FROM ex JOIN est USING (event_type)
    """


def cms_estimate_vs_exact(cells: DataFrame, ev: DataFrame) -> DataFrame:
    """Point-query every distinct key against the (tiny, broadcast) cell
    table and set the exact count alongside — shared by the batch and
    streaming CMS queries."""
    kb = cms.cms_pairs(ev.select("event_type").distinct())
    est = (
        kb.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("event_type")
        .agg(F.min("c").alias("cms_est"))
    )
    ex = ev.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    return ex.join(est, "event_type").select(
        "event_type",
        "n_exact",
        "cms_est",
        (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
    )


@query("agg_count_min_sketch", oracle=CMS_ORACLE)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4 rows x 256 buckets) over the
    event stream, then point-queried for every distinct event_type
    against the exact counts (overcount >= 0 is the CMS one-sided
    guarantee, visible in the output). Hashes are md5-derived and
    engine-neutral, so unlike the opaque-binary built-in sketches this
    one is fully DuckDB-hash-verified.

    Scale: ONE pass builds all d rows (posexplode of the d bucket ids
    per record — no d-fold re-scan, operators/cms.py), partial
    aggregation collapses to the d*w = 1024-cell table map-side, and the
    cell table is a sum-shaped mergeable partial: sketches from
    different days / partitions union by adding cells, the same
    re-aggregation contract as the HLL rollup above. Point queries
    broadcast the tiny sketch."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    return cms_estimate_vs_exact(cms.cms_cells(ev), ev)


# ---------------------------------------------------------------------------
# Time-series gap fill (hypertable gapfill + LOCF)
# ---------------------------------------------------------------------------
@query(
    "rollup_gap_fill",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_c
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, min(hour) AS lo, max(hour) AS hi FROM h GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM b
    )
    SELECT g.event_type, g.hour,
           coalesce(h.n, 0) AS n,
           last_value(h.sum_value_c IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hour
             ROWS UNBOUNDED PRECEDING) AS locf_value_c
    FROM grid g LEFT JOIN h USING (event_type, hour)
    """,
)
def rollup_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-filled hourly rollup with LOCF — the
    `time_bucket_gapfill` shape: per event type, every hour between that
    type's first and last event exists in the output; missing hours get
    count 0 and carry the last observed hourly value-sum forward
    (last-observation-carried-forward; the sum is exact integer cents,
    so the carried value is order-free and engine-identical).

    Scale: one partial-agg'd groupBy builds the sparse rollup; the dense
    grid comes from a per-type `sequence` explode of the (min, max) hour
    bounds — grid size is bounded by the time span, never the event
    count; one left join aligns them and one window pass fills."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_value_c"),
    )
    b = h.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    grid = b.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(h, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("sum_value_c", ignorenulls=True)
            .over(w)
            .alias("locf_value_c"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the customer–supplier co-order graph
# ---------------------------------------------------------------------------
def _pagerank_iter_sql(prev: str, cur: str) -> str:
    """One chained-CTE PageRank round (the oracle's loop unrolling)."""
    return f"""
    {cur} AS (
      SELECT n.node,
             (1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(r.rank / d.deg), 0) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN {prev} r ON r.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.node
    )"""


_PAGERANK_ORACLE = f"""
    WITH ed AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS (
      SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
    ), deg AS (
      SELECT src, count(*) AS deg FROM e GROUP BY src
    ), nodes AS (
      SELECT DISTINCT src AS node FROM e
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), r0 AS (
      SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    ),{",".join(_pagerank_iter_sql(f"r{i}", f"r{i + 1}") for i in range(5))}
    SELECT node, round(rank, 7) AS rank_r FROM r5
    """


# Symmetrized co-order edge list, materialized once per (session, sf) —
# the same amortized-build contract as the ANN indexes (sim_search_ivf's
# cached cells): a graph-analytics deployment derives the edge list once
# and runs many algorithms over it. Keyed on applicationId (CPython can
# reuse a stopped session's id()).
_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}

# Eviction hooks (ADVICE r14): without these, the graph ids reading
# through the shared edge caches fall back to single-sample cold in the
# bench's min-of-3 protocol — the one family the r14 registry missed.
appcache.register_evictor(
    lambda qid: qid
    in (
        "graph_degree_stats",
        "graph_pagerank",
        "graph_bfs_distance",
        "graph_kcore_peel",
        "graph_community_modularity",
        "graph_degree_assortativity",
        "graph_hits_bipartite",
        "graph_label_propagation",
        "graph_label_propagation_converged",
    ),
    appcache.dict_cache_evictor(_EDGE_CACHE),
)


def _lineitem_num_rows(sf_dir: str) -> int:
    """Free row count from parquet footers, tolerant of BOTH layouts:
    a single driver-written file and a Spark-written directory of part
    files (ADVICE r14 — the single-file read must stay a heuristic, not
    a hard dependency). Unreadable footers return 0, which selects the
    localCheckpoint path — correct-but-uncached beats failing every
    consumer query."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/lineitem.parquet"
    try:
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(f"{path}/*.parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:  # noqa: BLE001 — storage heuristic, never fatal
        return 0


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    appcache.evict_stale(_EDGE_CACHE, spark)
    if key not in _EDGE_CACHE:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        ed = (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .select(
                F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            )
            .distinct()
        )
        sym = ed.unionAll(
            ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # r15: hash-partition the cached edge set by src before
        # materializing it. localCheckpoint/persist preserve the
        # physical partitioning, and hashpartitioning(src) satisfies
        # every downstream ClusteredDistribution whose keys INCLUDE src
        # (the subset rule) — so LP vote rounds (groupBy(src, lab) +
        # argmax window on src), the degree aggregate, and the
        # assortativity joins all run with ZERO further exchanges per
        # pass. Width is scale-adaptive from the free footer row count
        # (the r13 gated-operator rule: checkpointed frames carry no
        # stats, so AQE can never right-size them) — one build-time
        # exchange buys exchange-free iteration for all nine consumers.
        # Width: volume-adaptive (≈500k edge rows per partition, the
        # pagerank loop's measured grain), floor 8 — the A/B optimum
        # at sf0.1: 4 parts starve the assortativity/modularity joins
        # (0.8 → 2.0 s), 32 parts drown the LP loop's many small
        # per-round actions in task scheduling (5.9 → 9.2 s), 8 wins
        # both (family sum 27.3 → 17.2 s) — capped at the session's
        # parallelism.
        n_li = _lineitem_num_rows(sf_dir)
        parallelism = spark.sparkContext.defaultParallelism
        parts = (
            min(parallelism, max(8, (2 * n_li) // 500_000 + 1))
            if n_li
            else parallelism
        )
        sym = sym.repartition(parts, "src")
        # eager=False: plan-only callers (CLI --explain) shouldn't pay
        # the edge derivation; the first action materializes it once.
        # Storage by volume (same rule as _copart_edges, r14): big
        # symmetric edge lists cache as compressed columnar batches
        # instead of checkpoint row blocks — string-keyed src/dst rows
        # are ~3x wider than the co-part longs, so the heap math that
        # OOM'd the sf3 triangle bites here even sooner.
        if n_li > 1_500_000:
            _EDGE_CACHE[key] = sym.persist()
        else:
            _EDGE_CACHE[key] = sym.localCheckpoint(eager=False)
    return _EDGE_CACHE[key]


@query(
    "graph_degree_stats",
    oracle="""
    WITH ed AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS (
      SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed
    ), deg AS (
      SELECT src, count(*) AS deg FROM e GROUP BY src
    )
    SELECT substr(src, 1, 1) AS side,
           CAST(floor(log2(deg)) AS BIGINT) AS deg_bucket,
           count(*) AS n_nodes,
           min(deg) AS min_deg,
           max(deg) AS max_deg,
           CAST(sum(deg) AS BIGINT) AS sum_deg
    FROM deg
    GROUP BY side, deg_bucket
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE DISTRIBUTION of the bipartite co-order graph: log2-bucketed
    degree histogram per side (customers vs suppliers) — the first
    diagnostic a graph pipeline runs before choosing join strategies
    (max_deg bounds self-join fan-out; the bucket histogram is the skew
    report that justifies salting/AQE choices for pagerank and the
    wedge-based triangle count). Reuses the per-(session,sf) cached edge
    list, so marginal cost is one groupBy chain over edges.

    Scale: degree = one partial-agg'd groupBy over edges; the histogram
    re-aggregates |nodes| rows into ≤ 2·log2(max_deg) buckets — both
    shuffles data-sized then tiny. log2-of-integer floors are exact in
    IEEE on both engines (powers of two are representable; non-powers
    cannot land on integers)."""
    sym = _coorder_edges(spark, sf_dir)
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    return (
        deg.select(
            F.substring("src", 1, 1).alias("side"),
            F.floor(F.log2("deg")).cast("bigint").alias("deg_bucket"),
            "deg",
        )
        .groupBy("side", "deg_bucket")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
            F.sum("deg").cast("bigint").alias("sum_deg"),
        )
    )


@query("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-5-round PageRank over the undirected customer–supplier
    co-order graph (an edge per distinct (customer, supplier) pair that
    shares an order; both directions materialized, so no dangling mass).
    The general iterative-algorithm surface beyond connected components
    (operators/graph.py:pagerank; loop discipline shared with
    operators/dedup.py:connected_components). The oracle unrolls the
    same five rounds as chained CTEs — fixed-round semantics make the
    result an exact function of the input, so the driver hash-verifies
    an ITERATIVE algorithm end-to-end. rank is rounded at 1e-7: per-node
    in-neighbor sum order differs across engines (~1e-15 noise,
    amplified ≤ 0.85^-5 over rounds — still ≪ the rounding grain)."""
    from kdcloganalyzer_spark.operators.graph import pagerank

    sym = _coorder_edges(spark, sf_dir)
    ranks = pagerank(
        sym, damping=0.85, iters=5, symmetric=True, materialized=True
    )
    return ranks.select("node", F.round("rank", 7).alias("rank_r"))


# ---------------------------------------------------------------------------
# Per-user event-path mining (top event-type trigrams)
# ---------------------------------------------------------------------------
@query(
    "events_top_paths",
    oracle="""
    WITH s AS (
      SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step per-user event-type paths — the "what do users
    do next" navigation-mining query (the sequence-level sibling of
    events_funnel's fixed funnel).

    Scale: ONE shuffle on user_id for the ordered window (two leads
    share a single Sort), then a partial-agg'd path count whose key
    cardinality is |event_type|³ — tiny — so the final top-10 is a
    TakeOrdered, not a global sort. Ordering ties broken by event_id on
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Per-user event-type Markov transition matrix
# ---------------------------------------------------------------------------
@query(
    "events_markov_transition",
    oracle="""
    WITH s AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    )
    SELECT cur, nxt, count(*) AS n,
           round(count(*)::DOUBLE /
                 sum(count(*)) OVER (PARTITION BY cur), 6) AS p
    FROM s WHERE nxt IS NOT NULL GROUP BY cur, nxt
    """,
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current) — the model behind events_top_paths'
    raw path counts (next-action prediction, anomalous-flow scoring).

    Scale: one shuffle on user_id for the ordered lead, a partial-agg'd
    count into a |event_type|² keyspace, and the row-normalization
    window runs over that tiny aggregate, not the corpus. The
    probability is a ratio of exact counts, so the 1e-6 rounding is
    engine-safe (same double in, same round out)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = s.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    row_tot = Window.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(row_tot), 6
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# Triangle counting over the part co-order graph
# ---------------------------------------------------------------------------
#: Shared by graph_triangle_count and its shuffle-regime twin
#: (plans/round13_ops.py) — identical triangle set by construction.
TRIANGLE_ORACLE = """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
      SELECT e1.u, e1.v, e2.v AS w
      FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), pern AS (
      SELECT node, count(*) AS tri_n FROM (
        SELECT u AS node FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
      ) GROUP BY node
    )
    SELECT node, tri_n FROM pern
    ORDER BY tri_n DESC, node ASC LIMIT 20
    """


@query("graph_triangle_count", oracle=TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the part co-order graph
    (an edge per distinct part pair sharing an order) — the clustering /
    community-density primitive alongside graph_pagerank's centrality
    and dedup_clusters' connectivity.

    Scale: operators/graph.py:triangle_counts runs the degree-ordered
    wedge scheme (Suri & Vassilvitskii WWW'11) — orientation bounds
    wedges by O(m^{3/2}) regardless of skew, so the hub part that
    co-occurs with everything never becomes the "last reducer"; the
    oracle's canonical u<v<w triple self-join is the same triangle set
    by a different (quadratic-in-degree) route, making the hash compare
    an algebraic identity check between the two formulations. The edge
    list is cached per (session, sf) like the PageRank graph and the
    ANN quantizers — the wedge+closing pipeline (the per-run cost) is
    exchange-free until its final tiny aggregate."""
    from kdcloganalyzer_spark.operators.graph import triangle_counts

    edges = _copart_edges(spark, sf_dir)
    return (
        triangle_counts(edges, materialized=True)
        .orderBy(F.desc("tri_n"), F.asc("node"))
        .limit(20)
    )


_COPART_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}

appcache.register_evictor(
    lambda qid: qid
    in ("graph_triangle_count", "graph_triangle_count_shuffle"),
    appcache.dict_cache_evictor(_COPART_EDGE_CACHE),
)


def _copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) part co-order edge list, materialized once per
    (session, sf) — the same amortized derive-once contract as
    _coorder_edges: one orderkey-keyed self-join whose per-order fanout
    is C(lines_per_order, 2) ≤ 21, then a distinct."""
    key = (spark.sparkContext.applicationId, sf_dir)
    appcache.evict_stale(_COPART_EDGE_CACHE, spark)
    if key not in _COPART_EDGE_CACHE:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        b = li.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p2")
        )
        edges = (
            li.join(b, li["l_orderkey"] == b["k"])
            .where(F.col("l_partkey") < F.col("p2"))
            .select(F.col("l_partkey").alias("u"), F.col("p2").alias("v"))
            .distinct()
        )
        # Storage by volume (free footer count, r13 neighbor-jaccard
        # idiom): big edge lists cache as compressed columnar batches
        # (persist) instead of checkpoint row blocks — the r14 sf3
        # audit OOM'd an 8 GB heap pinning a 36M-edge localCheckpoint
        # (~80 B/row deserialized vs ~16 B/row columnar).
        if _lineitem_num_rows(sf_dir) > 1_500_000:
            _COPART_EDGE_CACHE[key] = edges.persist()
        else:
            _COPART_EDGE_CACHE[key] = edges.localCheckpoint(eager=False)
    return _COPART_EDGE_CACHE[key]


# ---------------------------------------------------------------------------
# CDC snapshot diff (time-travel compare of two keyed materializations)
# ---------------------------------------------------------------------------
@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ), r1 AS (
      SELECT user_id, event_id, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events, b WHERE epoch_us(ts) < (b.lo + b.hi) / 2
    ), v1 AS (
      SELECT user_id, event_id AS last_id FROM r1 WHERE rn = 1
    ), r2 AS (
      SELECT user_id, event_id, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), v2 AS (
      SELECT user_id, event_id AS last_id FROM r2 WHERE rn = 1
    )
    SELECT CASE WHEN v1.user_id IS NULL THEN 'inserted'
                WHEN v1.last_id <> v2.last_id THEN 'updated'
                ELSE 'unchanged' END AS change_type,
           count(*) AS n_keys
    FROM v2 LEFT JOIN v1 ON v1.user_id = v2.user_id
    GROUP BY 1
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff — the time-travel compare a lakehouse runs
    between two versions of a keyed materialization: snapshot v1 =
    latest event per user over the first half of the time range
    (epoch midpoint, derived from the data so both engines compute the
    same literal), v2 = latest overall; classify every v2 key as
    inserted / updated / unchanged. The audit query behind
    dedup_latest_by_key's compaction and stream_foreach_batch_upsert's
    MERGE — "what did this batch actually change?".

    Scale: two latest-per-key aggregations (max_by — partial-combined,
    one user_id shuffle each, and Catalyst reuses the scan) and a
    co-partitioned left join on the SAME key, so the diff adds no wide
    exchange beyond the snapshots themselves; output is 3 rows. The
    (ts, event_id) tie-break makes both snapshots deterministic."""
    ev = load_table(spark, sf_dir, "events")
    # Bounded control fetch (2 longs), same sanction as the late-drop
    # split point: a 1-row bounds table joined lazily would plan as a
    # BroadcastNestedLoopJoin (no equi-key), which the plan sweep
    # rightly rejects on the data path.
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid = (b["lo"] + b["hi"]) / 2
    pick = F.max_by("event_id", F.struct("ts", "event_id"))
    v1 = (
        ev.where(F.unix_micros("ts") < F.lit(mid))
        .groupBy("user_id")
        .agg(pick.alias("last_id_v1"))
    )
    v2 = ev.groupBy("user_id").agg(pick.alias("last_id_v2"))
    change = (
        F.when(F.col("last_id_v1").isNull(), F.lit("inserted"))
        .when(F.col("last_id_v1") != F.col("last_id_v2"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        v2.join(v1, "user_id", "left")
        .select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count("*").alias("n_keys"))
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution
# ---------------------------------------------------------------------------
@query(
    "events_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS cts,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
               AS campaign
      FROM events WHERE event_type = 'click'
    ), m AS (
      SELECT p.event_id, p.value, c.campaign
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cts <= p.ts AND c.cts > p.ts - INTERVAL 1 DAY
    ), sh AS (
      SELECT event_id, value, campaign,
             count(*) OVER (PARTITION BY event_id) AS n_touch
      FROM m
    )
    SELECT campaign, count(*) AS n_touches,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_conversions,
           CAST(sum(CAST(round(value * 1000000 / n_touch) AS BIGINT))
                AS BIGINT) AS attr_value_us
    FROM sh GROUP BY campaign
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: each purchase's value is split
    equally across every click of the same user in the trailing 1-day
    window, and the shares roll up per campaign (the click's ``props.k``)
    — the marketing-analytics sibling of ``join_asof``'s last-touch
    single-winner shape, and a different join geometry: as-of keeps ONE
    carry-forward row per conversion, attribution needs ALL window
    touches.

    Scale: one user-keyed equi-join (clicks ⋈ purchases) with the time
    band as a post-join predicate — candidates per user are bounded by
    that user's own activity, so the join never goes cross-user; a
    per-purchase window (count over event_id) sizes the split without a
    second join; one partial-agg'd groupBy on the ~100-value campaign
    key finishes. Hot users are ordinary join skew → AQE skew-split
    (demonstrated for this engine in tests/test_prefix_join_skew.py).
    At 100 TB the trailing-window predicate also admits day-bucketed
    co-partitioning (join on (user, day) ∪ (user, day−1)) if user
    histories ever outgrow a task — same decomposition as
    join_range_theta's band buckets."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").alias(
            "campaign"
        ),
    )
    m = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (F.col("cts") <= F.col("ts"))
        & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 1 DAY")),
    ).select("event_id", "value", "campaign")
    sh = m.withColumn(
        "n_touch", F.count("*").over(Window.partitionBy("event_id"))
    )
    # Shares in exact integer MICRO-UNITS: value/n_touch is an identical
    # IEEE division in both engines, but summing the resulting doubles is
    # order-dependent and a cent-boundary sum (x.xx5) then rounds
    # differently per engine — rounding each share to an integer first
    # makes the aggregate exact and order-free (verify-skill gotcha:
    # round inputs, not just the sum).
    share_us = F.round(
        F.col("value") * F.lit(1000000) / F.col("n_touch")
    ).cast("bigint")
    return sh.groupBy("campaign").agg(
        F.count("*").alias("n_touches"),
        F.countDistinct("event_id").alias("n_conversions"),
        F.sum(share_us).cast("bigint").alias("attr_value_us"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------
@query(
    "events_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(ts) AS mxts FROM events),
    u AS (
      SELECT user_id,
             (epoch_us((SELECT mxts FROM mx)) - epoch_us(max(ts)))
               // 86400000000 AS r_days,
             count(*) AS freq,
             CAST(sum(round(value * 100)) AS BIGINT) AS monetary_cents
      FROM events GROUP BY user_id
    )
    SELECT user_id, r_days, freq, monetary_cents,
           ntile(4) OVER (ORDER BY r_days, user_id) AS r_tier,
           ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_tier,
           ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m_tier
    FROM u
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — recency / frequency / monetary quartile tiers
    per user, the classic behavioral-segmentation rollup (tier 1-1-1 =
    most recent, most active, highest spend). Recency is integer days
    from each user's last event to the corpus max timestamp
    (microsecond-exact integer arithmetic, ``unix_micros`` ⇄
    ``epoch_us``); monetary is integer cents; every ntile ORDER BY
    carries user_id as the tiebreak, so tier assignment is total-order
    deterministic and the whole segmentation hash-verifies.

    Scale: one groupBy(user_id) with partial aggregation builds the
    per-user RFM row (data-sized shuffle); the three ntile windows are
    GLOBAL rankings — the honest cost of exact quartiles (a single-
    partition sort of |users| rows, fine while users ≪ events; at 100 TB
    swap exact ntile for approx percentile cutoffs from
    agg_quantile_sketch and assign tiers by comparison, turning the
    global sort into a broadcast of 3 cut values). The corpus max ts is
    a 1-row aggregate collected driver-side (bounded control data — the
    sanctioned scalar pattern, never a BNLJ 1-row join)."""
    ev = load_table(spark, sf_dir, "events")
    mx_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    u = ev.groupBy("user_id").agg(
        F.expr(f"({mx_us}L - unix_micros(max(ts))) div 86400000000").alias(
            "r_days"
        ),
        F.count("*").alias("freq"),
        F.sum(F.round(F.col("value") * 100)).cast("bigint").alias(
            "monetary_cents"
        ),
    )
    w_r = Window.orderBy("r_days", "user_id")
    w_f = Window.orderBy(F.desc("freq"), "user_id")
    w_m = Window.orderBy(F.desc("monetary_cents"), "user_id")
    return u.select(
        "user_id",
        "r_days",
        "freq",
        "monetary_cents",
        F.ntile(4).over(w_r).alias("r_tier"),
        F.ntile(4).over(w_f).alias("f_tier"),
        F.ntile(4).over(w_m).alias("m_tier"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation — approx-cutoff variant (the 100 TB swap, registered)
# ---------------------------------------------------------------------------
@query(
    "events_rfm_segmentation_approx",
    oracle="""
    WITH mx AS (SELECT max(ts) AS mxts FROM events),
    u AS (
      SELECT user_id,
             (epoch_us((SELECT mxts FROM mx)) - epoch_us(max(ts)))
               // 86400000000 AS r_days,
             count(*) AS freq,
             CAST(sum(round(value * 100)) AS BIGINT) AS monetary_cents
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT quantile_disc(r_days, 0.25) AS r25,
             quantile_disc(r_days, 0.50) AS r50,
             quantile_disc(r_days, 0.75) AS r75,
             quantile_disc(freq, 0.25) AS f25,
             quantile_disc(freq, 0.50) AS f50,
             quantile_disc(freq, 0.75) AS f75,
             quantile_disc(monetary_cents, 0.25) AS m25,
             quantile_disc(monetary_cents, 0.50) AS m50,
             quantile_disc(monetary_cents, 0.75) AS m75
      FROM u
    )
    SELECT user_id, r_days, freq, monetary_cents,
           CAST(1 + CAST(r_days > c.r25 AS INT)
                  + CAST(r_days > c.r50 AS INT)
                  + CAST(r_days > c.r75 AS INT) AS INT) AS r_tier,
           CAST(1 + CAST(freq < c.f75 AS INT)
                  + CAST(freq < c.f50 AS INT)
                  + CAST(freq < c.f25 AS INT) AS INT) AS f_tier,
           CAST(1 + CAST(monetary_cents < c.m75 AS INT)
                  + CAST(monetary_cents < c.m50 AS INT)
                  + CAST(monetary_cents < c.m25 AS INT) AS INT) AS m_tier
    FROM u, c
    """,
)
def events_rfm_segmentation_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION, APPROX-CUTOFF FORM — the 100 TB swap that
    ``events_rfm_segmentation``'s docstring names, registered as a
    runnable, oracle-checked query (VERDICT r6 item 4). The exact twin
    ranks every user through three GLOBAL ntile windows (a
    single-partition sort of |users| rows — the honest exact cost);
    this variant computes the 25/50/75 cut values with
    ``approx_percentile`` (Greenwald-Khanna sketch: mergeable partial
    aggregate, one data-sized shuffle, NO global sort anywhere in the
    plan), collects the 9 integer cutoffs driver-side (bounded control
    scalars — the sanctioned pattern, never a lazy 1-row BNLJ join),
    and assigns tiers by comparison, which is embarrassingly parallel.

    Tier semantics: tier = 1 + #cutoffs beaten, with "at least p·N
    values ≤ cutoff" discrete-quantile cut values — so ties land
    deterministically on both engines and the whole segmentation
    hash-verifies. At gate SFs (|users| ≪ accuracy=1e6) the GK sketch
    is rank-exact and provably equals DuckDB ``quantile_disc`` (the
    ceil(q·n)-th order statistic — verified empirically at sf0.001 and
    sf0.01 for all three metrics); at 100 TB the same plan yields
    rank error ≤ n/1e6 per cutoff — bounded-error quartile boundaries
    while tier ASSIGNMENT stays exact given the cutoffs. The per-user
    base is localCheckpointed so the cutoff job and the final
    projection share one materialization instead of re-shuffling
    events twice."""
    ev = load_table(spark, sf_dir, "events")
    mx_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    u = ev.groupBy("user_id").agg(
        F.expr(f"({mx_us}L - unix_micros(max(ts))) div 86400000000").alias(
            "r_days"
        ),
        F.count("*").alias("freq"),
        F.sum(F.round(F.col("value") * 100)).cast("bigint").alias(
            "monetary_cents"
        ),
    ).localCheckpoint(eager=False)
    cuts = u.agg(
        F.expr(
            "approx_percentile(r_days, array(0.25,0.5,0.75), 1000000)"
        ).alias("r"),
        F.expr(
            "approx_percentile(freq, array(0.25,0.5,0.75), 1000000)"
        ).alias("f"),
        F.expr(
            "approx_percentile(monetary_cents, array(0.25,0.5,0.75), 1000000)"
        ).alias("m"),
    ).collect()[0]

    def asc_tier(col: str, c: list) -> F.Column:
        t = F.lit(1)
        for cut in c:
            t = t + (F.col(col) > F.lit(int(cut))).cast("int")
        return t.cast("int")

    def desc_tier(col: str, c: list) -> F.Column:
        t = F.lit(1)
        for cut in reversed(c):
            t = t + (F.col(col) < F.lit(int(cut))).cast("int")
        return t.cast("int")

    return u.select(
        "user_id",
        "r_days",
        "freq",
        "monetary_cents",
        asc_tier("r_days", cuts["r"]).alias("r_tier"),
        desc_tier("freq", cuts["f"]).alias("f_tier"),
        desc_tier("monetary_cents", cuts["m"]).alias("m_tier"),
    )


# ---------------------------------------------------------------------------
# Audience overlap — HLL sketch form (the 100 TB swap, registered)
# ---------------------------------------------------------------------------
def audience_overlap_hll_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Raw per-pair HLL estimates (type_a, type_b, est_a, est_b,
    est_both, est_jaccard) — the sketch-side half of
    events_audience_overlap_hll, kept separate so the pytest envelope
    check can read the estimates directly (the registered query folds
    them into a driver-hashable envelope flag instead)."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    inter = est_a + est_b - est_u
    return pairs.select(
        "type_a",
        "type_b",
        F.round(est_a).cast("bigint").alias("est_a"),
        F.round(est_b).cast("bigint").alias("est_b"),
        F.greatest(F.round(inter), F.lit(0)).cast("bigint").alias("est_both"),
        F.round(F.greatest(inter, F.lit(0.0)) / est_u, 6).alias("est_jaccard"),
    )


@query(
    "events_audience_overlap_hll",
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sz AS (
      SELECT event_type, count(*) AS n FROM s GROUP BY event_type
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b,
           CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
           CAST(i.n_both AS BIGINT) AS n_both,
           TRUE AS hll_in_envelope
    FROM inter i
    JOIN sz za ON za.event_type = i.type_a
    JOIN sz zb ON zb.event_type = i.type_b
    """,
)
def events_audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP, HLL-SKETCH FORM — the summary-merge swap that
    ``events_audience_overlap``'s docstring names, registered as a
    runnable query (VERDICT r6 "100 TB variants only in docstrings").
    The exact form needs the distinct (type, user) table AND a
    user-keyed self-join; when the audience dimension is unbounded
    (cohorts, campaign segments) or users no longer fit a distinct
    shuffle, the mergeable summary wins: ONE pass builds a Datasketches
    HLL per type (partial-agg'd, no distinct materialization), the
    per-type sketch table is tiny (|types| rows x 16 KB at lgK=14),
    and every pairwise overlap is computed from sketches alone —
    |A∩B| ≈ est(A) + est(B) − est(A∪B) by inclusion-exclusion, where
    the union sketch is exact-over-sketches (hll_union merges without
    further error).

    The 5x5 pair enumeration is a broadcast non-equi join of a 5-row
    table with itself — sanctioned BNLJ (tiny dimensional cross), the
    same class as sim_search_cosine's query-set cross.

    DRIVER-CHECKABLE ORACLE (r8 — previously rows-only): Datasketches
    estimates themselves have no DuckDB twin (DuckDB's approx_distinct
    is a different sketch), so the registered output reports the EXACT
    per-pair counts (identical to events_audience_overlap's green
    oracle) plus ``hll_in_envelope`` — Spark computes it as "every HLL
    estimate within the lgK=14 envelope of the exact value" (2% of the
    relevant cardinality, ≥2 absolute — the same bound
    tests/test_round7_ops.py pins), the oracle asserts the literal
    TRUE. A sketch regression flips the flag and fails the driver hash.
    The raw estimates stay readable via
    analytics.audience_overlap_hll_estimates (pytest uses it)."""
    est = audience_overlap_hll_estimates(spark, sf_dir)
    exact = events_audience_overlap(spark, sf_dir)
    j = exact.join(est, ["type_a", "type_b"])
    union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    in_env = (
        (
            F.abs(F.col("est_a") - F.col("n_a"))
            <= F.greatest(F.lit(2.0), 0.02 * F.col("n_a"))
        )
        & (
            F.abs(F.col("est_b") - F.col("n_b"))
            <= F.greatest(F.lit(2.0), 0.02 * F.col("n_b"))
        )
        & (
            F.abs(F.col("est_both") - F.col("n_both"))
            <= F.greatest(F.lit(2.0), 0.02 * union)
        )
        & (F.abs(F.col("est_jaccard") - F.col("jaccard")) <= 0.02)
    )
    return j.select(
        "type_a",
        "type_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_both").cast("bigint").alias("n_both"),
        in_env.alias("hll_in_envelope"),
    )


# ---------------------------------------------------------------------------
# Distributed approximate top-k (sharded heavy hitters)
# ---------------------------------------------------------------------------
@query(
    "agg_approx_topk_sharded",
    oracle="""
    WITH k AS (
      SELECT event_type || '#' || (user_id % 50) AS key FROM events
    ), c AS (
      SELECT key,
             ('0x' || substr(md5(key), 1, 15))::BIGINT % 8 AS pid,
             count(*) AS cnt
      FROM k GROUP BY key
    ), r AS (
      SELECT key, pid, cnt,
             row_number() OVER (PARTITION BY pid
                                ORDER BY cnt DESC, key) AS rn
      FROM c
    ), resid AS (
      SELECT pid, coalesce(max(cnt) FILTER (rn > 4), 0) AS pid_resid
      FROM r GROUP BY pid
    )
    SELECT key, cnt AS est, CAST(r.pid AS INT) AS pid, pid_resid
    FROM r JOIN resid ON r.pid = resid.pid
    WHERE rn <= 4
    QUALIFY row_number() OVER (ORDER BY cnt DESC, key) <= 12
    """,
)
def agg_approx_topk_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed APPROXIMATE TOP-K / heavy hitters — the sharded
    summary algorithm (TPUT-family): keys shard by an engine-neutral
    md5 hash, each shard keeps only its local top-4 plus the largest
    DROPPED count (the shard's residual threshold), and the global
    top-12 merges from the per-shard summaries. Because a key lives in
    exactly ONE shard, every reported estimate is EXACT, and any
    unreported key is provably ≤ max(its shard's residual, the merge
    cutoff — the 12th reported estimate) — both laws pinned in
    tests/test_topk_sharded.py. Completes the mergeable-summary family
    next to CMS (counts), HLL (distincts), and KLL (quantiles), and
    like the CMS twin it is hash-verified end-to-end: md5 sharding
    makes the summary an exact function of the data, not of the
    engine's partitioner.

    Scale: this is why shard-local top-k works at 100 TB — the full
    key×count table never centralizes; each shard ships K+1 numbers
    (top-K + residual) no matter how many keys it holds, so the merge
    input is O(shards·K). The count itself is one partial-agg'd
    groupBy; the per-shard ranking windows over shard-sized slices. At
    higher cardinality swap the exact shard count for SpaceSaving
    within the shard — the summary contract (estimate + threshold)
    stays identical."""
    ev = load_table(spark, sf_dir, "events")
    key = F.concat_ws("#", "event_type", (F.col("user_id") % 50))
    c = (
        ev.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "pid",
            (
                F.expr(
                    "cast(conv(substring(md5(key),1,15),16,10) as bigint)"
                )
                % 8
            ).cast("int"),
        )
    )
    w_shard = Window.partitionBy("pid").orderBy(F.desc("cnt"), "key")
    # r15: the ranked shard summary (≤ |types|·50 rows) feeds both the
    # residual aggregate and the kept join — materialize once so the
    # corpus count pass doesn't re-execute per consumer.
    r = c.withColumn("rn", F.row_number().over(w_shard)).localCheckpoint()
    resid = r.groupBy("pid").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") > 4, F.col("cnt"))), F.lit(0)
        ).alias("pid_resid")
    )
    kept = (
        # explicit broadcast (ADVICE r15): checkpointed frames carry no
        # AQE stats, so the tiny per-shard residual table must be hinted
        # like every other post-checkpoint join-back in this family.
        r.where(F.col("rn") <= 4)
        .join(F.broadcast(resid), "pid")
        .select("key", F.col("cnt").alias("est"), "pid", "pid_resid")
    )
    w_glob = Window.orderBy(F.desc("est"), "key")
    return (
        kept.withColumn("grn", F.row_number().over(w_glob))
        .where(F.col("grn") <= 12)
        .drop("grn")
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, quantile_cont(n, 0.5) AS med
      FROM d GROUP BY event_type
    ), dev AS (
      SELECT d.event_type, d.day, d.n, med.med,
             abs(d.n - med.med) AS adev
      FROM d JOIN med ON med.event_type = d.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type, dev.day, dev.n,
           CAST(round(2 * dev.med) AS BIGINT) AS med2,
           CAST(round(2 * mad.mad) AS BIGINT) AS mad2,
           CAST(6745 * (2 * dev.n - round(2 * dev.med)) AS BIGINT) AS z_num,
           CAST(10000 * round(2 * mad.mad) AS BIGINT) AS z_den,
           (abs(6745 * (2 * dev.n - round(2 * dev.med)))
            > 35000 * round(2 * mad.mad)) AS outlier
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    WHERE mad.mad > 0
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST volume-anomaly scoring — median/MAD modified z-scores
    (Iglewicz-Hoaglin: 0.6745·(x−med)/MAD, flag |z| > 3.5) per
    (event_type, day), the heavy-tail-safe sibling of
    events_anomaly_zscore: one pathological day inflates a mean/stddev
    baseline and masks itself, but barely moves the median and MAD.

    Cross-engine determinism: counts are integers; Spark exact
    ``percentile`` ≡ DuckDB ``quantile_cont`` (verify-skill
    equivalence), and medians of integers interpolate to exact halves
    — every downstream ratio is a chain of IEEE ops on identical
    inputs, so round(·, 3) hash-verifies.

    Scale: the corpus collapses to type×day counts in one
    partial-agg'd shuffle; the two median passes run over that tiny
    rollup (exact percentile needs the sorted group — fine at
    days×types size; at per-entity grain swap in approx KLL from
    agg_quantile_sketch). Both join-backs broadcast the 5-row
    med/MAD tables."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    # r15: the type x day rollup (<= |types| x |days| rows) feeds THREE
    # structurally different consumers (median branch, MAD branch, the
    # final join) — each re-executed the corpus collapse. Materialize
    # it once; both join-backs stay explicit broadcasts (checkpointed
    # frames carry no AQE stats).
    d = d.localCheckpoint()
    med = d.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = d.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    # Medians of integer counts interpolate to exact half-integers, so
    # 2·med and 2·mad are exact BIGINTs — the modified z-score is then
    # reported as an exact integer ratio z_num/z_den (= 0.6745·(n−med)/
    # MAD) and the 3.5 outlier gate becomes a pure integer comparison.
    # A rounded float z lands on .xxx5 midpoints where Spark (shortest-
    # repr HALF_UP) and DuckDB (true binary) round apart — verify-skill
    # gotcha.
    med2 = F.round(2 * F.col("med")).cast("bigint")
    mad2 = F.round(2 * F.col("mad")).cast("bigint")
    z_num = (F.lit(6745) * (2 * F.col("n") - med2)).cast("bigint")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > 0)
        .select(
            "event_type",
            "day",
            "n",
            med2.alias("med2"),
            mad2.alias("mad2"),
            z_num.alias("z_num"),
            (F.lit(10000) * mad2).cast("bigint").alias("z_den"),
            (F.abs(z_num) > F.lit(35000) * mad2).alias("outlier"),
        )
    )


@query(
    "sessionize_stats_rollup",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(CASE WHEN gap_us IS NULL
                        OR gap_us > {_GAP_MIN} * 60 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    ), sess AS (
      SELECT user_id, sess_id,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
             count(*) AS n_events
      FROM s GROUP BY user_id, sess_id
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(round(2 * quantile_cont(dur_us, 0.5)) AS BIGINT)
             AS med2_dur_us,
           CAST(round(10 * quantile_cont(dur_us, 0.9)) AS BIGINT)
             AS p90x10_dur_us,
           CAST(max(dur_us) AS BIGINT) AS max_dur_us,
           CAST(round(2 * quantile_cont(n_events, 0.5)) AS BIGINT)
             AS med2_events,
           CAST(count(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces
    FROM sess
    """,
)
def sessionize_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality distribution report composed ON TOP of the gap
    sessionizer: session count, duration median/p90/max, events-per-
    session median, and single-event bounce count — the product-
    analytics rollup every sessionization feeds next. Quantiles ride
    exact integer microsecond durations, shipped scaled (2×median,
    10×p90) so linear-interpolated quantiles of integers stay exact
    BIGINTs (p90 interpolates at tenths).

    Scale: reuses the sessionizer's single user_id shuffle for the
    window + per-session aggregate; the distribution pass then reduces
    |sessions| rows to ONE — exact quantiles hold the session list per
    group, so at 100 TB the quantile slots swap to the KLL sketch
    (agg_quantile_sketch) and everything else is a partial-agg'd
    global aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(
        gap_us.isNull() | (gap_us > _GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    s = ev.select(
        "user_id",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    sess = s.groupBy("user_id", "sess_id").agg(
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("dur_us"),
        F.count("*").alias("n_events"),
    )
    return sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.round(2 * F.expr("percentile(dur_us, 0.5)"))
        .cast("bigint")
        .alias("med2_dur_us"),
        F.round(10 * F.expr("percentile(dur_us, 0.9)"))
        .cast("bigint")
        .alias("p90x10_dur_us"),
        F.max("dur_us").cast("bigint").alias("max_dur_us"),
        F.round(2 * F.expr("percentile(n_events, 0.5)"))
        .cast("bigint")
        .alias("med2_events"),
        F.count(F.when(F.col("n_events") == 1, 1))
        .cast("bigint")
        .alias("n_bounces"),
    )


@query(
    "events_audience_overlap",
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sz AS (
      SELECT event_type, count(*) AS n FROM s GROUP BY event_type
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b, za.n AS n_a, zb.n AS n_b, i.n_both,
           round(i.n_both::DOUBLE / (za.n + zb.n - i.n_both), 6)
             AS jaccard
    FROM inter i
    JOIN sz za ON za.event_type = i.type_a
    JOIN sz zb ON zb.event_type = i.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP matrix: pairwise Jaccard of the distinct user
    sets behind each event type (do clickers also purchase?) — the
    segment-overlap report behind every "audience insights" panel.
    Exact small-pair-space version: 5 types → 10 pairs; the
    user-keyed self-join of the distinct (type, user) table produces
    only co-occurring pairs (never |users|² — a user contributes
    C(types_of_user, 2) ≤ 10 rows), and the Jaccard divides exact
    integers.

    Scale: one distinct (one shuffle), a self-join keyed on user_id
    (co-partitioned with the distinct's own exchange), one 10-group
    aggregate, two broadcast joins for the set sizes. When the
    "types" dimension is unbounded (audiences, cohorts), swap the
    exact distinct sets for HLL sketches (agg_hll_sketch_merge) and
    estimate the union via inclusion-exclusion — the summary-merge
    form of this exact report."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("event_type", "user_id").distinct()
    sz = s.groupBy("event_type").agg(F.count("*").alias("n"))
    a = s.select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    b = s.select(
        F.col("event_type").alias("type_b"), "user_id"
    )
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    za = sz.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    zb = sz.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(za), "type_a")
        .join(F.broadcast(zb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Exact integer-moment statistics (variance/covariance without float traps)
# ---------------------------------------------------------------------------
@query(
    "agg_exact_moments",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c,
             CAST(hour(ts) AS BIGINT) AS h
      FROM events
    ), m AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2,
             CAST(sum(h) AS BIGINT) AS sh,
             CAST(sum(c * h) AS BIGINT) AS sch
      FROM c GROUP BY event_type
    )
    SELECT event_type, n, s1, s2,
           (n * s2 - s1 * s1) // (n * (n - 1)) AS var_c2,
           n * sch - s1 * sh AS cov_ch_num
    FROM m
    """,
)
def agg_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SECOND MOMENTS — sample variance and covariance computed
    the only way that hash-verifies across engines: raw moments as
    exact BIGINT sums over integer cents (n, Σc, Σc², Σch), combined
    with INTEGER division (`div` ⇄ `//` truncate identically; a float
    var_samp would differ in the last ulp by partial-aggregation order
    on every engine pair, and round() of a ratio that can land on .5
    is the documented midpoint trap). var_c2 is sample variance in
    cents² (truncated); cov_ch_num is the exact covariance NUMERATOR
    n·Σch − Σc·Σh between value and hour-of-day (denominator n·(n−1)
    left to the consumer — exactness beats pre-dividing).

    Scale: raw moments are the textbook mergeable aggregate — one
    partial-agg'd shuffle, four BIGINT adds per row; this is also WHY
    map-side combine works for variance (Welford's running form is
    NOT mergeable per-row; moment sums are). Overflow headroom: cents
    ≤ 5e4 → c² ≤ 2.5e9; n·Σc² at 1e9 rows/group ≈ 1e28 would need
    DECIMAL(38,0) accumulation — the documented 100 TB adjustment
    (Spark sum(BIGINT) already overflows loudly under ANSI mode, not
    silently)."""
    ev = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    m = ev.select(
        "event_type",
        c.alias("c"),
        F.hour("ts").cast("bigint").alias("h"),
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum("h").alias("sh"),
        F.sum(F.col("c") * F.col("h")).alias("sch"),
    )
    return m.select(
        "event_type",
        "n",
        "s1",
        "s2",
        F.expr("(n * s2 - s1 * s1) div (n * (n - 1))").alias("var_c2"),
        (F.col("n") * F.col("sch") - F.col("s1") * F.col("sh")).alias(
            "cov_ch_num"
        ),
    )


# ---------------------------------------------------------------------------
# Cohort LTV (retention matrix with the money dimension)
# ---------------------------------------------------------------------------
@query(
    "retention_cohort_ltv",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), j AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            CAST(date_trunc('week', e.ts) AS DATE)) / 7
                  AS INT) AS week_offset,
             e.user_id,
             CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(CAST(sum(cents) AS BIGINT))
                  OVER (PARTITION BY cohort_week ORDER BY week_offset)
                AS BIGINT) AS cum_revenue_cents
    FROM j
    WHERE week_offset <= {_MAX_OFFSET}
    GROUP BY cohort_week, week_offset
    """,
)
def retention_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LIFETIME VALUE: retention_cohort's matrix with the money
    dimension — per (cohort_week, week_offset), active users, exact
    integer-cents revenue, and the cumulative LTV running sum each
    growth team actually plots (cum revenue per cohort over offsets).
    The running sum is a window over the TINY aggregated matrix
    (|cohorts|×|offsets| rows), not over events.

    Scale: same two shuffles as retention_cohort (per-user cohort
    assignment broadcast back, one (cohort, offset) distinct+sum agg);
    the LTV window adds no data-sized work. Money in BIGINT cents end
    to end."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    offset = (F.datediff(week, F.col("cohort_week")) / 7).cast("int")
    agg = (
        ev.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_week",
            offset.alias("week_offset"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .filter(F.col("week_offset") <= _MAX_OFFSET)
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.select(
        "cohort_week",
        "week_offset",
        "n_users",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("bigint").alias(
            "cum_revenue_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Event-sequence pattern matching (MATCH_RECOGNIZE-shaped)
# ---------------------------------------------------------------------------
@query(
    "events_sequence_match",
    oracle="""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS INT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'c[^p]*?p')) AS INT)
             AS n_click_to_purchase,
           CAST(len(regexp_extract_all(seq, 'e')) AS INT) AS n_errors,
           CASE WHEN seq LIKE 's%' THEN 1 ELSE 0 END AS signup_first
    FROM s
    WHERE regexp_matches(seq, 'c[^p]*?p')
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-SEQUENCE PATTERN MATCHING — the MATCH_RECOGNIZE shape
    (Flink CEP / Trino MATCH_RECOGNIZE) expressed Spark-first: each
    user's event stream becomes an ordered initial-letter string (one
    char per event, total-ordered by (ts, event_id)), and sequence
    patterns are then ordinary regexes — here the conversion pattern
    `c[^p]*?p` (a click leading to the NEXT purchase; non-greedy, so
    back-to-back conversions count separately), error incidence, and a
    signup-first flag. Regex-over-sequence-string is the standard CEP
    reduction when patterns are per-key and streams fit a row (here ≤
    a few hundred events/user).

    Scale: one groupBy(user_id) building the sequence string
    (partial-agg'd collect_list of 16-byte structs, then sorted
    in-memory PER USER — bounded by max events/user, not corpus), and
    a codegen regex projection. Users with pathological event counts
    would cap the string (slice the sorted array) — the per-key-bounded
    state assumption every CEP engine makes. No self-joins, no window
    over events."""
    ev = load_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ts",
                        "event_id",
                        F.substring("event_type", 1, 1).alias("ch"),
                    )
                )
            ),
            lambda s: s["ch"],
        ),
        "",
    )
    s = ev.groupBy("user_id").agg(seq.alias("seq"))
    n_conv = F.size(
        F.expr(r"regexp_extract_all(seq, 'c[^p]*?p', 0)")
    ).cast("int")
    return (
        s.where(F.col("seq").rlike("c[^p]*?p"))
        .select(
            "user_id",
            F.length("seq").cast("int").alias("n_events"),
            n_conv.alias("n_click_to_purchase"),
            F.size(F.expr("regexp_extract_all(seq, 'e', 0)"))
            .cast("int")
            .alias("n_errors"),
            F.when(F.col("seq").startswith("s"), 1)
            .otherwise(0)
            .alias("signup_first"),
        )
    )


@query(
    "events_ab_test_report",
    oracle="""
    WITH a AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5('exp1#' ||
                        CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS spend_cents
      FROM events GROUP BY 1, 2
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
             AS conv_rate_micro,
           CAST(sum(spend_cents) AS BIGINT) AS revenue_cents
    FROM a GROUP BY variant
    """,
)
def events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B EXPERIMENT REPORT — the experimentation readout: users are
    assigned to control/treatment by a SEEDED HASH of their id (the
    industry-standard deterministic bucketing — same user, same arm,
    any engine, any day; the cross-engine 60-bit md5 idiom makes the
    assignment itself hash-verified), then per-arm exposure,
    conversion, rate (exact integer micro-units — a float rate is the
    midpoint trap), and revenue are rolled up. Significance testing
    needs only these four integers per arm (the z-statistic is a
    driver-side formula over them).

    Scale: per-user conversion collapses in ONE partial-agg'd shuffle
    on user_id (the assignment hash is a map-side projection, never a
    join against an assignment table — that is the point of hashed
    bucketing); the per-arm rollup is 2 rows. Multi-experiment
    dashboards fan the same scan out over exp-id salt values."""
    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.expr(
            "CAST(conv(substring(md5(concat('exp1#',"
            " CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    per_user = ev.groupBy("user_id", variant.alias("variant")).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("converted"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("spend_cents"),
    )
    return per_user.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.expr("sum(converted) * 1000000 div count(*)").alias(
            "conv_rate_micro"
        ),
        F.sum("spend_cents").cast("bigint").alias("revenue_cents"),
    )


@query(
    "events_dau_mau_stickiness",
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
             AS stickiness_micro
    FROM m JOIN mu ON m.month = mu.month
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS — the engagement ratio every consumer product
    tracks: average daily actives over monthly actives, per month. The
    ratio is exact integer micro-units of (Σdau · 1e6) / (days · mau) —
    both distinct counts are exact, so the metric hash-verifies (an
    approx_count_distinct swap changes only the two count nodes).

    Scale: two distinct-aggregates over different grains share the one
    events scan; per-day and per-month distincts are the partial-agg +
    expand plan Catalyst already uses for multi-distinct. At true 100 TB
    the per-day exact distinct is the heavy node — the documented swap
    is HLL sketches per (day) merged upward to (month), which this
    repo's agg_hll_sketch_merge / users_few_services_approx already
    exhibit; the report shape here stays identical."""
    ev = load_table(spark, sf_dir, "events")
    # r15: BOTH distinct grains derive from one (user, day) activity
    # collapse — dau = per-day row count, mau = per-month count over
    # the (user, month) dedupe of the same table — so the corpus is
    # scanned and distinct-expanded ONCE instead of once per grain.
    # |users|x|days| is the standard activity-table size, far below
    # the event count; checkpointed because the two consumers are
    # structurally different subtrees. Scale bound (ADVICE r15): this
    # is the one r15 checkpoint that is activity-sized rather than
    # rollup-sized — acceptable because localCheckpoint stores at
    # MEMORY_AND_DISK (spills, never OOMs), and at true 100 TB the
    # documented swap is per-day HLL sketches merged upward (see
    # docstring), which shrinks this table to |days| rows.
    ud = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    d = ud.groupBy("day").agg(F.count("*").alias("dau"))
    m = d.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month")
    ).agg(
        F.sum("dau").cast("bigint").alias("sum_dau"),
        F.count("*").alias("n_days"),
    )
    mu = (
        ud.select(
            F.date_trunc("month", "day").cast("date").alias("month"),
            "user_id",
        )
        .distinct()
        .groupBy("month")
        .agg(F.count("*").alias("mau"))
    )
    return m.join(mu, "month").select(
        "month",
        "mau",
        "sum_dau",
        "n_days",
        F.expr("sum_dau * 1000000 div (n_days * mau)").alias(
            "stickiness_micro"
        ),
    )


@query(
    "analytics_pareto_concentration",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend DESC, o_custkey) AS rk,
             count(*) OVER () AS n_cust,
             sum(spend) OVER () AS total,
             sum(spend) OVER (ORDER BY spend DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(max(cum) AS BIGINT) AS cum_cents,
           CAST(max(cum) * 1000000 // max(total) AS BIGINT)
             AS cum_share_micro
    FROM (SELECT cum, total,
                 CAST(rk * 10 // n_cust AS BIGINT) AS decile
          FROM r WHERE rk * 10 % n_cust = 0 OR rk = n_cust) x
    GROUP BY decile
    """,
)
def analytics_pareto_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARETO / REVENUE-CONCENTRATION CURVE — "the top 10% of customers
    carry X% of revenue": customers ranked by exact-cents spend, the
    cumulative share read off at each decile boundary (the Lorenz-curve
    points a Gini coefficient integrates). All integer arithmetic:
    cents sums, row_number ranks, micro-unit shares via integer
    division — the whole curve hash-verifies.

    Scale: per-customer spend collapses in one partial-agg'd shuffle;
    the ranking then runs over the CUSTOMER summary (1/40th of order
    rows here; bounded by entity count generally). The unpartitioned
    rank-over-summary is the sanctioned pattern — at true
    billions-of-entities scale the decile boundaries come from
    approx_percentile over spend (the events_rfm_segmentation_approx
    swap) instead of a global rank, and the curve is read off the same
    way."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend")
    )
    w_rank = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    w_all = Window.partitionBy()
    r = s.select(
        "spend",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(w_all).alias("n_cust"),
        F.sum("spend").over(w_all).alias("total"),
        F.sum("spend")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    x = r.where(
        ((F.col("rk") * 10) % F.col("n_cust") == 0)
        | (F.col("rk") == F.col("n_cust"))
    ).select(
        (F.col("rk") * 10 / F.col("n_cust")).cast("int").alias("decile"),
        "cum",
        "total",
    )
    return x.groupBy("decile").agg(
        F.max("cum").cast("bigint").alias("cum_cents"),
        # DECIMAL(38,0) widening (r15 sf1 rehearsal): cum*1e6 overflows
        # BIGINT once the corpus' cent sum passes ~9.2e12 (sf1 is 2.3e13)
        # — DuckDB's sum() is already HUGEINT, so only Spark needed the
        # widening; decimal `div` truncates like HUGEINT `//`.
        F.expr(
            "CAST(max(cum) AS DECIMAL(38,0)) * 1000000"
            " div CAST(max(total) AS DECIMAL(38,0))"
        ).alias("cum_share_micro"),
    )


@query(
    "graph_bfs_distance",
    oracle="""
    WITH RECURSIVE ed AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed),
    walk AS (
      SELECT 'c' || (SELECT min(o_custkey) FROM orders) AS node, 0 AS dist
      UNION
      SELECT e.dst, walk.dist + 1
      FROM walk JOIN e ON e.src = walk.node
      WHERE walk.dist < 4
    ),
    d AS (SELECT node, CAST(min(dist) AS INT) AS dist
          FROM walk GROUP BY node)
    SELECT dist, substr(node, 1, 1) AS side,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM d GROUP BY dist, side
    """,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS HOP DISTANCE from a seed entity over the customer–supplier
    co-order graph — reachability rings ("how far is everything from
    this account"), the traversal primitive behind blast-radius and
    influence analyses. Spark side runs the Pregel-shaped frontier loop
    (operators/graph.py:bfs_distances — broadcast frontier, anti-join
    visited, eager rounds, early exit); the oracle is the depth-bounded
    recursive CTE with a min-dist rollup — two formulations, one
    deterministic answer, which is the point: the iterative form is the
    one that scales (frontier-bounded state), the recursive SQL form is
    the one DuckDB can check.

    Scale: see bfs_distances. Output is the per-ring census (dist ×
    node side), not per-node rows — ring sizes are what the analyses
    consume. Seed = min ordering customer, collected as a sanctioned
    1-row control scalar (a lazy 1-row join would plan as BNLJ)."""
    from kdcloganalyzer_spark.operators import graph as G

    edges = _coorder_edges(spark, sf_dir)
    seed_key = (
        load_table(spark, sf_dir, "orders")
        .agg(F.min("o_custkey").alias("m"))
        .collect()[0]["m"]
    )
    d = G.bfs_distances(edges, f"c{seed_key}", max_hops=4)
    return d.groupBy(
        "dist", F.substring("node", 1, 1).alias("side")
    ).agg(F.count("*").alias("n_nodes"))


@query(
    "rollup_weighted_moving_avg",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    )
    SELECT day, cents,
           16 * cents
             + 8 * coalesce(lag(cents, 1) OVER w, 0)
             + 4 * coalesce(lag(cents, 2) OVER w, 0)
             + 2 * coalesce(lag(cents, 3) OVER w, 0)
             + 1 * coalesce(lag(cents, 4) OVER w, 0) AS wma_num,
           16 + 8 * CASE WHEN lag(cents, 1) OVER w IS NULL
                         THEN 0 ELSE 1 END
              + 4 * CASE WHEN lag(cents, 2) OVER w IS NULL
                         THEN 0 ELSE 1 END
              + 2 * CASE WHEN lag(cents, 3) OVER w IS NULL
                         THEN 0 ELSE 1 END
              + 1 * CASE WHEN lag(cents, 4) OVER w IS NULL
                         THEN 0 ELSE 1 END AS wma_den
    FROM d
    WINDOW w AS (ORDER BY day)
    """,
)
def rollup_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MOVING AVERAGE — the exponential-shaped smoother
    (weights 16/8/4/2/1 over the trailing 5 days — a truncated
    EWMA with α=1/2) computed entirely in integers: per-day cents,
    integer weight products, and the numerator/denominator emitted
    SEPARATELY so the smoothed series hash-verifies (a float
    wma_num/wma_den division is the one step engines round apart;
    the consumer divides once). Warm-up days shrink the denominator
    instead of biasing toward zero — the standard partial-window
    convention.

    Scale: the corpus collapses to one row per day in one shuffle;
    the lag window runs over the calendar-sized summary (the
    analytics_period_growth argument). A true infinite-memory EWMA is
    inherently sequential — the truncated-window form is WHY this
    smoother parallelizes: each output row depends on a bounded
    lookback, so the window operator streams it."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    num = F.lit(16) * F.col("cents")
    den = F.lit(16)
    for i, wt in enumerate((8, 4, 2, 1), start=1):
        lagged = F.lag("cents", i).over(w)
        num = num + F.lit(wt) * F.coalesce(lagged, F.lit(0))
        den = den + F.when(lagged.isNull(), 0).otherwise(wt)
    return d.select(
        "day",
        "cents",
        num.cast("bigint").alias("wma_num"),
        den.cast("bigint").alias("wma_den"),
    )


@query(
    "analytics_segment_migration",
    oracle="""
    WITH half AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate <
                       (SELECT min(o_orderdate)
                          + (max(o_orderdate) - min(o_orderdate)) / 2
                        FROM orders)
                  THEN 'h1' ELSE 'h2' END AS period,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    spend AS (
      SELECT o_custkey, period,
             CAST(sum(cents) AS BIGINT) AS spend
      FROM half GROUP BY 1, 2
    ),
    tiered AS (
      SELECT o_custkey, period,
             CASE WHEN spend >= 40000000 THEN 'gold'
                  WHEN spend >= 20000000 THEN 'silver'
                  ELSE 'bronze' END AS tier
      FROM spend
    )
    SELECT coalesce(a.tier, 'none') AS tier_h1,
           coalesce(b.tier, 'none') AS tier_h2,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM (SELECT o_custkey, tier FROM tiered WHERE period = 'h1') a
    FULL JOIN (SELECT o_custkey, tier FROM tiered WHERE period = 'h2') b
      ON a.o_custkey = b.o_custkey
    GROUP BY 1, 2
    """,
)
def analytics_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT-MIGRATION MATRIX — where did each customer's tier go
    between two halves of the observation window (gold/silver/bronze by
    exact-cents spend against fixed thresholds, 'none' for customers
    absent from a half)? The churn/upgrade transition matrix every
    lifecycle team reports. The half-split midpoint is derived from the
    data (min+span/2) identically on both engines in timestamp
    arithmetic.

    Scale: one scan → per-(customer, half) spend in a single
    partial-agg'd shuffle; the FULL self-join is co-partitioned on
    customer (Catalyst reuses the groupBy partitioning) and the output
    is the ≤ 4×4 matrix. Fixed thresholds make tiers embarrassingly
    parallel; percentile tiers would go through the RFM approx-cutoff
    pattern instead."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).collect()[0]
    mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
    # r15: the two half-filtered sides of the old full self-join were
    # structurally different (no ReusedExchange), so the per-(customer,
    # period) collapse ran twice. ONE groupBy(o_custkey) with
    # conditional half sums is the identical matrix: a customer absent
    # from a half has a NULL conditional sum, exactly the old full-join
    # miss → 'none'.
    is_h1 = F.col("o_orderdate") < F.lit(mid)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    spend = orders.select(
        "o_custkey",
        F.when(is_h1, cents).alias("c1"),
        F.when(~is_h1, cents).alias("c2"),
    ).groupBy("o_custkey").agg(
        F.sum("c1").cast("bigint").alias("s1"),
        F.sum("c2").cast("bigint").alias("s2"),
    )

    def _tier(col: str):
        return (
            F.when(F.col(col).isNull(), "none")
            .when(F.col(col) >= 40000000, "gold")
            .when(F.col(col) >= 20000000, "silver")
            .otherwise("bronze")
        )

    return spend.groupBy(
        _tier("s1").alias("tier_h1"), _tier("s2").alias("tier_h2")
    ).agg(F.count("*").alias("n_customers"))


@query(
    "events_funnel_windowed",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'view' AS event_type,
             (SELECT count(*) FROM v) AS n_users
      UNION ALL
      SELECT 2, 'click_24h', (SELECT count(*) FROM c)
      UNION ALL
      SELECT 3, 'purchase_24h', (SELECT count(*) FROM p)
    )
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED FUNNEL — view → click → purchase where each step
    must land within 24 HOURS of the previous step's completion (the
    attribution-window semantics real conversion funnels use; the
    unbounded events_funnel counts a purchase a month later, this one
    does not). Same min-timestamp chaining as the unbounded form with
    an upper bound per hop — the earliest-qualifying-event convention
    makes the count deterministic.

    Scale: per-stage min() collapses per user before each hop's join,
    so every join is entity-sized and co-partitioned on user_id (three
    stages = the same shuffle key reused; Catalyst plans one exchange
    lineage). Windowing changes no plan shape — only the residual
    predicate — which is exactly why funnels generalize to K stages ×
    arbitrary windows at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    day_us = 24 * 3600 * 1000000
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (
                F.unix_micros("ts")
                <= F.unix_micros("t1") + F.lit(day_us)
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (
                F.unix_micros("ts")
                <= F.unix_micros("t2") + F.lit(day_us)
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        (1, "view", v),
        (2, "click_24h", c),
        (3, "purchase_24h", p),
    ]
    out = None
    for stage, name, df in rows:
        one = df.agg(F.count("*").alias("n_users")).select(
            F.lit(stage).alias("stage"),
            F.lit(name).alias("event_type"),
            "n_users",
        )
        out = one if out is None else out.unionAll(one)
    return out


@query(
    "events_forecast_seasonal_naive",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    j AS (
      SELECT day, cents,
             lag(cents, 7) OVER (ORDER BY day) AS forecast,
             lag(cents, 1) OVER (ORDER BY day) AS naive
      FROM d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(cents - forecast)) AS BIGINT)
             AS seasonal_abs_err,
           CAST(sum(abs(cents - naive)) AS BIGINT) AS naive_abs_err,
           CAST(sum(abs(cents - forecast)) * 1000000
             // sum(abs(cents - naive)) AS BIGINT) AS mase_micro
    FROM j WHERE forecast IS NOT NULL AND naive IS NOT NULL
    """,
)
def events_forecast_seasonal_naive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FORECAST BACKTEST (seasonal-naive vs naive) — the baseline every
    forecasting system must beat, evaluated the way M-competitions do:
    forecast(d) = actual(d−7) (weekly seasonality), error vs the
    1-day-naive benchmark, summarized as MASE in exact integer
    micro-units (cents errors are integers; one integer division at
    the end). mase_micro < 1e6 ⇔ weekly seasonality is real signal.

    Scale: the corpus collapses to the per-day series in one shuffle;
    both lag forecasts and the error rollup run over the calendar
    summary. Per-series forecasting at scale partitions the same plan
    by series key (the window gains a partitionBy and nothing else
    changes) — millions of independent series parallelize trivially;
    it is long single series that do not."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    j = d.select(
        "cents",
        F.lag("cents", 7).over(w).alias("forecast"),
        F.lag("cents", 1).over(w).alias("naive"),
    ).where(F.col("forecast").isNotNull() & F.col("naive").isNotNull())
    return j.agg(
        F.count("*").alias("n_days"),
        F.sum(F.abs(F.col("cents") - F.col("forecast")))
        .cast("bigint")
        .alias("seasonal_abs_err"),
        F.sum(F.abs(F.col("cents") - F.col("naive")))
        .cast("bigint")
        .alias("naive_abs_err"),
        # DECIMAL(38,0) widening (r15): error-cent sums are unbounded in
        # data volume; *1e6 passes BIGINT range past ~sf3 of this series
        F.expr(
            "CAST(sum(abs(cents - forecast)) AS DECIMAL(38,0)) * 1000000"
            " div CAST(sum(abs(cents - naive)) AS DECIMAL(38,0))"
        ).alias("mase_micro"),
    )


@query(
    "events_growth_accounting",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    fw AS (
      SELECT user_id, min(week) AS first_week FROM uw GROUP BY user_id
    ),
    flags AS (
      SELECT a.user_id, a.week,
             CASE WHEN f.first_week = a.week THEN 1 ELSE 0 END AS is_new,
             CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END
               AS is_retained
      FROM uw a
      JOIN fw f ON f.user_id = a.user_id
      LEFT JOIN uw b ON b.user_id = a.user_id AND b.week = a.week - 7
    )
    SELECT week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(is_new) AS BIGINT) AS n_new,
           CAST(sum(is_retained) AS BIGINT) AS n_retained,
           CAST(count(*) - sum(is_new) - sum(is_retained) AS BIGINT)
             AS n_resurrected
    FROM flags
    GROUP BY week
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING — the weekly active-user ledger (Social
    Capital's framework): every active user is exactly one of NEW
    (first-ever week), RETAINED (also active the prior week), or
    RESURRECTED (returning after a gap); churn falls out as
    active(w−1) − retained(w). The three classes partition the actives,
    so the ledger cross-foots — and being pure integer counts, it
    hash-verifies.

    Scale: the corpus collapses to distinct (user, week) FIRST (one
    partial-agg'd shuffle — everything downstream is entity-week
    sized); first-week is a groupBy on the same key; the prior-week
    probe is a self-join co-partitioned on user_id. Three operators,
    one partitioning, no window over raw events. The same ledger at
    daily grain just swaps the truncation unit."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    # r15: first-week and the prior-week probe are both derivable from
    # the user's ORDERED distinct-week sequence — min(week) over user
    # and lag(week)+7 == week (the immediately previous active week IS
    # (user, week−7) when it exists) — so the two self-joins (each
    # re-executing the corpus distinct) collapse into one window pass.
    wu = Window.partitionBy("user_id").orderBy("week")
    flags = uw.select(
        "week",
        F.when(
            F.min("week").over(Window.partitionBy("user_id"))
            == F.col("week"),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
        F.when(
            F.date_add(F.lag("week").over(wu), 7) == F.col("week"), 1
        )
        .otherwise(0)
        .alias("is_retained"),
    )
    return flags.groupBy("week").agg(
        F.count("*").alias("n_active"),
        F.sum("is_new").cast("bigint").alias("n_new"),
        F.sum("is_retained").cast("bigint").alias("n_retained"),
        (F.count("*") - F.sum("is_new") - F.sum("is_retained"))
        .cast("bigint")
        .alias("n_resurrected"),
    )


@query(
    "events_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_buy, min(v.t_view) AS t_view
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT epoch_us(t_buy) - epoch_us(t_view) AS us FROM p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(us) AS BIGINT) AS min_us,
           CAST(round(2 * quantile_cont(us, 0.5)) AS BIGINT)
             AS median_us_x2,
           CAST(round(10 * quantile_cont(us, 0.9)) AS BIGINT)
             AS p90_us_x10,
           CAST(max(us) AS BIGINT) AS max_us
    FROM lat
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT DISTRIBUTION — latency from first view to first
    subsequent purchase per user, summarized as min / median / p90 /
    max in exact integer microseconds (quantiles shipped scaled —
    2×median, 10×p90 — so linear interpolation of integers stays exact
    across engines, the sessionize_stats_rollup idiom). The metric
    funnel counts leave out: not whether users convert but how long
    they take.

    Scale: two per-user min() collapses share the user_id partitioning
    (the funnel argument); the latency list then reduces to ONE summary
    row. Exact percentile holds per-group values in memory — fine for
    one group of entity-sized latencies; a per-segment breakdown at
    billions of entities swaps in approx_percentile exactly as
    events_rfm_segmentation_approx does."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"), F.min("t_view").alias("t_view2"))
    )
    lat = p.select(
        (F.unix_micros("t_buy") - F.unix_micros("t_view2")).alias("us")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.min("us").cast("bigint").alias("min_us"),
        F.round(2 * F.expr("percentile(us, 0.5)"))
        .cast("bigint")
        .alias("median_us_x2"),
        F.round(10 * F.expr("percentile(us, 0.9)"))
        .cast("bigint")
        .alias("p90_us_x10"),
        F.max("us").cast("bigint").alias("max_us"),
    )


@query(
    "events_anomaly_seasonal_residual",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT day, cents,
             cents - lag(cents, 7) OVER (ORDER BY day) AS resid
      FROM d
    ),
    med AS (
      SELECT CAST(round(2 * quantile_cont(resid, 0.5)) AS BIGINT) AS m2
      FROM r WHERE resid IS NOT NULL
    ),
    mad AS (
      SELECT CAST(round(4 * quantile_cont(abs(2 * resid - m2), 0.5))
                  AS BIGINT) AS mad4
      FROM r, med WHERE resid IS NOT NULL
    )
    SELECT day, cents, CAST(resid AS BIGINT) AS resid,
           CAST(abs(2 * resid - med.m2) AS BIGINT) AS dev2
    FROM r, med, mad
    WHERE resid IS NOT NULL
      AND abs(2 * resid - med.m2) * 2 > 7 * mad.mad4
    """,
)
def events_anomaly_seasonal_residual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONALITY-AWARE ANOMALY DETECTION — the composition the two
    existing detectors (z-score, MAD) skip: remove the weekly pattern
    FIRST (residual = today − same-weekday-last-week, the seasonal-
    naive forecast), then flag residuals beyond 3.5 robust deviations
    (|2r − 2·median| · 2 > 7 · 4·MAD — every quantity pre-scaled to an
    exact integer so the inequality is integer-exact: ×2 keeps the
    interpolated median exact, ×4 the MAD, and cross-multiplying
    replaces the 3.5 float threshold with 7/2). A raw-value detector
    fires every weekend; a residual detector only on pattern BREAKS.

    Scale: corpus → calendar summary in one shuffle (the period_growth
    argument); the two quantiles and the flag scan run over ~30 rows.
    The median and MAD are CONTROL SCALARS — collected driver-side and
    embedded as literals (the sanctioned pattern; a lazy 1-row join
    would plan as BroadcastNestedLoopJoin, the shape the plan sweep
    rejects). Two bounded collects over a calendar-sized summary."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    r = d.select(
        "day",
        "cents",
        (F.col("cents") - F.lag("cents", 7).over(w)).alias("resid"),
    ).where(F.col("resid").isNotNull())
    r = r.localCheckpoint(eager=False)  # reused by both collects + flags
    m2 = int(
        r.agg(
            F.round(2 * F.expr("percentile(resid, 0.5)")).cast("bigint")
        ).collect()[0][0]
    )
    mad4 = int(
        r.agg(
            F.round(
                4 * F.expr(f"percentile(abs(2 * resid - {m2}), 0.5)")
            ).cast("bigint")
        ).collect()[0][0]
    )
    return r.where(
        F.abs(2 * F.col("resid") - F.lit(m2)) * 2 > 7 * F.lit(mad4)
    ).select(
        "day",
        "cents",
        F.col("resid").cast("bigint").alias("resid"),
        F.abs(2 * F.col("resid") - F.lit(m2))
        .cast("bigint")
        .alias("dev2"),
    )


@query(
    "sessionize_entry_exit",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    ),
    ee AS (
      SELECT user_id, sess_id,
             first_value(event_type) OVER ws AS entry_type,
             last_value(event_type) OVER ws AS exit_type,
             count(*) OVER ws AS n_events
      FROM s
      WINDOW ws AS (PARTITION BY user_id, sess_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
      QUALIFY row_number() OVER (PARTITION BY user_id, sess_id
                                 ORDER BY ts, event_id) = 1
    )
    SELECT entry_type, exit_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_single_event
    FROM ee GROUP BY entry_type, exit_type
    """,
)
def sessionize_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTRY/EXIT REPORT — the landing-page/exit-page table: for every
    gap session, its first and last event type under a (ts, event_id)
    TOTAL order (bare ts ties would make entry/exit nondeterministic),
    aggregated into the (entry, exit) transition counts plus the
    single-event-session (bounce) column. Composes the gap sessionizer
    with frame-bounded first_value/last_value — the DuckDB twin is the
    same windows plus QUALIFY to keep one row per session.

    Scale: ONE shuffle on user_id serves the gap window, the running
    session-id sum, and the per-session frame (same partitioning,
    exchanges reused); the (entry, exit) rollup is |types|² rows. No
    joins at all — the whole report is window algebra over one sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        gap_us.isNull() | (gap_us > _GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_s)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy(
        "ts", "event_id"
    )
    wf = ws.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ee = (
        s.select(
            "user_id",
            "sess_id",
            F.first("event_type").over(wf).alias("entry_type"),
            F.last("event_type").over(wf).alias("exit_type"),
            F.count("*").over(wf).alias("n_events"),
            F.row_number().over(ws).alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    return ee.groupBy("entry_type", "exit_type").agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_single_event"),
    )


@query(
    "events_velocity_features",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id < 40
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w1h AS BIGINT) AS n_1h,
           CAST(count(*) OVER w24h AS BIGINT) AS n_24h,
           CAST(sum(cents) OVER w24h AS BIGINT) AS spend_24h_cents,
           CAST(count(*) OVER w7d AS BIGINT) AS n_7d
    FROM e
    WINDOW
      w1h AS (PARTITION BY user_id ORDER BY sec
              RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW),
      w24h AS (PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW),
      w7d AS (PARTITION BY user_id ORDER BY sec
              RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)
    """,
)
def events_velocity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VELOCITY FEATURES — the point-in-time feature-engineering
    pattern behind fraud/abuse models: for EVERY event, the actor's
    trailing activity counts and spend over 1 h / 24 h / 7 d windows,
    computed AS OF that event (no leakage — range frames end at the
    current row, which is the property a feature store certifies).
    Whole-second epoch range frames and integer cents keep every
    feature exact across engines. Equal-timestamp events share a
    RANGE frame (peer rows) identically in both engines — the frame
    is time-defined, so no tie-break is needed.

    Scale: all three frames share ONE shuffle+sort on (user_id, sec) —
    Catalyst fuses same-spec windows, so adding horizons is free; state
    per key is the trailing 7-day buffer (bounded by actor rate, not
    corpus). This is the batch twin of the streaming feature pipeline
    (sliding windows + state store); training-set backfill runs THIS
    form because it replays history exactly."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    base = Window.partitionBy("user_id").orderBy("sec")
    w1h = base.rangeBetween(-3599, 0)
    w24h = base.rangeBetween(-86399, 0)
    w7d = base.rangeBetween(-604799, 0)
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w1h).alias("n_1h"),
        F.count("*").over(w24h).alias("n_24h"),
        F.sum("cents").over(w24h).cast("bigint").alias("spend_24h_cents"),
        F.count("*").over(w7d).alias("n_7d"),
    )


@query(
    "events_slo_burn_rate",
    oracle="""
    WITH h AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_err
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT hour, n_total, n_err,
             sum(n_err) OVER w6 AS err_6h,
             sum(n_total) OVER w6 AS tot_6h
      FROM h
      WINDOW w6 AS (ORDER BY hour
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    ),
    base AS (
      SELECT sum(n_err) AS be, sum(n_total) AS bt FROM h
    )
    SELECT hour,
           CAST(n_err AS BIGINT) AS n_err,
           CAST(n_err * 1000000 // n_total AS BIGINT)
             AS share_1h_micro,
           CAST(err_6h AS BIGINT) AS err_6h,
           CAST(err_6h * 1000000 // tot_6h AS BIGINT)
             AS share_6h_micro
    FROM w, base
    WHERE n_err * bt * 2 > n_total * be * 3
      AND err_6h * bt * 2 > tot_6h * be * 3
    """,
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO BURN-RATE ALERT — the SRE multi-window pattern (Google SRE
    workbook ch. 5): page only when the error share exceeds 1.5× the
    corpus baseline in BOTH the fast window (1 h — catches it quickly)
    AND the slow window (6 h — proves it is sustained, suppressing
    blips). Every comparison is integer cross-multiplication
    (err·total_base·2 > total·err_base·3 ⇔ share > 1.5× baseline) —
    no float ratio ever materializes, so the alert set hash-verifies;
    the reported shares are integer micro-units.

    Scale: the corpus collapses to the hourly grid in one shuffle; the
    6-hour rolling sums and both alert predicates run over ~720
    rows/month. The baseline is a 1-row summary-over-summary cross
    join — summary×summary, the sanctioned BNLJ tier — kept lazy here
    (unlike the anomaly query's collected scalars) to exhibit BOTH
    sanctioned control-scalar forms. Per-service fan-out adds the
    service key to every partition list and nothing else."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    w = h.select(
        "hour",
        "n_total",
        "n_err",
        F.sum("n_err").over(w6).alias("err_6h"),
        F.sum("n_total").over(w6).alias("tot_6h"),
    )
    base = h.agg(
        F.sum("n_err").alias("be"), F.sum("n_total").alias("bt")
    )
    return (
        w.join(base)
        .where(
            (F.col("n_err") * F.col("bt") * 2
             > F.col("n_total") * F.col("be") * 3)
            & (F.col("err_6h") * F.col("bt") * 2
               > F.col("tot_6h") * F.col("be") * 3)
        )
        .select(
            "hour",
            F.col("n_err").cast("bigint").alias("n_err"),
            F.expr("n_err * 1000000 div n_total").alias("share_1h_micro"),
            F.col("err_6h").cast("bigint").alias("err_6h"),
            F.expr("err_6h * 1000000 div tot_6h").alias("share_6h_micro"),
        )
    )


@query(
    "agg_incremental_moments_merge",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN event_id % 10 < 8 THEN 'base' ELSE 'delta' END
               AS slice,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    parts AS (
      SELECT event_type, slice,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s1,
             CAST(sum(cents * cents) AS BIGINT) AS s2
      FROM c GROUP BY event_type, slice
    )
    SELECT event_type,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(s1) AS BIGINT) AS s1,
           CAST(sum(s2) AS BIGINT) AS s2,
           CAST((sum(n) * sum(s2) - sum(s1) * sum(s1))
             // (sum(n) * (sum(n) - 1)) AS BIGINT) AS var_c2
    FROM parts GROUP BY event_type
    """,
)
def agg_incremental_moments_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL STATS MERGE — the mergeability claim agg_exact_moments
    makes, exhibited as a verified computation: the corpus is split into
    a base slice and a delta slice (hash-deterministic 80/20), each
    reduces to its own sufficient statistics (n, Σc, Σc²), and the
    published statistics come ONLY from adding the two partial tuples —
    never from re-scanning the union. The oracle computes the same
    two-phase merge; both equal the direct full-corpus moments by the
    monoid law, and the variance derived from merged sums is exact
    integer arithmetic end-to-end.

    Scale: THIS is the nightly-stats pattern at 100 TB — yesterday's
    sufficient statistics are a tiny table; today's delta reduces
    map-side; the merge is per-group integer adds. Any statistic
    expressible as a monoid over per-row terms (moments, counts,
    min/max, sketches) gets incremental maintenance for free; medians
    and exact distincts do NOT — they need the sketch tier
    (agg_quantile_sketch / agg_hll_sketch_merge)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.when(F.col("event_id") % 10 < 8, "base")
        .otherwise("delta")
        .alias("slice"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    parts = c.groupBy("event_type", "slice").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents"))
        .cast("bigint")
        .alias("s2"),
    )
    return parts.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1").cast("bigint").alias("s1"),
        F.sum("s2").cast("bigint").alias("s2"),
        F.expr(
            "(sum(n) * sum(s2) - sum(s1) * sum(s1))"
            " div (sum(n) * (sum(n) - 1))"
        ).alias("var_c2"),
    )
