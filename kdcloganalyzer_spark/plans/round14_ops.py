"""Round-14 additions (VERDICT r13 item 7): the remaining
docstring-named scale swaps registered as first-class hash-verified
ids, each following the r13 twin discipline (exact columns keep the
hash gate honest; the sketch/approx machinery feeds either an envelope
flag or a fully-replayable deterministic result).

- ``analytics_pareto_concentration_approx`` — the approx_percentile
  decile-boundary form ``analytics_pareto_concentration``'s docstring
  names (plans/analytics.py): boundaries from a GK sketch instead of a
  global rank, validated against the exact ranks via an envelope flag.
- ``events_user_entropy_cms`` — the CMS/top-k head + tail-bucket form
  ``events_user_entropy``'s docstring names (plans/round12_ops.py):
  the md5-derived CMS (operators/cms.py) selects the head, so the
  whole construction — sketch, head, reduced histogram, entropy — is
  deterministic and replayed end-to-end by the DuckDB oracle.
- ``agg_weighted_median_sketch`` — the weighted-sketch ladder
  ``agg_weighted_median``'s docstring names (plans/relational.py):
  each value inserted into a percentile sketch with its weight as
  multiplicity; the sketch median's cumulative-weight position is
  envelope-checked against the exact lower weighted median.
- ``sessionize_stats_rollup_sketch`` — the KLL-quantile swap
  ``sessionize_stats_rollup``'s docstring names (plans/analytics.py):
  GK sketch points for the three quantile slots, rank-envelope-checked
  against the exact session distribution.

Reference lineage: the reference has no sketch tier — these extend the
§2.3 north-star families (SURVEY.md) with the suite's exact integer
conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kdcloganalyzer_spark.operators import cms
from kdcloganalyzer_spark.plans.registry import query
from kdcloganalyzer_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Pareto concentration curve, approx-percentile boundary form
# ---------------------------------------------------------------------------
@query(
    "analytics_pareto_concentration_approx",
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
             AS cum_share_micro,
           TRUE AS approx_in_envelope
    FROM (SELECT cum, total,
                 CAST(rk * 10 // n_cust AS BIGINT) AS decile
          FROM r WHERE rk * 10 % n_cust = 0 OR rk = n_cust) x
    GROUP BY decile
    """,
)
def analytics_pareto_concentration_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARETO CURVE, APPROX-BOUNDARY FORM — the billions-of-entities
    swap ``analytics_pareto_concentration``'s docstring names: decile
    boundaries from ``percentile_approx`` (Greenwald-Khanna, one
    mergeable partial-agg'd pass) instead of a global rank-over-summary
    window — at true scale the unpartitioned rank is the one
    non-mergeable node, and the GK sketch is how the same curve is
    read off without it. Twin discipline (ADVICE r13 wording): the
    curve columns reported here are the EXACT twin's, kept solely so
    the hash gate re-verifies the curve; the approx machinery feeds
    ``approx_in_envelope`` — TRUE iff every GK decile boundary b_d
    sits within max(3, 1% of n) customers of its exact rank target
    (count(spend >= b_d) >= t_d - tol AND count(spend > b_d) <=
    t_d + tol, t_d = d*n/10) — so a drifting sketch flips the flag and
    the driver hash catches it. Boundaries and rank counts are bounded
    control scalars (two 1-row collects), never a row-space join."""
    orders = load_table(spark, sf_dir, "orders")
    s = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("spend")
        )
        .localCheckpoint(eager=False)
    )
    qs = [round(1 - d / 10, 1) for d in range(1, 10)]  # 0.9 .. 0.1
    head = s.agg(
        F.percentile_approx("spend", qs, 10000).alias("bnd"),
        F.count("*").alias("n"),
    ).first()
    bnds, n = list(head["bnd"]), int(head["n"])
    tol = max(3, n // 100)
    ranks = s.agg(
        *[
            F.sum(
                F.when(F.col("spend") >= F.lit(int(b)), 1).otherwise(0)
            ).alias(f"ge{d}")
            for d, b in enumerate(bnds, start=1)
        ],
        *[
            F.sum(
                F.when(F.col("spend") > F.lit(int(b)), 1).otherwise(0)
            ).alias(f"gt{d}")
            for d, b in enumerate(bnds, start=1)
        ],
    ).first()
    in_env = all(
        ranks[f"ge{d}"] >= (d * n) // 10 - tol
        and ranks[f"gt{d}"] <= (d * n) // 10 + tol
        for d in range(1, 10)
    )
    w_rank = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    w_all = Window.partitionBy()
    r = s.select(
        "spend",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(w_all).alias("n_cust"),
        F.sum("spend").over(w_all).alias("total"),
        F.sum("spend")
        .over(
            w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
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
        # DECIMAL(38,0) widening (r15 sf1 rehearsal caught the BIGINT
        # overflow at 10x data; DuckDB side is HUGEINT already)
        F.expr(
            "CAST(max(cum) AS DECIMAL(38,0)) * 1000000"
            " div CAST(max(total) AS DECIMAL(38,0))"
        ).alias("cum_share_micro"),
        F.lit(bool(in_env)).alias("approx_in_envelope"),
    )


# ---------------------------------------------------------------------------
# Per-user entropy, CMS-head + tail-bucket form
# ---------------------------------------------------------------------------
_ENTROPY_HEAD_K = 3


def _entropy_cms_oracle(k: int = _ENTROPY_HEAD_K) -> str:
    return f"""
    WITH h AS (
      SELECT event_type, CAST(r AS INT) AS r,
             {cms.cms_bucket_sql("event_type", "r")} AS bucket
      FROM events, UNNEST(range(0, {cms.CMS_D})) AS t(r)
    ),
    sk AS (SELECT r, bucket, count(*) AS c FROM h GROUP BY ALL),
    kb AS (
      SELECT event_type, CAST(r AS INT) AS r,
             {cms.cms_bucket_sql("event_type", "r")} AS bucket
      FROM (SELECT DISTINCT event_type FROM events),
           UNNEST(range(0, {cms.CMS_D})) AS t(r)
    ),
    est AS (SELECT event_type, min(c) AS cms_est
            FROM kb JOIN sk USING (r, bucket) GROUP BY 1),
    head AS (SELECT event_type FROM est
             ORDER BY cms_est DESC, event_type LIMIT {k}),
    red AS (
      SELECT user_id,
             CASE WHEN event_type IN (SELECT event_type FROM head)
                  THEN event_type ELSE '__tail__' END AS bucket_type
      FROM events
    ),
    c AS (
      SELECT user_id, bucket_type, count(*) AS c
      FROM red GROUP BY 1, 2
    ),
    d AS (
      SELECT user_id, c,
             sum(c) OVER (PARTITION BY user_id) AS n
      FROM c
    ),
    l AS (
      SELECT user_id, c, n,
             CAST(round(ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT)
               AS lnm
      FROM d
    )
    SELECT user_id,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST((-sum(c * lnm)) // sum(c) AS BIGINT) AS h_head_micro
    FROM l GROUP BY user_id
    """


@query("events_user_entropy_cms", oracle=_entropy_cms_oracle())
def events_user_entropy_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-USER ENTROPY, CMS-HEAD FORM — the unbounded-type-domain swap
    ``events_user_entropy``'s docstring names: at 100 TB the exact
    per-(user, type) count vector is unbounded state, so the histogram
    is reduced to a HEAD of globally-heavy types plus one tail bucket —
    per-user state becomes K+1 counters regardless of domain size. The
    head comes from the md5-derived count-min sketch (operators/
    cms.py: one posexplode pass builds the 4x256 cell table map-side;
    point queries broadcast it) — top-K=3 by (estimate DESC, type ASC),
    which is deterministic and ENGINE-NEUTRAL, so unlike the HLL twins
    no envelope flag is needed: the DuckDB oracle replays sketch, head
    selection, reduced histogram, and micro-nat entropy end-to-end and
    the hash verifies the whole construction. Entropy follows the
    exact twin's idiom: each ln(c/n) rounded ONCE to integer
    micro-nats, c-weighted integer sums, positive//positive div. The
    head list is a bounded control collect (<= K+heap candidates; at
    scale the candidate set comes from the same CMS+heap pass)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    cells = cms.cms_cells(ev.select("event_type"))
    kb = cms.cms_pairs(ev.select("event_type").distinct())
    est = (
        kb.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("event_type")
        .agg(F.min("c").alias("cms_est"))
    )
    head = [
        r["event_type"]
        for r in est.orderBy(
            F.desc("cms_est"), F.asc("event_type")
        ).limit(_ENTROPY_HEAD_K).collect()
    ]
    red = ev.select(
        "user_id",
        F.when(
            F.col("event_type").isin(head), F.col("event_type")
        )
        .otherwise(F.lit("__tail__"))
        .alias("bucket_type"),
    )
    c = red.groupBy("user_id", "bucket_type").agg(
        F.count("*").alias("c")
    )
    d = c.withColumn(
        "n", F.sum("c").over(Window.partitionBy("user_id"))
    )
    lnm = F.expr(
        "CAST(round(ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT)"
    )
    return (
        d.select("user_id", "c", lnm.alias("lnm"))
        .groupBy("user_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.count("*").cast("bigint").alias("n_buckets"),
            F.expr("CAST((-sum(c * lnm)) div sum(c) AS BIGINT)").alias(
                "h_head_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Weighted median, percentile-sketch form
# ---------------------------------------------------------------------------
@query(
    "agg_weighted_median_sketch",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT flag, cents, w,
             sum(w) OVER (PARTITION BY flag
                          ORDER BY cents, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY flag) AS total
      FROM x
    )
    SELECT flag,
           CAST(min(cents) AS BIGINT) AS weighted_median_cents,
           CAST(max(total) AS BIGINT) AS total_weight,
           TRUE AS sketch_in_envelope
    FROM cum
    WHERE 2 * cw >= total
    GROUP BY flag
    """,
)
def agg_weighted_median_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WEIGHTED MEDIAN, SKETCH FORM — a natively WEIGHTED mergeable
    quantile sketch: log-bucket (DDSketch-style) cells
    ``floor(ln(cents) / ln(1.01))`` with ``sum(w)`` per cell, so the
    quantity weight enters the sketch as an ADDEND, never as row
    multiplicity. One whole-stage-codegen hash aggregate over the
    scan; cell count is bounded by the VALUE RANGE (≤ ~1.4k cells per
    flag for any cents domain under 10^6, independent of row count),
    the per-cell sums are map-side combinable and the sketch merges by
    cell-wise addition — the 100 TB shape. The r14 form of this id fed
    an unweighted GK sketch via ``explode(sequence(1, w))``; the r15
    profile (VERDICT r14 item 1) measured that 25x multiplicity
    expansion at 5.5 s of the id's 6.5 s — and GK accuracy was NOT the
    cost (accuracy 200 still 5.1 s; it is 15M rows through an
    ObjectHashAggregate) — so the generic explode-multiplicity ladder
    is documented here as the anti-pattern the weighted sketch exists
    to avoid. The sketch's q=0.5 point is the upper bound of the first
    cell where cumulative weight crosses half the total (cumulated
    over the ≤1.4k collected cells driver-side — a bounded control
    table, same discipline as the split-point collects). Twin
    discipline: the reported median/total are EXACT (hash gate
    re-verifies them), computed TWO-PHASE from the same cells: the
    cell sums locate the crossing cell and its exact below-weight, so
    the exact pass is a codegen filter to the ~2 relevant cells per
    flag (~1/500 of the rows) plus a window over that narrow set with
    the below-weight as a literal offset — replacing r14's per-flag
    GLOBAL sort (a |flags|-partition window over every row: 2.5 s of
    the old 6.5 s here, and the unscalable part of the plan — |flags|
    tasks no matter the cluster). The sketch feeds
    ``sketch_in_envelope`` — TRUE iff the sketch point's
    cumulative-weight position lies in [45%, 55%] of the group's total
    weight (20*cw_le >= 9*total and 20*cw_lt <= 11*total,
    integer-exact; gamma=1.01 gives ≤1% value error, comfortably
    inside the band); its rank-counts fuse into the narrow pass as
    conditional sums (cells <= crossing carry cents < b by
    construction, cells > crossing+1 carry cents > b, so only
    crossing+1 rows are compared to b row-level). Zero full-data
    shuffles or sorts remain: one mergeable cell aggregate + one
    narrow refinement."""
    import math

    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    gamma = 1.01
    lg = math.log(gamma)
    xc = x.withColumn(
        "cell",
        F.floor(F.log(F.col("cents").cast("double")) / F.lit(lg)).cast(
            "bigint"
        ),
    )
    cells = (
        xc.groupBy("flag", "cell").agg(F.sum("w").alias("cw")).collect()
    )
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for r in cells:
        by_flag.setdefault(r["flag"], []).append((r["cell"], r["cw"]))
    # Per-flag control scalars from the exact cell sums: the crossing
    # cell (where cumulative weight first reaches half the total), the
    # exact weight below it, the sketch point b (crossing cell's upper
    # bound), and the exact weight at-or-below the crossing cell (the
    # envelope base — every row in cells <= crossing has cents < b,
    # every row in cells > crossing+1 has cents > b, so only the
    # crossing+1 cell needs row-level inspection against b).
    ctl: dict[str, tuple[int, int, int, int, int]] = {}
    for fl, cs in by_flag.items():
        cs.sort()
        total = sum(cw for _, cw in cs)
        acc = 0
        for cell, cw in cs:
            if 2 * (acc + cw) >= total:
                b = int(math.ceil(gamma ** (cell + 1)))
                ctl[fl] = (cell, acc, total, b, acc + cw)
                break
            acc += cw

    def _case(idx: int, dtype: str = "bigint"):
        c = F.lit(None).cast(dtype)
        for fl, vals in ctl.items():
            c = F.when(F.col("flag") == F.lit(fl), F.lit(vals[idx])).otherwise(
                c
            )
        return c

    cross_case, below_case, total_case, b_case, le_below_case = (
        _case(0),
        _case(1),
        _case(2),
        _case(3),
        _case(4),
    )
    narrow = xc.where(
        (F.col("cell") == cross_case) | (F.col("cell") == cross_case + 1)
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = narrow.select(
        "flag",
        "cents",
        "cell",
        "w",
        cross_case.alias("cross"),
        total_case.alias("total"),
        b_case.alias("b"),
        le_below_case.alias("le_below"),
        (
            below_case
            + F.sum(F.when(F.col("cell") == cross_case, F.col("w")).otherwise(0)).over(
                wcum
            )
        ).alias("cw"),
    )
    return cum.groupBy("flag").agg(
        F.min(
            F.when(
                (F.col("cell") == F.col("cross"))
                & (2 * F.col("cw") >= F.col("total")),
                F.col("cents"),
            )
        )
        .cast("bigint")
        .alias("weighted_median_cents"),
        F.max("total").cast("bigint").alias("total_weight"),
        (
            (
                20
                * (
                    F.max("le_below")
                    + F.sum(
                        F.when(
                            (F.col("cell") == F.col("cross") + 1)
                            & (F.col("cents") <= F.col("b")),
                            F.col("w"),
                        ).otherwise(0)
                    )
                )
                >= 9 * F.max("total")
            )
            & (
                20
                * (
                    F.max("le_below")
                    + F.sum(
                        F.when(
                            (F.col("cell") == F.col("cross") + 1)
                            & (F.col("cents") < F.col("b")),
                            F.col("w"),
                        ).otherwise(0)
                    )
                )
                <= 11 * F.max("total")
            )
        ).alias("sketch_in_envelope"),
    )


# ---------------------------------------------------------------------------
# Session stats rollup, percentile-sketch form
# ---------------------------------------------------------------------------
def _sess_rollup_sketch_oracle() -> str:
    from kdcloganalyzer_spark.plans.analytics import _GAP_MIN

    return f"""
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
           CAST(count(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces,
           TRUE AS sketch_in_envelope
    FROM sess
    """


@query("sessionize_stats_rollup_sketch", oracle=_sess_rollup_sketch_oracle())
def sessionize_stats_rollup_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SESSION STATS ROLLUP, KLL/SKETCH FORM — the quantile swap
    ``sessionize_stats_rollup``'s docstring names (plans/analytics.py):
    exact percentile() holds every session's value per group, so at
    100 TB the three quantile slots swap to a mergeable percentile
    sketch (``percentile_approx``, GK — one partial-agg'd pass, fixed
    sketch state per partition) while count/sum/max/bounces are
    already partial-agg'd. Twin discipline: the reported columns are
    the EXACT twin's (hash gate re-verifies the whole rollup);
    the sketch feeds ``sketch_in_envelope`` — TRUE iff each sketch
    quantile v_q lands within max(3, 1% of n) session-ranks of its
    target (count(x <= v_q) >= floor(q*n) - tol AND count(x < v_q) <=
    ceil(q*n) + tol, for q in {0.5 dur, 0.9 dur, 0.5 events}).
    Sketch points and rank counts are bounded control scalars (two
    1-row collects on the session summary)."""
    from kdcloganalyzer_spark.plans.analytics import _GAP_MIN

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
    sess = (
        s.groupBy("user_id", "sess_id")
        .agg(
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dur_us"),
            F.count("*").alias("n_events"),
        )
        .localCheckpoint(eager=False)
    )
    a = sess.agg(
        F.percentile_approx("dur_us", [0.5, 0.9], 2000).alias("dq"),
        F.percentile_approx("n_events", 0.5, 2000).alias("e50"),
        F.count("*").alias("n"),
    ).first()
    d50, d90 = int(a["dq"][0]), int(a["dq"][1])
    e50, n = int(a["e50"]), int(a["n"])
    tol = max(3, n // 100)
    checks = [("d50", "dur_us", d50, n // 2), ("d90", "dur_us", d90, (9 * n) // 10),
              ("e50", "n_events", e50, n // 2)]
    r = sess.agg(
        *[
            F.sum(
                F.when(F.col(col) <= F.lit(v), 1).otherwise(0)
            ).alias(f"le_{tag}")
            for tag, col, v, _ in checks
        ],
        *[
            F.sum(
                F.when(F.col(col) < F.lit(v), 1).otherwise(0)
            ).alias(f"lt_{tag}")
            for tag, col, v, _ in checks
        ],
    ).first()
    in_env = all(
        r[f"le_{tag}"] >= target - tol and r[f"lt_{tag}"] <= target + tol
        for tag, _, _, target in checks
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
        F.lit(bool(in_env)).alias("sketch_in_envelope"),
    )
