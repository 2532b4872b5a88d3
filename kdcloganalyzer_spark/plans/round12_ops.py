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


# ---------------------------------------------------------------------------
# URL function surface (parse_url / url_decode)
# ---------------------------------------------------------------------------

#: Deterministic per-doc URL with every component populated (synthesized
#: from doc_id exactly like dedup_url_canonical's variants — the driver
#: tables carry no URL column). Both engines build the SAME string, so
#: the oracle can re-extract components with regexp and certify Spark's
#: parse_url semantics against an independent implementation.
_URL_EXPR = (
    "concat('https://Host', CAST(doc_id % 20 AS STRING), "
    "'.Example.COM:8443/path/', CAST(doc_id AS STRING), '/page?id=', "
    "CAST(doc_id AS STRING), '&q=a%20b', CAST(doc_id AS STRING), "
    "'&utm_source=news#frag', CAST(doc_id % 5 AS STRING))"
)


@query(
    "fn_url_suite",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             'https://Host' || CAST(doc_id % 20 AS VARCHAR)
             || '.Example.COM:8443/path/' || CAST(doc_id AS VARCHAR)
             || '/page?id=' || CAST(doc_id AS VARCHAR)
             || '&q=a%20b' || CAST(doc_id AS VARCHAR)
             || '&utm_source=news#frag' || CAST(doc_id % 5 AS VARCHAR)
               AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS authority,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS ref,
           regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_raw,
           replace(regexp_extract(url, '[?&]q=([^&#]*)', 1),
                   '%20', ' ') AS q_decoded
    FROM u
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL FUNCTION SURFACE — the component extraction every
    crawl/clickstream pipeline runs before host-level rollups and URL
    canonicalization: ``parse_url`` (PROTOCOL / HOST / AUTHORITY / PATH
    / QUERY / REF and keyed QUERY parameter — the Hive-compatible
    surface Spark implements on java.net.URI) plus ``url_decode`` on
    the extracted parameter. The oracle re-derives every component with
    regexp over the SAME synthesized string (and the %20 decode as a
    literal replace — the only escape present by construction), so the
    hash certifies Spark's parser against an independent extraction,
    not itself.

    Scale: pure per-row codegen projections at the scan — zero
    shuffles, zero UDFs (parse_url is a JVM expression); at 100 TB the
    only cost is the scan itself, and host/path become the partition
    keys for everything downstream (dedup_url_canonical is the next
    tier of this ladder)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    u = docs.select("doc_id", F.expr(_URL_EXPR).alias("url"))
    qp = F.parse_url("url", F.lit("QUERY"), F.lit("q"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("AUTHORITY")).alias("authority"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("REF")).alias("ref"),
        qp.alias("q_raw"),
        F.url_decode(qp).alias("q_decoded"),
    )


# ---------------------------------------------------------------------------
# Per-user behavioral entropy (micro-nat integer idiom)
# ---------------------------------------------------------------------------


@query(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
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
           CAST(count(*) AS BIGINT) AS n_types,
           CAST((-sum(c * lnm)) // sum(c) AS BIGINT) AS h_micro
    FROM l GROUP BY user_id
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-USER BEHAVIORAL ENTROPY — Shannon entropy of each user's
    event-type distribution in integer MICRO-NATS (H = −Σ p·ln p): the
    behavioral-diversity feature that separates single-action bots
    (H=0) from organic multi-surface users, and the same measure
    curation pipelines run over source/format distributions. Exactness
    follows quality_bigram_lm's idiom: each per-term ln(c/n) is rounded
    ONCE to integer micro-nats (the single correctly-rounded division
    feeding ln makes the input identical across engines), then
    c-weighted integer sums and one integer div — no double ever sums,
    so the hash is order-free. Both divs are positive//positive, where
    DuckDB's floor-div and Spark's trunc-div agree.

    Scale: one partial-agg'd (user, type) shuffle collapses the corpus
    to ≤ |users|·|types| rows; the window and final rollup run on that
    summary sharing the user partitioning. At unbounded type domains
    the exact count vector swaps for a CMS/top-k head plus a tail
    bucket — entropy needs only the histogram, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
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
            F.count("*").cast("bigint").alias("n_types"),
            F.expr("CAST((-sum(c * lnm)) div sum(c) AS BIGINT)").alias(
                "h_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Net revenue retention (month-over-month cohort ledger)
# ---------------------------------------------------------------------------


@query(
    "analytics_customer_nrr",
    oracle="""
    WITH cm AS (
      SELECT o_custkey AS cust,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    ),
    pairs AS (
      SELECT p.m AS prev_m, p.cust, p.rev_cents AS prev_cents,
             coalesce(c.rev_cents, 0) AS cur_cents
      FROM cm p LEFT JOIN cm c
        ON c.cust = p.cust
       AND c.m = CAST(p.m + INTERVAL 1 MONTH AS DATE)
    )
    SELECT CAST(prev_m + INTERVAL 1 MONTH AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_base_customers,
           CAST(sum(prev_cents) AS BIGINT) AS base_cents,
           CAST(sum(cur_cents) AS BIGINT) AS retained_cents,
           CAST(sum(CASE WHEN cur_cents = 0 THEN prev_cents ELSE 0 END)
                AS BIGINT) AS churned_cents,
           CAST(sum(CASE WHEN cur_cents > prev_cents
                         THEN cur_cents - prev_cents ELSE 0 END)
                AS BIGINT) AS expansion_cents,
           CAST((sum(cur_cents) * 1000000) // sum(prev_cents)
                AS BIGINT) AS nrr_micro
    FROM pairs GROUP BY 1
    """,
)
def analytics_customer_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET REVENUE RETENTION — the SaaS-board metric generalized to any
    repeat-purchase ledger: for each month, the cohort is every
    customer with revenue in the PRIOR month; NRR = cohort's current
    revenue / cohort's prior revenue, decomposed into retained /
    churned / expansion cents. All money stays exact integer cents
    (_cents idiom); the ratio is one scaled-integer div
    (positive//positive, so DuckDB floor-div ≡ Spark trunc-div).

    Scale: the corpus collapses to one row per (customer, month) in a
    single partial-agg'd shuffle; the cohort pairing is a co-partitioned
    self-join on the customer key (the month residual rides along), and
    the final rollup is calendar-bounded. At 100 TB the (cust, month)
    summary IS the working set — raw orders never join."""
    o = load_table(spark, sf_dir, "orders")
    from kdcloganalyzer_spark.plans.relational import _cents

    cm = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.trunc("o_orderdate", "month").alias("m"),
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_cents"))
    p = cm.select(
        F.col("cust"),
        F.col("m").alias("prev_m"),
        F.col("rev_cents").alias("prev_cents"),
    )
    c = cm.select(
        F.col("cust"),
        F.col("m").alias("cur_m"),
        F.col("rev_cents").alias("cur_cents_raw"),
    )
    pairs = p.join(
        c,
        (p["cust"] == c["cust"])
        & (c["cur_m"] == F.add_months(p["prev_m"], 1)),
        "left",
    ).select(
        "prev_m",
        "prev_cents",
        F.coalesce("cur_cents_raw", F.lit(0)).alias("cur_cents"),
    )
    return pairs.groupBy(
        F.add_months("prev_m", 1).alias("month")
    ).agg(
        F.count("*").cast("bigint").alias("n_base_customers"),
        F.sum("prev_cents").cast("bigint").alias("base_cents"),
        F.sum("cur_cents").cast("bigint").alias("retained_cents"),
        F.sum(
            F.when(F.col("cur_cents") == 0, F.col("prev_cents")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("churned_cents"),
        F.sum(
            F.when(
                F.col("cur_cents") > F.col("prev_cents"),
                F.col("cur_cents") - F.col("prev_cents"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("expansion_cents"),
        F.expr(
            "CAST((sum(cur_cents) * 1000000) div sum(prev_cents)"
            " AS BIGINT)"
        ).alias("nrr_micro"),
    )


# ---------------------------------------------------------------------------
# ABC × XYZ inventory classification matrix
# ---------------------------------------------------------------------------


@query(
    "analytics_abc_classification",
    oracle="""
    WITH pr AS (
      SELECT l_partkey AS part,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY 1
    ),
    abc AS (
      SELECT part, rev_e4,
             sum(rev_e4) OVER (ORDER BY rev_e4 DESC, part) AS cum,
             sum(rev_e4) OVER () AS total
      FROM pr
    ),
    xyz AS (
      SELECT part,
             count(*) AS n_m,
             sum(q) AS s,
             sum(q * q) AS qq
      FROM (
        SELECT l_partkey AS part,
               date_trunc('month', l_shipdate) AS m,
               sum(CAST(round(l_quantity) AS BIGINT)) AS q
        FROM lineitem GROUP BY 1, 2
      ) GROUP BY part
    )
    SELECT cls_abc, cls_xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_e4) AS BIGINT) AS rev_e4
    FROM (
      SELECT a.part, a.rev_e4,
             CASE WHEN a.cum * 100 <= a.total * 80 THEN 'A'
                  WHEN a.cum * 100 <= a.total * 95 THEN 'B'
                  ELSE 'C' END AS cls_abc,
             CASE WHEN 4 * (x.n_m * x.qq - x.s * x.s) <= x.s * x.s
                    THEN 'X'
                  WHEN x.n_m * x.qq - x.s * x.s <= x.s * x.s THEN 'Y'
                  ELSE 'Z' END AS cls_xyz
      FROM abc a JOIN xyz x ON x.part = a.part
    ) GROUP BY 1, 2
    """,
)
def analytics_abc_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC × XYZ CLASSIFICATION MATRIX — the inventory-policy grid
    supply-chain teams run quarterly: parts classed by cumulative
    revenue share (A ≤ 80%, B ≤ 95%, C rest — the Pareto cut, exact
    integer cross-multiplication `cum·100 ≤ total·k`, never a float
    share) × demand variability over monthly quantities (X/Y/Z at
    CV ≤ 0.5 / ≤ 1.0, via the cross-multiplied integer identity
    CV² = (n·Σq² − S²)/S² so `4·(nQ−S²) ≤ S²` decides X with zero
    divisions). The 3×3 rollup reports part counts and revenue mass
    per class. Quantities are integer-valued doubles in the data
    (round-cast is lossless); revenue uses the repo's _rev_e4 idiom.

    Scale: two partial-agg'd collapses of lineitem (per-part revenue;
    per-(part, month) quantity) — both map-side-combined on the same
    part key; the ranking window runs over the PART summary (|parts|,
    not |lineitem|), and the variability stats reduce per part before
    the join. The global ORDER BY window is the only total sort, over
    ~N/30 summary rows; at 100 TB swap it for the two-pass histogram
    cut (analytics_pareto_concentration's documented refinement)."""
    li = load_table(spark, sf_dir, "lineitem")
    from kdcloganalyzer_spark.plans.relational import _rev_e4

    pr = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(_rev_e4()).cast("bigint").alias("rev_e4")
    )
    w_cum = Window.orderBy(F.desc("rev_e4"), F.asc("part")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    abc = pr.select(
        "part",
        "rev_e4",
        F.sum("rev_e4").over(w_cum).alias("cum"),
        F.sum("rev_e4").over(Window.partitionBy()).alias("total"),
    )
    qm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum(F.round("l_quantity").cast("bigint")).alias("q"))
    xyz = qm.groupBy("part").agg(
        F.count("*").alias("n_m"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
    )
    cls = abc.join(xyz, "part").select(
        "rev_e4",
        F.when(
            F.col("cum") * 100 <= F.col("total") * 80, F.lit("A")
        )
        .when(F.col("cum") * 100 <= F.col("total") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("cls_abc"),
        F.when(
            4 * (F.col("n_m") * F.col("qq") - F.col("s") * F.col("s"))
            <= F.col("s") * F.col("s"),
            F.lit("X"),
        )
        .when(
            F.col("n_m") * F.col("qq") - F.col("s") * F.col("s")
            <= F.col("s") * F.col("s"),
            F.lit("Y"),
        )
        .otherwise(F.lit("Z"))
        .alias("cls_xyz"),
    )
    return cls.groupBy("cls_abc", "cls_xyz").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("rev_e4").cast("bigint").alias("rev_e4"),
    )
