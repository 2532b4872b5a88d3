"""Round-12 additions: the two named-but-unregistered 100 TB swap twins
(VERDICT r11 item 2) and further coverage widening.

Like every plans module: each operator is a ``@query`` registration with
a DuckDB oracle twin; money/measure aggregates accumulate EXACT INTEGER
units so hashes are summation-order-free (CLAUDE.md convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kdcloganalyzer_spark import appcache
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
    # r15: one (user, day) distinct collapse feeds BOTH the day-grain
    # branch and the exact-MAU envelope branch (HLL updates are
    # idempotent — sketching the deduped table builds the identical
    # sketch), instead of two corpus scans with separate distincts.
    ud = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    day = ud.groupBy("day").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk"),
        F.count("*").alias("dau"),
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
    mu = (
        ud.select(
            F.date_trunc("month", "day").cast("date").alias("month"),
            "user_id",
        )
        .distinct()
        .groupBy("month")
        .agg(F.count("*").alias("mau"))
    )
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

    Scale (r15): the corpus collapses to one row per (customer, month)
    in a single partial-agg'd shuffle; the cohort pairing is a LEAD
    window per customer — (cust, m) is unique, so "the row at
    m + 1 month, else 0" is exactly lead(m)/lead(rev) guarded by the
    consecutive-month test, and the old co-partitioned self-join (which
    executed the cm aggregate twice — structurally different sides
    never ReusedExchange) disappears. The final rollup is
    calendar-bounded. At 100 TB the (cust, month) summary IS the
    working set — raw orders never join."""
    o = load_table(spark, sf_dir, "orders")
    from kdcloganalyzer_spark.plans.relational import _cents

    cm = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.trunc("o_orderdate", "month").alias("m"),
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_cents"))
    w_cust = Window.partitionBy("cust").orderBy("m")
    pairs = cm.select(
        F.col("m").alias("prev_m"),
        F.col("rev_cents").alias("prev_cents"),
        F.when(
            F.lead("m").over(w_cust) == F.add_months(F.col("m"), 1),
            F.lead("rev_cents").over(w_cust),
        )
        .otherwise(F.lit(0))
        .alias("cur_cents"),
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
        # DECIMAL(38,0) widening (r16 sf3 overflow sweep): a cohort
        # month's revenue-cents sum reaches ~8e11 at sf3 — ×1e6 is
        # within 12× of BIGINT overflow and crosses it by ~sf35. Same
        # value at every driver SF (div truncation is identical through
        # DECIMAL — tests/test_overflow_widening.py).
        F.expr(
            "CAST(CAST(sum(cur_cents) AS DECIMAL(38,0)) * 1000000"
            " div sum(prev_cents) AS BIGINT)"
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

    Scale (r15): ONE collapse of lineitem at (part, month) grain
    computes revenue AND monthly quantity together (per-part revenue is
    the exact-integer sum of its monthly sums, so the fusion is
    hash-identical), then a per-part rollup yields every classification
    input in one row — the oracle's abc ⋈ xyz join disappears and
    lineitem is scanned once instead of twice. The ranking window runs
    over the PART summary (|parts|, not |lineitem|). The global ORDER
    BY window is the only total sort, over ~N/30 summary rows; at
    100 TB swap it for the two-pass histogram cut
    (analytics_pareto_concentration's documented refinement)."""
    li = load_table(spark, sf_dir, "lineitem")
    from kdcloganalyzer_spark.plans.relational import _rev_e4

    pm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(
        F.sum(_rev_e4()).cast("bigint").alias("rev_m"),
        F.sum(F.round("l_quantity").cast("bigint")).alias("q"),
    )
    per_part = pm.groupBy("part").agg(
        F.sum("rev_m").cast("bigint").alias("rev_e4"),
        F.count("*").alias("n_m"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("qq"),
    )
    w_cum = Window.orderBy(F.desc("rev_e4"), F.asc("part")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cls = per_part.select(
        "part",
        "rev_e4",
        "n_m",
        "s",
        "qq",
        F.sum("rev_e4").over(w_cum).alias("cum"),
        F.sum("rev_e4").over(Window.partitionBy()).alias("total"),
    ).select(
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


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling (optimal allocation)
# ---------------------------------------------------------------------------

_NEYMAN_K = 120  # total sample budget across strata


@query(
    "sample_stratified_neyman",
    oracle=f"""
    WITH st AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS qq
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs,
             CAST(round(sqrt(CAST(n_docs * qq - s * s AS DOUBLE))
                        * 1000) AS BIGINT) AS w_milli
      FROM st
    ),
    alloc AS (
      SELECT source, n_docs, w_milli,
             CAST(({_NEYMAN_K} * w_milli)
                  // sum(w_milli) OVER () AS BIGINT) AS base,
             ({_NEYMAN_K} * w_milli) % sum(w_milli) OVER () AS rem,
             sum(w_milli) OVER () AS tot
      FROM w
    ),
    final AS (
      SELECT source, n_docs, w_milli,
             CAST(base + CASE WHEN row_number() OVER (
                    ORDER BY rem DESC, source)
                  <= {_NEYMAN_K} - sum(base) OVER ()
                  THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
      FROM alloc
    ),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
      FROM documents d
    ),
    sel AS (
      SELECT r.source,
             CAST(count(*) AS BIGINT) AS n_selected,
             CAST(bit_xor(('0x' || substr(
               md5(CAST(r.doc_id AS VARCHAR)), 1, 15))::BIGINT)
               AS BIGINT) AS sel_xor
      FROM ranked r JOIN final f ON f.source = r.source
      WHERE r.rn <= f.n_alloc
      GROUP BY r.source
    )
    SELECT f.source, f.n_docs, f.w_milli, f.n_alloc,
           coalesce(s.n_selected, 0) AS n_selected,
           coalesce(s.sel_xor, 0) AS sel_xor
    FROM final f LEFT JOIN sel s ON s.source = f.source
    """,
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-ALLOCATION STRATIFIED SAMPLING — the statistically optimal
    stratified design (allocation ∝ N_h·σ_h minimizes estimator
    variance for a fixed budget), the principled upgrade over
    proportional sample_stratified for corpus QA sampling where strata
    differ wildly in spread. Everything is exact integers: the Neyman
    weight N_h·σ_h equals sqrt(N_h·Σy² − S²) — ONE correctly-rounded
    sqrt of an exact integer, emitted in milli-units — allocation is
    largest-remainder apportionment on integer products (floor base +
    ranked remainders, ties by stratum key), and the selected set is
    the per-stratum md5-rank prefix, reported as the order-free
    bit_xor of 60-bit id hashes (the shard-manifest checksum idiom).

    Scale: the stats pass is one partial-agg'd groupBy(source); the
    apportionment runs on the |strata|-row summary (window over one
    partition of ~5 rows); selection reuses one (source)-partitioned
    md5 rank window — the same single shuffle. At 100 TB the md5-rank
    prefix swaps for the two-phase threshold protocol
    (pipeline_quota_sampler_twophase) so no stratum needs a full sort.
    Both integer divisions are positive//positive (floor ≡ trunc)."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("bigint")
        .alias("qq"),
    )
    w = st.select(
        "source",
        "n_docs",
        F.expr(
            "CAST(round(sqrt(CAST(n_docs * qq - s * s AS DOUBLE))"
            " * 1000) AS BIGINT)"
        ).alias("w_milli"),
    )
    k = _NEYMAN_K
    wa = Window.partitionBy()
    alloc = w.select(
        "source",
        "n_docs",
        "w_milli",
        F.expr(f"{k} * w_milli").alias("kw"),
        F.sum("w_milli").over(wa).alias("tot"),
    ).select(
        "source",
        "n_docs",
        "w_milli",
        F.expr("CAST(kw div tot AS BIGINT)").alias("base"),
        F.expr("kw % tot").alias("rem"),
    )
    final = alloc.select(
        "source",
        "n_docs",
        "w_milli",
        (
            F.col("base")
            + F.when(
                F.row_number().over(
                    Window.orderBy(F.desc("rem"), F.asc("source"))
                )
                <= F.lit(k) - F.sum("base").over(wa),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_alloc"),
    )
    # r15: the ≤|strata|-row allocation table feeds BOTH the selection
    # broadcast and the final left join — without materialization the
    # stats pass (a corpus scan) re-executed once per consumer.
    final = final.localCheckpoint()
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rn"),
    )
    sel = (
        ranked.join(F.broadcast(final.select("source", "n_alloc")), "source")
        .where(F.col("rn") <= F.col("n_alloc"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_selected"),
            F.expr(
                "CAST(bit_xor(CAST(conv(substring("
                "md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
                " AS BIGINT)) AS BIGINT)"
            ).alias("sel_xor"),
        )
    )
    # Checkpointed `final` carries no AQE stats — hint the (≤|strata|
    # rows) selection summary broadcast explicitly.
    return final.join(F.broadcast(sel), "source", "left").select(
        "source",
        "n_docs",
        "w_milli",
        "n_alloc",
        F.coalesce("n_selected", F.lit(0)).cast("bigint").alias(
            "n_selected"
        ),
        F.coalesce("sel_xor", F.lit(0)).cast("bigint").alias("sel_xor"),
    )


# ---------------------------------------------------------------------------
# k-center coreset selection (Gonzalez farthest-point, with ids + radii)
# ---------------------------------------------------------------------------


def _coreset_oracle(k: int = 16) -> str:
    dist = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " s -> (s[1] - s[2]) * (s[1] - s[2])))"
    )
    steps = [
        """
    s0 AS MATERIALIZED (
      SELECT vec_id, v FROM e
      QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) = 1
    ),
    d0 AS MATERIALIZED (
      SELECT e.vec_id, e.v, {d} AS dmin FROM e CROSS JOIN s0 s
    )""".format(d=dist.format(a="e.v", b="s.v"))
    ]
    for i in range(1, k):
        steps.append(
            """
    s{i} AS MATERIALIZED (
      SELECT vec_id, v, dmin FROM d{p}
      QUALIFY row_number() OVER (ORDER BY dmin DESC, vec_id) = 1
    ),
    d{i} AS MATERIALIZED (
      SELECT d.vec_id, d.v, least(d.dmin, {d}) AS dmin
      FROM d{p} d CROSS JOIN s{i} s
    )""".format(i=i, p=i - 1, d=dist.format(a="d.v", b="s.v"))
        )
    sel_union = " UNION ALL ".join(
        ["SELECT 0 AS step, vec_id, 0.0 AS d2 FROM s0"]
        + [
            f"SELECT {i} AS step, vec_id, dmin AS d2 FROM s{i}"
            for i in range(1, k)
        ]
    )
    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),{",".join(steps)},
    cover AS (SELECT max(dmin) AS c FROM d{k - 1})
    SELECT CAST(step AS INT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
           round(d2, 6) AS d2_sel_r6, round(cover.c, 6) AS cover_d2_r6
    FROM ({sel_union}) CROSS JOIN cover
    """


#: Per-(appId, sf) coreset result (16 control rows) — the traversal is
#: 16 TakeOrdered passes; like the IVF build it runs once per session.
_CORESET_CACHE: dict = {}
appcache.register_evictor(
    lambda qid: qid == "sample_coreset_kcenter",
    appcache.dict_cache_evictor(_CORESET_CACHE),
)


@query("sample_coreset_kcenter", oracle=_coreset_oracle())
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CENTER CORESET SELECTION — Gonzalez (1985) farthest-point
    traversal exposed as a data-pruning operator: the 16 selected
    vectors are a 2-approximation to the k-center problem, the standard
    coreset for 'train on a geometry-covering subset' curation (and
    exactly the seeding the IVF quantizer uses — this id reports WHAT
    that traversal selects: selection order, each center's distance to
    the prior coreset at selection, and the final coverage radius
    max_i min_c d²(i, c), the k-center objective value).

    Engine-neutrality is inherited from the IVF oracle machinery: seed
    by (md5(vec_id), vec_id) rank, each step maximizes the least()-
    chained running min squared distance (ties to smallest vec_id), all
    distances the element-order-identical float folds both engines
    replay bit-identically — the oracle re-runs the full traversal in
    16 unrolled MATERIALIZED CTEs and must reproduce ids AND radii.

    Scale: 16 TakeOrdered(1) passes over a localCheckpointed running
    dmin column (lineage O(1)); the output is 16 control rows. At
    100 TB the traversal runs on a deterministic sample (like any
    k-means seeding) or swaps for parallel Gonzalez (pick the farthest
    point per partition, then max-of-maxes — same approximation bound
    up to a factor 2)."""
    from kdcloganalyzer_spark import appcache
    from kdcloganalyzer_spark.operators.dedup import spread
    from kdcloganalyzer_spark.operators.similarity import _sqdist_to_literal

    key = (spark.sparkContext.applicationId, sf_dir)
    appcache.evict_stale(_CORESET_CACHE, spark)
    if key in _CORESET_CACHE:
        return _CORESET_CACHE[key]
    base = (
        spread(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", "embedding")
        .localCheckpoint(eager=False)
    )
    first = (
        base.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .collect()[0]
    )
    sel = [(0, int(first["vec_id"]), 0.0)]
    center = [float(x) for x in first["embedding"]]
    cur = base.withColumn(
        "dmin", _sqdist_to_literal(F.col("embedding"), center)
    ).localCheckpoint()
    for step in range(1, 16):
        far = cur.orderBy(F.desc("dmin"), "vec_id").limit(1).collect()[0]
        sel.append((step, int(far["vec_id"]), float(far["dmin"])))
        center = [float(x) for x in far["embedding"]]
        cur = cur.withColumn(
            "dmin",
            F.least(
                F.col("dmin"),
                _sqdist_to_literal(F.col("embedding"), center),
            ),
        ).localCheckpoint()
    cover = float(cur.agg(F.max("dmin").alias("c")).collect()[0]["c"])
    rows = spark.createDataFrame(
        [(s, v, d, cover) for s, v, d in sel],
        "step int, vec_id long, d2_sel double, cover_d2 double",
    )
    out = rows.select(
        "step",
        "vec_id",
        F.round("d2_sel", 6).alias("d2_sel_r6"),
        F.round("cover_d2", 6).alias("cover_d2_r6"),
    ).localCheckpoint(eager=True)
    _CORESET_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# PC1 via exact-integer power iteration (embedding outlier audit)
# ---------------------------------------------------------------------------

_PCA_ROUNDS = 6
_PCA_SCALE = 1 << 20  # shared quantum with the Lloyd idiom

#: Per-(appId, sf) final report — the iteration is deterministic, so
#: like the ANN index builds it runs once per session (cold cost in
#: BASELINE round-12 rows) and re-reads serve the pinned 10 rows.
_PCA_CACHE: dict = {}
appcache.register_evictor(
    lambda qid: qid == "embed_pca_power_iteration",
    appcache.dict_cache_evictor(_PCA_CACHE),
)


def _pca_oracle(rounds: int = _PCA_ROUNDS, dim: int = 64) -> str:
    s = _PCA_SCALE
    dot = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    rnds = []
    for r in range(1, rounds + 1):
        rnds.append(f"""
    w{r} AS MATERIALIZED (
      SELECT c.vec_id, c.c,
             CAST(floor(CAST({dot.format(a="c.c", b="v.v")} AS DOUBLE)
                        / 268435456.0) AS BIGINT) AS w
      FROM cen c CROSS JOIN v{r - 1} v
    ),
    t{r} AS MATERIALIZED (
      SELECT pos,
             CAST(floor(CAST(sum(cd * w) AS DOUBLE) / 1024.0) AS BIGINT)
               AS t
      FROM (
        SELECT w, unnest(generate_series(1, {dim})) AS pos,
               unnest(c) AS cd
        FROM w{r}
      ) GROUP BY pos
    ),
    n{r} AS MATERIALIZED (
      SELECT sqrt(list_sum(list_transform(list(CAST(t AS DOUBLE)
               ORDER BY pos), x -> x * x))) AS nrm
      FROM t{r}
    ),
    v{r} AS MATERIALIZED (
      SELECT list(CAST(round(CAST(t.t AS DOUBLE) / n.nrm * {s})
                       AS BIGINT) ORDER BY t.pos) AS v
      FROM t{r} t CROSS JOIN n{r} n
    )""")
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT)) AS q
      FROM embeddings
    ),
    mb AS MATERIALIZED (
      SELECT list(CAST(round(CAST(sq AS DOUBLE) / n) AS BIGINT)
                  ORDER BY pos) AS m
      FROM (
        SELECT pos, CAST(sum(qd) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT unnest(generate_series(1, {dim})) AS pos,
                 unnest(q) AS qd
          FROM q
        ) GROUP BY pos
      )
    ),
    cen AS MATERIALIZED (
      SELECT q.vec_id,
             list_transform(list_zip(q.q, mb.m), p -> p[1] - p[2]) AS c
      FROM q CROSS JOIN mb
    ),
    v0 AS (SELECT list_transform(generate_series(1, {dim}),
                                 x -> CAST({s} AS BIGINT)) AS v),
    {",".join(rnds)}
    SELECT CAST(row_number() OVER (ORDER BY abs(proj) DESC, vec_id)
                AS INT) AS rank,
           vec_id, CAST(proj AS BIGINT) AS proj_q
    FROM (
      SELECT c.vec_id,
             {dot.format(a="c.c", b="v.v")} AS proj
      FROM cen c CROSS JOIN v{rounds} v
    )
    QUALIFY row_number() OVER (ORDER BY abs(proj) DESC, vec_id) <= 10
    """


def _duck_round_half_away(y: float) -> int:
    """round(x) with DuckDB/Spark HALF-AWAY-FROM-ZERO semantics (Python's
    round() is banker's and would diverge on exact .5 boundaries)."""
    import math

    return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))


@query("embed_pca_power_iteration", oracle=_pca_oracle())
def embed_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP PRINCIPAL COMPONENT via EXACT-INTEGER POWER ITERATION — the
    embedding-drift / outlier audit PCA every curation pipeline wants:
    find the dominant variance direction of the (centered) embedding
    cloud and report the 10 most extreme vectors along it. The entire
    iteration is engine-replayable — the trick that made the Lloyd
    quantizer hash-verifiable, extended to an iterative eigensolver:

    - quantize embeddings to round(x·2^20) BIGINT; center against the
      rounded integer mean (one correctly-rounded division per dim);
    - each round: per-vector dot ⟨c_i, v⟩ is an exact BIGINT (≤2^48);
      scale to w_i = floor(dot / 2^28) (floor of an exact-power-of-two
      float division — engine-neutral, no trunc-vs-floor ambiguity on
      negatives); per-dim sums s_d = Σ c_id·w_i are exact BIGINTs
      (≤2^57 at sf1 — order-free); t_d = floor(s_d / 2^10); the ONLY
      float is the normalizer sqrt(Σ t_d²) computed as the same
      sequential pos-ordered fold on both engines, and the next iterate
      v_d = round(t_d / nrm · 2^20) re-quantizes through one correctly
      rounded division (half-away rounding replicated exactly in the
      driver — Python round() is banker's and is NOT used);
    - 6 rounds, then the top-10 |projection| report with exact-integer
      projections and a total tie-break. Convergence is geometric in
      λ1/λ2; THIS synthetic corpus is near-isotropic (measured
      λ1/λ2 ≈ 1.01–1.07, ‖mean‖ ≈ 0.04), so no rank-1 method can
      isolate PC1 here in bounded rounds — what the oracle certifies is
      the exact-integer distributed eigensolver machinery and its
      deterministic report; the law test pins the Rayleigh-quotient
      MONOTONICITY every power-iteration step guarantees (and exact
      replay), which holds with or without a spectral gap.

    Scale: one quantize+center pass (cached), then per round ONE
    map-side-combined aggregate producing 64 integer sums — no shuffle
    of anything but 64 numbers; v is a 64-element control vector
    (sanctioned driver scalar). That is exactly the distributed power-
    iteration communication pattern (matvec + allreduce) at any scale;
    rounds are rank-1 — for top-k swap in block iteration with QR on
    the driver-side k×k block."""
    import math

    from kdcloganalyzer_spark import appcache

    key = (spark.sparkContext.applicationId, sf_dir)
    appcache.evict_stale(_PCA_CACHE, spark)
    if key in _PCA_CACHE:
        return _PCA_CACHE[key]
    ev = load_table(spark, sf_dir, "embeddings")
    s = _PCA_SCALE
    dim = 64
    q = ev.select(
        "vec_id",
        F.expr(
            f"transform(embedding,"
            f" x -> CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT))"
        ).alias("q"),
    )
    # posexplode + groupBy(pos): 64 per-dim sums as a 64-row shuffle —
    # NOT 64 aggregate expressions (CollapseProject would inline the
    # 64-term dot into every one of them: 64x64-term codegen, measured
    # ~4 s/call; the generator boundary keeps w evaluated once per row).
    stats = (
        q.select(F.posexplode("q").alias("pos", "qd"))
        .groupBy("pos")
        .agg(F.sum("qd").alias("sq"), F.count("*").alias("n"))
        .collect()
    )
    n = int(stats[0]["n"])
    by_pos = {int(r["pos"]): int(r["sq"]) for r in stats}
    mbar = [
        _duck_round_half_away(float(by_pos[d]) / n) for d in range(dim)
    ]
    cen = q.select(
        "vec_id",
        F.expr(
            "zip_with(q, array({}), (x, y) -> x - y)".format(
                ",".join(f"{m}L" for m in mbar)
            )
        ).alias("c"),
    ).localCheckpoint(eager=True)
    # The per-round dot is an interpreted HOF fold over ONE literal
    # array expression — integer sums are exact so fold order is
    # irrelevant, and (unlike a 64-term element_at chain) the fresh
    # literals don't trigger a ~2 s whole-stage-codegen recompile per
    # round (measured 2.3 s -> 0.75 s/round at sf0.1).
    def _dot_fold(vec: list[int]) -> str:
        varr = "array(" + ",".join(f"{x}L" for x in vec) + ")"
        return (
            f"aggregate(zip_with(c, {varr}, (x, y) -> x * y),"
            " 0L, (acc, x) -> acc + x)"
        )

    v = [s] * dim
    for _ in range(_PCA_ROUNDS):
        w = F.expr(
            f"CAST(floor(CAST({_dot_fold(v)} AS DOUBLE) / 268435456.0)"
            " AS BIGINT)"
        )
        srows = (
            cen.select(w.alias("w"), F.posexplode("c").alias("pos", "cd"))
            .groupBy("pos")
            .agg(F.sum(F.col("cd") * F.col("w")).alias("sd"))
            .collect()
        )
        sd = {int(r["pos"]): int(r["sd"]) for r in srows}
        t = [int(math.floor(float(sd[d]) / 1024.0)) for d in range(dim)]
        acc = 0.0
        for td in t:
            acc += float(td) * float(td)
        nrm = math.sqrt(acc)
        v = [_duck_round_half_away(float(td) / nrm * s) for td in t]
    scored = cen.select(
        "vec_id",
        F.expr(f"CAST({_dot_fold(v)} AS BIGINT)").alias("proj_q"),
    )
    out = (
        scored.orderBy(F.abs(F.col("proj_q")).desc(), "vec_id")
        .limit(10)
        .select(
            F.row_number()
            .over(Window.orderBy(F.abs(F.col("proj_q")).desc(), "vec_id"))
            .alias("rank"),
            "vec_id",
            "proj_q",
        )
        .localCheckpoint(eager=True)
    )
    _PCA_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# Parquet footer statistics surface (row-group metadata as a table)
# ---------------------------------------------------------------------------

#: The driver gate always compares at this sf; other sfs go through
#: kdcloganalyzer_spark.oracle.oracle_sql_for's path rewrite.
DRIVER_SF_DIR = "/root/testdata/sf0.01"

_FOOTER_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
)


@query(
    "scan_parquet_footer_stats",
    oracle=f"""
    SELECT CAST(row_group_id AS INT) AS row_group,
           path_in_schema AS column_name,
           CAST(num_values AS BIGINT) AS n_values,
           CAST(stats_null_count AS BIGINT) AS null_count,
           CAST(round(stats_min_value::DOUBLE * 100) AS BIGINT) AS min_q,
           CAST(round(stats_max_value::DOUBLE * 100) AS BIGINT) AS max_q
    FROM parquet_metadata('{DRIVER_SF_DIR}/lineitem.parquet')
    WHERE path_in_schema IN {_FOOTER_COLS}
    """,
)
def scan_parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET FOOTER STATISTICS AS A TABLE — the row-group metadata
    surface (value counts, null counts, min/max per column chunk) that
    drives zone-map pruning: what the engine consults when it skips a
    row group, exposed as a queryable manifest (DuckDB calls it
    parquet_metadata(); Delta/Iceberg persist the same stats in their
    manifests — scan_manifest_pruned consumes that form). The Spark
    side reads the SAME footers via pyarrow on the driver — footers are
    KB-sized and row-group-counted, a bounded manifest by construction,
    never row data — so the oracle cross-checks two INDEPENDENT footer
    parsers against each other. Min/max land in a uniform exact-integer
    unit (value·100) so double-vs-string formatting never enters the
    hash.

    Scale: footer reads are O(row groups), not O(rows) — this is
    exactly the planning-time cost model; at 100 TB the same operator
    runs over the file listing in parallel (mapInPandas over paths,
    one footer read per file) and feeds min/max pruning decisions
    without touching data pages."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    md = f.metadata
    rows = []
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema not in _FOOTER_COLS:
                continue
            st = col.statistics
            rows.append(
                (
                    rg,
                    col.path_in_schema,
                    int(col.num_values),
                    int(st.null_count),
                    _duck_round_half_away(float(st.min) * 100),
                    _duck_round_half_away(float(st.max) * 100),
                )
            )
    return spark.createDataFrame(
        rows,
        "row_group int, column_name string, n_values long,"
        " null_count long, min_q long, max_q long",
    )


# ---------------------------------------------------------------------------
# Price indices (Laspeyres / Paasche / Fisher, exact integer micro-units)
# ---------------------------------------------------------------------------


@query(
    "analytics_price_index",
    oracle="""
    WITH py AS (
      SELECT l_partkey AS part,
             CAST(year(l_shipdate) AS INT) AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS v_cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    pp AS (
      SELECT part, yr, q,
             CAST((v_cents * 1000) // q AS BIGINT) AS p_milli
      FROM py
    ),
    base AS (
      SELECT part, q AS q0, p_milli AS p0
      FROM pp WHERE yr = (SELECT min(yr) FROM pp)
    ),
    j AS (
      SELECT t.yr, t.part, t.p_milli AS pt, t.q AS qt, b.p0, b.q0
      FROM pp t JOIN base b ON b.part = t.part
      WHERE t.yr > (SELECT min(yr) FROM pp)
    ),
    ix AS (
      SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
             CAST((CAST(sum(pt * q0) AS HUGEINT) * 1000000)
                  // sum(p0 * q0) AS BIGINT) AS laspeyres_micro,
             CAST((CAST(sum(pt * qt) AS HUGEINT) * 1000000)
                  // sum(p0 * qt) AS BIGINT) AS paasche_micro
      FROM j GROUP BY yr
    )
    SELECT yr, n_parts, laspeyres_micro, paasche_micro,
           CAST(round(sqrt(CAST(laspeyres_micro * paasche_micro
                                AS DOUBLE))) AS BIGINT) AS fisher_micro
    FROM ix
    """,
)
def analytics_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE INDEX SUITE — Laspeyres (base-period basket), Paasche
    (current-period basket) and Fisher (their geometric mean) against
    the first shipping year: the standard inflation/price-drift monitor
    for any priced catalog, and a curation analogue for token-cost
    drift. Unit prices are exact integer MILLI-cents (one flooring div
    of two exact sums per part-year, both engines positive//positive);
    index numerators/denominators are exact integer basket products
    (the scaled numerator widens through DECIMAL(38,0) ⇄ HUGEINT);
    each index is ONE scaled div, and Fisher is the only float — a
    sqrt of an exact (<2^53) integer product, correctly rounded in
    both engines, re-rounded to an integer micro.

    Scale: the corpus collapses once to (part, year) — map-side
    combined on the lineitem scan; basket joins run per part on the
    summary (co-partitioned equi-join, base side is one year's slice);
    the index rollup is calendar-bounded. Nothing rescans raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    from kdcloganalyzer_spark.plans.relational import _cents

    py = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.year("l_shipdate").cast("int").alias("yr"),
    ).agg(
        F.sum(_cents("l_extendedprice")).cast("bigint").alias("v_cents"),
        F.sum(F.round("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q"),
    )
    pp = py.select(
        "part",
        "yr",
        "q",
        F.expr("CAST((v_cents * 1000) div q AS BIGINT)").alias(
            "p_milli"
        ),
    ).localCheckpoint(eager=False)
    y0 = pp.agg(F.min("yr")).collect()[0][0]
    base = pp.where(F.col("yr") == y0).select(
        "part", F.col("q").alias("q0"), F.col("p_milli").alias("p0")
    )
    j = (
        pp.where(F.col("yr") > y0)
        .select("yr", "part", F.col("p_milli").alias("pt"), F.col("q").alias("qt"))
        .join(base, "part")
    )
    # The x1e6 scaled numerator exceeds BIGINT (basket sums reach
    # ~2e14 milli-cent-units) — widen through DECIMAL(38,0), the Spark
    # twin of DuckDB's HUGEINT; `div` on decimals returns BIGINT in
    # both engines (verified value-identical).
    ix = j.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.expr(
            "CAST((CAST(sum(pt * q0) AS DECIMAL(38,0)) * 1000000)"
            " div sum(p0 * q0) AS BIGINT)"
        ).alias("laspeyres_micro"),
        F.expr(
            "CAST((CAST(sum(pt * qt) AS DECIMAL(38,0)) * 1000000)"
            " div sum(p0 * qt) AS BIGINT)"
        ).alias("paasche_micro"),
    )
    return ix.select(
        "yr",
        "n_parts",
        "laspeyres_micro",
        "paasche_micro",
        F.expr(
            "CAST(round(sqrt(CAST(laspeyres_micro * paasche_micro"
            " AS DOUBLE))) AS BIGINT)"
        ).alias("fisher_micro"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (two-state recursive recurrence)
# ---------------------------------------------------------------------------

# alpha = beta = 1/4; floor((..)/4) with numerators < 2^53 is exact and
# engine-neutral EVEN FOR NEGATIVES (the trend state b goes negative on
# declines — a bare integer `div`/`//` would diverge: Spark truncates
# toward zero, DuckDB floors).
_HOLT_SEQ_SQL = """
    SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
           day, n_events
    FROM (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM {events} GROUP BY 1
    )
    """

_HOLT_ORACLE = f"""
    WITH RECURSIVE seq AS ({_HOLT_SEQ_SQL.format(events="events")}),
    hw(i, day, n_events, l, b) AS (
      SELECT i, day, n_events, n_events * 1000000, CAST(0 AS BIGINT)
      FROM seq WHERE i = 1
      UNION ALL
      SELECT i, day, n_events, l_new,
             CAST(floor((l_new - l_old + 3 * b_old) / 4) AS BIGINT)
      FROM (
        SELECT s.i, s.day, s.n_events,
               CAST(floor((s.n_events * 1000000 + 3 * (e.l + e.b)) / 4)
                    AS BIGINT) AS l_new,
               e.l AS l_old, e.b AS b_old
        FROM hw e JOIN seq s ON s.i = e.i + 1
      )
    )
    SELECT day, n_events, CAST(l AS BIGINT) AS level_micro,
           CAST(b AS BIGINT) AS trend_micro,
           CAST(l + b AS BIGINT) AS forecast_next_micro
    FROM hw
    """

_HOLT_STRIDE = 8


def _holt_batched_sql(k: int) -> str:
    """Spark-side k-batched two-state recursion: lateral column aliases
    keep the interleaved (l, b) chain LINEAR in text (a nested-text
    chain doubles per step — 2^k blowup), the same 8-days-per-level
    batching as rollup_ewma_recursive otherwise."""
    joins = ["JOIN v_seq_holt s1 ON s1.i = e.i + 1"] + [
        f"LEFT JOIN v_seq_holt s{j} ON s{j}.i = e.i + {j}"
        for j in range(2, k + 1)
    ]
    chain = []
    lp, bp = "e.l", "e.b"
    for j in range(1, k + 1):
        chain.append(
            f"CAST(floor((s{j}.n_events * 1000000 + 3 * ({lp} + {bp}))"
            f" / 4) AS BIGINT) AS l{j}"
        )
        chain.append(
            f"CAST(floor((l{j} - {lp} + 3 * {bp}) / 4) AS BIGINT)"
            f" AS b{j}"
        )
        lp, bp = f"l{j}", f"b{j}"
    iis = ", ".join(f"i{j}" for j in range(1, k + 1))
    days = ", ".join(f"day{j}" for j in range(1, k + 1))
    ns = ", ".join(f"n{j}" for j in range(1, k + 1))
    ls = ", ".join(f"l{j}" for j in range(1, k + 1))
    bs = ", ".join(f"b{j}" for j in range(1, k + 1))
    il_tip = ", ".join(f"i{j}" for j in range(k, 0, -1))
    l_tip = ", ".join(f"l{j}" for j in range(k, 0, -1))
    b_tip = ", ".join(f"b{j}" for j in range(k, 0, -1))
    inner = ", ".join(
        [f"s{j}.i AS i{j}" for j in range(1, k + 1)]
        + [f"s{j}.day AS day{j}" for j in range(1, k + 1)]
        + [f"s{j}.n_events AS n{j}" for j in range(1, k + 1)]
        + chain
    )
    return f"""
    WITH RECURSIVE hw(i, l, b, days, ns, ls, bs) AS (
      SELECT i, n_events * 1000000, CAST(0 AS BIGINT),
             array(day), array(n_events),
             array(n_events * 1000000), array(CAST(0 AS BIGINT))
      FROM v_seq_holt WHERE i = 1
      UNION ALL
      SELECT coalesce({il_tip}), coalesce({l_tip}), coalesce({b_tip}),
             array({days}), array({ns}), array({ls}), array({bs})
      FROM (
        SELECT {inner}
        FROM hw e
        {" ".join(joins)}
      )
    ),
    flat AS (
      SELECT posexplode(arrays_zip(days, ns, ls, bs)) AS (pos, z)
      FROM hw
    )
    SELECT z.days AS day, z.ns AS n_events,
           CAST(z.ls AS BIGINT) AS level_micro,
           CAST(z.bs AS BIGINT) AS trend_micro,
           CAST(z.ls + z.bs AS BIGINT) AS forecast_next_micro
    FROM flat WHERE z.days IS NOT NULL
    """


@query("analytics_holt_linear", oracle=_HOLT_ORACLE)
def analytics_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR-TREND smoothing (double exponential smoothing) of
    daily event volume — the level+trend forecaster one step up from
    rollup_ewma_recursive's flat EWMA: l_t = α·x_t + (1−α)(l+b),
    b_t = β(l_t−l) + (1−β)b with α=β=1/4, emitting level, trend and
    the one-step-ahead forecast l+b per day. EXACT integers: both
    states are BIGINT micro-units; every update is floor((…)/4) — an
    exact power-of-two float division under 2^53 then an exact floor,
    which (unlike bare integer division) is engine-neutral even when
    the TREND GOES NEGATIVE on declines (Spark div truncates toward
    zero, DuckDB // floors — they disagree exactly there).

    The DuckDB oracle recurses one day per level (textbook form, the
    two-state update staged through a subquery); Spark executes the
    SAME recurrence batched 8 days per level like the EWMA id — with
    one new trick: LATERAL COLUMN ALIASES keep the interleaved (l, b)
    chain linear in text, where nested-text substitution would double
    per step (2^8 blowup at stride 8).

    Scale: recursion depth = ceil(days/8), data-size independent; the
    corpus-scaled work is the one partial-agg'd daily rollup."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "v_events_holt"
    )
    seq = spark.sql(
        _HOLT_SEQ_SQL.format(events="v_events_holt")
    ).localCheckpoint(eager=True)
    seq.createOrReplaceTempView("v_seq_holt")
    return spark.sql(_holt_batched_sql(_HOLT_STRIDE))


# ---------------------------------------------------------------------------
# Tokenizer fertility report (per-language tokens/word, chars/token)
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    from kdcloganalyzer_spark.plans.round11_ops import (
        _BPE_ROUNDS,
        _BPE_TRAIN_CTES,
    )

    return (
        "WITH "
        + _BPE_TRAIN_CTES
        + f""",
    docw AS (
      SELECT lang, unnest(list_filter(string_split(
               regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
               x -> x <> '')) AS word
      FROM documents
    ),
    cnt AS (
      SELECT d.lang,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum((length(v.s) - length(replace(v.s, '><', ''))) / 2
                      + 1) AS BIGINT) AS n_tokens,
             CAST(sum(length(d.word)) AS BIGINT) AS n_chars
      FROM docw d JOIN v{_BPE_ROUNDS} v ON v.word = d.word
      GROUP BY d.lang
    )
    SELECT lang, n_words, n_tokens, n_chars,
           CAST(n_tokens * 1000000 // n_words AS BIGINT)
             AS fertility_micro,
           CAST(n_chars * 1000000 // n_tokens AS BIGINT)
             AS chars_per_token_micro
    FROM cnt
    """
    )


@query("pipeline_tokenizer_fertility", oracle=_fertility_oracle())
def pipeline_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOKENIZER FERTILITY REPORT — the per-language tokenizer-equity
    metric every multilingual training effort publishes: fertility =
    BPE tokens per word (higher = the tokenizer fragments that
    language more, inflating its effective cost per document) and
    chars-per-token compression, from the SAME learned merges as
    text_bpe_train_merges / pipeline_bpe_tokenize (shared per-(session,
    sf) _bpe_merges cache — one training serves all three ids). Counts
    are exact integers via the delimited-form length arithmetic; the
    two ratios are single scaled integer divs.

    Scale: corpus-linear explode + 8 codegen replaces (the replace
    chain IS the tokenizer — no vocabulary join on the Spark side),
    one partial-agg'd lang rollup; |langs| output rows."""
    from kdcloganalyzer_spark.plans.round11_ops import _bpe_merges

    merges = _bpe_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.lower(F.col("text")), "[^a-z]+", " "
                    ),
                    " ",
                ),
                lambda x: x != "",
            )
        ).alias("word"),
    )
    expr = "regexp_replace(word, '(.)', '<$1>')"
    for _, pl, pr, _pc in merges:
        expr = f"replace({expr}, '<{pl}><{pr}>', '<{pl}{pr}>')"
    cnt = occ.select("lang", "word", F.expr(expr).alias("s")).groupBy(
        "lang"
    ).agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.expr(
            "CAST(sum((length(s) - length(replace(s, '><', ''))) / 2 + 1)"
            " AS BIGINT)"
        ).alias("n_tokens"),
        F.sum(F.length("word")).cast("bigint").alias("n_chars"),
    )
    return cnt.select(
        "lang",
        "n_words",
        "n_tokens",
        "n_chars",
        F.expr("CAST(n_tokens * 1000000 div n_words AS BIGINT)").alias(
            "fertility_micro"
        ),
        F.expr("CAST(n_chars * 1000000 div n_tokens AS BIGINT)").alias(
            "chars_per_token_micro"
        ),
    )


# ---------------------------------------------------------------------------
# Drawdown curve (running-peak shortfall of daily revenue)
# ---------------------------------------------------------------------------


@query(
    "window_drawdown",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS period,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT period, rev_cents,
             max(rev_cents) OVER (ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak_cents
      FROM d
    )
    SELECT period, rev_cents, CAST(peak_cents AS BIGINT) AS peak_cents,
           CAST(peak_cents - rev_cents AS BIGINT) AS drawdown_cents,
           CAST((peak_cents - rev_cents) * 1000000 // peak_cents
                AS BIGINT) AS drawdown_micro
    FROM p
    """,
)
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRAWDOWN CURVE — the running-peak shortfall (finance's max-
    drawdown generalized to any KPI series): per month, revenue, the
    best month SO FAR, and how far below that peak the current month
    sits, absolute cents and scaled-integer relative micro. The
    max-drawdown row is just the curve's argmax — emitting the whole
    curve keeps the operator composable (alerting reads the last row,
    reporting plots the series). All exact integers; the relative
    drawdown is one positive//positive scaled div.

    Scale: the corpus collapses to one row per month in a single
    partial-agg'd shuffle; the running-max window runs on the
    calendar-bounded summary (a ~80-row single partition — acceptable
    because it IS the final report; per-series drawdowns would add
    partitionBy and parallelize)."""
    o = load_table(spark, sf_dir, "orders")
    from kdcloganalyzer_spark.plans.relational import _cents

    d = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("period")
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_cents"))
    w = Window.orderBy("period").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = d.select(
        "period",
        "rev_cents",
        F.max("rev_cents").over(w).cast("bigint").alias("peak_cents"),
    )
    return p.select(
        "period",
        "rev_cents",
        "peak_cents",
        (F.col("peak_cents") - F.col("rev_cents"))
        .cast("bigint")
        .alias("drawdown_cents"),
        # DECIMAL(38,0) widening (r16 sf3 overflow sweep): period
        # revenue cents ~8e11 at sf3; ×1e6 crosses BIGINT by ~sf35.
        F.expr(
            "CAST(CAST(peak_cents - rev_cents AS DECIMAL(38,0))"
            " * 1000000 div peak_cents AS BIGINT)"
        ).alias("drawdown_micro"),
    )


# ---------------------------------------------------------------------------
# PCM audio energy (multimodal compute: RMS / peak over 16-bit LE frames)
# ---------------------------------------------------------------------------


@query(
    "multimodal_audio_energy",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             octet_length(encode(text)) // 2 AS n,
             hex(encode(text)) AS h
      FROM documents
    ),
    sm AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
             list_transform(generate_series(1, CAST(n AS INT)),
               i -> ('0x' || substr(h, i*4-3, 2))::BIGINT
                    + 256 * (('0x' || substr(h, i*4-1, 2))::BIGINT)
                    - 65536 * ((('0x' || substr(h, i*4-1, 2))::BIGINT)
                               // 128)) AS smp
      FROM s
    )
    SELECT doc_id, n_samples,
           CAST(coalesce(list_sum(list_transform(smp, x -> x * x)), 0)
                AS BIGINT) AS energy_q,
           CAST(coalesce(list_max(list_transform(smp, x -> abs(x))), 0)
                AS BIGINT) AS peak_q,
           CAST(round(sqrt(CAST(coalesce(list_sum(
                  list_transform(smp, x -> x * x)), 0) AS DOUBLE)
                  / n_samples) * 1000) AS BIGINT) AS rms_milli
    FROM sm
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM AUDIO ENERGY — the feature-extraction leg of the audio tier
    (multimodal_wav_probe parses the container; this id computes over
    the FRAMES): interpret each payload's data section as 16-bit
    little-endian signed PCM and report exact integer energy Σs², peak
    |s|, and RMS in milli-units (the loudness/clipping audit run before
    audio enters a training mix). The Spark side is the REAL multimodal
    execution shape — an Arrow-batched mapInPandas closure doing the
    numpy frombuffer('<i2') decode and int64 square-sums (exact:
    |s|<2^15, Σs² < 2^45 at these payload sizes) — while the oracle
    re-derives every sample with branch-free hex-pair arithmetic
    (sign = u − 2^16·(high_byte // 128), no CASE in any list lambda —
    the DuckDB branching-fold gotcha), so two INDEPENDENT PCM decoders
    must agree bit-for-bit. RMS is the only float: one correctly-
    rounded division (exact <2^53 integers), one sqrt, one half-away
    round — engine-neutral.

    Scale: decode + reduce run inside the Arrow batch, one pass, no
    shuffle (the per-doc report is the output grain); payload bytes
    never leave the scan partition. A real fleet swaps frombuffer for
    the actual codec behind the same mapInPandas signature."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def decode_energy(batches):
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                b = b[: len(b) // 2 * 2]
                s = np.frombuffer(b, dtype="<i2").astype("int64")
                n = len(s)
                energy = int((s * s).sum()) if n else 0
                peak = int(np.abs(s).max()) if n else 0
                rms = (
                    math.floor(
                        math.sqrt(float(energy) / n) * 1000 + 0.5
                    )
                    if n
                    else 0
                )
                out.append((int(doc_id), n, energy, peak, rms))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_samples",
                    "energy_q",
                    "peak_q",
                    "rms_milli",
                ],
            )

    return docs.mapInPandas(
        decode_energy,
        "doc_id long, n_samples long, energy_q long, peak_q long,"
        " rms_milli long",
    )


# ---------------------------------------------------------------------------
# Bollinger bands over daily volume (exact integer breach test)
# ---------------------------------------------------------------------------


@query(
    "events_bollinger_bands",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, x,
             CAST(count(*) OVER win AS BIGINT) AS n,
             CAST(sum(x) OVER win AS BIGINT) AS s,
             CAST(sum(x * x) OVER win AS BIGINT) AS q
      FROM d
      WINDOW win AS (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, x AS n_events, n AS win_n,
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
def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOLLINGER BANDS over daily event volume — the rolling ±2σ
    envelope ops dashboards draw, with the breach test in EXACT
    integers: over a 7-day trailing window with running sums S, Q and
    count n, |x − μ| > 2σ is cross-multiplied to
    (x·n − S)² > 4·(n·Q − S²) — no division, no sqrt, no float
    anywhere (the mean is reported as one scaled div; the variance
    NUMERATOR n·Q − S² is emitted raw). The sign of (x·n − S) splits
    hi/lo breaches.

    Scale: the corpus collapses to one row per day in a single
    partial-agg'd shuffle; the three window aggregates share ONE
    7-row frame over the calendar summary. Per-series bands add
    partitionBy to the same window — the shuffle is then keyed, not
    global."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    win = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    w = d.select(
        "day",
        "x",
        F.count("*").over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("q"),
    )
    dev = F.col("x") * F.col("n") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return w.select(
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
# HITS hubs & authorities (integer max-normalized power iteration)
# ---------------------------------------------------------------------------

_HITS_ROUNDS = 5
_HITS_S = 1 << 20

#: Per-(appId, sf) final report — deterministic like the other iterative
#: builds; the 10-shuffle fused plan runs once per session (cold cost in
#: the BASELINE round-12 rows), re-reads serve the pinned 10 rows.
_HITS_CACHE: dict = {}
appcache.register_evictor(
    lambda qid: qid == "graph_hits_bipartite",
    appcache.dict_cache_evictor(_HITS_CACHE),
)


def _hits_oracle(rounds: int = _HITS_ROUNDS) -> str:
    s = _HITS_S
    ctes = [
        """
    ed AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    h0 AS MATERIALIZED (
      SELECT DISTINCT c, CAST({s} AS BIGINT) AS h FROM ed
    )""".format(s=s)
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""
    a{r}r AS MATERIALIZED (
      SELECT e.sp, CAST(sum(h.h) AS BIGINT) AS a
      FROM ed e JOIN h{r - 1} h ON h.c = e.c GROUP BY e.sp
    ),
    a{r} AS MATERIALIZED (
      SELECT sp, CAST(a * {s} // max(a) OVER () AS BIGINT) AS a
      FROM a{r}r
    ),
    h{r}r AS MATERIALIZED (
      SELECT e.c, CAST(sum(a.a) AS BIGINT) AS h
      FROM ed e JOIN a{r} a ON a.sp = e.sp GROUP BY e.c
    ),
    h{r} AS MATERIALIZED (
      SELECT c, CAST(h * {s} // max(h) OVER () AS BIGINT) AS h
      FROM h{r}r
    )""")
    return f"""
    WITH {",".join(ctes)},
    ranked AS (
      SELECT 'hub' AS kind, c AS node_id, h AS score_q,
             row_number() OVER (ORDER BY h DESC, c) AS rank
      FROM h{rounds}
      UNION ALL
      SELECT 'authority' AS kind, sp AS node_id, a AS score_q,
             row_number() OVER (ORDER BY a DESC, sp) AS rank
      FROM a{rounds}
    )
    SELECT kind, CAST(node_id AS BIGINT) AS node_id, score_q,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("graph_hits_bipartite", oracle=_hits_oracle())
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) on the directed customer →
    supplier co-order graph — the link-analysis twin of graph_pagerank:
    hubs are customers whose baskets touch the most-endorsed suppliers,
    authorities are suppliers endorsed by the strongest hubs (the
    mutually-recursive eigenproblem of AᵀA / AAᵀ). The iteration is
    ENTIRELY integer: scores live at scale 2^20 and each half-step
    re-normalizes by the MAX via one scaled flooring div (max-norm
    converges to the same principal eigenvector as L2 and needs no
    sqrt, no float, no control scalar — the normalizer is a window
    max, so all 5 rounds fuse into ONE lazy plan; nothing collects).
    Top-5 per side with total tie-breaks.

    Scale: per round two edge-keyed partial-agg'd shuffles (the
    textbook HITS message pattern); the max-norm windows run over
    |nodes|-sized score frames. Edges come from the shared
    per-(session, sf) co-order cache (one derivation serves pagerank /
    degree / triangles / HITS). At 100 TB the window-max swaps for a
    broadcast 1-row max (the documented control-scalar form) to avoid
    the single-partition window over a large node set."""
    from kdcloganalyzer_spark import appcache
    from kdcloganalyzer_spark.plans.analytics import _coorder_edges

    key = (spark.sparkContext.applicationId, sf_dir)
    appcache.evict_stale(_HITS_CACHE, spark)
    if key in _HITS_CACHE:
        return _HITS_CACHE[key]
    s = _HITS_S
    sym = _coorder_edges(spark, sf_dir)
    ed = sym.where(F.col("src").startswith("c")).select(
        F.expr("CAST(substring(src, 2) AS BIGINT)").alias("c"),
        F.expr("CAST(substring(dst, 2) AS BIGINT)").alias("sp"),
    )
    wall = Window.partitionBy()
    h = ed.select("c").distinct().select(
        "c", F.lit(s).cast("bigint").alias("h")
    )
    a = None
    for _ in range(_HITS_ROUNDS):
        ar = (
            ed.join(h, "c")
            .groupBy("sp")
            .agg(F.sum("h").cast("bigint").alias("a"))
        )
        a = ar.select(
            "sp",
            F.expr(f"CAST(a * {s} AS BIGINT)").alias("_num"),
            F.max("a").over(wall).alias("_max"),
        ).select(
            "sp",
            F.expr("CAST(_num div _max AS BIGINT)").alias("a"),
        )
        hr = (
            ed.join(a, "sp")
            .groupBy("c")
            .agg(F.sum("a").cast("bigint").alias("h"))
        )
        h = hr.select(
            "c",
            F.expr(f"CAST(h * {s} AS BIGINT)").alias("_num"),
            F.max("h").over(wall).alias("_max"),
        ).select("c", F.expr("CAST(_num div _max AS BIGINT)").alias("h"))
    hubs = h.select(
        F.lit("hub").alias("kind"),
        F.col("c").cast("bigint").alias("node_id"),
        F.col("h").alias("score_q"),
        F.row_number()
        .over(Window.orderBy(F.desc("h"), F.asc("c")))
        .cast("int")
        .alias("rank"),
    ).where(F.col("rank") <= 5)
    auths = a.select(
        F.lit("authority").alias("kind"),
        F.col("sp").cast("bigint").alias("node_id"),
        F.col("a").alias("score_q"),
        F.row_number()
        .over(Window.orderBy(F.desc("a"), F.asc("sp")))
        .cast("int")
        .alias("rank"),
    ).where(F.col("rank") <= 5)
    out = hubs.unionAll(auths).localCheckpoint(eager=True)
    _HITS_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (log-log OLS in exact integer micro-nats)
# ---------------------------------------------------------------------------


@query(
    "text_zipf_slope",
    oracle="""
    WITH wc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS f
      FROM (
        SELECT unnest(list_filter(string_split(
                 regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                 x -> x <> '')) AS word
        FROM documents
      ) GROUP BY word
    ),
    rk AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, word) AS r FROM wc
    ),
    pts AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM rk
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sxx
      FROM pts
    )
    SELECT n AS n_words,
           CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
                // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
             AS slope_micro,
           CAST(sx AS BIGINT) AS sum_lnr_micro,
           CAST(sy AS BIGINT) AS sum_lnf_micro
    FROM s
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF RANK-FREQUENCY SLOPE — the log-log OLS fit of the corpus
    word-frequency curve (natural language sits near −1; a synthetic or
    templated corpus shows up immediately as a flatter slope — one of
    the cheapest generated-text detectors, and the statistic that
    justifies vocabulary truncation points alongside
    text_vocab_coverage). Per the micro-nat idiom, each point's
    (ln rank, ln freq) is rounded ONCE to integer micro-nats; the OLS
    slope is then pure integer algebra (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
    widened through DECIMAL(38,0) ⇄ HUGEINT (Σxy reaches ~10^19 at
    sf0.1) and emitted as one scaled integer division. The numerator
    is NEGATIVE on a Zipf curve — measured: DuckDB's integer `//`
    TRUNCATES toward zero exactly like Spark's `div` (-7//2 = -3 in
    both; `//` floors only on floats), so plain division is engine-
    neutral even at negative values and no floor emulation is needed.

    Scale: one word-count collapse (map-combined), a rank window over
    the Heaps-bounded vocabulary summary, and a 1-row reduction."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(
                        F.regexp_replace(
                            F.lower(F.col("text")), "[^a-z]+", " "
                        ),
                        " ",
                    ),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    rk = wc.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("word")))
        .alias("r"),
    )
    pts = rk.select(
        F.expr(
            "CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("y"))
        ).alias("sxy"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("x"))
        ).alias("sxx"),
    )
    return s.selectExpr(
        "n AS n_words",
        "CAST(((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000)"
        " div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)"
        " AS slope_micro",
        "CAST(sx AS BIGINT) AS sum_lnr_micro",
        "CAST(sy AS BIGINT) AS sum_lnf_micro",
    )


# ---------------------------------------------------------------------------
# New-vs-repeat revenue split (acquisition-quality ledger)
# ---------------------------------------------------------------------------


@query(
    "analytics_new_vs_repeat",
    oracle="""
    WITH fo AS (
      SELECT o_custkey AS cust,
             min(CAST(date_trunc('month', o_orderdate) AS DATE))
               AS first_m
      FROM orders GROUP BY 1
    ),
    om AS (
      SELECT o_custkey AS cust,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT om.m AS month,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN om.m = fo.first_m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN om.m = fo.first_m
                         THEN om.rev_cents ELSE 0 END)
                AS BIGINT) AS new_cents,
           CAST(sum(CASE WHEN om.m <> fo.first_m
                         THEN om.rev_cents ELSE 0 END)
                AS BIGINT) AS repeat_cents,
           CAST(sum(CASE WHEN om.m <> fo.first_m
                         THEN om.rev_cents ELSE 0 END) * 1000000
                // sum(om.rev_cents) AS BIGINT) AS repeat_share_micro
    FROM om JOIN fo ON fo.cust = om.cust
    GROUP BY om.m
    """,
)
def analytics_new_vs_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW-VS-REPEAT REVENUE SPLIT — per month, how much revenue comes
    from first-ever customers vs returning ones (the acquisition-
    quality ledger that pairs with analytics_customer_nrr's retention
    view: NRR tracks the installed base, this tracks the mix funding
    growth). A customer is NEW in exactly the month of their first
    order. Exact integer cents; the repeat share is one scaled
    positive//positive div.

    Scale: two partial-agg'd collapses of orders share the customer
    key (first-month min and per-(customer, month) revenue), then one
    co-partitioned equi-join on cust — no raw-order self-join; the
    month rollup is calendar-bounded."""
    o = load_table(spark, sf_dir, "orders")
    from kdcloganalyzer_spark.plans.relational import _cents

    om = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_cents"))
    # r15: the first-order month is derivable FROM the (cust, month)
    # summary — min(m) per customer — so the separate per-customer
    # aggregate (a second orders scan) and the cust equi-join collapse
    # into one window over the already-aggregated frame.
    j = om.withColumn(
        "first_m", F.min("m").over(Window.partitionBy("cust"))
    )
    is_new = F.col("m") == F.col("first_m")
    return j.groupBy(F.col("m").alias("month")).agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum(F.when(is_new, 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(is_new, F.col("rev_cents")).otherwise(0))
        .cast("bigint")
        .alias("new_cents"),
        F.sum(F.when(~is_new, F.col("rev_cents")).otherwise(0))
        .cast("bigint")
        .alias("repeat_cents"),
        # DECIMAL(38,0) widening (r16 sf3 overflow sweep): same
        # revenue-cents ×1e6 class as nrr_micro/drawdown_micro.
        F.expr(
            "CAST(CAST(sum(CASE WHEN m <> first_m THEN rev_cents"
            " ELSE 0 END) AS DECIMAL(38,0))"
            " * 1000000 div sum(rev_cents) AS BIGINT)"
        ).alias("repeat_share_micro"),
    )


# ---------------------------------------------------------------------------
# Length-bucket batching report (padding-waste accounting)
# ---------------------------------------------------------------------------


@query(
    "pipeline_padding_waste",
    oracle="""
    WITH b AS (
      SELECT doc_id, n_chars,
             CAST(power(2, ceil(log2(greatest(n_chars, 1))))
                  AS BIGINT) AS bucket_cap
      FROM documents
    )
    SELECT bucket_cap,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(*) * bucket_cap AS BIGINT) AS capacity,
           CAST((count(*) * bucket_cap - sum(n_chars)) * 1000000
                // (count(*) * bucket_cap) AS BIGINT) AS waste_micro,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM b GROUP BY bucket_cap
    """,
)
def pipeline_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKET BATCHING REPORT — the padding-waste accounting
    behind sequence-length bucketing (batch documents with similar
    lengths so fixed-shape batches waste less padding): docs bucket to
    the next power-of-2 capacity, and each bucket reports occupancy,
    capacity, and the scaled padding-waste share — the number that
    justifies bucketed batching over one global max-length pad (compare
    Σ waste here against (N·global_max − Σ chars)). ceil(log2(n)) is
    exact in IEEE for integer inputs (powers of two are representable;
    non-powers can't land on integers), the bucket capacity is an exact
    power of two, and the waste share is one scaled positive division.

    Scale: a pure codegen bucket key at the scan, one partial-agg'd
    groupBy into ≤ log2(max_len) rows — the report is bounded by the
    length domain, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "n_chars",
        F.expr(
            "CAST(power(2, ceil(log2(greatest(n_chars, 1))))"
            " AS BIGINT)"
        ).alias("bucket_cap"),
    )
    return b.groupBy("bucket_cap").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.expr("CAST(count(*) * bucket_cap AS BIGINT)").alias("capacity"),
        F.expr(
            "CAST((count(*) * bucket_cap - sum(n_chars)) * 1000000"
            " div (count(*) * bucket_cap) AS BIGINT)"
        ).alias("waste_micro"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness classification (dispersion in exact integers)
# ---------------------------------------------------------------------------


@query(
    "events_burstiness_class",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
               AS gap_us
      FROM events
    ),
    s AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap_us) AS BIGINT) AS sg,
             CAST(sum(CAST(gap_us AS HUGEINT) * gap_us) AS HUGEINT)
               AS qg
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT user_id, n AS n_gaps,
           CAST(sg // n AS BIGINT) AS mean_gap_us,
           n * qg - CAST(sg AS HUGEINT) * sg > CAST(sg AS HUGEINT) * sg
             AS bursty,
           CAST((n * qg - CAST(sg AS HUGEINT) * sg) * 1000000
                // (CAST(sg AS HUGEINT) * sg) AS BIGINT)
             AS cv2_micro
    FROM s
    """,
)
def events_burstiness_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL BURSTINESS — per user, is the event stream bursty
    or Poisson-like? The classifier is the coefficient of variation of
    inter-arrival gaps: CV > 1 (σ > μ) marks bursts-and-silences,
    CV < 1 marks pacemaker regularity, exponential arrivals sit at 1.
    Entirely exact integers: gaps in microseconds, the test cross-
    multiplied to n·Σg² − (Σg)² > (Σg)² (no σ, no sqrt), and CV² in
    scaled micro as ONE division of the exact HUGEINT ⇄ DECIMAL(38)
    quantities (Σg² reaches ~10^21 at month-long gaps). The
    bot/scraper screen that complements events_user_entropy's
    diversity axis.

    Scale: one user-keyed shuffle shared by the lag window and the
    rollup; output is |users| rows. The HAVING ≥2 guard keeps the
    division total."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("gap_us").cast("bigint").alias("sg"),
        F.sum(
            F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us")
        ).alias("qg"),
    ).where(F.col("n") >= 2)
    return s.selectExpr(
        "user_id",
        "n AS n_gaps",
        "CAST(sg div n AS BIGINT) AS mean_gap_us",
        "n * qg - CAST(sg AS DECIMAL(38,0)) * sg"
        " > CAST(sg AS DECIMAL(38,0)) * sg AS bursty",
        "CAST((n * qg - CAST(sg AS DECIMAL(38,0)) * sg) * 1000000"
        " div (CAST(sg AS DECIMAL(38,0)) * sg) AS BIGINT) AS cv2_micro",
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "2024-01-16"  # pre-period = first half of the event window


@query(
    "events_cuped_adjusted",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5('exp1#' ||
                        CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts < TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts >= TIMESTAMP '{_CUPED_SPLIT} 00:00:00'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM u
    ),
    th AS (
      SELECT n, sx, sy,
             CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST((n * sxy - CAST(sx AS HUGEINT) * sy)
                            * 1000000
                            // (n * sxx - CAST(sx AS HUGEINT) * sx)
                            AS BIGINT) END AS theta_micro
      FROM g
    )
    SELECT u.variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(u.x) AS BIGINT) AS pre_cents,
           CAST(sum(u.y) AS BIGINT) AS post_cents,
           t.theta_micro,
           CAST(sum(u.y) * 1000000 // count(*) AS BIGINT)
             AS mean_post_micro,
           CAST(sum(u.y) * 1000000 // count(*)
                - t.theta_micro
                  * (sum(u.x) * 1000000 // count(*)
                     - t.sx * 1000000 // t.n) // 1000000
                AS BIGINT) AS adj_mean_micro
    FROM u CROSS JOIN th t
    GROUP BY u.variant, t.theta_micro, t.sx, t.n
    """,
)
def events_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE-REDUCED A/B READOUT (Deng et al., WSDM 2013) —
    the experimentation-platform standard: adjust each arm's
    post-period metric by the pooled pre-period covariate,
    ŷ = ȳ_arm − θ·(x̄_arm − x̄), θ = cov(x,y)/var(x), which strips
    pre-existing user-spend differences out of the treatment contrast.
    Everything is exact integers: per-user pre/post purchase cents
    (deterministic hashed arms — the events_ab_test_report idiom), θ
    as ONE scaled division of exact DECIMAL(38) ⇄ HUGEINT covariance
    algebra (trunc-div engine-neutral at any sign — r12 measured), and
    the adjusted mean as a fixed sequence of scaled integer ops both
    engines replay verbatim. The split date is a constant of the
    experiment window, not data-derived.

    Scale: ONE user-keyed partial-agg'd shuffle produces (x, y) per
    user; θ is a 1-row reduction over that summary (broadcast back by
    the tiny cross join); the arm rollup is 2 rows. No raw-event
    self-joins, no assignment table."""
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
    is_p = F.col("event_type") == "purchase"
    pre = is_p & (F.col("ts") < F.lit(f"{_CUPED_SPLIT} 00:00:00").cast("timestamp"))
    post = is_p & (F.col("ts") >= F.lit(f"{_CUPED_SPLIT} 00:00:00").cast("timestamp"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = ev.groupBy("user_id", variant.alias("variant")).agg(
        F.sum(F.when(pre, cents).otherwise(0)).cast("bigint").alias("x"),
        F.sum(F.when(post, cents).otherwise(0)).cast("bigint").alias("y"),
    )
    g = u.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    th = g.selectExpr(
        "n",
        "sx",
        """CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0
                THEN CAST(0 AS BIGINT)
                ELSE CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)
                          * 1000000
                          div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                          AS BIGINT) END AS theta_micro""",
    )
    # 1-row global stats: collect as sanctioned control scalars (a lazy
    # 1-row cross join would plan as BNLJ).
    trow = th.collect()[0]
    n_g, sx_g, theta = int(trow["n"]), int(trow["sx"]), int(trow["theta_micro"])
    return u.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("pre_cents"),
        F.sum("y").cast("bigint").alias("post_cents"),
        F.lit(theta).cast("bigint").alias("theta_micro"),
        F.expr("CAST(sum(y) * 1000000 div count(*) AS BIGINT)").alias(
            "mean_post_micro"
        ),
        F.expr(
            f"CAST(sum(y) * 1000000 div count(*)"
            f" - {theta}L * (sum(x) * 1000000 div count(*)"
            f" - {sx_g}L * 1000000 div {n_g}L) div 1000000 AS BIGINT)"
        ).alias("adj_mean_micro"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA on day-of-week (exact integer sum-of-squares decomposition)
# ---------------------------------------------------------------------------


@query(
    "analytics_anova_dow",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(date_part('dow', CAST(date_trunc('day', ts) AS DATE))
                  + 1 AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(x) AS BIGINT) AS sw
      FROM d GROUP BY dow
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS q,
             CAST(count(DISTINCT dow) AS BIGINT) AS k
      FROM d
    ),
    f AS (
      SELECT list_reduce(list(nw ORDER BY dow), (a, b) -> a * b) AS p,
             list(nw ORDER BY dow) AS nws,
             list(sw ORDER BY dow) AS sws
      FROM g
    ),
    alg AS (
      SELECT t.n, t.s, t.q, t.k, f.p,
             list_sum(list_transform(list_zip(f.sws, f.nws),
               z -> CAST(z[1] AS HUGEINT) * z[1] * (f.p // z[2])))
               AS a
      FROM t CROSS JOIN f
    )
    SELECT n AS n_days, k AS n_groups,
           CAST(n * a - CAST(s AS HUGEINT) * s * p AS BIGINT)
             AS ss_between_np,
           CAST((n * CAST(q AS HUGEINT) - CAST(s AS HUGEINT) * s) * p
                AS BIGINT) AS ss_total_np,
           CAST((n * a - CAST(s AS HUGEINT) * s * p) * 1000000
                // ((n * CAST(q AS HUGEINT) - CAST(s AS HUGEINT) * s)
                    * p) AS BIGINT) AS eta2_micro,
           CAST((n * a - CAST(s AS HUGEINT) * s * p) * (n - k) * 1000
                // (((n * CAST(q AS HUGEINT) - CAST(s AS HUGEINT) * s)
                     * p - (n * a - CAST(s AS HUGEINT) * s * p))
                    * (k - 1)) AS BIGINT) AS f_milli
    FROM alg
    """,
)
def analytics_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA on day-of-week — is weekday a real factor in daily
    volume? The classical decomposition SS_total = SS_between + SS_within
    carried out in EXACT integers: multiplying through by n·P (P = Π
    group sizes, ≤ 5^7 here) clears every fractional group mean, so
    SS_between·n·P = n·Σ_w S_w²·(P/n_w) − S²·P and SS_total·n·P =
    (n·Σx² − S²)·P are exact BIGINTs (HUGEINT ⇄ DECIMAL(38) for the
    products); η² (effect size) and the F statistic are then single
    scaled divisions of these integers — no float enters anywhere. The
    group arrays fold in dow-sorted order on both engines (integer
    product/sums are order-free anyway; the sort pins it).

    Scale: daily rollup is the only corpus-scaled pass; the group and
    total summaries are ≤7 and 1 rows; folds run over 7-element
    arrays. The same construction generalizes to any low-cardinality
    factor (source, lang, shard)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    d = d.select(
        "day", F.dayofweek("day").cast("bigint").alias("dow"), "x"
    )
    g = d.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("nw"),
        F.sum("x").cast("bigint").alias("sw"),
    )
    t = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
        F.count_distinct("dow").cast("bigint").alias("k"),
    )
    # p and a are bounded control scalars (≤7 group rows collected) —
    # a lazy 1-row × 1-row cross join would plan as BNLJ (sweep-
    # rejected); the collect() is the sanctioned pattern.
    grows = g.collect()
    p = 1
    for r in grows:
        p *= int(r["nw"])
    a = sum(int(r["sw"]) ** 2 * (p // int(r["nw"])) for r in grows)
    alg = t.selectExpr(
        "n",
        "s",
        "q",
        "k",
        f"CAST({p} AS BIGINT) AS p",
        f"CAST('{a}' AS DECIMAL(38,0)) AS a",
    )
    return alg.selectExpr(
        "n AS n_days",
        "k AS n_groups",
        "CAST(n * a - CAST(s AS DECIMAL(38,0)) * s * p AS BIGINT)"
        " AS ss_between_np",
        "CAST((n * CAST(q AS DECIMAL(38,0))"
        " - CAST(s AS DECIMAL(38,0)) * s) * p AS BIGINT) AS ss_total_np",
        "CAST((n * a - CAST(s AS DECIMAL(38,0)) * s * p) * 1000000"
        " div ((n * CAST(q AS DECIMAL(38,0))"
        " - CAST(s AS DECIMAL(38,0)) * s) * p) AS BIGINT) AS eta2_micro",
        "CAST((n * a - CAST(s AS DECIMAL(38,0)) * s * p) * (n - k) * 1000"
        " div (((n * CAST(q AS DECIMAL(38,0))"
        " - CAST(s AS DECIMAL(38,0)) * s) * p"
        " - (n * a - CAST(s AS DECIMAL(38,0)) * s * p)) * (k - 1))"
        " AS BIGINT) AS f_milli",
    )


# ---------------------------------------------------------------------------
# Survivorship merge (golden-record consolidation of exact-dup groups)
# ---------------------------------------------------------------------------


@query(
    "dedup_survivorship_merge",
    oracle="""
    WITH g AS (
      SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS grp,
             doc_id, lang, source, n_chars
      FROM documents
    ),
    m AS (
      SELECT grp,
             CAST(min(doc_id) AS BIGINT) AS survivor_id,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(max(n_chars) AS BIGINT) AS n_chars,
             array_to_string(list(DISTINCT lang ORDER BY lang), ',')
               AS langs,
             array_to_string(list(DISTINCT source ORDER BY source), ',')
               AS sources
      FROM g GROUP BY grp
    ),
    cl AS (
      SELECT grp, lang AS canonical_lang FROM (
        SELECT grp, lang, count(*) AS c,
               row_number() OVER (PARTITION BY grp
                 ORDER BY count(*) DESC, lang) AS rn
        FROM g GROUP BY grp, lang
      ) WHERE rn = 1
    )
    SELECT m.survivor_id, m.n_copies, m.n_chars, m.langs, m.sources,
           cl.canonical_lang
    FROM m JOIN cl ON cl.grp = m.grp
    WHERE m.n_copies > 1
    """,
)
def dedup_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVORSHIP MERGE (golden-record consolidation) — the step
    AFTER dedup detection that MDM pipelines run: for every duplicate
    group (here keyed by the md5 of the first-8-words fingerprint —
    the crude cluster key standing in for whatever the upstream dedup
    tier emitted; byte-exact md5(text) finds zero groups in the small
    fixtures), emit ONE merged record under
    deterministic field-level survivorship rules — lowest id survives,
    metadata unions canonicalize (sorted distinct joins — the
    array-order gotcha), the canonical language is the group MODE with
    a total tie-break (the agg_mode_exact lesson: native mode() is
    tie-nondeterministic). Only multi-copy groups emit, so the output
    IS the merge worklist.

    Scale: one partial-agg'd groupBy on the content hash (the
    dedup_exact shuffle) + one mode sub-aggregate sharing the same
    grp partitioning; no pairs, no text shuffled beyond the 32-char
    digest."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("grp"),
        "doc_id",
        "lang",
        "source",
        "n_chars",
    )
    m = g.groupBy("grp").agg(
        F.min("doc_id").cast("bigint").alias("survivor_id"),
        F.count("*").cast("bigint").alias("n_copies"),
        F.max("n_chars").cast("bigint").alias("n_chars"),
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias(
            "langs"
        ),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources"
        ),
    )
    cl = (
        g.groupBy("grp", "lang")
        .agg(F.count("*").alias("c"))
        .select(
            "grp",
            "lang",
            F.row_number()
            .over(
                Window.partitionBy("grp").orderBy(
                    F.desc("c"), F.asc("lang")
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("grp", F.col("lang").alias("canonical_lang"))
    )
    return (
        m.where(F.col("n_copies") > 1)
        .join(cl, "grp")
        .select(
            "survivor_id",
            "n_copies",
            "n_chars",
            "langs",
            "sources",
            "canonical_lang",
        )
    )


# ---------------------------------------------------------------------------
# Lag-7 autocorrelation of daily volume (exact integer ACF point)
# ---------------------------------------------------------------------------


@query(
    "events_autocorr_lag7",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM d
    ),
    p AS (
      SELECT d.x AS x0,
             lead(d.x, 7) OVER (ORDER BY d.day) AS x7
      FROM d
    ),
    alg AS (
      SELECT t.n, t.s,
             CAST(sum((CAST(p.x0 AS HUGEINT) * t.n - t.s)
                      * (CAST(p.x7 AS HUGEINT) * t.n - t.s))
                  AS HUGEINT) AS num,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM p CROSS JOIN t WHERE p.x7 IS NOT NULL
      GROUP BY t.n, t.s
    ),
    den AS (
      SELECT CAST(sum((CAST(d.x AS HUGEINT) * t.n - t.s)
                      * (CAST(d.x AS HUGEINT) * t.n - t.s))
                  AS HUGEINT) AS den
      FROM d CROSS JOIN t
    )
    SELECT alg.n AS n_days, alg.n_pairs,
           CAST(alg.num * 1000000 // den.den AS BIGINT) AS acf7_micro
    FROM alg CROSS JOIN den
    """,
)
def events_autocorr_lag7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-7 AUTOCORRELATION of daily event volume — THE weekly-
    periodicity statistic (the ACF point every seasonal model checks
    before committing to a 7-day cycle; pairs with analytics_anova_dow,
    which tests the same structure as a factor). Exact integers by the
    n-scaling trick: centering x − S/n becomes x·n − S after scaling
    by n, so the lag products Σ(x_t·n − S)(x_{t+7}·n − S) and the
    variance Σ(x·n − S)² are exact HUGEINT ⇄ DECIMAL(38) sums and the
    ACF is ONE scaled division (sign-safe: trunc-div is engine-neutral
    on integers, measured r12).

    Scale: the corpus collapses to the daily summary once — eagerly
    checkpointed (r15: the id's three driver actions — n/S collect,
    denominator collect, the final numerator aggregate — each re-ran
    the corpus collapse; ≤ days rows is the cheapest possible
    checkpoint); the lead window, both reductions, and the division
    run on the calendar-bounded frame. The n/S scalars ride a
    broadcast 1-row cross join on the SUMMARY (≤ days rows — the
    sanctioned 1-row×small-N analytics join, not a data-path BNLJ)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("x")
    ).localCheckpoint()
    t = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    trow = t.collect()[0]
    n, s = int(trow["n"]), int(trow["s"])
    p = d.select(
        F.col("x").alias("x0"),
        F.lead("x", 7).over(Window.orderBy("day")).alias("x7"),
    )
    alg = p.where(F.col("x7").isNotNull()).agg(
        F.sum(
            (F.col("x0").cast("decimal(38,0)") * n - s)
            * (F.col("x7").cast("decimal(38,0)") * n - s)
        ).alias("num"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )
    den = d.agg(
        F.sum(
            (F.col("x").cast("decimal(38,0)") * n - s)
            * (F.col("x").cast("decimal(38,0)") * n - s)
        ).alias("den")
    )
    drow = den.collect()[0]
    return alg.selectExpr(
        f"CAST({n} AS BIGINT) AS n_days",
        "n_pairs",
        f"CAST(num * 1000000 div CAST('{int(drow['den'])}' AS"
        " DECIMAL(38,0)) AS BIGINT) AS acf7_micro",
    )


# ---------------------------------------------------------------------------
# Payload byte-value histogram (corpus byte distribution)
# ---------------------------------------------------------------------------


@query(
    "multimodal_byte_histogram",
    oracle="""
    WITH b AS (
      SELECT unnest(generate_series(1, octet_length(encode(text))))
               AS i,
             hex(encode(text)) AS h
      FROM documents
    )
    SELECT CAST(('0x' || substr(h, i*2-1, 2))::BIGINT AS INT)
             AS byte_value,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY 1
    """,
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAYLOAD BYTE-VALUE HISTOGRAM — the corpus-level byte distribution
    (≤256 rows): the cheapest corruption / encoding / format-drift
    detector for binary columns (truncated UTF-8, unexpected control
    bytes, and header-vs-payload mix shifts all show up here before any
    decoder runs). The Spark side is the multimodal execution shape —
    numpy bincount per Arrow batch inside mapInPandas, emitting ≤256
    partial rows per batch that one tiny groupBy folds (map-side
    combine in Python, merge in the engine — the mergeable-summary
    pattern at the byte level); the oracle re-counts every byte via
    hex-pair arithmetic, so an independent path checks the decode.

    Scale: one pass, payload bytes never shuffle — only ≤256-row
    partials do; the report is domain-bounded regardless of corpus
    size."""
    docs = load_table(spark, sf_dir, "documents").select("text")

    def bincounts(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            total = np.zeros(256, dtype="int64")
            for text in pdf["text"]:
                b = np.frombuffer(text.encode("utf-8"), dtype="uint8")
                total += np.bincount(b, minlength=256)
            nz = np.nonzero(total)[0]
            yield pd.DataFrame(
                {"byte_value": nz.astype("int32"), "n": total[nz]}
            )

    partial = docs.mapInPandas(bincounts, "byte_value int, n long")
    return partial.groupBy("byte_value").agg(
        F.sum("n").cast("bigint").alias("n")
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (lang × source contingency)
# ---------------------------------------------------------------------------


@query(
    "analytics_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY 1, 2
    ),
    r AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
    c AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    cell AS (
      SELECT o.lang, o.source,
             CAST((CAST(o.obs AS HUGEINT) * t.n - CAST(r.rt AS HUGEINT)
                   * c.ct)
                  * (CAST(o.obs AS HUGEINT) * t.n
                     - CAST(r.rt AS HUGEINT) * c.ct) * 1000000
                  // (CAST(t.n AS HUGEINT) * r.rt * c.ct) AS BIGINT)
               AS term_micro
      FROM o
      JOIN r ON r.lang = o.lang
      JOIN c ON c.source = o.source
      CROSS JOIN t
    )
    SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cols,
           CAST((SELECT count(*) FROM cell) AS BIGINT) AS n_cells,
           CAST(((SELECT count(*) FROM r) - 1)
                * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof,
           CAST(sum(term_micro) AS BIGINT) AS chi2_micro
    FROM cell
    """,
)
def analytics_chi2_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """χ² TEST OF INDEPENDENCE on the lang × source contingency table —
    is the language mix independent of the source (the dataset-bias
    screen run before mixing sources into a training corpus)? The
    classical Σ(O−E)²/E with E = r·c/N is cleared to integers per
    CELL: term = (O·N − r·c)²·10⁶ // (N·r·c) — each term floored ONCE
    to integer micro-units (the bigram-LM per-term idiom; all
    quantities positive), then summed exactly, so the statistic is
    order-free. dof = (rows−1)(cols−1) rides along; the critical-value
    comparison is a driver-side lookup over these integers. Zero-count
    cells contribute no row (GROUP BY only sees observed pairs) — the
    convention both engines share; E > 0 always since marginals are
    positive.

    Scale: one (lang, source) collapse — the contingency table — then
    marginals and cell terms on the ≤|langs|·|sources| summary; the
    broadcast of three tiny marginal tables is the only join traffic.
    The summary is eagerly checkpointed (r15): the id's five separate
    actions (total collect, row/col counts, the final agg whose plan
    embeds o three more times) each re-ran the corpus collapse —
    6 document scans for a ≤|langs|·|sources|-row table."""
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("obs")
    ).localCheckpoint()
    r = o.groupBy("lang").agg(F.sum("obs").cast("bigint").alias("rt"))
    c = o.groupBy("source").agg(F.sum("obs").cast("bigint").alias("ct"))
    trow = o.agg(F.sum("obs")).collect()[0][0]
    n = int(trow)
    cell = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .selectExpr(
            f"CAST((CAST(obs AS DECIMAL(38,0)) * {n}L"
            f" - CAST(rt AS DECIMAL(38,0)) * ct)"
            f" * (CAST(obs AS DECIMAL(38,0)) * {n}L"
            f" - CAST(rt AS DECIMAL(38,0)) * ct) * 1000000"
            f" div (CAST({n} AS DECIMAL(38,0)) * rt * ct) AS BIGINT)"
            " AS term_micro"
        )
    )
    nr = r.count()
    nc = c.count()
    return cell.agg(
        F.lit(nr).cast("bigint").alias("n_rows"),
        F.lit(nc).cast("bigint").alias("n_cols"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.lit((nr - 1) * (nc - 1)).cast("bigint").alias("dof"),
        F.sum("term_micro").cast("bigint").alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE surface (dynamic SQL with session variables)
# ---------------------------------------------------------------------------


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE surface — Spark 4's dynamic-SQL statement
    (SQL-standard two-step: the query TEXT lives in a session VARIABLE,
    parameters bind positionally via USING) — the mechanism BI layers
    and stored-procedure ports use for runtime-assembled statements,
    demonstrated with injection-safe positional binding rather than
    string concatenation (the bound value never parses as SQL). The
    executed text is the oracle's own aggregation, so the hash
    certifies that the dynamic path plans and runs identically to the
    static one.

    Scale: EXECUTE IMMEDIATE is pure front-end — the parsed plan is
    the same Catalyst plan as the static text (one partial-agg'd
    groupBy over the pruned scan); zero runtime overhead past parse."""
    from kdcloganalyzer_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_li_exec_imm"
    )
    spark.sql("DECLARE OR REPLACE stmt_r12 STRING")
    spark.sql(
        "SET VAR stmt_r12 = 'SELECT l_returnflag,"
        " CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
        " AS BIGINT) AS rev_cents"
        " FROM v_li_exec_imm WHERE l_quantity >= ?"
        " GROUP BY l_returnflag'"
    )
    return spark.sql("EXECUTE IMMEDIATE stmt_r12 USING 30")


# ---------------------------------------------------------------------------
# Mann–Whitney U (weekend vs weekday, exact doubled-rank integers)
# ---------------------------------------------------------------------------


@query(
    "analytics_mann_whitney",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    f AS (
      SELECT day, x,
             date_part('dow', day) IN (0, 6) AS is_weekend
      FROM d
    ),
    r AS (
      SELECT is_weekend,
             2 * (rank() OVER (ORDER BY x) - 1)
               + count(*) OVER (PARTITION BY x) + 1 AS r2
      FROM f
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN is_weekend THEN r2 ELSE 0 END)
                  AS BIGINT) AS r2w,
             CAST(sum(CASE WHEN is_weekend THEN 1 ELSE 0 END)
                  AS BIGINT) AS nw,
             CAST(sum(CASE WHEN is_weekend THEN 0 ELSE 1 END)
                  AS BIGINT) AS nd
      FROM r
    )
    SELECT nw AS n_weekend, nd AS n_weekday,
           CAST(r2w - nw * (nw + 1) AS BIGINT) AS u2_weekend,
           CAST(2 * nw * nd - (r2w - nw * (nw + 1)) AS BIGINT)
             AS u2_weekday,
           CAST((r2w - nw * (nw + 1)) * 1000000 // (2 * nw * nd)
                AS BIGINT) AS auc_micro,
           (r2w - nw * (nw + 1)) > nw * nd AS weekend_higher
    FROM s
    """,
)
def analytics_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–WHITNEY U — the nonparametric two-sample test (weekend vs
    weekday daily volume), exact to the last tie: average ranks for
    tied values are half-integers, so everything computes in DOUBLED
    ranks — r2 = 2·(rank−1) + tie_count + 1 is an exact integer, the
    doubled statistic U2 = ΣR2 − n_w(n_w+1) is exact, the two groups'
    U2 cross-foot to 2·n_w·n_d, and U/(n_w·n_d) — the probability of
    superiority, i.e. the AUC of 'weekend' as a classifier of volume —
    is ONE scaled division. No normal approximation enters the emitted
    integers; the z-test against them is a driver-side formula.

    Scale: daily collapse once; rank and tie-count windows run over
    the calendar-bounded summary (a global sort of ~days rows); the
    rest is a 1-row reduction."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    f = d.select(
        "x", F.dayofweek("day").isin(1, 7).alias("is_weekend")
    )
    r = f.select(
        "is_weekend",
        (
            2 * (F.rank().over(Window.orderBy("x")) - 1)
            + F.count("*").over(Window.partitionBy("x"))
            + 1
        ).alias("r2"),
    )
    s = r.agg(
        F.sum(F.when(F.col("is_weekend"), F.col("r2")).otherwise(0))
        .cast("bigint")
        .alias("r2w"),
        F.sum(F.when(F.col("is_weekend"), 1).otherwise(0))
        .cast("bigint")
        .alias("nw"),
        F.sum(F.when(F.col("is_weekend"), 0).otherwise(1))
        .cast("bigint")
        .alias("nd"),
    )
    return s.selectExpr(
        "nw AS n_weekend",
        "nd AS n_weekday",
        "CAST(r2w - nw * (nw + 1) AS BIGINT) AS u2_weekend",
        "CAST(2 * nw * nd - (r2w - nw * (nw + 1)) AS BIGINT)"
        " AS u2_weekday",
        "CAST((r2w - nw * (nw + 1)) * 1000000 div (2 * nw * nd)"
        " AS BIGINT) AS auc_micro",
        "(r2w - nw * (nw + 1)) > nw * nd AS weekend_higher",
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (daily count vs daily value mass)
# ---------------------------------------------------------------------------


@query(
    "analytics_spearman_corr",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS val_c
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT 2 * (rank() OVER (ORDER BY cnt) - 1)
               + count(*) OVER (PARTITION BY cnt) + 1 AS rx,
             2 * (rank() OVER (ORDER BY val_c) - 1)
               + count(*) OVER (PARTITION BY val_c) + 1 AS ry
      FROM d
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx,
             CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
             CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
             CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
      FROM r
    )
    SELECT n AS n_days,
           CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
           CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
           CAST(n * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
           CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
                // CAST(round(sqrt(CAST(
                     (n * sxx - CAST(sx AS HUGEINT) * sx)
                     * (n * syy - CAST(sy AS HUGEINT) * sy) AS DOUBLE)))
                   AS HUGEINT) AS BIGINT) AS rho_micro,
           4 * (n * sxy - CAST(sx AS HUGEINT) * sy)
             * (n * sxy - CAST(sx AS HUGEINT) * sy)
             > (n * sxx - CAST(sx AS HUGEINT) * sx)
               * (n * syy - CAST(sy AS HUGEINT) * sy)
             AND (n * sxy - CAST(sx AS HUGEINT) * sy) > 0
             AS strong_positive
    FROM s
    """,
)
def analytics_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION between daily event count and daily
    value mass — the monotone-association test that survives outliers
    and nonlinearity (does busier mean richer?). Doubled average ranks
    (the Mann–Whitney idiom) keep tie handling exact-integer; the
    Pearson-on-ranks algebra (n·Σxy − ΣxΣy etc.) is exact
    HUGEINT ⇄ DECIMAL(38); the |ρ| > 0.5 strength flag is the fully
    exact cross-multiplication 4·num² > den_x·den_y; ρ itself needs
    ONE sqrt — of an exact integer product through the correctly-
    rounded cast→double→sqrt→round chain both engines share — then one
    scaled division.

    Scale: daily collapse once; two rank windows + a 1-row reduction
    over the calendar summary."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("val_c"),
    )
    r = d.select(
        (
            2 * (F.rank().over(Window.orderBy("cnt")) - 1)
            + F.count("*").over(Window.partitionBy("cnt"))
            + 1
        ).alias("rx"),
        (
            2 * (F.rank().over(Window.orderBy("val_c")) - 1)
            + F.count("*").over(Window.partitionBy("val_c"))
            + 1
        ).alias("ry"),
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("ry")).alias(
            "sxy"
        ),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("rx")).alias(
            "sxx"
        ),
        F.sum(F.col("ry").cast("decimal(38,0)") * F.col("ry")).alias(
            "syy"
        ),
    )
    return s.selectExpr(
        "n AS n_days",
        "CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS num",
        "CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)"
        " AS den_x",
        "CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)"
        " AS den_y",
        "CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000"
        " div CAST(round(sqrt(CAST("
        "(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
        " * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy) AS DOUBLE)))"
        " AS DECIMAL(38,0)) AS BIGINT) AS rho_micro",
        "4 * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
        " * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
        " > (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
        " * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy)"
        " AND (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) > 0"
        " AS strong_positive",
    )


# ---------------------------------------------------------------------------
# Multi-character field separator CSV scan (round-trip proof)
# ---------------------------------------------------------------------------


def _multisep_dir_for_sf(sf_dir: str) -> str:
    """Staged '||' export path, keyed on the SOURCE parquet's content
    token (mtime_ns + size), not just the sf basename — a regenerated
    documents fixture (or a different tree sharing the sf tag) can
    never silently reuse a stale export (ADVICE r12). Spark-side only;
    the oracle reads the documents view directly."""
    import os

    tag = os.path.basename(sf_dir.rstrip("/"))
    st = os.stat(f"{sf_dir}/documents.parquet")
    return (
        f"/tmp/kdcspark_multisep_{tag}_{st.st_mtime_ns % 10**9}_{st.st_size}"
    )


@query(
    "scan_csv_multichar_sep",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS key_sum
    FROM documents GROUP BY lang, source
    """,
)
def scan_csv_multichar_sep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-CHARACTER FIELD SEPARATOR scan — the '||'-delimited export
    format half the enterprise ETL world still emits (chosen exactly
    because single chars collide with free text): document metadata is
    staged once as ``a||b||c||d`` lines (format via concat_ws,
    executor-side, atomic publish via build-dir rename), then re-read
    through Spark's multi-char ``sep`` CSV reader with an explicit
    schema. The aggregate must equal the same rollup computed straight
    from the parquet (the oracle) — the round-trip is provably
    lossless, certifying the multi-char tokenizer itself.

    Scale: '||'-delimited text is newline-splittable, so the scan
    parallelizes by byte ranges like any CSV; multi-char separator
    matching stays in uniVocity's JVM tokenizer (no regex fallback,
    no Python)."""
    import os
    import shutil

    base = _multisep_dir_for_sf(sf_dir)
    if not os.path.isdir(base):
        build = f"{base}.build.{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        # concat_ws SKIPS a NULL argument entirely, which would shift
        # every later column one slot left on read-back (ADVICE r12);
        # coalescing each field to '' keeps the column count fixed, so
        # an unexpected NULL surfaces as a clean per-value mismatch
        # instead of a shifted row.
        cols = ["doc_id", "lang", "source", "n_chars"]
        load_table(spark, sf_dir, "documents").select(
            F.concat_ws(
                "||",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit(""))
                    for c in cols
                ],
            ).alias("value")
        ).coalesce(2).write.mode("overwrite").text(build)
        try:
            os.rename(build, base)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    rec = spark.read.csv(
        base,
        sep="||",
        schema="doc_id LONG, lang STRING, source STRING, n_chars LONG",
    )
    return rec.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum("doc_id").cast("bigint").alias("key_sum"),
    )


# ---------------------------------------------------------------------------
# Dedup-rate growth curve (nested md5-prefix subsamples)
# ---------------------------------------------------------------------------


@query(
    "pipeline_dedup_rate_curve",
    oracle="""
    WITH g AS (
      SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS grp,
             CAST(('0x' || substr(md5('curve#'
                    || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 4
                  AS BIGINT) AS b
      FROM documents
    ),
    c AS (
      SELECT grp,
             sum(CASE WHEN b <= 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN b <= 1 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN b <= 2 THEN 1 ELSE 0 END) AS c2,
             sum(CASE WHEN b <= 3 THEN 1 ELSE 0 END) AS c3
      FROM g GROUP BY grp
    ),
    t AS (
      SELECT unnest([0, 1, 2, 3]) AS quartile
    )
    SELECT t.quartile,
           CAST(sum(CASE t.quartile WHEN 0 THEN c0 WHEN 1 THEN c1
                    WHEN 2 THEN c2 ELSE c3 END) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN (CASE t.quartile WHEN 0 THEN c0
                    WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST((sum(CASE t.quartile WHEN 0 THEN c0 WHEN 1 THEN c1
                     WHEN 2 THEN c2 ELSE c3 END)
                 - sum(CASE WHEN (CASE t.quartile WHEN 0 THEN c0
                       WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END) > 0
                       THEN 1 ELSE 0 END)) * 1000000
                // sum(CASE t.quartile WHEN 0 THEN c0 WHEN 1 THEN c1
                       WHEN 2 THEN c2 ELSE c3 END) AS BIGINT)
             AS dup_rate_micro
    FROM c CROSS JOIN t
    GROUP BY t.quartile
    """,
)
def pipeline_dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP-RATE GROWTH CURVE — how duplication scales with corpus
    size: nested 25/50/75/100% subsamples (deterministic seeded-md5
    quartile buckets, so each prefix CONTAINS the previous — the only
    way the curve is monotone-meaningful) each report docs, unique
    fingerprints, and the dup rate. Real corpora show superlinear
    duplicate growth (unique content follows Heaps' law), and this
    curve is what extrapolates dedup savings from a pilot slice to the
    full crawl before anyone pays for the full run. One fingerprint
    groupBy computes all four prefixes at once: per-group cumulative
    bucket counts c0..c3, then four prefix rollups over the group
    summary — the corpus is scanned ONCE, never per point.

    Scale: the fingerprint collapse is the dedup_exact shuffle; the
    4× expansion happens on the GROUP summary (4 rows per group,
    constant), not raw docs; output is 4 rows."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("grp"),
        F.expr(
            "CAST(conv(substring(md5(concat('curve#',"
            " CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 4"
        ).alias("b"),
    )
    c = g.groupBy("grp").agg(
        *[
            F.sum(F.when(F.col("b") <= q, 1).otherwise(0)).alias(f"c{q}")
            for q in range(4)
        ]
    )
    t = c.select(
        "c0", "c1", "c2", "c3",
        F.explode(F.array(*[F.lit(q) for q in range(4)])).alias(
            "quartile"
        ),
    ).select(
        "quartile",
        F.expr(
            "CASE quartile WHEN 0 THEN c0 WHEN 1 THEN c1"
            " WHEN 2 THEN c2 ELSE c3 END"
        ).alias("cq"),
    )
    return t.groupBy("quartile").agg(
        F.sum("cq").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("cq") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unique"),
        F.expr(
            "CAST((sum(cq) - sum(CASE WHEN cq > 0 THEN 1 ELSE 0 END))"
            " * 1000000 div sum(cq) AS BIGINT)"
        ).alias("dup_rate_micro"),
    )


# ---------------------------------------------------------------------------
# ZIP local-file-header build + probe (variable-offset byte layout)
# ---------------------------------------------------------------------------


@query(
    "multimodal_zip_probe",
    oracle="""
    SELECT doc_id,
           true AS magic_ok,
           CAST(8 AS BIGINT) AS method,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
           'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS member_name,
           CAST(30 + length('doc_' || CAST(doc_id AS VARCHAR) || '.txt')
                AS BIGINT) AS data_offset
    FROM documents
    """,
)
def multimodal_zip_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP LOCAL-FILE-HEADER build + probe — the fifth byte layout of
    the multimodal tier (PNG/JPEG BE, GIF LE-u16, WAV LE-u32) and the
    first with VARIABLE-OFFSET fields: assemble a spec-shaped local
    header — PK\\x03\\x04, version 20, method LE-u16, sizes LE-u32,
    name-length LE-u16, the member name, then the payload — and parse
    back method, payload length, the member NAME (substring at a
    length read from the header itself — offset arithmetic a fixed
    layout never exercises), and the computed data offset. A hash
    match proves build and parse agree through the variable-length
    indirection. Documented simplification: method=8 is declared but
    the payload is stored, and the single-member central directory is
    omitted — header mechanics, not a zip implementation.

    Scale: per-row codegen; payload bytes project away before any
    shuffle (the multimodal rule)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    name = F.concat(
        F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
    )

    def _le2(col):
        b = [
            F.lpad(F.hex((col / (1 << (8 * i))).cast("long") % 256), 2, "0")
            for i in range(2)
        ]
        return F.unhex(F.concat(*b))

    def _le4(col):
        b = [
            F.lpad(F.hex((col / (1 << (8 * i))).cast("long") % 256), 2, "0")
            for i in range(4)
        ]
        return F.unhex(F.concat(*b))

    n_bytes = F.length(payload).cast("long")
    zipb = F.concat(
        F.expr("X'504B0304'"),  # PK\3\4
        _le2(F.lit(20)),  # version needed
        _le2(F.lit(0)),  # flags
        _le2(F.lit(8)),  # method (deflate declared)
        _le4(F.lit(0)),  # mtime/mdate
        _le4(F.lit(0)),  # crc32 (omitted: header mechanics only)
        _le4(n_bytes),  # compressed size (stored)
        _le4(n_bytes),  # uncompressed size
        _le2(F.length(name)),  # name length
        _le2(F.lit(0)),  # extra length
        F.encode(name, "UTF-8"),
        payload,
    )
    built = docs.select("doc_id", zipb.alias("z"))

    def _u16(pos):
        return (
            F.conv(F.hex(F.expr(f"substring(z, {pos}, 1)")), 16, 10)
            .cast("long")
            + 256
            * F.conv(
                F.hex(F.expr(f"substring(z, {pos + 1}, 1)")), 16, 10
            ).cast("long")
        )

    def _u32(pos):
        return _u16(pos) + 65536 * _u16(pos + 2)

    name_len = _u16(27)
    return built.select(
        "doc_id",
        (F.expr("substring(z, 1, 4)") == F.expr("X'504B0304'")).alias(
            "magic_ok"
        ),
        _u16(9).cast("bigint").alias("method"),
        _u32(23).cast("bigint").alias("payload_len"),
        F.expr(
            "decode(substring(z, 31, conv(hex(substring(z, 27, 1)), 16,"
            " 10) + 256 * conv(hex(substring(z, 28, 1)), 16, 10)),"
            " 'UTF-8')"
        ).alias("member_name"),
        (30 + name_len).cast("bigint").alias("data_offset"),
    )


# ---------------------------------------------------------------------------
# Local peak detection with windowed prominence (signal-processing verb)
# ---------------------------------------------------------------------------


@query(
    "events_peak_detection",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, x,
             lag(x) OVER win AS xp, lead(x) OVER win AS xn,
             min(x) OVER (win ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS lmin,
             min(x) OVER (win ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
               AS rmin
      FROM d
      WINDOW win AS (ORDER BY day)
    )
    SELECT day, x AS n_events,
           CAST(lmin AS BIGINT) AS left_min3,
           CAST(rmin AS BIGINT) AS right_min3,
           CAST(x - greatest(lmin, rmin) AS BIGINT) AS prominence
    FROM w
    WHERE xp IS NOT NULL AND xn IS NOT NULL AND x > xp AND x > xn
    """,
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL PEAK DETECTION with windowed prominence — the signal-
    processing verb behind spike triage: a day is a peak when it
    strictly exceeds both neighbors (ties lose on both sides —
    deterministic; series edges are never peaks), and its ±3-day
    prominence is the height above the HIGHER of the two flanking
    minima (the scipy find_peaks 'prominence' idea, window-bounded so
    it stays one pass — true prominence chases monotone runs
    arbitrarily far, which is the gaps-and-islands construction if
    needed). All exact integers; four window functions share ONE
    ordered frame spec.

    Scale: daily collapse once; every window rides the same
    calendar-bounded sort. Per-series peaks add partitionBy."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    win = Window.orderBy("day")
    w = d.select(
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
        "day",
        F.col("x").alias("n_events"),
        F.col("lmin").cast("bigint").alias("left_min3"),
        F.col("rmin").cast("bigint").alias("right_min3"),
        (F.col("x") - F.greatest("lmin", "rmin"))
        .cast("bigint")
        .alias("prominence"),
    )


# ---------------------------------------------------------------------------
# Curation gate ablation matrix (independent-flag overlap cells)
# ---------------------------------------------------------------------------


def _ablation_oracle() -> str:
    # Build from the SAME named flag-CTE constant the funnel oracle is
    # built from (curation.FUNNEL_FLAGS_CTE) — the two reports provably
    # share one flag definition, with no textual slicing of another
    # id's registered SQL (ADVICE r12).
    from kdcloganalyzer_spark.plans.curation import FUNNEL_FLAGS_CTE

    return (
        FUNNEL_FLAGS_CTE
        + """SELECT q_keep, d_keep, l_keep, s_keep,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(count(*) * 1000000 // sum(count(*)) OVER ()
                AS BIGINT) AS share_micro
    FROM m GROUP BY q_keep, d_keep, l_keep, s_keep
    """
    )


@query("pipeline_gate_ablation", oracle=_ablation_oracle())
def pipeline_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURATION GATE ABLATION MATRIX — the question the sequential
    funnel report cannot answer: which gates do the work, and how much
    do they OVERLAP? Every document lands in one of the 2⁴ cells of
    the (quality, exact-dup, line-dup, sample) flag cube; marginal
    kill rates, pairwise overlaps, and 'only this gate fires' counts
    all read off the cells by inclusion-exclusion — the analysis run
    before dropping or reordering a gate. Flags come from the SAME
    shared _funnel_flags frame as pipeline_corpus_funnel /
    pipeline_corpus_release (one DAG, three reports), and the oracle
    reuses the funnel oracle's CTE prefix VERBATIM — the two ids
    provably test one flag definition.

    Scale: the flag derivation is the funnel's existing three
    shuffles; the cube rollup is ≤16 rows; the share window runs on
    that summary."""
    from kdcloganalyzer_spark.plans.curation import _funnel_flags

    m = _funnel_flags(spark, sf_dir)
    g = m.groupBy("q_keep", "d_keep", "l_keep", "s_keep").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    return g.select(
        "q_keep",
        "d_keep",
        "l_keep",
        "s_keep",
        "n_docs",
        "n_tokens",
        F.expr(
            "CAST(n_docs * 1000000 div sum(n_docs) OVER ()"
            " AS BIGINT)"
        ).alias("share_micro"),
    )


# ---------------------------------------------------------------------------
# AES encrypt/decrypt round-trip surface (deterministic ECB demo)
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(((octet_length(encode(source)) // 16) + 1) * 16 AS BIGINT)
             AS cipher_len
    FROM documents GROUP BY source
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES ENCRYPT/DECRYPT surface — column-level encryption round-trip
    (the at-rest-PII pattern: encrypt before the lake, decrypt in the
    governed view). ECB mode keeps the demo DETERMINISTIC (the default
    GCM salts a random IV per call — correct for production, un-hash-
    able here; the docstring trade-off IS the lesson: deterministic
    encryption leaks equality, which is also exactly what makes it
    joinable). The group key is the DECRYPTED ciphertext — counts can
    only match the oracle's plaintext rollup if decrypt(encrypt(x))
    == x for every row — and the ciphertext length must equal the
    PKCS#7 formula 16·(⌊len/16⌋+1), which the oracle computes without
    any AES at all.

    Scale: JVM codegen crypto expressions at the scan; zero shuffles
    beyond the rollup."""
    docs = load_table(spark, sf_dir, "documents")
    enc = docs.select(
        F.expr(
            f"aes_encrypt(source, '{_AES_KEY}', 'ECB')"
        ).alias("ct")
    )
    dec = enc.select(
        F.expr(
            f"CAST(aes_decrypt(ct, '{_AES_KEY}', 'ECB') AS STRING)"
        ).alias("source"),
        F.length("ct").cast("bigint").alias("clen"),
    )
    return dec.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("clen").cast("bigint").alias("cipher_len"),
    )


# ---------------------------------------------------------------------------
# Haar wavelet decomposition of daily volume (exact integer pyramid)
# ---------------------------------------------------------------------------


def _haar_oracle(levels: int = 5) -> str:
    ctes = [
        """
    dly AS (
      SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i,
             x
      FROM (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
      )
    ),
    l0 AS (
      SELECT g.j, CAST(coalesce(d.x, 0) AS BIGINT) AS a
      FROM (SELECT unnest(generate_series(0, 31)) AS j) g
      LEFT JOIN dly d ON d.i = g.j
    )"""
    ]
    parts = []
    for l in range(1, levels + 1):
        ctes.append(f"""
    l{l} AS (
      SELECT j // 2 AS j,
             CAST(sum(a) AS BIGINT) AS a,
             CAST(sum(CASE WHEN j % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS d
      FROM l{l - 1} GROUP BY j // 2
    )""")
        parts.append(
            f"SELECT {l} AS level, CAST(count(*) AS BIGINT) AS n_coeffs,"
            f" CAST(sum(abs(d)) AS BIGINT) AS l1_detail,"
            f" CAST(sum(d * d) AS BIGINT) AS l2_detail,"
            f" CAST(sum(a) AS BIGINT) AS approx_mass FROM l{l}"
        )
    return f"WITH {','.join(ctes)} " + " UNION ALL ".join(parts)


@query("events_haar_wavelet", oracle=_haar_oracle())
def events_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAAR WAVELET DECOMPOSITION of daily event volume — the
    multi-resolution energy pyramid (which time scale carries the
    variation: day-to-day jitter vs weekly swells vs the monthly
    trend). The UNNORMALIZED Haar transform keeps every coefficient an
    exact integer — level-l pairs reduce to sum a_even+a_odd and
    detail a_even−a_odd, no √2 anywhere — so per-level L1/L2 detail
    energies and the approximation mass are exact BIGINTs (the series
    zero-pads from 30 to 32 days; padding shows up as one documented
    edge detail). Five levels = five chained ≤32-row groupBys, the
    same pyramid a distributed implementation runs on per-partition
    segments before merging boundary pairs.

    Scale: the corpus collapses to the daily summary once; the
    pyramid is calendar-bounded (log₂(days) levels of shrinking
    frames). Per-series pyramids add partitionBy to every level.

    r15: the five chained groupBys each fed a separate union branch
    that re-executed the whole prefix DAG (70 Exchange nodes / 10
    event scans in the physical plan). Unnormalized-Haar identity:
    the level-l detail of group j is a SIGNED sum of the base slots
    j0 in [j·2^l, (j+1)·2^l) with sign = +1 iff bit (l−1) of j0 is 0
    (each level halves pairs of the previous approximations, so the
    sign telescopes to that single bit), and the approximation is the
    plain sum. Exploding the 5 level ids per base slot and grouping
    once by (level, j0 div 2^l) therefore reproduces every level's
    coefficients from the 32-row base in ONE aggregation — 5 Exchanges
    / 2 scans, identical integers (guide §2.4)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    idx = d.select(
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("bigint")
        .alias("i"),
        "x",
    )
    # Loud growth guard (ADVICE r12): the 32-slot pad also TRUNCATES —
    # both sides of the oracle pair drop day 33+ symmetrically, so a
    # fixture that ever spans more than 32 days would silently ignore
    # data while the hash stayed green. One bounded control-scalar
    # count (≤ a few dozen groups) makes that day fail loudly instead.
    n_days = d.count()
    assert n_days <= 32, (
        f"events span {n_days} days > the 32-slot Haar frame; widen the"
        " pyramid (next power of two) before trusting this decomposition"
    )
    base = (
        spark.range(32)
        .select(F.col("id").cast("bigint").alias("j"))
        .join(idx, F.col("j") == F.col("i"), "left")
        .select("j", F.coalesce("x", F.lit(0)).cast("bigint").alias("a"))
    )
    slots = base.select(
        "j",
        "a",
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("level"),
    )
    coeff = slots.groupBy(
        "level",
        F.expr("j div CAST(shiftleft(1, level) AS BIGINT)").alias("jj"),
    ).agg(
        F.sum("a").cast("bigint").alias("a"),
        F.sum(
            F.expr(
                "CASE WHEN (j div CAST(shiftleft(1, level - 1) AS"
                " BIGINT)) % 2 = 0 THEN a ELSE -a END"
            )
        )
        .cast("bigint")
        .alias("d"),
    )
    return (
        coeff.groupBy("level")
        .agg(
            F.count("*").cast("bigint").alias("n_coeffs"),
            F.sum(F.abs("d")).cast("bigint").alias("l1_detail"),
            F.sum(F.col("d") * F.col("d"))
            .cast("bigint")
            .alias("l2_detail"),
            F.sum("a").cast("bigint").alias("approx_mass"),
        )
        .select(
            F.col("level").cast("int").alias("level"),
            "n_coeffs",
            "l1_detail",
            "l2_detail",
            "approx_mass",
        )
    )


# ---------------------------------------------------------------------------
# Kendall tau-b (exact pairwise concordance with tie corrections)
# ---------------------------------------------------------------------------


@query(
    "analytics_kendall_tau",
    oracle="""
    WITH d AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             x, y
      FROM (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS y
        FROM events GROUP BY 1
      )
    ),
    p AS (
      SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
      FROM (SELECT i, x, y,
                   unnest(generate_series(1, i - 1)) AS j FROM d) b
      JOIN d a ON a.i = b.j
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS dd,
             CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS tx,
             CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS ty,
             CAST(count(*) AS BIGINT) AS n0
      FROM p
    )
    SELECT n0, c AS concordant, dd AS discordant,
           tx AS tied_x, ty AS tied_y,
           CAST((c - dd) * 1000000
                // CAST(round(sqrt(CAST((n0 - tx) * (n0 - ty)
                                        AS DOUBLE))) AS BIGINT)
                AS BIGINT) AS tau_b_micro,
           4 * (c - dd) * (c - dd) > (n0 - tx) * (n0 - ty)
             AND c > dd AS strong_positive
    FROM s
    """,
)
def analytics_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL τ-b between daily event count and daily value mass —
    the third rank-correlation lens (Spearman weights displacement,
    Kendall counts INVERSIONS; robustness folk theorem: τ's influence
    function is bounded where Spearman's isn't). Exact pairwise
    concordance: the C(n,2) pair expansion is the theil_sen
    explode+equi-join — calendar-bounded, never a theta self-join,
    with the same i ≥ 2 guard against Spark's descending sequence(1,0)
    artifact. C, D and both tie totals are exact integers; τ-b's
    denominator is ONE sqrt of an exact (<2^53) product via the
    correctly-rounded chain; the |τ|>0.5 flag is fully exact
    cross-multiplication.

    Scale: pair count is (days choose 2) — calendar-bounded; the
    corpus-scaled work is the one daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
        .select(
            F.row_number().over(Window.orderBy("day")).cast("bigint").alias("i"),
            "x",
            "y",
        )
        # r15: the calendar-bounded daily rollup (and its single-
        # partition index window) fed BOTH pair-join sides, so the
        # corpus collapse executed twice. Materialize it once.
        .localCheckpoint()
    )
    b = d.where(F.col("i") >= 2).select(
        F.col("i").alias("bi"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.explode(F.sequence(F.lit(1), F.col("i") - 1)).alias("j"),
    )
    p = b.join(d, d["i"] == b["j"]).select(
        F.signum(F.col("bx") - F.col("x")).cast("int").alias("sx"),
        F.signum(F.col("by") - F.col("y")).cast("int").alias("sy"),
    )
    s = p.agg(
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("dd"),
        F.sum(F.when(F.col("sx") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("tx"),
        F.sum(F.when(F.col("sy") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("ty"),
        F.count("*").cast("bigint").alias("n0"),
    )
    return s.selectExpr(
        "n0",
        "c AS concordant",
        "dd AS discordant",
        "tx AS tied_x",
        "ty AS tied_y",
        "CAST((c - dd) * 1000000"
        " div CAST(round(sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)))"
        " AS BIGINT) AS BIGINT) AS tau_b_micro",
        "4 * (c - dd) * (c - dd) > (n0 - tx) * (n0 - ty)"
        " AND c > dd AS strong_positive",
    )


# ---------------------------------------------------------------------------
# Calendar heatmap matrix (dow × hour activity grid)
# ---------------------------------------------------------------------------


@query(
    "events_calendar_heatmap",
    oracle="""
    SELECT CAST(date_part('dow', ts) + 1 AS BIGINT) AS dow,
           CAST(date_part('hour', ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def events_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR HEATMAP MATRIX — the dow × hour activity grid every
    operations dashboard renders (when is the system busy; when do
    humans vs crons act): ≤7×24 cells with event counts, distinct
    actors, and exact value cents. Trivial by construction and
    included precisely because it is load-bearing: this is the
    highest-frequency report shape in practice, and the dow
    convention (Spark dayofweek 1=Sunday ⇄ DuckDB dow+1) is the
    cross-engine trap the suite pins once so every future calendar id
    inherits it.

    Scale: one partial-agg'd (dow, hour) collapse — 168 cells
    regardless of corpus size; the distinct-user count is the one
    shuffle-heavy node, with the HLL swap named for unbounded actor
    domains (events_dau_mau_stickiness_hll's pattern)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )
