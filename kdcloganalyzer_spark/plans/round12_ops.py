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
    return final.join(sel, "source", "left").select(
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
