"""Round-13 additions: the remaining named-but-unregistered 100 TB swap
twins (VERDICT r12 item 8) — each an existing operator's scale-path
form, registered as a first-class hash-verified query.

- ``events_calendar_heatmap_hll`` — the HLL distinct-actor swap
  ``events_calendar_heatmap``'s docstring names (round12_ops.py).
- ``graph_triangle_count_shuffle`` — the above-broadcast-gate shuffle
  regime of ``triangle_counts`` (operators/graph.py), exercised at
  bench scale and hash-verified against the SAME oracle (the sf1
  rehearsal showed this regime is what a 100 TB graph actually runs —
  it deserves a standing correctness receipt, not just a code path).
- ``pipeline_dedup_rate_hll`` — sketch-form dedup-rate monitoring:
  distinct-fingerprint estimates per source without ever shuffling
  fingerprints (the dedup_exact collapse is the heavy node the sketch
  removes at 100 TB).

Reference lineage: the reference has no sketch/graph tier — these
extend the §2.3 north-star families (SURVEY.md), with the same exact
integer conventions as their exact twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans.analytics import (
    TRIANGLE_ORACLE,
    _copart_edges,
)
from kdcloganalyzer_spark.plans.registry import query
from kdcloganalyzer_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Calendar heatmap, HLL distinct-actor form
# ---------------------------------------------------------------------------
@query(
    "events_calendar_heatmap_hll",
    oracle="""
    SELECT CAST(date_part('dow', ts) + 1 AS BIGINT) AS dow,
           CAST(date_part('hour', ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           TRUE AS hll_in_envelope
    FROM events GROUP BY 1, 2
    """,
)
def events_calendar_heatmap_hll(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CALENDAR HEATMAP, HLL FORM — the distinct-actor swap
    ``events_calendar_heatmap``'s docstring names (round12_ops.py),
    registered as a runnable query. At 100 TB the per-cell exact
    COUNT(DISTINCT user_id) is the grid's one heavy node (a user-keyed
    distinct shuffle per cell); the sketch form builds one Datasketches
    HLL per (dow, hour) cell in a single partial-agg'd pass — raw user
    ids never shuffle in the PURE sketch form; ≤168 sketches merge
    map-side. NOTE (ADVICE r13): the plan registered HERE additionally
    keeps the exact count_distinct in the same aggregate SOLELY so the
    DuckDB hash gate can verify the grid — that exact column does
    shuffle raw user ids, so this id's benched plan is the
    verification form; the 100 TB scale path drops the exact column
    and keeps only the sketch estimate. Output = the exact twin's
    columns + ``hll_in_envelope``:
    every cell's estimate within max(3, 2.5% of exact) (lgK=14,
    RSE ≈ 0.81%, so 2.5% ≈ 3σ — the events_dau_mau_stickiness_hll
    envelope rationale). The oracle asserts the literal TRUE; the
    reported n_users stays the exact count, so the hash also
    re-verifies the grid itself."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(14))
        ).alias("_est"),
    )
    in_env = F.abs(
        F.col("_est").cast("double") - F.col("n_users")
    ) <= F.greatest(F.lit(3.0), 0.025 * F.col("n_users"))
    return cell.select(
        "dow", "hour", "n", "n_users", "value_cents",
        in_env.alias("hll_in_envelope"),
    )


# ---------------------------------------------------------------------------
# Triangle counting, shuffle (above-broadcast-gate) regime
# ---------------------------------------------------------------------------
@query("graph_triangle_count_shuffle", oracle=TRIANGLE_ORACLE)
def graph_triangle_count_shuffle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIANGLE COUNTS, SHUFFLE REGIME — ``triangle_counts`` with the
    broadcast gate forced shut, so the plan is the generic
    last-reducer-safe layout a 100 TB graph actually runs: oriented
    wedges and the closing edge set exchanged as volume-sized
    co-partitioned equi-joins (operators/graph.py above-gate path; the
    r13 sf1 audit sized those exchanges to the counted edge volume
    after measuring the session-default width 2.2x slower). Same
    oracle as ``graph_triangle_count`` — the two regimes must produce
    the identical triangle set, which makes this id the standing
    hash-verified receipt for the scale path (previously the shuffle
    regime was only ever exercised off-bench at sf1). The edge cache
    is shared with the broadcast twin, so the bench prices exactly the
    regime difference."""
    from kdcloganalyzer_spark.operators.graph import triangle_counts

    edges = _copart_edges(spark, sf_dir)
    return (
        triangle_counts(edges, broadcast_max_edges=0, materialized=True)
        .orderBy(F.desc("tri_n"), F.asc("node"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Dedup-rate monitoring, HLL distinct-fingerprint form
# ---------------------------------------------------------------------------
@query(
    "pipeline_dedup_rate_hll",
    oracle="""
    WITH g AS (
      SELECT source,
             md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS grp
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT grp) AS BIGINT) AS n_unique,
           CAST((count(*) - count(DISTINCT grp)) * 1000000
                // count(*) AS BIGINT) AS dup_rate_micro,
           TRUE AS hll_in_envelope
    FROM g GROUP BY source
    """,
)
def pipeline_dedup_rate_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP-RATE MONITOR, HLL FORM — per-source duplicate rate from a
    distinct-FINGERPRINT sketch instead of the dedup_exact collapse.
    The exact rate needs the full fingerprint groupBy (the corpus-wide
    shuffle dedup_exact pays); the monitoring question — "how
    duplicated is each source TODAY" — only needs |distinct| per
    source, which one HLL per source answers in a single partial-agg'd
    pass: in the PURE sketch form fingerprints hash into sketches
    map-side and only ≤|sources| sketch payloads ever move. NOTE
    (ADVICE r13): the plan registered HERE additionally keeps the
    exact count_distinct(grp) SOLELY for the DuckDB hash gate — that
    column does shuffle fingerprints, so the benched plan is the
    verification form; the 100 TB scale path drops it and reports the
    sketch estimate. This is the continuous-monitoring twin
    of ``pipeline_dedup_rate_curve``'s pilot-extrapolation (same
    first-8-words md5 fingerprint, curation-tier convention). Output =
    exact counts (the oracle re-verifies them) + ``hll_in_envelope``:
    per-source estimate within max(3, 2.5% of exact), the lgK=14 ≈ 3σ
    envelope shared by every HLL twin in the suite."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "source",
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("grp"),
    )
    s = g.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("grp").cast("bigint").alias("n_unique"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("grp"), F.lit(14))
        ).alias("_est"),
    )
    in_env = F.abs(
        F.col("_est").cast("double") - F.col("n_unique")
    ) <= F.greatest(F.lit(3.0), 0.025 * F.col("n_unique"))
    return s.select(
        "source",
        "n_docs",
        "n_unique",
        F.expr(
            "CAST((n_docs - n_unique) * 1000000 div n_docs AS BIGINT)"
        ).alias("dup_rate_micro"),
        in_env.alias("hll_in_envelope"),
    )
