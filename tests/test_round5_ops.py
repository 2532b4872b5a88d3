"""Semantic invariants for the round-5 operators: degree-ordered
triangle counting on a planted graph, and SemDeDup keep-set laws (the
rows-only contract for dedup_semantic — kept vectors are pairwise below
threshold within a cell, every dropped vector has a lower-id witness,
and the per-cell summary partitions the membership).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.operators import dedup
from kdcloganalyzer_spark.operators.graph import triangle_counts
from kdcloganalyzer_spark.plans import registry

registry.load_all()

SEM_T = 0.35


def test_triangle_counts_on_planted_graph(spark):
    """K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a
    pendant path 4-5-6 (no new triangles, nodes 5/6 absent from the
    output)."""
    k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], "u int, v int"
    )
    got = {
        r["node"]: r["tri_n"] for r in triangle_counts(edges).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_orientation_handles_skew_hub(spark):
    """A hub wired to n spokes with one spoke-spoke edge: exactly one
    triangle regardless of the hub's degree — the degree-ordered wedge
    join must not lose (or double-count) triangles when one endpoint
    dominates."""
    n = 50
    star = [(0, s) for s in range(1, n + 1)]
    edges = spark.createDataFrame(star + [(1, 2)], "u int, v int")
    got = {
        r["node"]: r["tri_n"] for r in triangle_counts(edges).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}


def _semdedup_parts(spark, sf_dir):
    from kdcloganalyzer_spark.plans.llm_pipeline import _ivf_index

    assigned, _ = _ivf_index(spark, sf_dir)
    dropped = dedup.semdedup_dropped(assigned, SEM_T)
    kept = assigned.join(dropped, "vec_id", "left_anti")
    return assigned, dropped, kept


def test_semdedup_kept_pairwise_below_threshold(spark, sf_dir):
    """No two KEPT vectors in the same cell reach the threshold: if
    u < v were both kept with cos ≥ t, v would have the lower-id
    witness u and could not be kept."""
    _, _, kept = _semdedup_parts(spark, sf_dir)
    a = kept.select(
        "cell", F.col("vec_id").alias("ia"), F.col("unit").alias("ua")
    )
    b = kept.select(
        "cell", F.col("vec_id").alias("ib"), F.col("unit").alias("ub")
    )
    close = (
        a.join(b, "cell")
        .where(F.col("ia") < F.col("ib"))
        .where(dedup._dot(F.col("ua"), F.col("ub")) >= SEM_T)
    )
    assert close.count() == 0


def test_semdedup_dropped_have_lower_id_kept_witness(spark, sf_dir):
    """Every dropped vector has a lower-id same-cell KEPT vector with
    cosine ≥ t — the paper's keep-one-per-duplicate-group rule. A
    merely kept-or-dropped witness would let drops chain through
    non-transitive similarity (ADVICE r5): a vector below threshold to
    every kept vector must itself be kept."""
    assigned, dropped, kept = _semdedup_parts(spark, sf_dir)
    d = assigned.join(dropped, "vec_id").select(
        "cell", F.col("vec_id").alias("ib"), F.col("unit").alias("ub")
    )
    w = kept.select(
        "cell", F.col("vec_id").alias("ia"), F.col("unit").alias("ua")
    )
    witnessed = (
        d.join(w, "cell")
        .where(F.col("ia") < F.col("ib"))
        .where(dedup._dot(F.col("ua"), F.col("ub")) >= SEM_T)
        .select("ib")
        .distinct()
    )
    assert witnessed.count() == dropped.count()


def test_semdedup_summary_partitions_membership(spark, sf_dir):
    """The registered query's per-cell summary: kept + dropped =
    members per cell, and totals agree with the operator outputs."""
    out = registry.QUERIES["dedup_semantic"](spark, sf_dir)
    bad = out.filter(
        F.col("n_kept") + F.col("n_dropped") != F.col("n_members")
    )
    assert bad.count() == 0
    assigned, dropped, _ = _semdedup_parts(spark, sf_dir)
    tot = out.agg(
        F.sum("n_members").alias("m"), F.sum("n_dropped").alias("d")
    ).collect()[0]
    assert tot["m"] == assigned.count()
    assert tot["d"] == dropped.count()


def test_containment_detects_planted_superset(spark):
    """A small doc embedded verbatim in a bigger doc: C(small, big) = 1
    even though Jaccard is far below threshold — and the directional
    output contains (small ⊂ big) but NOT (big ⊂ small)."""
    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"filler{i}" for i in range(40))
    other = "unrelated words entirely here nothing shared at all"
    docs = spark.createDataFrame(
        [(1, small, "en", "web"), (2, big, "en", "web"),
         (3, other, "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.containment_pairs(docs, 0.9).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_matches_blocked_quadratic(spark, sf_dir):
    """Prefix-filtered containment ≡ the direct blocked all-pairs form
    on the real corpus (the frontend-equivalence law, one-sided)."""
    from kdcloganalyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fast = dedup.containment_pairs(docs, 0.9)
    d = docs.select(
        "doc_id", "lang", "source",
        dedup.word_set(F.col("text")).alias("words"),
    ).withColumn("nw", F.size("words"))
    a, b = d.alias("a"), d.alias("b")
    cont = F.round(
        F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
        / F.col("a.nw"),
        6,
    )
    slow = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= 0.9)
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def _plan(spark, sf_dir, qid):
    df = registry.QUERIES[qid](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_triangle_plan_wedges_never_exchanged(spark, sf_dir):
    """The 41M-wedge intermediate must flow scan → broadcast-join →
    broadcast-join → partial agg without a shuffle: exactly ONE hash
    exchange (the final tiny node aggregate), two BroadcastHashJoins,
    and a TakeOrderedAndProject top-20 (never a global sort)."""
    import re

    p = _plan(spark, sf_dir, "graph_triangle_count")
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert p.count("BroadcastHashJoin") == 2
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_window_distribution_single_window_operator(spark, sf_dir):
    """All four distribution functions share one window spec, so
    Catalyst must fuse them into a bounded number of Window operators
    over a single shuffle (the unbounded-frame nth_value may split into
    its own Window, but never a second exchange)."""
    import re

    p = _plan(spark, sf_dir, "window_distribution_suite")
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert 1 <= p.count("Window") <= 2


def test_join_hint_shuffle_hash_obeyed(spark, sf_dir):
    """The shuffle_hash hint must materialize as a ShuffledHashJoin
    (not SortMergeJoin) with the hinted side as the build side."""
    p = _plan(spark, sf_dir, "join_hint_shuffle_hash")
    assert "ShuffledHashJoin" in p
    assert "SortMergeJoin" not in p


def test_triangle_counts_shuffle_fallback_equivalent(spark):
    """Above the broadcast gate the wedge and closing joins fall back to
    shuffle equi-joins — force that path (broadcast_max_edges=0) and
    assert it produces the same counts as the broadcast path on the
    planted K4 + pendant-path graph."""
    k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], "u int, v int"
    )
    got = {
        r["node"]: r["tri_n"]
        for r in triangle_counts(edges, broadcast_max_edges=0).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
