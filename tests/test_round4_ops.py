"""Invariant tests for the round-4 operators that the value oracle alone
does not pin: sequence-packing structure, and approx≈exact agreement for
the HLL users_few_services variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()

BUDGET = 512


def test_pack_sequences_chunks_are_exact_and_complete(spark, sf_dir):
    out = registry.QUERIES["pipeline_pack_sequences"](spark, sf_dir)
    from kdcloganalyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("tok")
    )

    # every document's chunk spans sum back to its token count
    per_doc = out.groupBy("lang", "doc_id").agg(
        F.sum("tok_in_chunk").alias("packed")
    )
    mismatch = per_doc.join(docs, ["lang", "doc_id"]).filter(
        F.col("packed") != F.col("tok")
    )
    assert mismatch.count() == 0

    # every chunk except each stream's LAST holds exactly BUDGET tokens
    per_chunk = out.groupBy("lang", "chunk_id").agg(
        F.sum("tok_in_chunk").alias("n")
    )
    last = per_chunk.groupBy("lang").agg(F.max("chunk_id").alias("last_id"))
    bad = (
        per_chunk.join(last, "lang")
        .filter(F.col("chunk_id") != F.col("last_id"))
        .filter(F.col("n") != BUDGET)
    )
    assert bad.count() == 0
    # and no chunk anywhere exceeds the budget
    assert per_chunk.filter(F.col("n") > BUDGET).count() == 0


def test_ivfpq_recall_vs_exact(spark, sf_dir):
    """Composed IVF+PQ must keep mean recall@10 ≥ 0.7 vs brute force
    (measured 0.82-0.86 at n_probe=6/16 cells on sf0.001/sf0.01)."""
    exact = registry.QUERIES["sim_search_cosine"](spark, sf_dir).collect()
    approx = registry.QUERIES["sim_search_ivfpq"](spark, sf_dir).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.q_id, set()).add(r.vec_id)
    for r in approx:
        ap.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_users_few_services_approx_agrees_with_exact(spark, sf_dir):
    """HLL++ at rsd 0.05 on per-user cardinalities of at most a few dozen
    services must agree with the exact variant on nearly every user; the
    threshold cut can flip only borderline (n_svc == 3/4) users."""
    exact = {
        r["client"]: r["n_svc"]
        for r in registry.QUERIES["users_few_services"](
            spark, sf_dir
        ).collect()
    }
    approx = {
        r["client"]: r["n_svc"]
        for r in registry.QUERIES["users_few_services_approx"](
            spark, sf_dir
        ).collect()
    }
    assert exact, "degenerate corpus: no qualifying users"
    sym_diff = set(exact) ^ set(approx)
    assert len(sym_diff) <= max(1, len(exact) // 10), (
        len(sym_diff),
        len(exact),
    )
    for c in set(exact) & set(approx):
        assert abs(exact[c] - approx[c]) <= 1, (c, exact[c], approx[c])
