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
    """Composed IVF+PQ must keep mean recall@10 ≥ 0.7 vs brute force.
    Measured 0.92 at sf0.001 with the r10 serving knobs (n_probe=10,
    n_rerank=150) over the r9 engine-deterministic quantizer
    (farthest-point seeds + exact-integer Lloyd) — a 0.22 margin over
    the floor, vs the r9 zero-margin 0.70 at n_probe=8. The
    deterministic build makes this recall EXACT, not seed-dependent
    (the retired KMeans(seed=42) fit measured 0.82-0.86 but was not
    oracle-replayable)."""
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


def _toy_docs(spark):
    """Tiny corpus with exact clones, a near-clone, and distinct docs."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "web"),
        (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
        (2, "the quick brown fox jumps over the lazy cat", "en", "web"),
        (3, "completely different words entirely here now", "en", "web"),
        (4, "unrelated tokens again nothing shared at all", "en", "web"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_minhash_identical_docs_pair_with_estimate_one(spark):
    from kdcloganalyzer_spark.operators import dedup

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in dedup.minhash_lsh_pairs(_toy_docs(spark), 0.9).collect()
    }
    # exact clones MUST collide in every band and estimate J=1.0
    assert pairs.get((0, 1)) == 1.0
    # disjoint-vocabulary docs must not pair at a 0.9 threshold
    assert (3, 4) not in pairs


def test_minhash_dedup_assigns_clone_to_representative(spark):
    from kdcloganalyzer_spark.operators import dedup

    out = {
        r["doc_id"]: (r["dup_of"], r["jaccard_est"])
        for r in dedup.minhash_dedup(_toy_docs(spark), 0.9).collect()
    }
    assert out.get(1) == (0, 1.0)  # clone collapses onto min-id rep
    assert 0 not in out  # the representative itself is not a duplicate


def test_simhash_identical_docs_have_hamming_zero(spark):
    from kdcloganalyzer_spark.operators import dedup

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(_toy_docs(spark), 3).collect()
    }
    assert pairs.get((0, 1)) == 0
    # a one-word edit on a 9-word doc flips several counter signs (5 bits
    # here) — outside the strict radius, visible at a looser one:
    loose = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(_toy_docs(spark), 8).collect()
    }
    assert 0 < loose[(0, 2)] <= 8
    # disjoint-vocabulary docs stay far apart even at the loose radius
    assert (3, 4) not in loose


def test_cms_overcount_is_one_sided_and_tight_for_sparse_keys(
    spark, sf_dir
):
    """CMS guarantees est >= exact always; with 5 keys hashed into 4x256
    cells, collisions are essentially impossible, so the estimate should
    also be EXACT here — the interesting content is the invariant, the
    tightness just documents the regime."""
    rows = registry.QUERIES["agg_count_min_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_est"] >= r["n_exact"], r


def test_consistent_topk_is_mergeable_bottom_k(spark, sf_dir):
    """min-k by hash priority must commute with partitioning: the min-k
    of per-half min-ks equals the global min-k — the property that lets
    a 1000-executor cluster sample without a global sort."""
    from pyspark.sql import Window

    from kdcloganalyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pri = F.md5(F.col("doc_id").cast("string"))
    halves = []
    for cond in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        halves.append(
            docs.filter(cond)
            .select("source", "doc_id", pri.alias("pri"))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("source").orderBy(
                        F.asc("pri"), F.asc("doc_id")
                    )
                ),
            )
            .filter(F.col("rn") <= 5)
            .drop("rn")
        )
    merged = halves[0].unionByName(halves[1])
    re_ranked = (
        merged.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.asc("pri"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "pri", "rn")
    )
    direct = registry.QUERIES["sample_consistent_topk"](spark, sf_dir)
    assert {tuple(r) for r in re_ranked.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_bigram_lm_scores_repetitive_doc_above_rare_doc(spark):
    """A doc made of the corpus's dominant bigram must out-score (higher
    avg log-prob) a doc of corpus-unique bigrams — the signal the
    perplexity filter exists to extract."""
    import kdcloganalyzer_spark.plans.curation as cur

    rows = [
        (0, "the cat " * 20, "en", "src"),     # dominant bigrams
        (1, "the cat sat here", "en", "src"),
        (2, "zyx qwv plk mnb", "en", "src"),   # all-unique bigrams
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )

    # run the registered plan body against the toy frame via its
    # internals: rebuild with load_table monkey-patched
    import kdcloganalyzer_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda *_a, **_k: docs
        cur.load_table = tables.load_table
        out = {
            r["doc_id"]: r["sum_logp_u6"] / r["n_bigrams"]
            for r in cur.quality_bigram_lm(spark, "ignored").collect()
        }
    finally:
        tables.load_table = orig
        cur.load_table = orig
    # doc 1 is NOT asserted above doc 2: after doc 0 floods the corpus
    # with cat→the transitions, doc 1's "cat sat" is a genuinely
    # surprising bigram and the LM correctly penalizes it.
    assert out[0] > out[2]
