"""Semantic invariants for the round-4 extension operators, beyond what
the value oracle pins: chunk tiling structure, quantization error
bounds, PageRank mass conservation, substring-span behavior on planted
clones, entropy extremes, and upsert convergence under replay.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_doc_chunks_tile_every_token(spark, sf_dir):
    """Chunks cover tokens exactly: chunk k starts at k*48+1; the union
    of [tok_start, tok_start+n_tok) spans 1..n with the final chunk
    reaching exactly n."""
    out = registry.QUERIES["pipeline_doc_chunks"](spark, sf_dir)
    from kdcloganalyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    bad_start = out.filter(
        F.col("tok_start") != F.col("chunk_id") * 48 + 1
    )
    assert bad_start.count() == 0
    last = out.groupBy("doc_id").agg(
        F.max_by(
            F.col("tok_start") + F.col("n_tok") - 1, F.col("chunk_id")
        ).alias("covered"),
        F.min("n_tok").alias("min_tok"),
    )
    j = last.join(docs, "doc_id")
    assert j.filter(F.col("covered") != F.col("n")).count() == 0
    assert j.filter(F.col("min_tok") < 1).count() == 0


def test_quantize_int8_error_bounded_by_half_scale(spark, sf_dir):
    """Per-element |x - q·scale| ≤ scale/2 ⇒ SSE ≤ d·(scale/2)²; and the
    quantized checksum is within d·127 of zero trivially — check the
    informative bound instead: sse_r ≤ 64 · (scale_r/2)² + rounding."""
    out = registry.QUERIES["embed_quantize_int8"](spark, sf_dir)
    bad = out.filter(
        F.col("sse_r")
        > 64 * (F.col("scale_r") / 2) * (F.col("scale_r") / 2) + 1e-6
    )
    assert bad.count() == 0
    assert out.filter(F.col("scale_r") <= 0).count() == 0


def test_pagerank_mass_conserved(spark, sf_dir):
    """On the symmetrized graph (no dangling nodes) total rank is
    conserved at 1.0 every round — so after 5 rounds Σrank = 1."""
    out = registry.QUERIES["graph_pagerank"](spark, sf_dir)
    total = out.agg(F.sum("rank_r")).collect()[0][0]
    assert abs(total - 1.0) < 1e-3  # rank_r is rounded at 1e-7 per row


def test_substring_spans_planted_clone_fully_covered(spark):
    """A document duplicated verbatim has dup_frac == 1.0; a document
    sharing no 5-gram with any other has dup_frac == 0.0."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # clone of 1
        (3, "one two three four five six seven eight nine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # run the same construction as the registered query, inline
    from kdcloganalyzer_spark.plans.pipeline_ext import _SPAN_GRAMS

    g = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    ).select(
        "doc_id", F.explode(F.expr(_SPAN_GRAMS.replace("__W__", "ws"))).alias("gram")
    )
    shared = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram", F.lit(1).alias("hit"))
    )
    frac = {
        r["doc_id"]: r["dup_frac"]
        for r in g.join(shared, "gram", "left")
        .groupBy("doc_id")
        .agg(
            (F.count("hit") / F.count("*")).alias("dup_frac")
        )
        .collect()
    }
    assert frac[1] == 1.0 and frac[2] == 1.0
    assert frac[3] == 0.0


def test_char_entropy_extremes(spark):
    """Single-repeated-char text has entropy 0; k equiprobable chars
    have entropy log2(k)."""
    rows = [(1, "aaaaaaaa"), (2, "abcdabcd")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cs = F.split(F.lower("text"), "")
    d = docs.select("doc_id", cs.alias("cs"), F.size(cs).alias("n"))

    def p(u):
        return F.size(F.filter("cs", lambda x: x == u)).cast("double") / F.col("n")

    ent = -F.aggregate(
        F.array_distinct("cs"), F.lit(0.0), lambda acc, u: acc + p(u) * F.log2(p(u))
    )
    vals = {r["doc_id"]: r["e"] for r in d.select("doc_id", ent.alias("e")).collect()}
    assert abs(vals[1] - 0.0) < 1e-12
    assert abs(vals[2] - 2.0) < 1e-12


def test_upsert_replay_is_idempotent(spark, sf_dir):
    """Running the streaming upsert twice (fresh checkpoints, same
    input) converges to the same table — the merge is a pure function
    of the input set, not of batch arrival."""
    a = registry.QUERIES["stream_foreach_batch_upsert"](spark, sf_dir)
    b = registry.QUERIES["stream_foreach_batch_upsert"](spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
