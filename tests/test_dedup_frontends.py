"""Scale-frontend ≡ all-pairs equivalence (SURVEY.md §2.3 dedup tier).

The registered dedup queries run ONLY the scale-safe candidate-generation
frontends (prefix-filtered inverted-index join, pivot-pruned cell join).
Both are claimed LOSSLESS — prefix-filter theorem (Chaudhuri ICDE'06 /
Bayardo WWW'07) and the triangle-inequality cell bound respectively — so
their output must be IDENTICAL, pair for pair, to the naive blocked
all-pairs forms kept in operators/dedup.py as oracles. These tests are
the regression guard for that claim (cited from plans/llm_pipeline.py).
"""

from __future__ import annotations

import pytest

from kdcloganalyzer_spark.operators import dedup
from kdcloganalyzer_spark.sources.tables import load_table


def _pairs(df, score_col):
    return {
        (r["id_a"], r["id_b"], r[score_col]) for r in df.collect()
    }


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_prefix_join_matches_blocked_all_pairs(spark, sf_dir, threshold):
    docs = load_table(spark, sf_dir, "documents")
    naive = _pairs(dedup.ngram_jaccard_pairs(docs, threshold), "jaccard")
    prefix = _pairs(
        dedup.ngram_jaccard_pairs_prefix(docs, threshold), "jaccard"
    )
    assert prefix == naive
    assert naive, "degenerate corpus: no qualifying pairs to compare"


@pytest.mark.parametrize("threshold", [0.5, 0.9])
def test_dford_prefix_matches_blocked_all_pairs(spark, sf_dir, threshold):
    """The df-ascending token order changes WHICH tokens index each doc,
    never the result set — lossless for any fixed total order."""
    docs = load_table(spark, sf_dir, "documents")
    naive = _pairs(dedup.ngram_jaccard_pairs(docs, threshold), "jaccard")
    dford = _pairs(
        dedup.ngram_jaccard_pairs_prefix_dford(docs, threshold), "jaccard"
    )
    assert dford == naive


@pytest.mark.parametrize("threshold", [0.7])
def test_prefix_bound_safe_for_inexact_float_thresholds(
    spark, sf_dir, threshold
):
    """0.7 has no exact double representation (sits just above 7/10);
    without the epsilon guard on ceil(t*nw) the prefix shortens by one
    token for nw divisible by 10 and minimum-overlap pairs vanish."""
    docs = load_table(spark, sf_dir, "documents")
    naive = _pairs(dedup.ngram_jaccard_pairs(docs, threshold), "jaccard")
    prefix = _pairs(
        dedup.ngram_jaccard_pairs_prefix(docs, threshold), "jaccard"
    )
    assert prefix == naive


@pytest.mark.parametrize("threshold", [0.35, 0.8])
def test_pivot_pruned_matches_label_blocked_all_pairs(
    spark, sf_dir, threshold
):
    emb = load_table(spark, sf_dir, "embeddings")
    naive = _pairs(dedup.embedding_cosine_pairs(emb, threshold), "cos")
    pivot = _pairs(
        dedup.embedding_cosine_pairs_pivot(emb, threshold), "cos"
    )
    assert pivot == naive
    if threshold <= 0.35:
        assert naive, "degenerate corpus: no qualifying pairs to compare"


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_incremental_join_matches_filtered_all_pairs(
    spark, sf_dir, threshold
):
    """The asymmetric delta⋈base SSJoin must equal the self-join's
    result restricted to (delta, base) pairs — same prefix-filter
    theorem, R-vs-S form. Pairs are orientation-normalized: the
    self-join emits id_a < id_b while the incremental join emits
    (delta_id, base_id)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 7 == 0)
    base = docs.filter(F.col("doc_id") % 7 != 0)
    inc = {
        (min(a, b), max(a, b), j)
        for (a, b, j) in _pairs(
            dedup.jaccard_join_delta_base(delta, base, threshold), "jaccard"
        )
    }
    naive = {
        (a, b, j)
        for (a, b, j) in _pairs(
            dedup.ngram_jaccard_pairs(docs, threshold), "jaccard"
        )
        if (a % 7 == 0) != (b % 7 == 0)
    }
    assert inc == naive
    assert inc, "degenerate split: no cross-split pairs to compare"
