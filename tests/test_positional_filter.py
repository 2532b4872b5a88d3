"""Positional-filter (PPJoin, Xiao/Wang/Lin/Yu WWW'08) laws — r16.

The prefix-join family carries each indexed token's 1-based global
position and prunes candidate rows whose suffix-overlap upper bound
1 + min(|A|-p_a, |B|-p_b) cannot reach the required overlap
(t·(|A|+|B|)/(1+t) for Jaccard, t·|A| for containment). The filter is
LOSSLESS per pair because the pair's minimal common token row always
satisfies the bound; these tests pin (a) exact-boundary pairs where an
off-by-one or a missing epsilon guard would drop a qualifying pair,
(b) that the filter actually prunes decoy candidates before the
dedup/verify stages, and (c) the dford path, whose positions flow
through a row_number window instead of posexplode.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kdcloganalyzer_spark.operators import dedup


def _mkdocs(spark, word_lists):
    return spark.createDataFrame(
        [(i, " ".join(ws), "xx", "src") for i, ws in enumerate(word_lists)],
        "doc_id long, text string, lang string, source string",
    )


def _hash_order(spark, tokens):
    """The engine's own (xxhash64(token), token) total order."""
    rows = (
        spark.createDataFrame([(t,) for t in tokens], "tok string")
        .select("tok", F.xxhash64("tok").alias("h"))
        .collect()
    )
    return [r["tok"] for r in sorted(rows, key=lambda r: (r["h"], r["tok"]))]


def _pairs(df, col):
    return {(r["id_a"], r["id_b"], r[col]) for r in df.collect()}


def test_jaccard_boundary_pair_overlap_at_suffix_end(spark):
    """Worst case for the positional bound: the common tokens are the
    LAST alpha tokens of both docs in hash order, so at the minimal
    common token 1 + min(na-pa, nb-pb) == alpha exactly — a strict
    inequality or a tightened float bound drops the pair."""
    toks = _hash_order(
        spark, [f"w{i:02d}" for i in range(12)]
    )  # 12 tokens in engine hash order
    # t = 0.5, |A| = |B| = 6, required overlap = ceil(0.5*12/1.5) = 4.
    # A = 2 unique smallest + last 4 shared; B = 2 other uniques + same 4.
    shared = toks[8:12]
    a_words = toks[0:2] + shared
    b_words = toks[2:4] + shared
    docs = _mkdocs(spark, [a_words, b_words])
    got = _pairs(dedup.ngram_jaccard_pairs_prefix(docs, 0.5), "jaccard")
    naive = _pairs(dedup.ngram_jaccard_pairs(docs, 0.5), "jaccard")
    assert got == naive
    assert got == {(0, 1, 0.5)}  # J = 4/8 exactly at threshold


def test_containment_boundary_pair_overlap_at_suffix_end(spark):
    """Containment twin of the boundary case: C(A,B) = t exactly with
    the shared tokens at the end of both hash orders."""
    toks = _hash_order(spark, [f"c{i:02d}" for i in range(14)])
    # t = 0.8, |A| = 5, required overlap ceil(0.8*5) = 4.
    shared = toks[10:14]
    a_words = [toks[0]] + shared  # |A| = 5, C = 4/5 = 0.8
    b_words = toks[4:10] + shared  # |B| = 10 ≥ t·|A|
    docs = _mkdocs(spark, [a_words, b_words])
    got = _pairs(dedup.containment_pairs(docs, 0.8), "containment")
    assert (0, 1, 0.8) in got


def test_positional_filter_prunes_decoy_candidates(spark):
    """Two same-size docs sharing exactly ONE token, placed at position 2
    of both hash orders (inside both prefixes, len 2 at t=0.9/nw=11) —
    the size filter admits the pair, the positional filter must kill it:
    the bound 1 + min(nw-2, nw-2) = 10 < required 2·0.9·11/1.9 ≈ 10.42."""
    toks = _hash_order(spark, [f"d{i:02d}" for i in range(22)])
    shared = toks[2]  # position 2 in each doc (after one smaller unique)
    a_words = [toks[0], shared] + toks[3:12]  # |A| = 11
    b_words = [toks[1], shared] + toks[12:21]  # |B| = 11
    docs = _mkdocs(spark, [a_words, b_words])
    d = dedup._prep_word_sets(docs)
    idx = dedup._hash_prefix_index(d, 0.9)
    cand = dedup._prefix_candidates(idx, 0.9)
    assert cand.count() == 0
    # sanity: without the positional bound the decoy pair WOULD surface —
    # same join minus the positional predicate.
    a, b = idx.alias("a"), idx.alias("b")
    loose = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            F.least(F.col("a.nw"), F.col("b.nw"))
            >= F.lit(0.9) * F.greatest(F.col("a.nw"), F.col("b.nw"))
        ),
    )
    assert loose.count() == 1


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_dford_positional_equivalence_on_random_corpora(
    spark, word_lists, threshold
):
    """dford's positions come from a row_number window over (df, tok)
    order — a different code path than posexplode; same losslessness
    law on hypothesis corpora."""
    docs = _mkdocs(spark, word_lists)
    naive = _pairs(dedup.ngram_jaccard_pairs(docs, threshold), "jaccard")
    dford = _pairs(
        dedup.ngram_jaccard_pairs_prefix_dford(docs, threshold), "jaccard"
    )
    assert dford == naive


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=1,
            max_size=8,
        ),
        min_size=4,
        max_size=12,
    ),
    st.sampled_from([0.5, 0.8]),
)
def test_delta_base_positional_equivalence_on_random_corpora(
    spark, word_lists, threshold
):
    """Asymmetric delta⋈base SSJoin with the positional filter on both
    indexed sides ≡ the self-join restricted to cross-split pairs."""
    docs = _mkdocs(spark, word_lists)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    base = docs.filter(F.col("doc_id") % 3 != 0)
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
        if (a % 3 == 0) != (b % 3 == 0)
    }
    assert inc == naive
