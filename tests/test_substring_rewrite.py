"""Laws for dedup_substring_rewrite (the exact-substring REMOVAL
transform; plans/pipeline_ext.py): losslessness of the kept-token
arithmetic, consistency with the spans coverage signal, and the
idempotence-for-clean-docs property (a doc the rewrite left untouched
is byte-identical to its normalized original, so a second pass cannot
touch it either unless NEW cross-doc spans formed — which the
subsequence law bounds)."""

from __future__ import annotations

import pytest

from kdcloganalyzer_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="module")
def rewrite(spark, sf_dir):
    return (
        registry.QUERIES["dedup_substring_rewrite"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from kdcloganalyzer_spark.sources.tables import load_table

    pdf = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    return pdf


def test_covers_every_doc(rewrite, docs):
    assert list(rewrite.index) == list(docs.index)


def test_token_arithmetic_lossless(rewrite):
    """kept = n_tokens - n_removed, and the rewritten text has exactly
    that many tokens (empty rewrite ≡ 0 kept)."""
    for doc_id, r in rewrite.iterrows():
        kept = r["n_tokens"] - r["n_removed"]
        n_out = len(r["text_rewritten"].split()) if r["text_rewritten"] else 0
        assert n_out == kept, (doc_id, kept, n_out)
        assert 0 <= r["n_removed"] <= r["n_tokens"]
        assert r["bytes_after"] <= r["bytes_before"]


def test_untouched_docs_identical(rewrite, docs):
    """n_removed == 0 ⇒ the rewritten text IS the normalized original
    (lowercased, split/join roundtrip) — the transform is the identity
    off the duplicated spans."""
    n_clean = 0
    for doc_id, r in rewrite.iterrows():
        if r["n_removed"] == 0:
            norm = " ".join(docs.loc[doc_id, "text"].lower().split(" "))
            assert r["text_rewritten"] == norm, doc_id
            assert r["bytes_after"] == r["bytes_before"]
            n_clean += 1
    assert n_clean > 0  # the law must actually bind on this corpus


def test_rewritten_is_subsequence(rewrite, docs):
    """Every rewritten doc is an order-preserving token subsequence of
    the original — removal never reorders or invents tokens."""
    n_changed = 0
    for doc_id, r in rewrite.iterrows():
        if r["n_removed"] == 0:
            continue
        n_changed += 1
        orig = docs.loc[doc_id, "text"].lower().split(" ")
        out = r["text_rewritten"].split() if r["text_rewritten"] else []
        it = iter(orig)
        assert all(tok in it for tok in out), doc_id
    assert n_changed > 0  # corpus must exercise the removal path


def test_consistent_with_spans_signal(spark, sf_dir, rewrite):
    """Exactly the docs the spans query flags (n_dup_grams > 0) get
    tokens removed, and removal is at least the gram span size on
    each (one shared 5-gram covers >= 5 positions)."""
    spans = (
        registry.QUERIES["dedup_substring_spans"](spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    flagged = set(spans.index[spans["n_dup_grams"] > 0])
    changed = set(rewrite.index[rewrite["n_removed"] > 0])
    assert flagged == changed
    assert (rewrite.loc[sorted(changed), "n_removed"] >= 5).all()
