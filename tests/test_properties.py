"""Property-based checks (SURVEY.md §5.2 item 4).

1. Sessionizer chunking invariance: the reference corrupts records that
   straddle split boundaries (FIXME at KDCLogRecordReader.java:210,
   drop at :317-320); our design must produce byte-identical records for
   ANY partition chunking — hypothesis drives the split size.
2. Lexicographic ≡ chronological ordering of the `YYYY-MM-DDTHH:MM:SS`
   timestamp format — the invariant that lets the reference min/max on
   raw strings (UserTimeRec.java:121-124, kdcreduce.pl:32-33) and lets
   us aggregate on ts_raw interchangeably with ts.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kdcloganalyzer_spark.operators.sessionize import sessionize
from kdcloganalyzer_spark.sources.kdc_log import read_log_lines

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "kdc", "golden.log"
)

_BASELINE_CACHE: dict[int, list[str]] = {}


def _records_at_chunk_size(
    spark, max_bytes: int, assembler=None
) -> list[str]:
    """Collect GOLDEN's records under a forced split size, normalized for
    multiset comparison. ``assembler`` defaults to the window-path
    sessionize over read_log_lines; pass a (lines_raw -> records)
    callable (e.g. sessionize_split_parallel) to exercise another path
    through the SAME normalization."""
    from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_bytes))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        if assembler is None:
            df = sessionize(read_log_lines(spark, GOLDEN))
        else:
            df = assembler(read_log_lines_raw(spark, GOLDEN))
        rows = df.drop("enctypes").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)
    return sorted(str(sorted(r.asDict().items(), key=str)) for r in rows)


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=64, max_value=4096))
def test_sessionize_chunking_invariant(spark, chunk_bytes):
    if 0 not in _BASELINE_CACHE:
        _BASELINE_CACHE[0] = _records_at_chunk_size(spark, 128 * 1024 * 1024)
    assert _records_at_chunk_size(spark, chunk_bytes) == _BASELINE_CACHE[0]


_EPOCH = datetime(1970, 1, 2)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=2_000_000_000),
    st.integers(min_value=0, max_value=2_000_000_000),
)
def test_ts_string_order_is_chronological(a_s, b_s):
    a = _EPOCH + timedelta(seconds=a_s)
    b = _EPOCH + timedelta(seconds=b_s)
    sa, sb = a.strftime("%Y-%m-%dT%H:%M:%S"), b.strftime("%Y-%m-%dT%H:%M:%S")
    assert (sa < sb) == (a < b)
    assert (sa == sb) == (a == b)


def test_stratified_sample_semantics(spark, sf_dir):
    """sampleBy invariants the rows-only driver check can't see: sampled
    rows are a SUBSET of the source, kept-whole strata survive exactly,
    the downsampled stratum lands near fraction*N, and a fixed seed is
    reproducible."""
    from kdcloganalyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.35, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    s1 = docs.sampleBy("lang", fractions, seed=42)
    s2 = docs.sampleBy("lang", fractions, seed=42)
    assert s1.exceptAll(docs).count() == 0  # subset, multiset-wise
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0

    src = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, frac in fractions.items():
        if frac == 1.0:
            assert got.get(lang, 0) == src.get(lang, 0), lang
    # Bernoulli sampling: en count within 5 sigma of frac*N.
    import math

    n, p = src["en"], fractions["en"]
    sigma = math.sqrt(n * p * (1 - p))
    assert abs(got.get("en", 0) - n * p) < 5 * sigma


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=64, max_value=4096))
def test_split_parallel_chunking_invariant(spark, chunk_bytes):
    """The split-parallel assembler must be byte-identical to the window
    path for ANY byte-range chunking — hypothesis drives split sizes down
    to a few records per split, forcing boundary-straddling records."""
    from kdcloganalyzer_spark.operators.sessionize import (
        sessionize_split_parallel,
    )

    if 0 not in _BASELINE_CACHE:
        _BASELINE_CACHE[0] = _records_at_chunk_size(spark, 128 * 1024 * 1024)
    assert (
        _records_at_chunk_size(
            spark, chunk_bytes, assembler=sessionize_split_parallel
        )
        == _BASELINE_CACHE[0]
    )


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
def test_prefix_join_equivalence_on_random_corpora(spark, word_lists, threshold):
    """Prefix-filter losslessness on hypothesis-generated corpora: tiny
    vocab + short docs force heavy overlap, prefix collisions, and
    minimum-overlap pairs at every threshold — the regime where an
    off-by-one prefix bound silently drops pairs."""
    from kdcloganalyzer_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(ws), "xx", "src") for i, ws in enumerate(word_lists)],
        "doc_id long, text string, lang string, source string",
    )
    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold).collect()
    }
    prefix = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs_prefix(docs, threshold).collect()
    }
    assert prefix == naive


# ---------------------------------------------------------------------------
# Triangle counting: random-graph equivalence vs brute force, and
# relabeling invariance (hypothesis drives the edge set)
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=997),
)
def test_triangle_counts_match_bruteforce_on_random_graphs(
    spark, raw_edges, relabel_mult
):
    """For ANY random edge list: (1) the degree-ordered wedge pipeline
    equals the O(n³) brute-force per-node triangle count; (2) applying
    an injective node relabeling (x → x·m for odd m) permutes the
    output without changing the count multiset — orientation must not
    depend on label structure beyond the total order."""
    from itertools import combinations

    from kdcloganalyzer_spark.operators.graph import triangle_counts

    canon = sorted({(min(u, v), max(u, v)) for u, v in raw_edges if u != v})
    if not canon:
        return
    eset = set(canon)
    nodes = sorted({n for e in canon for n in e})
    expect: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1

    edges = spark.createDataFrame(canon, "u int, v int")
    got = {
        r["node"]: r["tri_n"] for r in triangle_counts(edges).collect()
    }
    assert got == expect

    m = relabel_mult * 2 + 1  # odd ⇒ injective on ints
    relabeled = spark.createDataFrame(
        sorted((min(u * m, v * m), max(u * m, v * m)) for u, v in canon),
        "u int, v int",
    )
    got_r = {
        r["node"]: r["tri_n"]
        for r in triangle_counts(relabeled).collect()
    }
    assert got_r == {n * m: c for n, c in expect.items()}


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
    st.sampled_from([0.5, 0.7, 0.9, 1.0]),
)
def test_containment_join_equivalence_on_random_corpora(
    spark, word_lists, threshold
):
    """One-sided prefix-filter losslessness for the CONTAINMENT join on
    hypothesis-generated corpora — the same adversarial regime as the
    Jaccard property (tiny vocab, heavy overlap, exact-boundary pairs),
    plus full-containment (C=1) duplicates, against a direct quadratic
    reference computed in Python."""
    from kdcloganalyzer_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(ws), "xx", "src") for i, ws in enumerate(word_lists)],
        "doc_id long, text string, lang string, source string",
    )
    sets = {i: set(ws) for i, ws in enumerate(word_lists)}
    expect = set()
    for ia, wa in sets.items():
        for ib, wb in sets.items():
            if ia == ib:
                continue
            c = round(len(wa & wb) / len(wa), 6)
            if c >= threshold:
                expect.add((ia, ib, c))
    got = {
        (r["id_a"], r["id_b"], r["containment"])
        for r in dedup.containment_pairs(docs, threshold).collect()
    }
    assert got == expect
