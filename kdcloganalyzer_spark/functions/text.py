"""Text-analysis expressions (SURVEY.md §2.3 `text_analysis` family).

All pure JVM built-ins (split/filter/aggregate/regexp) so they run inside
whole-stage codegen over the document scan — at 100 TB these are
scan-bound map operators with zero shuffle. Every function has an exact
DuckDB twin (see plans/llm_pipeline.py oracles), which is why token/char
semantics are specified via portable constructs (single-space split,
RE2-compatible regexes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Words that double as language markers in the synthetic corpus; real
# deployments swap in per-language stopword lists.
STOPWORDS = ("the", "a", "of", "and")

# language → marker words (padded-substring counting, engine-portable)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "la"],
    "zh": ["de", "le", "he"],
}

# BPE-ish token regex: letter runs, digit runs, single punctuation.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

ROLL_MOD = 1_000_000_007
FP_PREFIX = 256  # rolling-hash prefix length


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def n_tokens(col: Column) -> Column:
    return F.size(tokens(col))


def n_bpe_tokens(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    is_stop = lambda t: (  # noqa: E731
        (t == STOPWORDS[0]) | (t == STOPWORDS[1]) | (t == STOPWORDS[2]) | (t == STOPWORDS[3])
    )
    return F.size(F.filter(toks, is_stop)) / F.size(toks)


def punct_ratio(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^A-Za-z0-9 ]"), 0)) / F.length(col)


def marker_count(col: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whole token, via padded substring count."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))) / len(
        needle
    )


def lang_score(col: Column, lang: str) -> Column:
    out = F.lit(0.0)
    for w in LANG_MARKERS[lang]:
        out = out + marker_count(F.lower(col), w)
    return out


def predicted_lang(col: Column) -> Column:
    """Argmax language by marker score; ties resolved in LANG_MARKERS order."""
    langs = list(LANG_MARKERS)
    scores = {lg: lang_score(col, lg) for lg in langs}
    # sequential >= comparisons == first-max-wins in declaration order
    expr = F.lit(langs[-1])
    for lg in reversed(langs[:-1]):
        later = [scores[o] for o in langs[langs.index(lg) + 1 :]]
        cond = F.lit(True)
        for s in later:
            cond = cond & (scores[lg] >= s)
        expr = F.when(cond, F.lit(lg)).otherwise(expr)
    return expr


def quality_score(col: Column) -> Column:
    """Heuristic quality: stopword mass + length saturation − punctuation."""
    return F.round(
        0.5 * stopword_ratio(col)
        + 0.3 * F.least(n_tokens(col) / 100.0, F.lit(1.0))
        - 0.2 * punct_ratio(col),
        4,
    )


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash (mod 1e9+7) over the first 256 chars."""
    chars = F.regexp_extract_all(
        F.substring(F.lower(col), 1, FP_PREFIX), F.lit(r"."), 0
    )
    codes = F.transform(chars, F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % ROLL_MOD,
    )
