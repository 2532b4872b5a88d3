"""DECIMAL(38,0)-widened scaled divisions — r16 sf3 overflow sweep.

Sites whose cents-sum numerator × 1e6 crosses BIGINT around sf35
(analytics_customer_nrr, window_drawdown, analytics_new_vs_repeat — the
r15 widenings in pareto/corpus-funnel/pq-distortion/theta are already
law-tested in their own files) now accumulate through DECIMAL(38,0).
These tests pin the two laws that make the widening hash-neutral:

1. Spark's `div` on DECIMAL(38,0) truncates toward zero exactly like
   BIGINT `div` (and DuckDB `//` on HUGEINT) — checked on boundary
   values including magnitudes where the BIGINT path would overflow.
2. At driver-SF magnitudes the widened expressions emit the same value
   as the original BIGINT expressions (spot-checked via the registered
   queries' own oracles; here the expression-level identity).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_decimal_div_truncates_like_bigint_div(spark):
    cases = [
        (123456789, 7),
        (-123456789, 7),
        (10**12 + 7, 3),          # BIGINT-safe: both paths comparable
        (9_223_372_036, 11),      # * 1e6 just under BIGINT max
        (10**13 + 1, 9999991),    # * 1e6 OVERFLOWS BIGINT — DECIMAL only
        (5 * 10**13, 7 * 10**11),  # sf3-scale cents sums
    ]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a",
        "b",
        F.expr(
            "CAST(CAST(a AS DECIMAL(38,0)) * 1000000 div b AS BIGINT)"
        ).alias("dec_path"),
    )
    for r in df.collect():
        assert r["dec_path"] == _trunc_div(r["a"] * 1_000_000, r["b"]), (
            r["a"],
            r["b"],
        )


def test_widened_expr_equals_bigint_expr_at_safe_magnitudes(spark):
    """On BIGINT-safe inputs the widened form is value-identical to the
    original — the reason the driver oracle hashes cannot move."""
    df = spark.createDataFrame(
        [(1234567, 890123), (1, 3), (999999999, 7)], "a long, b long"
    ).select(
        F.expr("CAST(a * 1000000 div b AS BIGINT)").alias("old"),
        F.expr(
            "CAST(CAST(a AS DECIMAL(38,0)) * 1000000 div b AS BIGINT)"
        ).alias("new"),
    )
    for r in df.collect():
        assert r["old"] == r["new"]
