"""Laws for the round-8 operators that the oracle compare can't pin.

- ``test_decimal_arithmetic_exact``: the Spark-side DECIMAL(28,2)
  aggregation path promised by fn_decimal_suite's docstring — the
  decimal TYPE itself can't cross the driver's DuckDB→pandas fetch
  (DECIMAL renders as float64 there), so the registered query publishes
  canonical money STRINGS and this test proves true decimal
  sum/min/max agree with them digit-for-digit.
- ``test_fuzzy_join_vocabulary_equals_row_level``: the vocabulary-level
  plan rewrite of join_fuzzy_blocked (distinct names + min-key
  fan-back) must be output-identical to the naive row-level blocked
  join it replaced.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.sources.tables import load_table

registry.load_all()


def test_decimal_arithmetic_exact(spark, sf_dir):
    """DECIMAL(28,2) sum/min/max over o_totalprice must equal the
    canonical '%d.%02d' strings fn_decimal_suite publishes: the decimal
    path is exact (no float accumulation), so its plain string form is
    byte-identical to the integer-cents rendering."""
    orders = load_table(spark, sf_dir, "orders")
    dec = (
        orders.select(
            "o_orderstatus",
            # exact per-row conversion: cents BIGINT → DECIMAL(28,2)
            (
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .cast("decimal(28,2)")
                / 100
            ).cast("decimal(28,2)").alias("price_dec"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.sum("price_dec").cast("decimal(28,2)").alias("total_dec"),
            F.min("price_dec").cast("decimal(28,2)").alias("min_dec"),
            F.max("price_dec").cast("decimal(28,2)").alias("max_dec"),
        )
    )
    assert [f.dataType.simpleString() for f in dec.schema.fields[1:]] == [
        "decimal(28,2)"
    ] * 3
    got = {
        r["o_orderstatus"]: (
            str(r["total_dec"]),
            str(r["min_dec"]),
            str(r["max_dec"]),
        )
        for r in dec.collect()
    }
    want = {
        r["o_orderstatus"]: (r["total_dec"], r["min_dec"], r["max_dec"])
        for r in registry.QUERIES["fn_decimal_suite"](spark, sf_dir).collect()
    }
    assert got == want


def test_fuzzy_join_vocabulary_equals_row_level(spark, sf_dir):
    """join_fuzzy_blocked's vocabulary-level plan (distinct names with
    min-partkey, composite (prefix4, length) blocking, broadcast
    fan-back) must reproduce the naive row-level prefix-blocked join's
    best-match output exactly."""
    part = load_table(spark, sf_dir, "part")
    probe = part.where(
        (F.col("p_partkey") % 7 == 0) & (F.length("p_name") >= 7)
    ).select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(
            F.substring("p_name", 1, 5), F.expr("substring(p_name, 7)")
        ).alias("probe_name"),
    )
    naive = (
        probe.join(
            part.select("p_partkey", "p_name"),
            F.substring(F.col("probe_name"), 1, 4)
            == F.substring(F.col("p_name"), 1, 4),
        )
        .withColumn("lev", F.levenshtein("probe_name", "p_name"))
        .where(F.col("lev") <= 2)
    )
    w = Window.partitionBy("probe_key").orderBy("lev", "p_partkey")
    expected = sorted(
        (r["probe_key"], r["p_partkey"], r["lev"])
        for r in naive.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    )
    got = sorted(
        (r["probe_key"], r["match_key"], r["lev"])
        for r in registry.QUERIES["join_fuzzy_blocked"](
            spark, sf_dir
        ).collect()
    )
    assert got == expected
