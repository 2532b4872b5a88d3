"""Build the sf1 rehearsal dataset (10x sf0.1) at /tmp/rehearsal/sf1.

Each table is replicated 10x with disjoint key offsets per copy so join
selectivity, group cardinality, per-node graph degrees, and the
duplicate-rate structure scale linearly (10 disjoint copies of the
sf0.1 world). ``documents.text`` is token-salted per copy (copy 0 =
original) so cross-copy shingle/minhash collisions are zero — plain
replication would make every doc a 10-clone and inflate pair outputs
45x instead of 10x. Tables land as SINGLE parquet files (the driver's
layout; sources/tables.py reads footers via pyarrow, which rejects
directories). The KDC corpus regenerates itself at 1M records via the
sf-keyed synth generator.

Usage: python tools/build_sf1.py   (idempotent; ~5 min, ~175 MB)
"""
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from kdcloganalyzer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/rehearsal/sf1"

U, O, P, S, E, D, V = (10**6, 10**8, 10**6, 10**6, 10**9, 10**6, 10**6)


def off(col: str, unit: int):
    return (F.col(col) + F.col("copy") * unit).alias(col)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="build_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    rep = spark.range(10).withColumnRenamed("id", "copy")

    def write_single(df, t: str) -> None:
        """One parquet FILE at {OUT}/{t}.parquet (driver layout)."""
        final = f"{OUT}/{t}.parquet"
        if os.path.isfile(final):
            return
        tmp = f"{OUT}/_tmp_{t}"
        df.drop("copy").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        if os.path.isdir(final):
            shutil.rmtree(final)
        shutil.move(part, final)
        shutil.rmtree(tmp, ignore_errors=True)
        print(t, "->", os.path.getsize(final) // (1 << 20), "MB", flush=True)

    def src(t: str):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    for t in ("nation", "region"):  # fixed dims — not scaled
        write_single(src(t).withColumn("copy", F.lit(0)), t)
    write_single(
        src("customer").crossJoin(rep).select(
            off("c_custkey", U), "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment", "copy"),
        "customer",
    )
    write_single(
        src("supplier").crossJoin(rep).select(
            off("s_suppkey", S), "s_name", "s_nationkey", "s_acctbal",
            "copy"),
        "supplier",
    )
    write_single(
        src("part").crossJoin(rep).select(
            off("p_partkey", P), "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice", "copy"),
        "part",
    )
    write_single(
        src("orders").crossJoin(rep).select(
            off("o_orderkey", O), off("o_custkey", U), "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority", "copy"),
        "orders",
    )
    write_single(
        src("lineitem").crossJoin(rep).select(
            off("l_orderkey", O), off("l_partkey", P), off("l_suppkey", S),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate", "copy"),
        "lineitem",
    )
    write_single(
        src("events").crossJoin(rep).select(
            off("event_id", E), "ts", off("user_id", U), "event_type",
            "value", "props", "copy"),
        "events",
    )
    salted = F.when(F.col("copy") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit("([A-Za-z0-9]+)"),
            # '$1k<copy>': group ref then a non-digit separator — '$1'
            # followed directly by the copy digit would parse as $1k
            F.concat(F.lit("$1k"), F.col("copy").cast("string")),
        )
    )
    write_single(
        src("documents").crossJoin(rep).select(
            off("doc_id", D), salted.alias("text"), "lang", "source",
            "n_chars", "copy"),
        "documents",
    )
    write_single(
        src("embeddings").crossJoin(rep).select(
            off("vec_id", V), "embedding", "label", "copy"),
        "embeddings",
    )

    from kdcloganalyzer_spark.sources.kdc_synth import synth_dir_for_sf

    synth_dir_for_sf(OUT)  # 1M-record KDC corpus (idempotent)
    spark.stop()
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
