"""Build the sf3 rehearsal dataset (30x sf0.1) at /tmp/rehearsal/sf3 —
ONLY the tables the three worst-sf1-ratio ids read (VERDICT r13 item 4:
`graph_triangle_count_shuffle`, `graph_pagerank`,
`dedup_minhash_band_tuning`): orders + lineitem (co-order/co-part edge
derivations) and documents (minhash corpus). Same disjoint-key-offset
replication scheme as tools/build_sf1.py, 30 copies; documents.text is
token-salted per copy so cross-copy shingle collisions are zero and the
duplicate-pair structure scales linearly (30 disjoint copies of the
sf0.1 world), not quadratically in the copy count.

Usage: python tools/build_sf3.py   (idempotent; ~1 GB)
"""
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from kdcloganalyzer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/rehearsal/sf3"
COPIES = 30

U, O, P, S, D = (10**6, 10**8, 10**6, 10**6, 10**6)


def off(col: str, unit: int):
    return (F.col(col) + F.col("copy") * unit).alias(col)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="build_sf3")
    spark.sparkContext.setLogLevel("ERROR")
    rep = spark.range(COPIES).withColumnRenamed("id", "copy")

    def write_single(df, t: str) -> None:
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
    salted = F.when(F.col("copy") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit("([A-Za-z0-9]+)"),
            F.concat(F.lit("$1k"), F.col("copy").cast("string")),
        )
    )
    write_single(
        src("documents").crossJoin(rep).select(
            off("doc_id", D), salted.alias("text"), "lang", "source",
            "n_chars", "copy"),
        "documents",
    )
    spark.stop()
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
