"""Command-line entry point — the Spark-native replacement for the
reference's job drivers (``hadoop jar loganalyzer.jar …UserTimeRunner
<in> <out>``, UserTimeRunner.java:53-60, and the hadoop-streaming perl
invocation, README.md:14). One binary, every registered query:

    python -m kdcloganalyzer_spark list
    python -m kdcloganalyzer_spark run first_last_auth_per_user \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m kdcloganalyzer_spark run agg_min_max_count --explain
    python -m kdcloganalyzer_spark run top_n_entities \
        --out /tmp/topn --format csv

``run`` prints the result (or writes it with ``--out``); ``--explain``
prints the formatted physical plan instead of executing — the tool for
checking pushdown/broadcast/exchange shapes before paying for a 100 TB
run. ``verify <id>`` (or ``verify --all``) runs the DuckDB oracle
compare locally — the same check the driver's correctness gate applies.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kdcloganalyzer_spark",
        description="PySpark-native KDC log / LLM-pipeline analytics engine",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered query ids (SURVEY.md §2)")

    r = sub.add_parser("run", help="run one registered query")
    r.add_argument("query_id")
    r.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="scale-factor directory with the parquet tables",
    )
    r.add_argument("--limit", type=int, default=20, help="rows to print")
    r.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of executing",
    )
    r.add_argument("--out", help="write the full result here instead of printing")
    r.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "csv", "json", "orc"],
        help="output format for --out",
    )

    v = sub.add_parser(
        "verify",
        help="run the DuckDB oracle compare for one id (or --all)",
    )
    v.add_argument("query_id", nargs="?", help="query id (omit with --all)")
    v.add_argument("--all", action="store_true", help="verify every oracle id")
    v.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="scale-factor directory with the parquet tables",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from kdcloganalyzer_spark.plans import registry

    registry.load_all()

    if args.cmd == "list":
        for qid in sorted(registry.QUERIES):
            oracle = "oracle" if qid in registry.ORACLES else "rows-only"
            print(f"{qid}\t{oracle}")
        return 0

    if args.cmd == "verify":
        from kdcloganalyzer_spark.oracle import (
            compare,
            duckdb_con,
            oracle_sql_for,
        )
        from kdcloganalyzer_spark.session import get_spark

        if args.all and args.query_id:
            print("give a query id OR --all, not both", file=sys.stderr)
            return 2
        ids = (
            sorted(registry.QUERIES)
            if args.all
            else [args.query_id] if args.query_id else []
        )
        if not ids:
            print("give a query id or --all", file=sys.stderr)
            return 2
        spark = get_spark(app_name="cli:verify")
        con = duckdb_con(args.sf_dir)
        rc = 0
        for qid in ids:
            if qid not in registry.QUERIES:
                print(f"{qid}\tUNKNOWN")
                rc = 2
                continue
            try:
                if qid not in registry.ORACLES:
                    # rows-only ids still get the driver's smoke check
                    n = registry.QUERIES[qid](spark, args.sf_dir).count()
                    print(f"{qid}\tROWS-ONLY ({n} rows)")
                    continue
                # strict=True: the local verify also cross-checks
                # NULL-vs-NaN census and DESCRIBE-level type leaks the
                # driver's pandas-path compare cannot see (ADVICE r8).
                ok, why = compare(
                    registry.QUERIES[qid](spark, args.sf_dir),
                    con,
                    oracle_sql_for(qid, args.sf_dir),
                    strict=True,
                )
            except Exception as e:  # noqa: BLE001 — report, keep going
                print(f"{qid}\tERROR: {type(e).__name__}: {e}"[:300])
                rc = rc or 1
                continue
            print(f"{qid}\t{'PASS' if ok else 'FAIL: ' + why}")
            rc = rc or (0 if ok else 1)
        return rc

    if args.query_id not in registry.QUERIES:
        print(f"unknown query id: {args.query_id!r} (see `list`)", file=sys.stderr)
        return 2

    from kdcloganalyzer_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{args.query_id}")
    df = registry.QUERIES[args.query_id](spark, args.sf_dir)

    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        writer = df.write.mode("overwrite")
        if args.format == "csv":
            writer = writer.option("header", "true")
        getattr(writer, args.format)(args.out)
        print(f"wrote {args.out} ({args.format})")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
