"""Time a subset of registered queries with bench.py's exact
methodology (3 noop-sink executions, record min + median) so a single
operator can be measured before/after an optimization without paying
the full 405-id suite. Prints one JSON line per id.

Usage:
    python tools/bench_ids.py <id> [<id> ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_ids.py ...

Same env contract as bench.py (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS).
Not part of the driver contract — a developer tool only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kdcloganalyzer_spark.plans import registry  # noqa: E402
from kdcloganalyzer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ids = sys.argv[1:]
    if not ids:
        print("usage: bench_ids.py <qid> [<qid> ...]", file=sys.stderr)
        sys.exit(2)
    registry.load_all()
    unknown = [q for q in ids if q not in registry.QUERIES]
    if unknown:
        print(f"unknown ids: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark(app_name="bench_ids")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    out = {}
    for qid in ids:
        fn = registry.QUERIES[qid]
        spark.sparkContext.setJobDescription(f"bench_ids: {qid}")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[qid] = {
            "min": round(min(runs), 3),
            "median": round(sorted(runs)[1], 3),
            "runs": [round(r, 3) for r in runs],
        }
        print(json.dumps({qid: out[qid]}), flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
