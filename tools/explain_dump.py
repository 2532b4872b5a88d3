"""Dump `.explain("formatted")` for registered queries to files.

Usage:
    python tools/explain_dump.py <outdir> <suffix> <id> [<id> ...]

Writes <outdir>/<id>_<suffix>.txt for each id (e.g. plans/r15,
suffix "before"/"after"). Developer tool; not part of the driver
contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kdcloganalyzer_spark.plans import registry  # noqa: E402
from kdcloganalyzer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir, suffix, *ids = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    registry.load_all()
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in ids:
        df = registry.QUERIES[qid](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{qid}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
