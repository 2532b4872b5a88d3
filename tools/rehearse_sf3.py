"""Run the three worst-sf1-ratio ids against the sf3 (30x) rehearsal
dataset (tools/build_sf3.py) — VERDICT r13 item 4: validate the
volume-derived exchange-sizing formula (min(256, max(32, n_edges/150k)))
one decade past sf1 and record where the 256-partition cap starts to
bind. Two runs per id (run1 = cold, run2 = warm), matched-position
comparison against the sf1 numbers in BASELINE.md.

Usage: python tools/rehearse_sf3.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.session import get_spark

registry.load_all()
spark = get_spark(app_name="rehearse_sf3")
spark.sparkContext.setLogLevel("ERROR")
spark.range(100000).selectExpr("sum(id)").collect()

IDS = [
    "dedup_minhash_band_tuning",
    "graph_pagerank",
    "graph_triangle_count_shuffle",
]
out = {}
for qid in IDS:
    runs = []
    for i in range(2):
        t0 = time.perf_counter()
        try:
            registry.QUERIES[qid](spark, "/tmp/rehearsal/sf3").write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        except Exception as ex:  # noqa: BLE001 — record, keep going
            runs.append(f"ERR:{type(ex).__name__}:{str(ex)[:200]}")
            break
    out[qid] = runs
    print(qid, "sf3", runs, flush=True)
json.dump(out, open("/tmp/sf3_rehearsal.json", "w"), indent=1)
print("DONE", flush=True)
