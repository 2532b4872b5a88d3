"""Run the 15 most expensive batch ids against the sf1 rehearsal
dataset (tools/build_sf1.py). Two runs per id: run1 = cold (staging +
plan JIT), run2 = warm; compare matched run positions across scales
(BASELINE.md round-13 sf1 table).

Usage: python tools/rehearse_sf1.py
"""
import os, sys, time, json
sys.path.insert(0, '/root/repo')
from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.session import get_spark
registry.load_all()
spark = get_spark(app_name="rehearse_sf1b")
spark.sparkContext.setLogLevel("ERROR")
spark.range(100000).selectExpr("sum(id)").collect()
IDS = ["graph_label_propagation_converged","dedup_ngram_jaccard_dford",
"sessionize_split_parallel","dedup_ngram_jaccard","graph_pagerank",
"dedup_minhash_band_tuning","graph_triangle_count","graph_neighbor_jaccard",
"dedup_clusters","graph_label_propagation","dedup_containment",
"analytics_holt_linear","graph_kcore_peel","graph_bfs_distance",
"pipeline_corpus_funnel"]
out = {}
for qid in IDS:
    runs=[]
    for i in range(2):
        t0=time.perf_counter()
        try:
            registry.QUERIES[qid](spark, "/tmp/rehearsal/sf1").write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter()-t0,2))
        except Exception as ex:
            runs.append(f"ERR:{type(ex).__name__}:{str(ex)[:200]}")
            break
    out[qid]=runs
    print(qid, "sf1", runs, flush=True)
json.dump(out, open("/tmp/sf1_rehearsal_b.json","w"), indent=1)
print("DONE", flush=True)
