"""Round-15 sf1 rehearsal tranche 3: the four r14 sketch twins (the
only registered ids with no sf1 row — VERDICT r14 task 4), the four
r15 per-series window twins, and every id whose plan changed in the
r15 optimization round (single-pass Q2/Q18/ABC rewrites, src-
partitioned edge cache). Two runs per id: run1 cold, run2 warm.

Usage: python tools/rehearse_sf1_tranche3.py
"""
import sys, time, json
sys.path.insert(0, '/root/repo')
from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.session import get_spark
registry.load_all()
spark = get_spark(app_name="rehearse_sf1c")
spark.sparkContext.setLogLevel("ERROR")
spark.range(100000).selectExpr("sum(id)").collect()
IDS = [
    "agg_weighted_median_sketch", "analytics_pareto_concentration_approx",
    "events_user_entropy_cms", "sessionize_stats_rollup_sketch",
    "events_bollinger_bands_series", "events_forecast_seasonal_naive_series",
    "events_peak_detection_series", "window_drawdown_series",
    "analytics_min_cost_supplier", "analytics_large_volume_orders",
    "analytics_abc_classification", "graph_degree_stats",
    "graph_label_propagation", "graph_label_propagation_converged",
    "graph_pagerank", "graph_kcore_peel", "graph_bfs_distance",
    "graph_community_modularity", "graph_degree_assortativity",
]
out = {}
for qid in IDS:
    runs = []
    for i in range(2):
        t0 = time.perf_counter()
        try:
            registry.QUERIES[qid](spark, "/tmp/rehearsal/sf1").write.format(
                "noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        except Exception as ex:
            runs.append(f"ERR:{type(ex).__name__}:{str(ex)[:200]}")
            break
    out[qid] = runs
    print(qid, "sf1", runs, flush=True)
json.dump(out, open("/tmp/sf1_rehearsal_c.json", "w"), indent=1)
print("DONE", flush=True)
