"""Second sf1 rehearsal tranche (VERDICT r13 item 3): the next 25 batch
ids by BENCH cost (ranks 16-40; the top 15 ran in r13 —
tools/rehearse_sf1.py) against the 10x dataset at /tmp/rehearsal/sf1,
plus `dedup_minhash_eval` (a verdict-named suspect: its exact side is
blocked-off quadratic on a corpus third). Two runs per id: run1 = cold
(staging + plan JIT), run2 = warm; cross-scale comparisons use matched
run positions (BASELINE.md round-14 sf1 table).

Usage: python tools/rehearse_sf1_tranche2.py [sf_dir] [out_json]
(defaults: /tmp/rehearsal/sf1, /tmp/sf1_rehearsal_t2.json — pass
/root/testdata/sf0.1 for the matched-protocol reference runs)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rehearsal/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_rehearsal_t2.json"

registry.load_all()
spark = get_spark(app_name="rehearse_sf1_t2")
spark.sparkContext.setLogLevel("ERROR")
spark.range(100000).selectExpr("sum(id)").collect()

IDS = [
    "graph_triangle_count_shuffle",
    "graph_community_modularity",
    "text_source_drift",
    "text_ngram_novelty_incremental",
    "events_haar_wavelet",
    "text_tfidf",
    "text_pii_scrub",
    "kdc_password_spray",
    "analytics_basket_affinity",
    "text_top_bigrams",
    "text_quality_score",
    "kdc_referral_patterns",
    "analytics_waiting_supplier",
    "quality_bigram_lm",
    "join_interval_overlap",
    "sim_search_lsh_eval",
    "text_keyword_rake",
    "pipeline_dedup_report",
    "kdc_account_lockout",
    "analytics_price_index",
    "contamination_ngram",
    "agg_kmv_distinct_setops",
    "analytics_nation_trade_volume",
    "analytics_promo_revenue_share",
    "dedup_minhash_eval",
]
out = {}
for qid in IDS:
    runs = []
    for i in range(2):
        t0 = time.perf_counter()
        try:
            registry.QUERIES[qid](spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        except Exception as ex:  # noqa: BLE001 — record, keep going
            runs.append(f"ERR:{type(ex).__name__}:{str(ex)[:200]}")
            break
    out[qid] = runs
    print(qid, SF_DIR, runs, flush=True)
json.dump(out, open(OUT, "w"), indent=1)
print("DONE", flush=True)
