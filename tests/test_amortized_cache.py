"""Property tests for the streaming `_amortized` result cache
(plans/streaming_queries.py) — VERDICT r12 item 6.

The cache is the amortization contract the bench's steady numbers rest
on, so its invariants get pinned mechanically:

1. a second invocation of an amortized id returns IDENTICAL rows (the
   cache may never change answers);
2. the cache key carries sf_dir — two scales must produce two distinct
   entries with their own results (this test FAILS if the key ever
   drops sf_dir: the second scale would serve the first scale's rows);
3. `appcache.evict_stale` drops dead-app entries on the next call, so a
   session bounce can never serve a frame whose JVM-side blocks died
   with the old app.
"""

from __future__ import annotations

import kdcloganalyzer_spark.plans.streaming_queries as PS
from kdcloganalyzer_spark import appcache
from kdcloganalyzer_spark.plans import registry

registry.load_all()

CHEAP_ID = "stream_window_tumbling"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_second_invocation_identical_and_cached(spark, sf_dir):
    fn = registry.QUERIES[CHEAP_ID]
    first = _rows(fn(spark, sf_dir))
    key = (spark.sparkContext.applicationId, sf_dir, CHEAP_ID)
    assert key in PS._STREAM_RESULT_CACHE, (
        "amortized id did not populate the result cache under the "
        "(appId, sf_dir, qid) key"
    )
    assert _rows(fn(spark, sf_dir)) == first


def test_cache_key_carries_sf_dir(spark, sf_dir):
    fn = registry.QUERIES[CHEAP_ID]
    small = _rows(fn(spark, sf_dir))
    other_sf = "/root/testdata/sf0.01"
    bigger = _rows(fn(spark, other_sf))
    app = spark.sparkContext.applicationId
    assert (app, sf_dir, CHEAP_ID) in PS._STREAM_RESULT_CACHE
    assert (app, other_sf, CHEAP_ID) in PS._STREAM_RESULT_CACHE
    # sf0.01 has 10x the events of sf0.001: identical results would mean
    # the cache served a stale scale's frame.
    assert small != bigger
    assert sum(r[2] for r in bigger) > sum(r[2] for r in small)


def test_evict_stale_drops_dead_app_entries(spark, sf_dir):
    fn = registry.QUERIES[CHEAP_ID]
    fn(spark, sf_dir)  # ensure one live entry exists
    app = spark.sparkContext.applicationId
    live_key = (app, sf_dir, CHEAP_ID)
    dead_key = ("app-DEAD-0000", sf_dir, CHEAP_ID)
    PS._STREAM_RESULT_CACHE[dead_key] = PS._STREAM_RESULT_CACHE[live_key]
    appcache.evict_stale(PS._STREAM_RESULT_CACHE, spark)
    assert dead_key not in PS._STREAM_RESULT_CACHE
    assert live_key in PS._STREAM_RESULT_CACHE
    # the wrapper itself evicts before lookup, so a dead entry can never
    # be served even if evict_stale were not called explicitly
    PS._STREAM_RESULT_CACHE[dead_key] = PS._STREAM_RESULT_CACHE[live_key]
    fn(spark, sf_dir)
    assert dead_key not in PS._STREAM_RESULT_CACHE
