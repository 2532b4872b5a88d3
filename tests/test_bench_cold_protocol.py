"""Pins for bench.py's amortized-cold measurement protocol (VERDICT r12
item 2, hardened r13): stream ids take min-of-3 genuinely-cold samples
by clearing the streaming result cache between runs; batch amortized
ids keep their single-sample cold (their caches are not addressable
from the bench)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kdcloganalyzer_spark.plans import streaming_queries as sq  # noqa: E402


def test_evict_amortized_clears_stream_cache_only():
    sq._STREAM_RESULT_CACHE[("app", "sf", "q")] = object()
    assert bench._evict_amortized("stream_window_tumbling") is True
    assert sq._STREAM_RESULT_CACHE == {}
    # batch amortized ids are untouched (single-sample cold by design)
    sq._STREAM_RESULT_CACHE[("app", "sf", "q")] = object()
    assert bench._evict_amortized("embed_pca_power_iteration") is False
    assert ("app", "sf", "q") in sq._STREAM_RESULT_CACHE
    sq._STREAM_RESULT_CACHE.clear()
