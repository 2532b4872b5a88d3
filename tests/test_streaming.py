"""Structured Streaming semantics tests (SURVEY.md §5.2 item 4 adjacent):
batch-equivalence of the streaming sessionizer and watermark late-drop.

The window-aggregation queries (tumbling/sliding/session) are covered by
the parametrized DuckDB oracle suite; here we pin the two rows-only
streaming behaviors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.sources.kdc_synth import synth_dir_for_sf
from kdcloganalyzer_spark.streaming import stream_queries as SQ


def test_stream_sessionize_equals_batch(spark, sf_dir):
    """File-granular micro-batches must assemble EXACTLY the records the
    batch sessionizer does — streaming adds incremental discovery, never
    different semantics."""
    from kdcloganalyzer_spark.operators.sessionize import sessionize
    from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw

    log_dir = synth_dir_for_sf(sf_dir)
    batch = sessionize(read_log_lines_raw(spark, log_dir)).drop("enctypes")
    stream = SQ.stream_sessionize_kdc(spark, log_dir)

    assert stream.count() == batch.count()
    # exceptAll both ways == multiset equality.
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_watermark_drops_late_batch(spark, sf_dir):
    """Batch 1 (recent rows) advances the watermark; batch 2 (only older
    rows) must be fully dropped, so every finalized window sits at/after
    the recent half's first hour and total counts never exceed the recent
    row count."""
    from kdcloganalyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    split_ts = ev.selectExpr("percentile_approx(ts, 0.5, 10000) AS m").collect()[
        0
    ]["m"]
    n_recent = ev.filter(F.col("ts") >= F.lit(split_ts)).count()

    out = SQ.watermark_late_drop(spark, sf_dir)
    rows = out.collect()
    assert rows, "append mode emitted no finalized windows"
    assert sum(r["n"] for r in rows) <= n_recent
    first_hour = min(r["win_start"] for r in rows)
    # No window may predate the recent half (old rows were dropped).
    assert first_hour >= split_ts.replace(minute=0, second=0, microsecond=0)
