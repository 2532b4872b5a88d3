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


def test_stateful_counts_carry_state_across_batches(spark, sf_dir):
    """applyInPandasWithState must ACCUMULATE per-key state across
    micro-batches of one run: stream the events split into two files with
    maxFilesPerTrigger=1, then the LAST update-mode emission per user must
    equal the whole-table batch aggregate (not the second file's alone)."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql.streaming.state import GroupStateTimeout

    from kdcloganalyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    mid = ev.selectExpr("percentile_approx(ts, 0.5, 10000) AS m").collect()[0]["m"]
    stage = tempfile.mkdtemp(prefix="stateful_2batch_")
    data_dir = f"{stage}/data"
    import os

    os.makedirs(data_dir)
    for name, part in (
        ("00_first.parquet", ev.filter(F.col("ts") < F.lit(mid))),
        ("01_second.parquet", ev.filter(F.col("ts") >= F.lit(mid))),
    ):
        tmp = f"{stage}/_tmp"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{data_dir}/{name}")

    def update(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id BIGINT, n BIGINT",
            stateStructType="n BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    res = SQ._run_to_memory(sdf, "update")
    # last emission per user == cumulative count == batch GROUP BY
    final = res.groupBy("user_id").agg(F.max("n").alias("n"))
    expected = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


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


def test_rate_limit_keeper_multichunk_groups(spark, sf_dir, tmp_path):
    """Regression (r11 ADVICE): a group whose micro-batch delivery spans
    MULTIPLE Arrow chunks must replay the token-bucket recurrence in
    one global event-time order — per-chunk sorting diverges from the
    batch closed form whenever arrival order isn't chronological.
    Build a ts-DESCENDING events copy (so within-key arrival order is
    reversed) and force tiny chunks (maxRecordsPerBatch=4) so every
    multi-click user spans chunks, then demand exact equality with a
    sequential Python replay on the globally sorted series."""
    from kdcloganalyzer_spark.plans.round11_ops import (
        _RL_BURST,
        _RL_COST,
        _RL_RATE,
    )
    from kdcloganalyzer_spark.sources.tables import load_table

    mini = str(tmp_path / "rl_sf")
    (tmp_path / "rl_sf").mkdir()
    pdf = (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc())
        .toPandas()
    )
    pdf.to_parquet(f"{mini}/events.parquet", index=False)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        got = {
            r["user_id"]: (
                r["n_events"], r["n_throttled"], r["max_deficit_micro"]
            )
            for r in SQ.stream_rate_limit_keeper(spark, mini).collect()
        }
    finally:
        spark.conf.set(key, prev)

    from collections import defaultdict

    per_user = defaultdict(list)
    for r in (
        load_table(spark, mini, "events")
        .where(F.col("event_type") == "click")
        .select("user_id", F.unix_timestamp("ts").cast("bigint").alias("tsu"))
        .collect()
    ):
        per_user[r["user_id"]].append(r["tsu"])
    expect = {}
    for uid, ts in per_user.items():
        ts.sort()
        s, prev_t, n_thr, mx = 0, None, 0, 0
        for t in ts:
            dt = 0 if prev_t is None else t - prev_t
            s = max(0, s + _RL_COST - _RL_RATE * dt)
            prev_t = t
            mx = max(mx, s)
            if s > _RL_BURST:
                n_thr += 1
        expect[uid] = (len(ts), n_thr, mx)
    assert max(len(v) for v in per_user.values()) > 4, (
        "fixture must have a user spanning >1 Arrow chunk"
    )
    assert got == expect
