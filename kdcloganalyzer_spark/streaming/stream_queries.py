"""Structured Streaming operators (SURVEY.md §2.3 `stream_sessionize` and
the window/watermark family; reference EP2 `sink_stdout_stream` lineage —
/root/reference/perl/kdcmapper.pl:37-76 is a line-at-a-time streaming
mapper, which Structured Streaming generalizes).

Each registered query runs a bounded stream (Trigger.AvailableNow) to a
sink and returns the materialized result, so the driver's batch-shaped
contract (`(spark, sf_dir) -> DataFrame`) holds while the plan underneath
is a genuine StreamingQuery with state, watermarks, and incremental
triggers. On a cluster the same code runs unbounded: swap the trigger and
the sink.

Scale notes:
- windowed aggregations keep state per (window, key); watermarks bound
  that state — without them a 100 TB stream accretes state forever.
- the multi-line KDC sessionizer streams file-granularly: the file source
  delivers whole files per micro-batch (records never span files —
  KDCLogRecordReader scopes records to one split's file), so each batch
  runs the proven batch sessionizer via foreachBatch. No cross-batch
  state needed; state-API sessionization is only required when one file's
  tail can arrive in a later batch, which the file source never does.
- arbitrary state uses ``applyInPandasWithState``; the newer
  ``transformWithStateInPandas`` (Spark 4 composable state) was probed
  but its driver worker requires ``google.protobuf``, absent from this
  environment — the older API covers the same per-key-state semantics.
"""

from __future__ import annotations

from kdcloganalyzer_spark import appcache

from contextlib import contextmanager
from itertools import count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MEM_SEQ = count()


@contextmanager
def _state_sized_shuffle(spark: SparkSession, n: int = 4):
    """Scope ``spark.sql.shuffle.partitions`` down for a streaming run.

    Stateful streaming stages shuffle to the session's shuffle-partition
    count and the state store opens one instance PER partition PER
    micro-batch; with a few thousand state keys, 32+ partitions are pure
    task-scheduling overhead (2-4× the wall time of these bounded
    benches; 8 → 4 measured another 15-25% off the bounded runs — the
    state keyspaces here are hundreds to ~1k rows, far below the point
    where partition parallelism pays). The count binds into the
    checkpoint at first start, so it must be set BEFORE ``.start()`` — every query here uses a fresh
    checkpoint per invocation, making the restore safe. At real scale
    size this to key cardinality × executor count instead; AQE cannot do
    it for streaming (state partitioning is fixed by the checkpoint)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _run_to_memory(
    sdf: DataFrame, output_mode: str = "complete", n_shuffle: int = 4
) -> DataFrame:
    """Run a bounded streaming DataFrame to a memory sink; return result.

    Complete/update-mode runs disable the trailing no-data micro-batch
    (~0.17 s/run measured): complete re-emits the full result every
    data batch and the update-mode users here are NoTimeout
    pandas-state (emissions happen on data batches only), so the
    finalization batch can only re-deliver what is already in the
    sink. APPEND mode keeps it — watermark-closed windows emit exactly
    there, and EventTimeTimeout firing (own runner, not this helper)
    depends on it too.

    The checkpoint goes to tmpfs explicitly (r13): without an explicit
    location the engine creates its temp checkpoint under /tmp (disk),
    paying offset/commit-log fsyncs per micro-batch — measured ~0.1 s
    per bounded run on this box. Durability buys nothing for a bounded
    bench run; a real deployment points this at object storage."""
    import shutil

    spark = sdf.sparkSession
    name = f"stream_result_{next(_MEM_SEQ)}"
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old_nodata = spark.conf.get(nodata_key, "true")
    ckdir = appcache.tempdir(prefix=f"ck_{name}_", fast=True)
    with _state_sized_shuffle(spark, n_shuffle):
        if output_mode != "append":
            spark.conf.set(nodata_key, "false")
        try:
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckdir)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set(nodata_key, old_nodata)
            # The bounded run is over and the memory sink holds the
            # result — drop the checkpoint (offsets/commits/state-store
            # snapshots) NOW instead of at interpreter exit, or a full
            # bench with min-of-3 cold stream re-runs accumulates
            # state checkpoints in tmpfs for the process lifetime
            # (ADVICE r13). atexit (appcache.tempdir) stays as backstop.
            shutil.rmtree(ckdir, ignore_errors=True)
    return spark.table(name)


_STAGE_CACHE: dict[str, str] = {}
_LATE_SPLIT_CACHE: dict[str, str] = {}


def _staged_events_dir(sf_dir: str) -> str:
    """The streaming file source monitors a DIRECTORY; the driver ships
    events as a single parquet file. Stage a symlink dir once per sf."""
    if sf_dir not in _STAGE_CACHE:
        import os

        d = appcache.tempdir(prefix="events_stream_")
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"), f"{d}/events.parquet"
        )
        _STAGE_CACHE[sf_dir] = d
    return _STAGE_CACHE[sf_dir]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same timestamp
    normalization as the batch loader (sources/tables.py): dtype-dispatch
    over nanos-as-int64 / TIMESTAMP_NTZ / TIMESTAMP, always yielding a
    watermarkable TIMESTAMP column."""
    from kdcloganalyzer_spark.sources.tables import (
        ensure_utc_session,
        normalize_ts,
    )

    ensure_utc_session(spark)
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).parquet(_staged_events_dir(sf_dir))
    return normalize_ts(sdf, "ts")


def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day tumbling window × event_type counts/sums, with a 1-hour
    watermark bounding aggregation state."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    out = ev.groupBy(
        F.window("ts", "1 day").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_value_c"),
    )
    res = _run_to_memory(out)
    return res.select(
        F.col("win.start").alias("win_start"), "event_type", "n",
        "sum_value_c",
    )


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-day windows sliding by 1 day — each event lands in two windows."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    out = ev.groupBy(F.window("ts", "2 days", "1 day").alias("win")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_value_c"),
    )
    res = _run_to_memory(out)
    return res.select(
        F.col("win.start").alias("win_start"), "n", "sum_value_c"
    )


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap): dynamic-length
    windows that merge while events keep arriving within the gap."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    out = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("win"), "user_id"
    ).agg(F.count("*").alias("n"))
    res = _run_to_memory(out)
    return res.select(
        "user_id",
        F.col("win.start").alias("sess_start"),
        F.col("win.end").alias("sess_end"),
        "n",
    )


def watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data drop under a watermark, made deterministic via stream
    RESTART: the events table is split into a recent half and an only-old
    half. Run 1 streams the recent file and commits its watermark
    (max(recent.ts) - 10 minutes) to the checkpoint. Run 2 restarts from
    that checkpoint and streams the old file — every row sits below the
    restored watermark and is dropped, so the appended output holds ONLY
    the recent half's finalized windows.

    (Two runs, not two micro-batches of one run: under
    Trigger.AvailableNow the watermark is fixed for all planned batches
    and only advances at the final commit, so intra-run late batches are
    NOT dropped — restart-with-checkpoint is how the semantics actually
    bind, and doubles as a state-recovery demonstration.)
    """
    import glob
    import os
    import shutil

    # The recent/old input split is a pure function of the events table —
    # stage it once per sf_dir (median split, one coalesced parquet file
    # per half) and let every invocation symlink the halves into its own
    # fresh source dir. The two streaming runs (watermark commit, then
    # checkpointed restart over the late file) execute every time; only
    # the input prep is memoized.
    if sf_dir not in _LATE_SPLIT_CACHE:

        def build(half_dir: str) -> None:
            from kdcloganalyzer_spark.sources.tables import load_table

            ev_batch = load_table(spark, sf_dir, "events")
            split_ts = ev_batch.selectExpr(
                "percentile_approx(ts, 0.5, 10000) AS m"
            ).collect()[0]["m"]
            for name, half in (
                (
                    "00_recent.parquet",
                    ev_batch.filter(F.col("ts") >= F.lit(split_ts)),
                ),
                (
                    "01_late.parquet",
                    ev_batch.filter(F.col("ts") < F.lit(split_ts)),
                ),
            ):
                tmp = f"{half_dir}/_tmp"
                half.coalesce(1).write.mode("overwrite").parquet(tmp)
                shutil.move(
                    glob.glob(f"{tmp}/part-*.parquet")[0],
                    f"{half_dir}/{name}",
                )
            shutil.rmtree(f"{half_dir}/_tmp", ignore_errors=True)

        _LATE_SPLIT_CACHE[sf_dir] = appcache.persistent_stage(
            "latedrop", [f"{sf_dir}/events.parquet"], build
        )
    half_dir = _LATE_SPLIT_CACHE[sf_dir]

    stage = appcache.tempdir(prefix="late_drop_", fast=True)
    data_dir = f"{stage}/data"
    out_dir = f"{stage}/out"
    ckpt = f"{stage}/ckpt"
    os.makedirs(data_dir)
    schema = spark.read.parquet(half_dir).schema

    def run_once() -> None:
        sdf = (
            spark.readStream.schema(schema)
            .parquet(data_dir)
            .withWatermark("ts", "10 minutes")
        )
        out = sdf.groupBy(F.window("ts", "1 hour").alias("win")).agg(
            F.count("*").alias("n")
        )
        q = (
            out.select(F.col("win.start").alias("win_start"), "n")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with _state_sized_shuffle(spark):
        os.symlink(
            f"{half_dir}/00_recent.parquet", f"{data_dir}/00_recent.parquet"
        )
        run_once()  # commits watermark = max(recent.ts) - 10 min
        os.symlink(
            f"{half_dir}/01_late.parquet", f"{data_dir}/01_late.parquet"
        )
        run_once()  # old rows < restored watermark → dropped

    return spark.read.parquet(out_dir)


def stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming aggregation via ``applyInPandasWithState``
    (SURVEY.md §7 phase 6 "stateful sessionizer via state API" lineage —
    the arbitrary-state primitive the window/session operators can't
    express): per-user running (count, sum, first/last ts) state, updated
    per micro-batch in Arrow-batched pandas, emitted in update mode.

    Scale: state lives in the executor state store partitioned by the
    grouping key (one shuffle on user_id per batch); a watermark-driven
    timeout (``GroupStateTimeout.EventTimeTimeout``) would bound state for
    unbounded key domains — the bounded bench stream keeps NoTimeout so
    every key's final state is emitted deterministically.

    The update function is a self-contained closure (executors don't have
    /root/repo on sys.path — see .claude/skills/verify gotchas).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")

    def update(key, pdfs, state):
        import pandas as pd

        n, s, mn, mx = state.get if state.exists else (0, 0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            # per-row integer cents BEFORE summing: the state stays an
            # exact BIGINT, order-free across micro-batch arrival order
            s += int((pdf["value"] * 100).round().astype("int64").sum())
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "sum_value_c": [s],
                "first_ts": [mn],
                "last_ts": [mx],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id BIGINT, n BIGINT, sum_value_c BIGINT, "
            "first_ts TIMESTAMP, last_ts TIMESTAMP"
        ),
        stateStructType="n BIGINT, s BIGINT, mn TIMESTAMP, mx TIMESTAMP",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # 8 state partitions: per-group pandas calls dominate (~1.5k groups),
    # which is parallelism-bound — same tuning evidence as
    # session_timeout_closures (4.3 s @4, ~2.9 s @8 there).
    return _run_to_memory(out, "update", n_shuffle=8)


def static_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of events joins the
    static customer dim (broadcast — re-planned per batch, so a dim
    refresh is picked up between batches on a real cluster), then a
    complete-mode aggregation by market segment.

    Scale: the canonical streaming-enrichment shape — no state for the
    join itself (stateless per batch, unlike stream-stream joins); only
    the downstream aggregation keeps state, bounded by segment
    cardinality."""
    from kdcloganalyzer_spark.sources.tables import load_table

    ev = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(dim), "user_id", "left")
    out = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_value_c"),
    )
    return _run_to_memory(out)


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time range join: each click joins the same
    user's purchases within the following hour. Both sides carry
    watermarks and the join condition carries the event-time range, so
    the state store retains only one hour (+ lateness) of each side —
    the construction that keeps an unbounded stream-stream join's state
    finite. Under the bounded availableNow run the INNER join emits
    every match (watermarks only bound state/outer-finalization), so the
    result equals the batch range join the oracle computes."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "inner",
    ).select("user_id", "click_id", "purchase_id")
    # 8 partitions: both sides' ~33k-row state commits parallelize; the
    # join itself is state-store-bound, not scan-bound.
    return _run_to_memory(joined, "append", n_shuffle=8)


def stream_sessionize_kdc(spark: SparkSession, log_dir: str) -> DataFrame:
    """Streaming port of the multi-line KDC sessionizer
    (operators/sessionize.py; reference KDCLogRecordReader.java:208-324).

    A ``binaryFile`` stream discovers log files incrementally (20 files
    per micro-batch here — 2 batches over the 33-file corpus, enough to
    prove multi-batch operation without paying a third scheduling round) and delivers
    ONE ROW PER FILE — selecting only ``path`` prunes the content
    column, so per-batch file discovery costs a directory listing, not
    a full text scan (the earlier ``readStream.text`` shape paid one
    whole-corpus line scan per batch just to learn the file names via
    ``input_file_name()``; the micro-batch frame exposes neither
    ``inputFiles()`` nor ``_metadata`` — both probed empty/unresolved).
    foreachBatch then runs the batch sessionizer over exactly that
    batch's files — correct because records never span files, so
    file-granular batches cannot split a record. Each batch's records
    are pinned with ``localCheckpoint(eager=True)`` and the bounded
    result is their union — the executor-storage sink (r13: the
    earlier parquet append + re-read charged ~2 s of serialization
    that is sink-format cost, not streaming cost; a real deployment's
    append sink is whatever table format serves the records, and the
    micro-batch dataflow is identical either way).
    """
    from kdcloganalyzer_spark.operators.sessionize import sessionize
    from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw

    parts: list[DataFrame] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        files = [r["path"] for r in batch_df.select("path").collect()]
        if not files:
            return
        recs = sessionize(read_log_lines_raw(spark, files)).drop("enctypes")
        parts.append(recs.localCheckpoint(eager=True))

    with _state_sized_shuffle(spark, 16):
        q = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("maxFilesPerTrigger", 20)
            .load(log_dir)
            .writeStream.foreachBatch(process_batch)
            .option(
                "checkpointLocation",
                appcache.tempdir(prefix="stream_kdc_ckpt_", fast=True),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _staged_tail_chunks(
    log_dir: str, n_chunks: int, n_files: int = 1
) -> tuple[str, list[str]]:
    """Stage ``n_files`` log files as per-file ``n_chunks`` JSONL chunk
    files — the test harness's stand-in for a tail-follower on GROWING
    files. Each row is ``{"file": ..., "seq": per_file_line_no,
    "line": ...}``: a real tail source (Kafka topic, fluentd, a
    byte-offset follower) delivers exactly this (origin + payload +
    position), and the seq is what lets the stateful assembler
    re-establish in-file order after the group-key shuffle. Chunk
    boundaries land wherever the line count falls — deliberately
    MID-RECORD, the layout the file-granular foreachBatch sessionizer
    (stream_sessionize_kdc) never faces. All files' chunk ``c`` share
    one mtime tick, so a micro-batch carries the CONCURRENT growth of
    every followed file (oldest-first source ordering).

    Returns (monitored_dir, logical file names). Staging reads the
    files driver-side — it IS the simulated producer, not the engine's
    data path (the engine sees only the staged stream)."""
    import json
    import os

    key = f"{log_dir}::tail{n_chunks}x{n_files}"
    if key not in _STAGE_CACHE:
        srcs = sorted(
            f for f in os.listdir(log_dir) if f.endswith(".log")
        )[:n_files]

        def build(d: str) -> None:
            now = int(os.path.getmtime(os.path.join(log_dir, srcs[0])))
            for src in srcs:
                with open(os.path.join(log_dir, src)) as f:
                    lines = f.read().splitlines()
                per = max(1, (len(lines) + n_chunks - 1) // n_chunks)
                for c in range(n_chunks):
                    chunk = lines[c * per : (c + 1) * per]
                    p = os.path.join(d, f"chunk{c:02d}_{src}.json")
                    with open(p, "w") as out:
                        for i, line in enumerate(chunk):
                            out.write(
                                json.dumps(
                                    {
                                        "file": src,
                                        "seq": c * per + i,
                                        "line": line,
                                    }
                                )
                                + "\n"
                            )
                    os.utime(p, (now + c, now + c))

        d = appcache.persistent_stage(
            f"tail{n_chunks}x{n_files}",
            [os.path.join(log_dir, s) for s in srcs],
            build,
        )
        _STAGE_CACHE[key] = f"{d}\t" + "\t".join(srcs)
    parts = _STAGE_CACHE[key].split("\t")
    return parts[0], parts[1:]


def stream_sessionize_tail_kdc(
    spark: SparkSession, log_dir: str, n_chunks: int = 3, n_files: int = 1
) -> DataFrame:
    """Streaming multi-line sessionizer for GROWING FILES — the
    ``tail -f`` shape: each followed log file arrives in ``n_chunks``
    appended segments across micro-batches, and records STRADDLE the
    segment boundaries (the reference's record-assembly core,
    KDCLogRecordReader.java:208-324, under the one layout the
    file-granular foreachBatch design of ``stream_sessionize_kdc``
    dodges — that one is correct because records never span FILES; this
    one is correct when they span BATCHES). With ``n_files > 1``,
    several files grow CONCURRENTLY — one independent state row per
    file key (pinned in tests/test_streaming_tail.py's 2-file case).

    Shape: the line-feature pass (terminator detection) runs JVM-side on
    the stream exactly as in batch; ``applyInPandasWithState`` keyed by
    file then carries the PARTIAL-RECORD TAIL (unterminated trailing
    lines + their flags + running record/line offsets) across
    micro-batches, emitting only COMPLETED records' lines with globally
    consistent (rec_id, line_no) — the same ids the batch sessionizer
    assigns, so the downstream per-record assembly (``_assemble``) is
    the identical code path and the whole thing is batch-equivalent by
    construction (pinned in tests/test_streaming_tail.py). The trailing
    unterminated record is never emitted, matching the reference's
    drop-the-tail rule (reader:317-320).

    Scale: state is ONE row per live file (the tail of its current
    record — bounded by record length, not file length), shuffled on
    the file key; a fleet of growing files = one state key each,
    partitioned across executors. Per batch the work is the line-feature
    projection (codegen) + one Arrow exchange for the stateful group —
    no per-batch rescan of earlier data; at 100 TB/day of appending logs
    this is the standing-ingest shape, with ``GroupStateTimeout`` set to
    a processing-time horizon to reap files that stopped growing (the
    bounded bench keeps NoTimeout for determinism)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from kdcloganalyzer_spark.functions.kdc_parse import line_features
    from kdcloganalyzer_spark.operators.sessionize import _assemble

    d, _fnames = _staged_tail_chunks(log_dir, n_chunks, n_files)
    sdf = (
        spark.readStream.schema("file string, seq long, line string")
        .option("maxFilesPerTrigger", n_files)
        .json(d)
    )
    feats = line_features(F.col("line"))
    annotated = sdf.select(
        "file",
        "seq",
        "line",
        feats["is_sending"].alias("is_sending"),
    )

    def assemble_tail(key, pdfs, state):
        import pandas as pd

        if state.exists:
            next_seq, rec_base, line_base, tail, tail_flags = state.get
            tail_lines = tail.split("\n") if tail else []
            flags = [c == "1" for c in tail_flags]
        else:
            next_seq, rec_base, line_base = 0, 0, 0
            tail_lines, flags = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("seq")
            # The group-key shuffle destroys arrival order; seq restores
            # it. A gap means the harness delivered chunks out of order
            # — fail loud, never assemble wrong records.
            seqs = batch["seq"].to_numpy()
            if seqs[0] != next_seq or (
                seqs[1:] != seqs[:-1] + 1
            ).any():
                raise ValueError(
                    f"non-contiguous tail stream at {key}: "
                    f"expected {next_seq}, got {seqs[:3]}"
                )
            next_seq = int(seqs[-1]) + 1
            tail_lines = tail_lines + batch["line"].tolist()
            flags = flags + batch["is_sending"].tolist()
        last = -1
        for i, fl in enumerate(flags):
            if fl:
                last = i
        k = last + 1
        out_lines, out_flags = tail_lines[:k], flags[:k]
        rec_ids, line_nos = [], []
        rc = rec_base
        for i, fl in enumerate(out_flags):
            rec_ids.append(rc)
            line_nos.append(line_base + i + 1)
            if fl:
                rc += 1
        state.update(
            (
                int(next_seq),
                int(rc),
                int(line_base + k),
                "\n".join(tail_lines[k:]),
                "".join("1" if fl else "0" for fl in flags[k:]),
            )
        )
        yield pd.DataFrame(
            {
                "file": [key[0]] * k,
                "rec_id": pd.Series(rec_ids, dtype="int64"),
                "line_no": pd.Series(line_nos, dtype="int64"),
                "line": out_lines,
            }
        )

    stateful = annotated.groupBy("file").applyInPandasWithState(
        assemble_tail,
        "file string, rec_id long, line_no long, line string",
        "next_seq long, rec_base long, line_base long, "
        "tail string, tail_flags string",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    lines_df = _run_to_memory(stateful, "append")
    feats2 = line_features(F.col("line"))
    return _assemble(
        lines_df.select(
            "file",
            "rec_id",
            "line_no",
            "line",
            *[v.alias(n) for n, v in feats2.items()],
        ),
        "line_no",
    )


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the events file is staged TWICE into the
    monitored directory (a replayed/at-least-once upstream), and
    ``withWatermark + dropDuplicates`` emits each event_id exactly once;
    the materialized sink is then batch-aggregated per event_type — equal
    to the oracle's aggregation over the single original copy.

    Scale: dedup state is per-key in the state store, partitioned by the
    dedup key; the watermark bounds retention so an unbounded stream
    holds state only for the lateness horizon (under AvailableNow the
    watermark advances at the final commit, so the full bounded run
    dedups globally — exactly what a backfill replay wants)."""
    import os

    key = f"{sf_dir}::dup2"
    if key not in _STAGE_CACHE:
        d = appcache.tempdir(prefix="events_dup_")
        src = os.path.abspath(f"{sf_dir}/events.parquet")
        os.symlink(src, f"{d}/copy_a.parquet")
        os.symlink(src, f"{d}/copy_b.parquet")
        _STAGE_CACHE[key] = d
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    from kdcloganalyzer_spark.sources.tables import (
        ensure_utc_session,
        normalize_ts,
    )

    ensure_utc_session(spark)
    sdf = normalize_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_STAGE_CACHE[key]),
        "ts",
    ).withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    # 8 partitions: 100k-key dedup state is commit-bound; more
    # partitions parallelize the per-partition store commits.
    deduped = _run_to_memory(sdf, "append", n_shuffle=8)
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_value_c"),
    )


def _staged_event_halves(sf_dir: str) -> str:
    """Stage the events table as TWO parquet files (event_id parity) in a
    monitored dir, so ``maxFilesPerTrigger=1`` yields two genuine
    incremental micro-batches with disjoint data (unlike the replay
    staging of ``stream_dedup_events``). Split via DuckDB so staging does
    not need a SparkSession; the streaming reader re-derives the schema
    from the staged files (DuckDB rewrites nanos → micros, which
    ``normalize_ts`` dispatches on anyway)."""
    key = f"{sf_dir}::halves"
    if key not in _STAGE_CACHE:
        import os

        src = os.path.abspath(f"{sf_dir}/events.parquet")

        def build(d: str) -> None:
            import duckdb

            con = duckdb.connect()
            for name, pred in (("half_a", "= 0"), ("half_b", "<> 0")):
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src}') "
                    f"WHERE event_id % 2 {pred}) "
                    f"TO '{d}/{name}.parquet' (FORMAT PARQUET)"
                )
            con.close()

        _STAGE_CACHE[key] = appcache.persistent_stage(
            "evhalves", [src], build
        )
    return _STAGE_CACHE[key]


def foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed-upsert sink (foreachBatch MERGE): each micro-batch
    aggregates per-user (latest event by (ts, event_id) + event count)
    and merges it into a keyed parquet state table — last-writer-wins on
    the latest-event columns, additive on the count. Two disjoint
    micro-batches (``_staged_event_halves``) make the merge genuinely
    incremental; the converged table must equal the batch
    latest-per-user query, which is what the oracle checks.

    Scale: this is the canonical "stream into a keyed serving table"
    sink. foreachBatch runs driver-side per batch and each merge is a
    batch plan: one shuffle for the batch's per-key aggregate, one
    co-partitioned union-aggregate against the current table. On a real
    cluster the new-version step becomes a Delta/Iceberg ``MERGE INTO``
    (transactional, file-pruned); the bounded bench pins each version
    with ``localCheckpoint`` — the merge dataflow (aggregate, union
    against current, re-aggregate) is byte-identical, and the
    serialization format of the serving table is sink cost, not
    streaming cost (r13; was versioned parquet dirs)."""
    from kdcloganalyzer_spark.sources.tables import (
        ensure_utc_session,
        normalize_ts,
    )

    ensure_utc_session(spark)
    d = _staged_event_halves(sf_dir)
    schema = spark.read.parquet(d).schema
    sdf = normalize_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d),
        "ts",
    )
    state: dict[str, DataFrame] = {}

    def latest_shape(df: DataFrame) -> DataFrame:
        return df.select(
            "user_id",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            "n",
        )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        b = latest_shape(
            batch_df.groupBy("user_id").agg(
                F.max_by(
                    F.struct("ts", "event_id", "event_type"),
                    F.struct("ts", "event_id"),
                ).alias("last"),
                F.count("*").alias("n"),
            )
        )
        if "cur" in state:
            cur = state["cur"]
            b = latest_shape(
                cur.unionByName(b)
                .groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct(
                            F.col("last_ts").alias("ts"),
                            F.col("last_event_id").alias("event_id"),
                            F.col("last_event_type").alias("event_type"),
                        ),
                        F.struct("last_ts", "last_event_id"),
                    ).alias("last"),
                    F.sum("n").alias("n"),
                )
            )
        state["cur"] = b.localCheckpoint(eager=True)

    with _state_sized_shuffle(spark):
        q = (
            sdf.writeStream.foreachBatch(merge)
            .outputMode("append")
            .option(
                "checkpointLocation",
                appcache.tempdir(prefix="upsert_ckpt_", fast=True),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return state["cur"]


def cms_stream_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch maintenance: the (r, bucket) cell
    counts are a streaming-supported aggregation in complete mode, so
    the sketch stays current across micro-batches with d×w rows of
    state TOTAL — the canonical 'sketch the firehose' shape. The bounded
    availableNow run's final cell table is defined to equal the batch
    cell table, which is what lets the batch CMS oracle hash-verify this
    streaming query."""
    from kdcloganalyzer_spark.operators.cms import cms_cells

    ev = read_events_stream(spark, sf_dir).select("event_type")
    return _run_to_memory(cms_cells(ev), "complete")


# Checkpoint of the bounded state-inspection run, built once per
# (session, sf) — the state DATA is input-determined, so rebuilding it
# per invocation would only re-pay the availableNow run; the amortized
# contract matches the ANN/edge caches.
_STATE_CKPT_CACHE: dict[tuple[str, str], str] = {}


def state_store_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-state AUDIT via the Spark 4 state data source: run a
    stateful per-event-type streaming count to a checkpoint
    (availableNow), then read the state store back as a BATCH DataFrame
    (``spark.read.format("statestore").load(ckpt)``) and project
    (key.event_type, value.count).

    This is the operational surface a production streaming deployment
    leans on — inspecting live state for debugging, validating a
    checkpoint before a version migration, or rehydrating state into a
    batch table — and it is exactly verifiable: the bounded run's final
    state IS the batch aggregate, so the DuckDB twin is a plain
    GROUP BY over the same events. Complements stream_stateful_counts
    (applyInPandasWithState builds custom state; this READS engine
    state from the outside).

    Scale: the state source reads one store per shuffle partition in
    parallel with no driver materialization; state size here is
    |event_type| rows per partition. The checkpoint is built once per
    (session, sf) and re-read thereafter."""
    key = (spark.sparkContext.applicationId, sf_dir)
    appcache.evict_stale(_STATE_CKPT_CACHE, spark)
    if key not in _STATE_CKPT_CACHE:
        stage = appcache.tempdir(prefix="state_inspect_")
        ckpt = f"{stage}/ckpt"
        ev = read_events_stream(spark, sf_dir).select("event_type")
        agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
        with _state_sized_shuffle(spark):
            q = (
                agg.writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        _STATE_CKPT_CACHE[key] = ckpt
    st = spark.read.format("statestore").load(_STATE_CKPT_CACHE[key])
    return st.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
    )


_UNION_SPLIT_CACHE: dict[str, str] = {}


def union_two_sources_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE streaming query over TWO independent file sources — the
    multi-source DAG every consolidation pipeline runs (two ingest
    feeds, one unified aggregation). The events table is split by
    user-id parity into two source directories; each side becomes its
    own readStream (own FileStreamSource, own offset log entry in the
    shared checkpoint), the union is tagged per side, and one per-day
    window aggregation consumes both.

    Scale: Structured Streaming tracks per-source offsets in a single
    checkpoint, so the two scans advance atomically per micro-batch —
    this is the mechanism that makes N-feed consolidation exactly-once;
    the union itself is a no-shuffle operator, and the windowed agg
    shuffles once on (window, feed) exactly as the single-source form
    does. Feeds of wildly different rates are the practical caveat at
    scale (one empty source never blocks AvailableNow)."""
    import os

    if sf_dir not in _UNION_SPLIT_CACHE:

        def build(d: str) -> None:
            from kdcloganalyzer_spark.sources.tables import load_table

            ev_batch = load_table(spark, sf_dir, "events")
            for name, half in (
                ("even", ev_batch.filter(F.col("user_id") % 2 == 0)),
                ("odd", ev_batch.filter(F.col("user_id") % 2 == 1)),
            ):
                half.write.mode("overwrite").parquet(f"{d}/{name}")

        _UNION_SPLIT_CACHE[sf_dir] = appcache.persistent_stage(
            "union2", [f"{sf_dir}/events.parquet"], build
        )
    d = _UNION_SPLIT_CACHE[sf_dir]
    schema = spark.read.parquet(f"{d}/even").schema

    def side(name: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(os.path.join(d, name))
            .withColumn("feed", F.lit(name))
        )

    ev = side("even").unionByName(side("odd")).withWatermark("ts", "1 hour")
    out = ev.groupBy(
        F.window("ts", "1 day").alias("win"), "feed"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_value_c"),
    )
    res = _run_to_memory(out)
    return res.select(
        F.col("win.start").alias("win_start"), "feed", "n", "sum_value_c"
    )


def binaryfile_manifest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming WHOLE-FILE ingestion — readStream over a binaryFile
    source (one row per file as it lands: the raw-asset intake feed),
    aggregated into the running manifest (files, bytes) per name
    prefix. The streaming twin of scan_binaryfile_source's batch read.

    Scale: file discovery is the micro-batch unit (maxFilesPerTrigger
    bounds intake); selecting only path/length prunes content reads
    entirely (the binaryFile source honors column pruning), so the
    manifest costs directory listings, not data bytes. The
    schema-spelled-out requirement is a readStream quirk pinned here:
    binaryFile streams do NOT infer."""
    from kdcloganalyzer_spark.plans.relational import (
        binfiles_path_for_sf,
        scan_binaryfile_source,
    )

    base = binfiles_path_for_sf(sf_dir)
    import os

    if not os.path.isdir(base):
        scan_binaryfile_source(spark, sf_dir)  # stage once
    sdf = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .load(f"{base}/*.txt")
    )
    out = (
        sdf.select(
            F.regexp_extract(F.col("path"), r"doc_(\d\d)", 1).alias(
                "prefix"
            ),
            "length",
        )
        .groupBy("prefix")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("length").cast("bigint").alias("total_bytes"),
        )
    )
    return _run_to_memory(out)


def kdc_failed_auth_alert_stream(
    spark: SparkSession, log_dir: str
) -> DataFrame:
    """STREAMING KDC SECURITY MONITOR — the reference's whole reason to
    exist, run as a live alert: log files arrive in micro-batches (the
    stream_sessionize_kdc discovery shape — binaryFile rows, content
    pruned), each batch sessionizes ONLY its files and appends that
    batch's per-(client, hour) failed-AUTH partial counts to a counter
    sink; the alert table is the rollup of the accumulated partials —
    clients reaching ≥3 failures inside an hour. Partial-count append +
    final merge is the idempotent streaming-counter pattern
    (foreachBatch upsert tier); counts are associative, so file-
    granular batching cannot change the alert set.

    Scale: per batch, only new files are parsed (cost tracks the
    delta); the counter sink stays (clients × hours)-sized, not
    event-sized. A production monitor replaces the final batch rollup
    with the same aggregation maintained incrementally (foreachBatch
    MERGE into a keyed store) and an eviction horizon on closed
    hours — the alert predicate is unchanged."""
    from kdcloganalyzer_spark.operators.sessionize import sessionize
    from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw

    parts: list[DataFrame] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        files = [r["path"] for r in batch_df.select("path").collect()]
        if not files:
            return
        recs = sessionize(read_log_lines_raw(spark, files))
        part = (
            recs.filter(
                F.col("valid")
                & ~F.col("success")
                & (F.col("req_type") == "AUTH")
            )
            .groupBy(
                "client",
                F.date_trunc("hour", "ts").alias("hour"),
            )
            .agg(F.count("*").alias("n"))
        )
        # (clients x hours)-sized partial, pinned in executor storage;
        # the production counter sink is a keyed MERGE target — the
        # partial-count dataflow per batch is identical (r13: parquet
        # append charged sink-format cost to the streaming bench).
        parts.append(part.localCheckpoint(eager=True))

    with _state_sized_shuffle(spark, 16):
        q = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("maxFilesPerTrigger", 20)
            .load(log_dir)
            .writeStream.foreachBatch(process_batch)
            .option(
                "checkpointLocation",
                appcache.tempdir(prefix="stream_kdc_alert_ck_", fast=True),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return (
        acc.groupBy("client", "hour")
        .agg(F.sum("n").cast("bigint").alias("n_failures"))
        .where(F.col("n_failures") >= 3)
        .select(
            "client",
            F.col("hour").cast("timestamp").alias("hour"),
            "n_failures",
        )
    )


def windowed_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-day top-3 event types: the tumbling-window count
    aggregation runs IN the stream (state = |windows x types|, bounded
    by the 1-hour watermark); the rank-and-cut runs as a batch window
    function over the materialized per-window counts — streaming append
    mode cannot rank across rows, so production top-k splits exactly
    this way (stream the mergeable counts, rank in the serving layer).
    """
    from pyspark.sql.window import Window as W

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    out = ev.groupBy(
        F.window("ts", "1 day").alias("win"), "event_type"
    ).agg(F.count("*").alias("n"))
    res = _run_to_memory(out)
    w = W.partitionBy("win").orderBy(F.desc("n"), "event_type")
    return (
        res.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


_TIMEOUT_SPLIT_CACHE: dict[str, str] = {}


def session_timeout_closures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME STATE TIMEOUTS (applyInPandasWithState +
    EventTimeTimeout): per-user session state that the ENGINE closes
    when the watermark passes last_seen + 1 day — the idle-session
    reaper every stateful streaming deployment needs (without
    timeouts, a user who never returns leaks state forever).

    Made deterministic with ONE far-future sentinel row (a synthetic
    user at 2024-03-01) appended to the staged feed: the single
    availableNow run builds every user's state from the data batches,
    the run-final watermark lands a month past every real user's
    last_seen + 1 day, and the engine's no-data finalization batch
    fires each expired state exactly once (hasTimedOut=True, then
    removed — double-fire is impossible by construction), emitting its
    closing state (event count, last seen). The sentinel's own state
    never expires and emits nothing. Which batch fires a given state
    is engine-internal — and IRRELEVANT here, which is exactly what
    makes a timeout operator oracle-checkable: the closure SET and the
    closing STATES are a pure function of the table. (r10 used two
    availableNow runs sharing a checkpoint; the fold-in halves the
    fixed micro-batch cost with an identical output hash.)

    The sentinel user_id is DERIVED as max(user_id) + 10^7 rather than
    hard-coded, so a dataset that happens to contain the old literal
    can never silently merge the sentinel into a real user's state
    (ADVICE r10).

    Scale: state is O(active users); the timeout sweep is the state
    store's own expiry scan, not a data scan — the construction that
    keeps an unbounded keyspace's state finite at 100 TB."""
    import glob
    import os
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    from kdcloganalyzer_spark import appcache

    if sf_dir not in _TIMEOUT_SPLIT_CACHE:

        def build(half_dir: str) -> None:
            from kdcloganalyzer_spark.sources.tables import load_table

            ev_batch = load_table(spark, sf_dir, "events").select(
                "user_id", "ts"
            )
            # 1-row control scalar: the sentinel id must be provably
            # absent from the table (max + offset), never a magic
            # literal.
            max_uid = ev_batch.agg(F.max("user_id")).collect()[0][0] or 0
            # JVM-side 1-row build: createDataFrame over a Python list
            # parallelizes to defaultParallelism slices and spawns one
            # Python worker per slice (~5.5 s measured for this one row
            # at local[32]); range(1) stays entirely in the JVM.
            advance = spark.range(1).select(
                F.lit(int(max_uid) + 10_000_000)
                .cast("bigint")
                .alias("user_id"),
                F.lit("2024-03-01").cast("timestamp").alias("ts"),
            )
            for name, part in (
                ("00_events.parquet", ev_batch),
                ("01_advance.parquet", advance),
            ):
                tmp = f"{half_dir}/_tmp"
                part.coalesce(1).write.mode("overwrite").parquet(tmp)
                shutil.move(
                    glob.glob(f"{tmp}/part-*.parquet")[0],
                    f"{half_dir}/{name}",
                )
            shutil.rmtree(f"{half_dir}/_tmp", ignore_errors=True)

        _TIMEOUT_SPLIT_CACHE[sf_dir] = appcache.persistent_stage(
            "timeout", [f"{sf_dir}/events.parquet"], build
        )
    half_dir = _TIMEOUT_SPLIT_CACHE[sf_dir]

    stage = appcache.tempdir(prefix="session_timeout_", fast=True)
    data_dir = f"{stage}/data"
    ckpt = f"{stage}/ckpt"
    os.makedirs(data_dir)
    parts: list[DataFrame] = []
    schema = spark.read.parquet(f"{half_dir}/00_events.parquet").schema

    def update(key, pdfs, state):
        import pandas as pd

        gap_us = 24 * 3600 * 1000000
        if state.hasTimedOut:
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "last_ts": [pd.to_datetime(last_us, unit="us")],
                }
            )
            return
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            mx = pdf["ts"].max().value // 1000  # ns -> us
            last_us = mx if mx > last_us else last_us
        state.update((n, last_us))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)  # ms
        yield from ()

    def run_once() -> None:
        sdf = (
            spark.readStream.schema(schema)
            .parquet(data_dir)
            .withWatermark("ts", "1 hour")
        )
        out = sdf.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=(
                "user_id BIGINT, n_events BIGINT, last_ts TIMESTAMP"
            ),
            stateStructType="n BIGINT, last_us BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _id: parts.append(
                    df.localCheckpoint(eager=True)
                )
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from kdcloganalyzer_spark.sources.tables import ensure_utc_session

    ensure_utc_session(spark)
    # 8 state partitions, not the suite default 4: this operator's cost
    # is the per-group Python call (1.5k groups × 2 batches), which is
    # parallelism-bound — measured 4.3 s at 4 partitions, 2.8-3.0 s at
    # 8, WORSE at 1-2 (8.0 s); 12-16 buy nothing further at this key
    # cardinality.
    with _state_sized_shuffle(spark, 8):
        # Single availableNow run over data + sentinel: states build
        # from the data batches, the run-final watermark (sentinel ts
        # − 1 h) expires every real state, and the engine's no-data
        # finalization batch fires the closures.
        os.symlink(
            f"{half_dir}/00_events.parquet", f"{data_dir}/00_events.parquet"
        )
        os.symlink(
            f"{half_dir}/01_advance.parquet",
            f"{data_dir}/01_advance.parquet",
        )
        run_once()
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return acc


def stream_dedup_events_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming dedup via ``dropDuplicatesWithinWatermark`` — the
    BOUNDED-STATE variant of stream_dedup_events: state for a key is
    evicted once the watermark passes its event time plus the delay,
    so an unbounded at-least-once replay holds state proportional to
    the lateness horizon, never the key universe (plain
    dropDuplicates under a watermark keeps keys forever unless the
    key itself embeds event time). The staged double-replay arrives
    well inside the 1-hour delay, so the bounded run dedups exactly
    like the unbounded-state form and shares its oracle."""
    import os

    key = f"{sf_dir}::dup2ww"
    if key not in _STAGE_CACHE:
        d = appcache.tempdir(prefix="events_dupww_")
        src = os.path.abspath(f"{sf_dir}/events.parquet")
        os.symlink(src, f"{d}/copy_a.parquet")
        os.symlink(src, f"{d}/copy_b.parquet")
        _STAGE_CACHE[key] = d
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    from kdcloganalyzer_spark.sources.tables import (
        ensure_utc_session,
        normalize_ts,
    )

    ensure_utc_session(spark)
    sdf = (
        normalize_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(_STAGE_CACHE[key]),
            "ts",
        )
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    deduped = _run_to_memory(sdf, "append", n_shuffle=8)
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_value_c"),
    )


def stream_rate_limit_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming token-bucket keeper — the stateful twin of
    events_rate_limit_sim (plans/round11_ops.py): per-user
    ``applyInPandasWithState`` carrying (deficit, last_tsu, counts)
    across micro-batches, replaying S = max(0, S + cost − rate·Δt) in
    exact integer micro-tokens. Rows are sorted by event time across
    the WHOLE per-batch group delivery — all Arrow chunks concatenated
    before one global sort (arrival order across the key shuffle is not
    chronological, and a >maxRecordsPerBatch group spans chunks — the
    applyInPandasWithState gotchas), and the file
    source delivers batches oldest-first, so the recurrence order is
    the event-time order and the final per-user summary equals the
    batch closed-form exactly (shared oracle).

    Scale: state is 5 integers per user; an EventTimeTimeout would
    evict idle buckets on an unbounded stream (the bounded bench run
    keeps NoTimeout so every user's final state emits)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.unix_timestamp("ts").cast("bigint").alias("tsu"),
        )
    )
    cost, rate, burst = 600000, 1000, 1800000

    def update(key, pdfs, state):
        import pandas as pd

        deficit, last_tsu, n, n_thr, mx = (
            state.get if state.exists else (0, -1, 0, 0, 0)
        )
        # One global sort over the WHOLE group delivery: a key whose
        # micro-batch exceeds arrow.maxRecordsPerBatch arrives as
        # multiple chunks, and per-chunk sorting would replay the
        # recurrence out of event-time order.
        for tsu in sorted(int(t) for pdf in pdfs for t in pdf["tsu"]):
            dt = 0 if last_tsu < 0 else tsu - last_tsu
            deficit = max(0, deficit + cost - rate * dt)
            last_tsu = tsu
            n += 1
            mx = max(mx, deficit)
            if deficit > burst:
                n_thr += 1
        state.update((deficit, last_tsu, n, n_thr, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_throttled": [n_thr],
                "max_deficit_micro": [mx],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id BIGINT, n_events BIGINT, n_throttled BIGINT, "
            "max_deficit_micro BIGINT"
        ),
        stateStructType=(
            "deficit BIGINT, last_tsu BIGINT, n BIGINT, n_thr BIGINT, "
            "mx BIGINT"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # pandas-state per user: parallelism-bound like stateful_user_counts
    return _run_to_memory(out, "update", n_shuffle=8)


def windowed_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bollinger bands: the per-day tumbling-window counts
    aggregate IN the stream (mergeable, watermark-bounded state — the
    windowed_topk_types split); the trailing ±2σ breach test runs as a
    batch window over the materialized daily summary, because a
    cross-WINDOW rolling frame is not expressible inside a streaming
    aggregation (state would need retractions across 7 closed windows).
    Shares events_bollinger_bands' oracle: integer cross-multiplied
    test, no float anywhere."""
    from pyspark.sql.window import Window as W

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    out = ev.groupBy(F.window("ts", "1 day").alias("win")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    res = _run_to_memory(out).select(
        F.col("win.start").alias("day"), "x"
    )
    win = W.orderBy("day").rowsBetween(-6, W.currentRow)
    w = res.select(
        "day",
        "x",
        F.count("*").over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("q"),
    )
    dev = F.col("x") * F.col("n") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return w.select(
        "day",
        F.col("x").alias("n_events"),
        F.col("n").alias("win_n"),
        F.expr("CAST(s * 1000 div n AS BIGINT)").alias("mean_milli"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
        .cast("bigint")
        .alias("var_num"),
        ((dev > 0) & (dev * dev > var4)).alias("breach_hi"),
        ((dev < 0) & (dev * dev > var4)).alias("breach_lo"),
    )
