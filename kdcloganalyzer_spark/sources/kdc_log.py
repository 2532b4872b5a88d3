"""Raw KDC log line source: (file, line_no, line) with correct in-file order.

The reference reads splits with seek-past-first-partial-line semantics
(KDCLogRecordReader.java:163-206); Spark's text source implements the same
split handling. What Spark does NOT give us directly is a per-file line
number, which the sessionizer needs. We recover total in-file order from
two metadata signals, with no reliance on task scheduling:

- ``_metadata.file_block_start`` — byte offset of the split a line came
  from (orders splits of one file);
- ``monotonically_increasing_id()`` — increases within a partition in read
  order (orders lines within a split).

``row_number() OVER (PARTITION BY file ORDER BY block_start, mid)`` is then
the exact per-file line number, whatever the file/partition packing.

Scale: the window shuffles once on file path; parallelism = #files, which
matches the KDC workload (many daily per-server log files). Compressed
inputs (.gz) arrive as one split per file, same code path. This fixes the
reference's split-boundary record corruption (FIXME at
KDCLogRecordReader.java:210, drop at :317-320) by construction — split
placement can no longer affect record assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_log_lines_raw(
    spark: SparkSession, path: str, max_line_length: int | None = None
) -> DataFrame:
    """(file, _block_start, _mid, line): raw scan plus the two order keys.

    No window yet — downstream operators that need their own window over the
    same (partitionBy file, orderBy _block_start,_mid) spec can fuse with
    the line-numbering into a single Sort (sessionize does this).

    ``max_line_length`` is the oversized-row defense (reference
    `mapred.linerecordreader.maxlength`, KDCLogRecordReader.java:167,
    311-315 — skip-don't-fail on pathological lines): encoded as a filter
    on the scan, so a corrupt multi-MB line costs its read, never memory
    in the sessionizer state.
    """
    from kdcloganalyzer_spark.sources.tables import ensure_utc_session

    # source entry point: pin the session timezone so to_timestamp in the
    # downstream sessionizer parses walls as UTC instants deterministically
    # (not dependent on whether an unrelated load_table ran first).
    ensure_utc_session(spark)
    df = spark.read.text(path).select(
        F.col("_metadata.file_path").alias("file"),
        F.col("_metadata.file_block_start").alias("_block_start"),
        F.monotonically_increasing_id().alias("_mid"),
        F.col("value").alias("line"),
    )
    if max_line_length is not None:
        df = df.filter(F.length("line") <= max_line_length)
    return df


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read text file(s) at ``path`` → (file, line_no, line), line_no 1-based."""
    raw = read_log_lines_raw(spark, path)
    w = Window.partitionBy("file").orderBy("_block_start", "_mid")
    return raw.select(
        "file", F.row_number().over(w).alias("line_no"), "line"
    )
