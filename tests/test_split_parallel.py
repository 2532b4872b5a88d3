"""Property tests for the split-parallel sessionizer (SURVEY.md §4.3):
byte-range splits of one huge log must yield >1 task and EXACTLY the
records of the many-files layout — the reference's split-boundary FIXME
(KDCLogRecordReader.java:210) fixed by construction.
"""

from __future__ import annotations

import glob
import os

import pytest

from kdcloganalyzer_spark.operators.sessionize import (
    sessionize,
    sessionize_split_parallel,
)
from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw
from kdcloganalyzer_spark.sources.kdc_synth import synth_dir_for_sf


@pytest.fixture(scope="module")
def single_file(sf_dir, tmp_path_factory) -> str:
    """All non-gz synth logs concatenated into ONE file, in name order —
    every per-file record boundary is preserved (files end on a
    terminator line), so the record multiset must match the many-files
    read exactly."""
    log_dir = synth_dir_for_sf(sf_dir)
    out = tmp_path_factory.mktemp("one_big_log") / "kdc-all.log"
    with open(out, "w") as dst:
        for p in sorted(glob.glob(os.path.join(log_dir, "*.log"))):
            with open(p) as src:
                dst.write(src.read())
    return str(out)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    )


@pytest.fixture()
def small_splits(spark):
    """Force ~4 KB byte-range splits so even the tiny test corpus scans
    as many partitions with records straddling split boundaries."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    yield
    spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_single_huge_file_splits_into_many_tasks(
    spark, single_file, small_splits
):
    raw = read_log_lines_raw(spark, single_file)
    assert raw.rdd.getNumPartitions() > 1  # the scan itself is parallel
    split_recs = sessionize_split_parallel(raw)
    # distinct split offsets prove multiple byte ranges fed the assembly
    n_splits = raw.select("_block_start").distinct().count()
    assert n_splits > 1
    # identical records to the window-based assembly of the same file
    window_recs = sessionize(read_log_lines_raw(spark, single_file))
    assert _rows(split_recs) == _rows(window_recs)


def test_single_file_matches_many_files_layout(
    spark, sf_dir, single_file, small_splits
):
    log_dir = synth_dir_for_sf(sf_dir)
    many = sessionize(
        read_log_lines_raw(spark, os.path.join(log_dir, "*.log"))
    )
    one = sessionize_split_parallel(read_log_lines_raw(spark, single_file))
    assert _rows(one) == _rows(many)


def test_split_parallel_matches_window_path_on_many_files(
    spark, sf_dir, small_splits
):
    """Boundary stitching under forced 4 KB splits across EVERY synth
    file (including the gz one, which arrives as a single split)."""
    log_dir = synth_dir_for_sf(sf_dir)
    a = sessionize_split_parallel(read_log_lines_raw(spark, log_dir))
    b = sessionize(read_log_lines_raw(spark, log_dir))
    assert _rows(a) == _rows(b)
