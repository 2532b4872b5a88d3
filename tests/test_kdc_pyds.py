"""Parity: the Python DataSource KDC reader (sources/kdc_pyds.py) must
produce the same record multiset as the declarative window sessionizer
(operators/sessionize.py) on the same corpus — two independent
implementations of KDCLogRecordReader.java:208-324 checking each other.
"""

from __future__ import annotations

from kdcloganalyzer_spark.plans.kdc_queries import kdc_records
from kdcloganalyzer_spark.sources.kdc_pyds import read_kdc_python_source
from kdcloganalyzer_spark.sources.kdc_synth import synth_dir_for_sf

COLS = [
    "ts_raw", "req_type", "client", "crealm", "service", "srealm",
    "client_ip", "valid", "success", "referral", "error_class", "error",
    "chosen_enctype",
]


def _multiset(df):
    rows = [tuple(r[c] for c in COLS) for r in df.select(*COLS).collect()]
    return sorted(rows, key=str)


def test_python_source_matches_declarative_sessionizer(spark, sf_dir):
    log_dir = synth_dir_for_sf(sf_dir)
    pyds = read_kdc_python_source(spark, log_dir)
    decl = kdc_records(spark, sf_dir)
    a, b = _multiset(pyds), _multiset(decl)
    assert len(a) == len(b) and a == b


def test_python_source_parallelism_is_per_file(spark, sf_dir):
    log_dir = synth_dir_for_sf(sf_dir)
    df = read_kdc_python_source(spark, log_dir)
    n_files = df.select("file").distinct().count()
    assert df.rdd.getNumPartitions() == n_files


def test_python_source_matches_sessionizer_on_golden(spark, tmp_path):
    """The adversarial golden fixture (every error class, B5 interleaved
    headers, headerless verify, referral, no-preauth) must parse
    identically through both implementations."""
    import os
    import shutil

    golden = os.path.join(
        os.path.dirname(__file__), "fixtures", "kdc", "golden.log"
    )
    d = tmp_path / "logs"
    d.mkdir()
    shutil.copy(golden, d / "golden.log")

    from kdcloganalyzer_spark.operators.sessionize import sessionize
    from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw

    decl = sessionize(read_log_lines_raw(spark, str(d))).drop("enctypes")
    pyds = read_kdc_python_source(spark, str(d))
    a, b = _multiset(pyds), _multiset(decl)
    assert len(a) > 0 and a == b
