"""Test-suite import path for the oracle compare; the implementation
lives in the package so the CLI ``verify`` subcommand shares it
(kdcloganalyzer_spark/oracle.py)."""

from kdcloganalyzer_spark.oracle import compare, duckdb_con  # noqa: F401
