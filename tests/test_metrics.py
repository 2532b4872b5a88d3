"""observe()-based counters must agree with the oracle-checkable
companion aggregation (SURVEY.md §5.2: counters expressed as queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.metrics import observed_accept_filter
from kdcloganalyzer_spark.plans.kdc_queries import kdc_records


def test_observed_counters_match_groupby(spark, sf_dir):
    records = kdc_records(spark, sf_dir)
    accepted, obs = observed_accept_filter(records)
    n_accepted = accepted.count()  # action → metrics become available
    got = obs.get

    def cnt(cond) -> int:
        return records.filter(cond).count()

    assert got["rt_auth"] == cnt(F.col("valid") & (F.col("req_type") == "AUTH"))
    assert got["rt_tgs"] == cnt(F.col("valid") & (F.col("req_type") == "TGS"))
    assert got["rt_invalid"] == cnt(~F.col("valid"))
    assert got["rej_failed"] == cnt(F.col("valid") & ~F.col("success"))
    assert got["rej_missing_preauth"] == cnt(
        F.col("valid") & ~F.col("success") & F.col("error_class").isNull()
    )
    assert got["rej_referral"] == cnt(
        F.col("valid")
        & F.col("success")
        & (F.col("req_type") == "AUTH")
        & F.col("referral")
    )
    # the accept path and the counters partition the record set
    assert n_accepted == cnt(
        F.col("valid")
        & F.col("success")
        & (F.col("req_type") == "AUTH")
        & ~F.col("referral")
    )
