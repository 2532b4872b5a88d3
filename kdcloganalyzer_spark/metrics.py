"""Side-channel metrics via df.observe (SURVEY.md §2.1 `counters_observe`;
reference Hadoop counters at UserTimeMapper.java:28-48, perl
reporter:counter protocol at kdcmapper.pl:11-36).

The reference increments counters inside the mapper as records stream by.
Spark's equivalent is an Observation attached to the plan: metric
expressions evaluate during the SAME pass as the query (no second scan)
and surface after the first action, exactly-once per successful action.
The oracle-checkable companion query (plans/kdc_queries.py
`counters_observe`) remains the correctness pin; this module is the
production wiring where a second aggregation pass would be wasteful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_accept_filter(records: DataFrame) -> tuple[DataFrame, Observation]:
    """Apply the mapper's accept filter (UserTimeMapper.java:27-49) with
    the reference's counter taxonomy observed on the way through.

    Counter names mirror the Hadoop groups: Record Type×{AUTH,TGS,UNKNOWN,
    Invalid}, Rejected Records×{Invalid,Failed,Request Type,Referral},
    plus the errorless-failure relabel 'Missing Pre-authentication'
    (UserTimeMapper.java:35-39).
    """
    obs = Observation("kdc_counters")

    def n(cond):
        return F.sum(cond.cast("long"))

    observed = records.observe(
        obs,
        n(F.col("valid") & (F.col("req_type") == "AUTH")).alias("rt_auth"),
        n(F.col("valid") & (F.col("req_type") == "TGS")).alias("rt_tgs"),
        n(F.col("valid") & (F.col("req_type") == "UNKNOWN")).alias("rt_unknown"),
        n(~F.col("valid")).alias("rt_invalid"),
        n(~F.col("valid")).alias("rej_invalid"),
        n(F.col("valid") & ~F.col("success")).alias("rej_failed"),
        n(
            F.col("valid")
            & ~F.col("success")
            & F.col("error_class").isNull()
        ).alias("rej_missing_preauth"),
        n(
            F.col("valid") & F.col("success") & (F.col("req_type") != "AUTH")
        ).alias("rej_request_type"),
        n(
            F.col("valid")
            & F.col("success")
            & (F.col("req_type") == "AUTH")
            & F.col("referral")
        ).alias("rej_referral"),
    )
    accepted = observed.filter(
        F.col("valid")
        & F.col("success")
        & (F.col("req_type") == "AUTH")
        & ~F.col("referral")
    )
    return accepted, obs
