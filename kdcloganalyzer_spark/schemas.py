"""Explicit StructType schemas (SURVEY.md §1.3-1.4: never infer log schemas).

``KDC_RECORDS`` is the engine's post-sessionization record table — the Spark
equivalent of the reference's KDCLogRecord
(/root/reference/src/main/java/edu/cmu/cc/hadoop/kerberos/loganalyzer/KDCLogRecord.java:24-36),
with crealm/srealm kept as real columns (reference drops them in serde —
SURVEY.md §8 B4) and enctype columns promoted from the perl variant
(/root/reference/perl/kdcmapper-with-enctypes.pl:39-57).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw scan: one row per physical log line.
KDC_LOG_LINES = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("line", T.StringType(), True),
    ]
)

# Post-sessionization: one row per KDC request event (multi-line assembled).
KDC_RECORDS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("ts_raw", T.StringType(), True),
        T.StructField("req_type", T.StringType(), True),  # AUTH | TGS | UNKNOWN
        T.StructField("client", T.StringType(), True),
        T.StructField("crealm", T.StringType(), True),
        T.StructField("service", T.StringType(), True),
        T.StructField("srealm", T.StringType(), True),
        T.StructField("client_ip", T.StringType(), True),
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("referral", T.BooleanType(), False),
        T.StructField("error_class", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("enctypes", T.ArrayType(T.StringType()), True),
        T.StructField("chosen_enctype", T.StringType(), True),
    ]
)

# Flagship aggregate (reference UserTimeRec + key, SURVEY.md §1.2).
USER_TIME = T.StructType(
    [
        T.StructField("client", T.StringType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("n", T.LongType(), False),
    ]
)

# Driver synthetic tables (TESTDATA.md / FIXTURES.md §3).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
