"""Line-level KDC log parsing expressions (all JVM-side built-ins).

Faithful re-expression of the reference reader's per-line state machine
(KDCLogRecordReader.java:208-324) as Spark columns. Patterns are from
KDCLogRecordReader.java:47-81; the per-line check PRECEDENCE mirrors the
if/else-if chain exactly (header:236 → sending:267 → preauth:270 →
error chain:272-297 → referral:298 → headerless verify:300-309):

- a header line is never error-classified (the `continue` at reader:265);
- within a line, the first matching class in chain order wins;
- the headerless "Failed to verify ..." regexes are only consulted when
  nothing else matched (the trailing `else` at reader:300).

Performance layout (measured ~3× on the parse hot path): the per-line pass
computes only booleans — every regex is prefiltered by a cheap
`contains()` guard so the common line never runs a regex to completion —
while the expensive 7-group header extraction and enctype split run AFTER
record aggregation, once per record on the single surviving line
(``header_fields`` / ``enctype_fields``). Everything compiles into
whole-stage-codegen projections — no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# KDCLogRecordReader.java:47-49
TIMESTAMP = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
ATOM = r"[-/_\.a-zA-Z0-9]+"
REALM = r"[-\.a-zA-Z0-9]+"

# KDCLogRecordReader.java:50-54 (matchInitial) — groups:
# 1=ts 2=reqtype 3=client 4=crealm 5=ip 6=service 7=srealm
HEADER_RE = (
    f"({TIMESTAMP})\\s+((?:AS|TGS)-REQ)\\s+({ATOM})@({REALM})"
    f"\\s+from\\s+(IPv4:[\\d\\.]+|IPv6:[\\p{{XDigit}}\\.:]+)"
    f"\\s+for\\s+({ATOM})@({REALM})"
)

# KDCLogRecordReader.java:79-81 (matchSending — the record terminator)
SENDING_RE = (
    f"{TIMESTAMP}\\s+sending\\s+\\d+\\s+bytes\\s+to\\s+"
    f"(?:IPv4:[\\d\\.]+|IPv6:[\\p{{XDigit}}\\.:]+)"
)

# KDCLogRecordReader.java:76-77 — headerless failures, merged into one
# pattern (semantics preserved: AP-REQ variant requires the colon).
# Groups: 1=ts 2=message
VERIFY_RE = (
    f"({TIMESTAMP})\\s+(Failed to verify (?:AP-REQ:|checksum|authenticator).*)"
)

# matchBadServerEtype (reader:75) uses .matches() on .*X.* — equivalent to
# find() of the inner pattern.
BAD_SERVER_ETYPE_RE = r"\bServer \(.*\) has no support.*\betypes\b"

# perl kdcmapper-with-enctypes.pl:78-81
ENCTYPES_RE = r"Client supported enctypes: (.*) using (\S+)"
ENCTYPES_GUARD = "Client supported enctypes: "

PREAUTH_SUBSTR = "Pre-authentication succeeded"  # reader:55
REFERRAL_SUBSTR = "eturning a referral to realm"  # reader:78

# The §2.4 taxonomy: (class, [trigger substrings]) in exact chain order
# (KDCLogRecordReader.java:272-297).
ERROR_CHAIN: list[tuple[str, list[str]]] = [
    ("BAD_PASSWORD", ["Failed to decrypt PA-DATA --"]),  # reader:56,272
    (
        "BAD_NAME",  # reader:57,68-70,274-278
        [
            "UNKNOWN --",
            "Client no longer in database",
            "Client not found in database",
            "Server not found in database",
        ],
    ),
    (
        "UNUSABLE_NAME",  # reader:58-62,279-284
        [
            "Client expired",
            "Client's key has expired",
            "Server's key has expired",
            "Principal may not act as server",
            "Principal may not act as client",
        ],
    ),
    (
        "BAD_AUTHENTICATION",  # reader:63-66,71-72,75,285-292
        [
            "krb_rd_req:",
            "Too large time skew",
            "No key matches pa-data",
            "@BAD_SERVER_ETYPE@",  # regex, handled specially
            "Addition ticket have not matching etypes",
            "Bad request for renewable ticket",
            "Ticket expired",
        ],
    ),
    (
        "BAD_PARAMETERS",  # reader:73-74,293-295
        [
            "equest to forward non-forwardable ticket",
            "equest to renew non-renewable ticket",
        ],
    ),
    ("UNKNOWN", ["Failed building TGS-REP"]),  # reader:67,296-297
]


def _contains_any(line: Column, substrings: list[str]) -> Column:
    cond = F.lit(False)
    for s in substrings:
        if s == "@BAD_SERVER_ETYPE@":
            # contains guard before the only regex in the chain
            cond = cond | (
                line.contains("has no support") & line.rlike(BAD_SERVER_ETYPE_RE)
            )
        else:
            cond = cond | line.contains(s)
    return cond


def error_class_expr(line: Column) -> Column:
    """Chain-ordered error classification of a single line (NULL if none)."""
    result = F.lit(None).cast("string")
    for cls, subs in reversed(ERROR_CHAIN):
        result = F.when(_contains_any(line, subs), F.lit(cls)).otherwise(result)
    return result


def line_features(line: Column) -> dict[str, Column]:
    """Per-line boolean/classification columns (the cheap pass).

    Heavy field extraction happens per-record in ``header_fields`` /
    ``verify_fields`` / ``enctype_fields``.
    """
    is_header = (
        (line.contains("AS-REQ") | line.contains("TGS-REQ"))
        & line.contains(" from ")
        & line.rlike(HEADER_RE)
    )
    is_sending = ~is_header & line.contains(" sending ") & line.rlike(SENDING_RE)
    is_preauth = ~is_header & ~is_sending & line.contains(PREAUTH_SUBSTR)
    chain_class = F.when(
        ~is_header & ~is_sending & ~is_preauth, error_class_expr(line)
    )
    is_chain_error = chain_class.isNotNull()
    is_referral = (
        ~is_header
        & ~is_sending
        & ~is_preauth
        & ~is_chain_error
        & line.contains(REFERRAL_SUBSTR)
    )
    is_verify = (
        ~is_header
        & ~is_sending
        & ~is_preauth
        & ~is_chain_error
        & ~is_referral
        & line.contains("Failed to verify ")
        & line.rlike(VERIFY_RE)
    )
    is_error = is_chain_error | is_verify

    # success: preauth → true (reader:271); TGS header → true (reader:252,
    # switching on the EXTRACTED request-type group — a whole-line
    # contains("TGS-REQ") would also fire on an AS-REQ whose principal
    # embeds the substring, e.g. service "TGS-REQ-proxy"; ATOM allows
    # '-'); any error line → false (setErrorIfUnset always clears
    # success, KDCLogRecord.java:187). Last effect wins at the record
    # level. The regexp_extract only evaluates on header lines (the
    # when-branch short-circuits), so the cheap-pass contract holds.
    success_effect = (
        F.when(is_preauth, F.lit(True))
        .when(
            is_header & (F.regexp_extract(line, HEADER_RE, 2) == "TGS-REQ"),
            F.lit(True),
        )
        .when(is_error, F.lit(False))
    )

    return {
        "is_header": is_header,
        "is_sending": is_sending,
        "is_error": is_error,
        "is_verify": is_verify,
        "is_referral": is_referral,
        "is_enctypes": line.contains(ENCTYPES_GUARD),
        "chain_class": chain_class,
        "success_effect": success_effect,
        # ts is (re)set by header lines and headerless verify lines
        # (reader:245,304,307) — both start with the timestamp.
        "sets_ts": is_header | is_verify,
    }


def header_fields(header_line: Column) -> dict[str, Column]:
    """7-group extraction from a record's last header line (reader:234-266)."""
    g = lambda i: F.regexp_extract(header_line, HEADER_RE, i)  # noqa: E731
    return {
        "hdr_ts": g(1),
        "hdr_reqtype": g(2),
        "client": g(3),
        "crealm": g(4),
        "client_ip": g(5),
        "service": g(6),
        "srealm": g(7),
    }


def enctype_fields(enc_line: Column) -> tuple[Column, Column]:
    """(enctypes array, chosen enctype) from a 'Client supported enctypes'
    line (perl kdcmapper-with-enctypes.pl:78-81). Trailing separators
    trimmed: perl split drops trailing empty fields."""
    enc_list = F.nullif(
        F.regexp_replace(
            F.regexp_extract(enc_line, ENCTYPES_RE, 1), r"[,\s]+$", ""
        ),
        F.lit(""),
    )
    enctypes = F.when(enc_list.isNotNull(), F.split(enc_list, r",\s*"))
    chosen = F.nullif(F.regexp_extract(enc_line, ENCTYPES_RE, 2), F.lit(""))
    return enctypes, chosen
