"""Full-corpus parity: Spark sessionizer vs an INDEPENDENT line-by-line
state machine.

``sessionize_multiline`` is rows-only in the driver gate by construction
(its oracle parquet is materialized from its own output — circular). This
test closes that gap with a from-scratch imperative re-implementation of
the reference reader's state machine (KDCLogRecordReader.java:208-324:
mutable current-record, LAST header wins, setErrorIfUnset first-error
semantics, every error line clears success, records without a terminator
dropped) sharing NO code with the Spark pipeline, run over the ENTIRE
sf0.001 synthetic corpus (.log + .gz), compared as record multisets.

The golden tests (test_kdc_parser.py) pin hand-derived per-case values;
this pins that the declarative window/groupBy assembly equals the
imperative reference semantics on every record of a real-sized corpus.
"""

from __future__ import annotations

import gzip
import re
from collections import Counter

from kdcloganalyzer_spark.operators.sessionize import sessionize
from kdcloganalyzer_spark.sources.kdc_log import read_log_lines_raw
from kdcloganalyzer_spark.sources.kdc_synth import synth_dir_for_sf

# Patterns transcribed from the REFERENCE (KDCLogRecordReader.java:47-81),
# not imported from kdcloganalyzer_spark.functions.kdc_parse — the point
# is independence. Java \p{XDigit} → [0-9a-fA-F].
_TS = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
_ATOM = r"[-/_\.a-zA-Z0-9]+"
_REALM = r"[-\.a-zA-Z0-9]+"
_HEADER = re.compile(
    rf"({_TS})\s+((?:AS|TGS)-REQ)\s+({_ATOM})@({_REALM})"
    rf"\s+from\s+(IPv4:[\d\.]+|IPv6:[0-9a-fA-F\.:]+)"
    rf"\s+for\s+({_ATOM})@({_REALM})"
)
_SENDING = re.compile(
    rf"{_TS}\s+sending\s+\d+\s+bytes\s+to\s+(?:IPv4:[\d\.]+|IPv6:[0-9a-fA-F\.:]+)"
)
_VERIFY = re.compile(
    rf"({_TS})\s+(Failed to verify (?:AP-REQ:|checksum|authenticator).*)"
)
_BAD_SERVER_ETYPE = re.compile(r"\bServer \(.*\) has no support.*\betypes\b")
_ENCTYPES = re.compile(r"Client supported enctypes: (.*) using (\S+)")
_LINE_TS = re.compile(rf"^({_TS})")

# (class, substrings) in the reference's exact if/else-if chain order
# (KDCLogRecordReader.java:272-297); '@RE@' marks the one regex member.
_CHAIN = [
    ("BAD_PASSWORD", ["Failed to decrypt PA-DATA --"]),
    (
        "BAD_NAME",
        [
            "UNKNOWN --",
            "Client no longer in database",
            "Client not found in database",
            "Server not found in database",
        ],
    ),
    (
        "UNUSABLE_NAME",
        [
            "Client expired",
            "Client's key has expired",
            "Server's key has expired",
            "Principal may not act as server",
            "Principal may not act as client",
        ],
    ),
    (
        "BAD_AUTHENTICATION",
        [
            "krb_rd_req:",
            "Too large time skew",
            "No key matches pa-data",
            "@RE@",
            "Addition ticket have not matching etypes",
            "Bad request for renewable ticket",
            "Ticket expired",
        ],
    ),
    (
        "BAD_PARAMETERS",
        [
            "equest to forward non-forwardable ticket",
            "equest to renew non-renewable ticket",
        ],
    ),
    ("UNKNOWN", ["Failed building TGS-REP"]),
]


def _chain_class(line: str) -> str | None:
    for cls, subs in _CHAIN:
        for s in subs:
            if s == "@RE@":
                if "has no support" in line and _BAD_SERVER_ETYPE.search(line):
                    return cls
            elif s in line:
                return cls
    return None


class _Rec:
    __slots__ = (
        "header",
        "ts_line",
        "success",
        "referral",
        "error",
        "error_class",
        "enc_line",
        "valid",
    )

    def __init__(self) -> None:
        self.header = None
        self.ts_line = None
        self.success: bool | None = None
        self.referral = False
        self.error = None
        self.error_class = None
        self.enc_line = None
        self.valid = False


def _finish(rec: _Rec):
    """Materialize the reference's record tuple (FIXTURES.md §2 schema,
    minus the derived `ts` instant — `ts_raw` pins it)."""
    ts_raw = None
    if rec.ts_line is not None:
        m = _LINE_TS.match(rec.ts_line)
        ts_raw = m.group(1) if m else None
    client = crealm = service = srealm = client_ip = req_type = None
    if rec.valid:
        m = _HEADER.search(rec.header)
        reqtype_raw = m.group(2)
        req_type = {"AS-REQ": "AUTH", "TGS-REQ": "TGS"}.get(
            reqtype_raw, "UNKNOWN"
        )
        client, crealm = m.group(3), m.group(4)
        client_ip, service, srealm = m.group(5), m.group(6), m.group(7)
    enctypes = chosen = None
    if rec.enc_line is not None:
        m = _ENCTYPES.search(rec.enc_line)
        if m:
            lst = re.sub(r"[,\s]+$", "", m.group(1))
            enctypes = tuple(re.split(r",\s*", lst)) if lst else None
            chosen = m.group(2) or None
    return (
        ts_raw,
        req_type,
        client,
        crealm,
        service,
        srealm,
        client_ip,
        rec.valid,
        bool(rec.success),
        rec.referral,
        rec.error_class,
        rec.error,
        enctypes,
        chosen,
    )


def _reference_sessionize(lines: list[str]) -> list[tuple]:
    """The imperative reference state machine over one file's lines."""
    out: list[tuple] = []
    rec = _Rec()
    for line in lines:
        if _HEADER.search(line):
            rec.header = line  # LAST header wins (reader:234-266, B5)
            rec.ts_line = line
            rec.valid = True
            if _HEADER.search(line).group(2) == "TGS-REQ":
                rec.success = True  # reader:252
        elif _SENDING.search(line):
            out.append(_finish(rec))  # terminator → emit (reader:267,311)
            rec = _Rec()
        elif "Pre-authentication succeeded" in line:
            rec.success = True  # reader:270-271
        elif (cls := _chain_class(line)) is not None:
            if rec.error is None:  # setErrorIfUnset (KDCLogRecord:182-188)
                rec.error, rec.error_class = line, cls
            rec.success = False  # every error line clears success (:187)
        elif "eturning a referral to realm" in line:
            rec.referral = True  # reader:298-299
        elif m := _VERIFY.search(line):
            rec.ts_line = line  # verify lines (re)set ts (reader:304,307)
            if rec.error is None:
                rec.error, rec.error_class = m.group(2), "BAD_AUTHENTICATION"
            rec.success = False
        # independent of the chain: last enctypes line wins
        if "Client supported enctypes: " in line:
            rec.enc_line = line
    # trailing record without a terminator is DROPPED (reader:317-320)
    return out


def _read_file(path: str) -> list[str]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return f.read().splitlines()


def test_full_corpus_parity(spark):
    import glob
    import os

    log_dir = synth_dir_for_sf("/root/testdata/sf0.001")
    expected: Counter = Counter()
    files = sorted(
        glob.glob(os.path.join(log_dir, "*.log"))
        + glob.glob(os.path.join(log_dir, "*.log.gz"))
    )
    assert len(files) >= 2
    for p in files:
        expected.update(_reference_sessionize(_read_file(p)))

    got = Counter(
        (
            r["ts_raw"],
            r["req_type"],
            r["client"],
            r["crealm"],
            r["service"],
            r["srealm"],
            r["client_ip"],
            r["valid"],
            r["success"],
            r["referral"],
            r["error_class"],
            r["error"],
            tuple(r["enctypes"]) if r["enctypes"] is not None else None,
            r["chosen_enctype"],
        )
        for r in sessionize(read_log_lines_raw(spark, log_dir)).collect()
    )
    assert sum(expected.values()) > 100  # real corpus, not a trivial pass
    missing = expected - got
    extra = got - expected
    assert not missing and not extra, (
        f"missing={list(missing)[:3]} extra={list(extra)[:3]}"
    )
