"""Hygiene for app-scoped module-level caches and staged temp dirs.

The plan modules amortize expensive index builds (minhash signatures,
IVF/PQ quantizers, symmetric edge lists, the KDC records table) in
module-level dicts keyed on ``(applicationId, sf_dir, ...)``. That is the
right contract for a long-lived session, but a process that creates and
stops several SparkSessions (pytest does exactly that) would otherwise
accumulate dead-app entries forever, pinning lazy localCheckpoint blocks
for the process lifetime — ADVICE r5. ``evict_stale`` drops every entry
whose applicationId is not the live one; each cache getter calls it
before its own lookup, so the caches are bounded by one app's working
set.

``tempdir`` is ``tempfile.mkdtemp`` plus an atexit ``shutil.rmtree`` so
staged inputs / streaming checkpoints don't outlive the process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def evict_stale(cache: dict, spark) -> None:
    """Drop cache entries from stopped SparkSessions.

    Keys must be tuples whose first element is the owning applicationId
    (the convention every app-scoped cache here follows). Entries of the
    LIVE app are untouched; dead-app DataFrames can't be unpersisted
    through their stopped session, so dropping the reference is all the
    cleanup there is (the JVM-side blocks died with the app).
    """
    app = spark.sparkContext.applicationId
    for k in [k for k in cache if isinstance(k, tuple) and k and k[0] != app]:
        cache.pop(k, None)


def persistent_stage(tag: str, srcs: list[str], build) -> str:
    """Cross-process idempotent staged-INPUT dir under /tmp.

    The streaming queries simulate a producer by splitting/replaying the
    driver's parquet into a monitored feed directory. That feed is a
    pure function of the source table, and in a real deployment it
    simply EXISTS — rebuilding it per process charged every cold bench
    run ~1 s per feed of fixture construction that is not streaming
    cost. Same persistence contract as the records/binfiles parquet
    (kdc_queries.records_path_for_sf): stable /tmp path, `_SUCCESS`
    marker, and — per ADVICE r12's staleness warning on basename-only
    keys — the path embeds a CONTENT fingerprint of the sources
    (path, mtime_ns, size), so a regenerated fixture can never reuse a
    stale export. Built in a pid-unique dir and os.rename()d into place
    (check-then-act markers race with the entry() prestage — SKILL.md).

    ``build(dir)`` must populate ``dir`` and may use Spark/DuckDB; file
    mtimes inside are preserved by the rename (tail-chunk staging
    depends on its utime ticks)."""
    import hashlib
    import json
    import os

    sig_parts = []
    for p in srcs:
        st = os.stat(p)
        sig_parts.append((p, st.st_mtime_ns, st.st_size))
    sig = hashlib.md5(
        json.dumps(sig_parts, sort_keys=True).encode()
    ).hexdigest()[:12]
    final = f"/tmp/kdcspark_stage_{tag}_{sig}"
    if not os.path.exists(os.path.join(final, "_SUCCESS")):
        bld = f"{final}.build.{os.getpid()}"
        os.makedirs(bld, exist_ok=True)
        build(bld)
        open(os.path.join(bld, "_SUCCESS"), "w").close()
        try:
            os.rename(bld, final)
        except OSError:
            # lost the rename race — the winner's dir is complete
            shutil.rmtree(bld, ignore_errors=True)
    return final


def tempdir(prefix: str, fast: bool = False) -> str:
    """mkdtemp that is removed at interpreter exit.

    ``fast=True`` prefers tmpfs (/dev/shm) when present — for
    commit-latency-bound scratch like streaming checkpoints of BOUNDED
    runs, where durability across a machine crash buys nothing (a real
    deployment points checkpoints at object storage instead)."""
    import os

    base = None
    if fast and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        base = "/dev/shm"
    d = tempfile.mkdtemp(prefix=prefix, dir=base)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
