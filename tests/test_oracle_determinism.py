"""Oracle input-order determinism sweep (VERDICT r8 item 4).

The r7 octet_length coincidences and the r8 `dim_scd2_build` running-sum
window (ORDER BY ts while the tie-break needed event_id) were all one
class: an oracle whose output is only deterministic because the fixture
happens to have no ties / a lucky storage order. A static parse of every
window clause can't see through CTEs, so this sweeps the class at the
DATA level: run every registered oracle in DuckDB at sf0.001 three times
— once over the parquet views in storage order, twice over materialized
copies of the base tables shuffled by md5(row-ordinal || seed) — and
assert the canonical value-hash is identical. Any window/ROWS-frame
whose ORDER BY is not a total order within its partition (or any other
storage-order dependence, e.g. LIMIT without ORDER BY, arg_min ties) can
flip a tie under the shuffled scan and fails here before it flakes in
the driver gate.

Oracles that read STAGED inputs (/tmp parquet the Spark queries write)
take their input from files, not the shuffled views — they are skipped
when the staging doesn't exist and, when it does, their base-table
independence makes the shuffle a no-op; both are fine, the class this
guards lives in the view-reading oracles.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from kdcloganalyzer_spark.oracle import _norm, oracle_sql_for
from kdcloganalyzer_spark.plans import registry
from kdcloganalyzer_spark.schemas import DRIVER_TABLES

SF_DIR = "/root/testdata/sf0.001"
SEEDS = ("a7", "f2")

registry.load_all()


def _connect(seed: str | None, threads: int = 2) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in DRIVER_TABLES:
        src = f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        if seed is None:
            con.execute(f"CREATE VIEW {t} AS {src}")
        else:
            # Materialize a deterministically SHUFFLED copy: window ties
            # and other storage-order-dependent results flip here.
            con.execute(
                f"""
                CREATE TABLE {t} AS
                SELECT * EXCLUDE (_shuffle_rn) FROM (
                  SELECT *, row_number() OVER () AS _shuffle_rn
                  FROM read_parquet('{SF_DIR}/{t}.parquet')
                ) ORDER BY md5(CAST(_shuffle_rn AS VARCHAR) || '{seed}')
                """
            )
    return con


@pytest.fixture(scope="module")
def cons():
    # Vary BOTH nondeterminism axes across the three runs: base-table
    # storage order (the md5 shuffles) AND execution parallelism
    # (threads 1 vs 8 — DuckDB's parallel aggregation can reorder float
    # sums, the other way an oracle flakes against the driver).
    built = [
        _connect(None, threads=2),
        _connect(SEEDS[0], threads=1),
        _connect(SEEDS[1], threads=8),
    ]
    yield built
    for c in built:
        c.close()


def _result_hash(con: duckdb.DuckDBPyConnection, sql: str) -> str:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        str(tuple(_norm(r[i]) for i in order)) for r in cur.fetchall()
    )
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return f"{len(rows)}:{h.hexdigest()}"


@pytest.mark.parametrize("qid", sorted(registry.ORACLES))
def test_oracle_is_storage_order_free(qid, cons):
    sql = oracle_sql_for(qid, SF_DIR)
    try:
        base = _result_hash(cons[0], sql)
    except duckdb.IOException:
        pytest.skip("oracle reads staged inputs not materialized here")
    shuffled = [_result_hash(c, sql) for c in cons[1:]]
    assert all(h == base for h in shuffled), (
        f"{qid}: oracle output depends on base-table storage order "
        f"(base={base}, shuffled={shuffled}) — an ORDER BY somewhere is "
        "not a total order (add the unique tie-break column) or a LIMIT "
        "lacks a full ordering"
    )
