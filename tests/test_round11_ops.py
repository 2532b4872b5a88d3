"""Law tests for the round-11 operators — invariants the value oracles
alone do not pin (CUSUM recurrence equivalence, clustering mass/inertia
consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_cusum_matches_recurrence(spark, sf_dir):
    """The windowed closed form S_t = R_t − min(0, min_{j≤t} R_j) must
    equal the textbook recurrence S_t = max(0, S_{t−1} + (x_t − k))
    replayed sequentially, and the alarm must be exactly S_t > 2k."""
    rows = (
        registry.QUERIES["events_cusum_changepoint"](spark, sf_dir)
        .orderBy("day")
        .collect()
    )
    assert rows, "daily series must be non-empty"
    k_micro = None
    s = 0
    for r in rows:
        if k_micro is None:
            # recover k from the first row: r_micro relation isn't
            # emitted, so rebuild k as the global mean in micro-units.
            total = sum(x["n_events"] for x in rows)
            k_micro = total * 1_000_000 // len(rows)
        s = max(0, s + (r["n_events"] * 1_000_000 - k_micro))
        assert r["cusum_micro"] == s, (r["day"], r["cusum_micro"], s)
        assert r["alarm"] == (s > 2 * k_micro), r["day"]
        assert r["cusum_micro"] >= 0


def test_kmeans_report_mass_and_inertia(spark, sf_dir):
    """Cluster sizes partition the corpus exactly; inertia is
    non-negative; msd_r6 is the single rounded division of the two
    exact integers it claims to be."""
    from kdcloganalyzer_spark.sources.tables import load_table

    out = registry.QUERIES["embed_cluster_kmeans_int"](spark, sf_dir)
    rows = out.collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_total
    scale = float(1 << 20)
    for r in rows:
        assert r["inertia_q"] >= 0
        expect = round(r["inertia_q"] / (r["n_vectors"] * scale * scale), 6)
        assert abs(r["msd_r6"] - expect) < 1e-12, r
    # cells are distinct and bounded by the codebook size
    cells = [r["cell"] for r in rows]
    assert len(cells) == len(set(cells))


def test_ewma_matches_recurrence(spark, sf_dir):
    """The recursive-CTE EWMA must equal the sequential integer
    recurrence s_t = floor((7*s_{t-1} + x_t*1e6)/8) replayed in
    Python, anchored at s_1 = x_1*1e6."""
    rows = (
        registry.QUERIES["rollup_ewma_recursive"](spark, sf_dir)
        .orderBy("day")
        .collect()
    )
    assert rows
    s = None
    for r in rows:
        x = r["n_events"] * 1_000_000
        s = x if s is None else (7 * s + x) // 8
        assert r["ewma_micro"] == s, (r["day"], r["ewma_micro"], s)
        assert r["above_trend"] == (x > s) if s != x else True


def test_runs_test_matches_replay(spark, sf_dir):
    """Runs/up/down counts must match a sequential replay of the daily
    series; mu/var must be the floored closed forms; the alarm must be
    the cross-multiplied 2-sigma comparison."""
    from kdcloganalyzer_spark.sources.tables import load_table

    daily = sorted(
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect(),
        key=lambda r: r["day"],
    )
    signs = []
    for a, b in zip(daily, daily[1:]):
        d = b["n"] - a["n"]
        if d != 0:
            signs.append(1 if d > 0 else -1)
    runs = sum(
        1 for i, s in enumerate(signs) if i == 0 or signs[i - 1] != s
    )
    n1, n2 = signs.count(1), signs.count(-1)
    n = n1 + n2
    row = registry.QUERIES["analytics_runs_test"](spark, sf_dir).collect()[0]
    assert (row["n_up"], row["n_down"], row["runs"]) == (n1, n2, runs)
    import math

    assert row["mu_micro"] == math.floor(1_000_000 + 2.0 * n1 * n2 * 1_000_000 / n)
    assert row["var_micro"] == math.floor(
        2.0 * n1 * n2 * (2 * n1 * n2 - n) * 1_000_000 / (n * n * (n - 1))
    )
    dev = runs * 1_000_000 - row["mu_micro"]
    assert row["nonrandom_2sigma"] == (
        dev * dev > 4 * row["var_micro"] * 1_000_000
    )


def test_kcore_min_degree_law(spark, sf_dir):
    """Every side of the surviving core has min in-core degree >= k
    (the defining k-core property), and the core is non-empty at the
    fixture SF (adaptive k guarantees survivors)."""
    rows = registry.QUERIES["graph_kcore_peel"](spark, sf_dir).collect()
    assert rows, "core must be non-empty with the adaptive threshold"
    for r in rows:
        assert r["min_deg"] >= r["k_threshold"], r
        assert r["n_core"] >= 1 and r["sum_deg"] >= r["n_core"] * r["k_threshold"]


def test_rolling_median_window_law(spark, sf_dir):
    """Replay each user's (ts, event_id)-ordered stream with a 7-deep
    window and check med2 == 2x the exact interpolated median."""
    from kdcloganalyzer_spark.sources.tables import load_table

    src = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        )
        .collect()
    )
    from collections import defaultdict, deque

    streams = defaultdict(list)
    for r in src:
        streams[r["user_id"]].append(r)
    expect: dict[int, tuple[int, int]] = {}
    for uid, rs in streams.items():
        dq: deque = deque(maxlen=7)
        for r in sorted(rs, key=lambda x: (x["ts"], x["event_id"])):
            dq.append(r["cents"])
            vals = sorted(dq)
            n = len(vals)
            med2 = (
                2 * vals[n // 2] if n % 2 else vals[n // 2 - 1] + vals[n // 2]
            )
            expect[r["event_id"]] = (med2, n)
    rows = registry.QUERIES["window_rolling_median_int"](spark, sf_dir).collect()
    assert rows and len(rows) == len(expect)
    for r in rows:
        assert (r["med2_cents"], r["n_window"]) == expect[r["event_id"]], r


def test_hhi_share_bounds(spark, sf_dir):
    """Shares are basis points: top share <= 10^4; HHI <= 10^8 and >=
    the equal-share floor 10^8/n (within the floor-division slack of
    one bp per supplier)."""
    for r in registry.QUERIES["analytics_hhi_concentration"](
        spark, sf_dir
    ).collect():
        assert 0 < r["top_share_bp"] <= 10_000
        assert r["hhi_bp2"] <= 10_000 ** 2
        n = r["n_suppliers"]
        floor_hhi = (10_000 - n) ** 2 // n  # each share may lose <1bp to floor
        assert r["hhi_bp2"] >= floor_hhi, r


def test_lockout_replay(spark, sf_dir):
    """Replay the lockout rule sequentially from the records frame:
    same per-client counts (empty output allowed — sf0.001 streaks
    top out at 2 by construction)."""
    from kdcloganalyzer_spark.plans.kdc_queries import kdc_records

    recs = (
        kdc_records(spark, sf_dir)
        .where(F.col("valid") & (F.col("req_type") == "AUTH"))
        .select("client", F.unix_timestamp("ts").alias("tsu"), "success")
        .collect()
    )
    from collections import defaultdict

    per_client = defaultdict(list)
    for r in recs:
        per_client[r["client"]].append((r["tsu"], r["success"]))
    expect = defaultdict(int)
    for c, evs in per_client.items():
        evs.sort()
        streak: list[int] = []
        for tsu, ok in evs:
            if ok:
                streak = []
            else:
                streak.append(tsu)
                if len(streak) >= 3 and tsu - streak[-3] <= 1799:
                    expect[c] += 1
    got = {
        r["client"]: r["n_lockout_events"]
        for r in registry.QUERIES["kdc_account_lockout"](spark, sf_dir).collect()
    }
    assert got == dict(expect)
