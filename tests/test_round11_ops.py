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


def test_bpe_merges_match_reference_trainer(spark, sf_dir):
    """Replay greedy BPE training in plain Python from the word-count
    table and require the identical 8 (left, right, count) merges."""
    import re
    from collections import Counter

    from kdcloganalyzer_spark.sources.tables import load_table

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    vocab = Counter()
    for t in texts:
        for w in re.sub("[^a-z]+", " ", t.lower()).split():
            vocab[w] += 1
    words = {w: [c for c in w] for w in vocab}
    expect = []
    for rank in range(1, 9):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        (pl, pr), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rank, pl, pr, pc))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pl and syms[i + 1] == pr:
                    out.append(pl + pr)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in sorted(
            registry.QUERIES["text_bpe_train_merges"](spark, sf_dir).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    assert got == expect


def test_spatial_grid_matches_bruteforce(spark, sf_dir):
    """Replay the grid NN in Python: quantize, bucket, 3x3 probe,
    integer argmin with id tie-break."""
    from kdcloganalyzer_spark.sources.tables import load_table

    pts = {
        r["vec_id"]: (
            round(float(r["embedding"][0]) * 1048576),
            round(float(r["embedding"][1]) * 1048576),
        )
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    G = 131072
    cells = {}
    for vid, (x, y) in pts.items():
        cells.setdefault((x // G, y // G), []).append(vid)
    expect = {}
    for qid, (qx, qy) in pts.items():
        if qid % 5 != 0:
            continue
        cx, cy = qx // G, qy // G
        best = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for nid in cells.get((cx + dx, cy + dy), ()):
                    if nid == qid:
                        continue
                    nx, ny = pts[nid]
                    d2 = (qx - nx) ** 2 + (qy - ny) ** 2
                    if best is None or (d2, nid) < best:
                        best = (d2, nid)
        if best is not None:
            expect[qid] = (best[1], best[0])
    got = {
        r["qid"]: (r["nn_id"], r["d2q"])
        for r in registry.QUERIES["join_spatial_grid"](spark, sf_dir).collect()
    }
    assert got == expect


def test_mattr_bruteforce_windows(spark, sf_dir):
    """The O(n) overlap form must equal the naive per-window distinct
    average, floored to micro-units."""
    import re

    from kdcloganalyzer_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: re.sub("[^a-z]+", " ", r["text"].lower()).split()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = registry.QUERIES["quality_ttr_mattr"](spark, sf_dir).collect()
    assert len(rows) == len([d for d in docs.values() if d])
    for r in rows:
        toks = docs[r["doc_id"]]
        n = len(toks)
        assert r["n_tokens"] == n
        assert r["n_types"] == len(set(toks))
        assert r["ttr_micro"] == len(set(toks)) * 1_000_000 // n
        if n >= 20:
            s = sum(
                len(set(toks[p : p + 20])) for p in range(n - 19)
            )
            assert r["mattr_micro"] == s * 1_000_000 // (n - 19)
        else:
            assert r["mattr_micro"] is None


def test_net_suite_ip_math(spark, sf_dir):
    """u32 / net24 / CIDR membership recomputed from the string."""
    for r in registry.QUERIES["fn_net_suite"](spark, sf_dir).collect():
        a, b, c, d = map(int, r["client_ip"][5:].split("."))
        u32 = (((a * 256) + b) * 256 + c) * 256 + d
        assert r["ip_u32"] == u32
        assert r["net24"] == f"{a}.{b}.{c}.0/24"
        assert r["in_10_0_0_0_9"] == (u32 >> 23 == 20)
        assert r["host8"] == d


def test_revenue_bridge_identity(spark, sf_dir):
    """The additive-bridge identity: price + volume numerators sum to
    delta * denominator EXACTLY, for every group."""
    rows = registry.QUERIES["analytics_revenue_bridge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["q1"] > 0 and r["q2"] > 0
        assert r["pe_num"] + r["ve_num"] == r["delta_cents"] * r["denom2"], r


def test_theil_sen_matches_replay(spark, sf_dir):
    """Median pairwise slope replayed in Python with the same
    (double-slope, dy, dx) ordering and lower-median pick."""
    from kdcloganalyzer_spark.sources.tables import load_table

    daily = sorted(
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect(),
        key=lambda r: r["day"],
    )
    ns = [r["n"] for r in daily]
    pairs = [
        (ns[j] - ns[i], j - i)
        for j in range(len(ns))
        for i in range(j)
    ]
    pairs.sort(key=lambda p: (p[0] / p[1], p[0], p[1]))
    med = pairs[(len(pairs) + 1) // 2 - 1]
    row = registry.QUERIES["analytics_theil_sen"](spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(pairs)
    assert (row["dy_med"], row["dx_med"]) == med


def test_theil_sen_even_pair_count(spark, sf_dir, tmp_path):
    """Regression (r11 ADVICE): with an EVEN pair count the lower-median
    filter must still select a row — the old `(n_pairs + 1) / 2`
    DOUBLE division compared rn == x.5 and silently emitted an empty
    frame. 4 distinct days → C(4,2) = 6 pairs (even)."""
    from kdcloganalyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    days = [
        r["day"]
        for r in ev.select(F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .orderBy("day")
        .limit(4)
        .collect()
    ]
    assert len(days) == 4
    # Single-FILE parquet, like the driver's testdata layout (the
    # loader's nano-ts sniff reads the file footer directly).
    mini = str(tmp_path / "mini_sf")
    (tmp_path / "mini_sf").mkdir()
    ev.where(F.date_trunc("day", "ts") <= F.lit(days[-1])).toPandas().to_parquet(
        f"{mini}/events.parquet", index=False
    )
    rows = registry.QUERIES["analytics_theil_sen"](spark, mini).collect()
    assert len(rows) == 1, "even pair count must still yield the lower median"
    row = rows[0]
    assert row["n_pairs"] == 6
    daily = sorted(
        load_table(spark, mini, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect(),
        key=lambda r: r["day"],
    )
    ns = [r["n"] for r in daily]
    pairs = [(ns[j] - ns[i], j - i) for j in range(len(ns)) for i in range(j)]
    pairs.sort(key=lambda p: (p[0] / p[1], p[0], p[1]))
    med = pairs[(len(pairs) + 1) // 2 - 1]
    assert (row["dy_med"], row["dx_med"]) == med


def test_rake_matches_replay(spark, sf_dir):
    """Full RAKE replay: islands, degree/freq word scores in floored
    micro-units, phrase-score integer sums, the >=2.0 gate."""
    import re
    from collections import Counter, defaultdict

    from kdcloganalyzer_spark.plans.round11_ops import _RAKE_STOP
    from kdcloganalyzer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    phrases = []
    for r in docs:
        toks = re.sub("[^a-z]+", " ", r["text"].lower()).split()
        run = []
        for t in toks + [None]:
            if t is None or t in _RAKE_STOP:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
    freq, degree = Counter(), Counter()
    for ph in phrases:
        for t in ph:
            freq[t] += 1
            degree[t] += len(ph)
    w_micro = {t: degree[t] * 1_000_000 // freq[t] for t in freq}
    score = defaultdict(int)
    occ = Counter()
    for ph in phrases:
        occ[" ".join(ph)] += 1
        score[" ".join(ph)] = sum(w_micro[t] for t in ph)
    expect = {
        p: (occ[p], s) for p, s in score.items() if s >= 2_000_000
    }
    got = {
        r["phrase"]: (r["n_occurrences"], r["score_micro"])
        for r in registry.QUERIES["text_keyword_rake"](spark, sf_dir).collect()
    }
    assert got == expect


def test_systematic_strata_coverage(spark, sf_dir):
    """Exactly ceil(stratum_size / 10) sampled per stratum, at rn % 10
    == 1 positions."""
    import math

    from kdcloganalyzer_spark.sources.tables import load_table

    sizes = {
        r["c_nationkey"]: r["n"]
        for r in load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = registry.QUERIES["sample_systematic_strata"](spark, sf_dir).collect()
    from collections import Counter

    per = Counter(r["nationkey"] for r in rows)
    assert dict(per) == {
        k: math.ceil(n / 10) for k, n in sizes.items()
    }
    assert all(r["rn"] % 10 == 1 for r in rows)


def test_deletion_vectors_band_accounting(spark, sf_dir):
    """Band totals cover the file exactly; live+deleted == band size;
    the live checksum replays from the raw file positions."""
    import hashlib

    from kdcloganalyzer_spark.sources.tables import load_table

    keys = [
        r["o_orderkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    # row order within a single parquet file is file order — rebuild
    # positions from a fresh ordered read.
    ordered = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", F.col("_metadata.row_index").alias("pos"))
        .collect()
    )
    bands = {}
    for r in ordered:
        b = r["pos"] // 1000
        live = r["pos"] % 97 not in (0, 13, 51)
        n_live, n_del, x = bands.get(b, (0, 0, 0))
        if live:
            h = int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:15], 16)
            bands[b] = (n_live + 1, n_del, x ^ h)
        else:
            bands[b] = (n_live, n_del + 1, x)
    got = {
        r["band"]: (r["n_live"], r["n_deleted"], r["live_xor60"])
        for r in registry.QUERIES["scan_deletion_vectors"](spark, sf_dir).collect()
    }
    assert got == bands
    assert sum(a + b for a, b, _ in bands.values()) == len(keys)


def test_sql_scalar_udf_inlines(spark, sf_dir):
    """The SQL UDF must inline: no Python eval nodes in the plan, and
    values equal the hand-written expression."""
    df = registry.QUERIES["sql_scalar_udf"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    from kdcloganalyzer_spark.sources.tables import load_table

    expect = {
        r["l_returnflag"]: (r["rev_e4"], r["n_mid"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)"
                " * (100 - CAST(round(l_discount*100) AS BIGINT)))"
                " AS BIGINT)"
            ).alias("rev_e4"),
            F.expr(
                "CAST(sum(CASE WHEN CAST(round(l_discount*100) AS BIGINT)"
                " BETWEEN 5 AND 7 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_mid"),
        )
        .collect()
    }
    got = {
        r["l_returnflag"]: (r["rev_e4"], r["n_mid_discount"])
        for r in df.collect()
    }
    assert got == expect


def test_interpolate_linear_laws(spark, sf_dir):
    """0 <= dt < 86400; num == (y2-y1)*dt; den constant; every purchase
    with a next-day anchor appears exactly once."""
    rows = registry.QUERIES["rollup_interpolate_linear"](spark, sf_dir).collect()
    assert rows
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert 0 <= r["dt_sec"] < 86400
        assert r["interp_num"] == (r["y2"] - r["y1"]) * r["dt_sec"]
        assert r["interp_den"] == 86400


def test_dormant_reactivation_replay(spark, sf_dir):
    """Sequential replay of per-user day gaps."""
    from collections import defaultdict

    from kdcloganalyzer_spark.sources.tables import load_table

    days = defaultdict(set)
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .collect()
    ):
        days[r["user_id"]].add(r["d"])
    expect = {}
    for uid, ds in days.items():
        ds = sorted(ds)
        gaps = [
            (b, (b - a).days)
            for a, b in zip(ds, ds[1:])
            if (b - a).days >= 3
        ]
        if gaps:
            expect[uid] = (
                len(gaps),
                max(g for _, g in gaps),
                max(d for d, _ in gaps),
            )
    got = {
        r["user_id"]: (
            r["n_reactivations"],
            r["max_gap_days"],
            r["last_reactivation_day"],
        )
        for r in registry.QUERIES["events_dormant_reactivation"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_referral_rate_math(spark, sf_dir):
    """Rates are exact integer micro-divisions of the emitted counts."""
    rows = registry.QUERIES["kdc_referral_patterns"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["referral_rate_micro"]
            == r["n_referrals"] * 1_000_000 // r["n_requests"]
        )
        assert 0 <= r["n_referrals"] <= r["n_requests"]


def test_bpe_tokenize_replay(spark, sf_dir):
    """Tokenize a replayed corpus with the learned merges in Python and
    match per-doc word/token/char counts; tokens are bounded by chars
    below and words above."""
    import re

    from kdcloganalyzer_spark.plans.round11_ops import _bpe_merges
    from kdcloganalyzer_spark.sources.tables import load_table

    merges = [(pl, pr) for _, pl, pr, _ in _bpe_merges(spark, "" + sf_dir)]

    def tokenize(word: str) -> int:
        syms = list(word)
        for pl, pr in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pl and syms[i + 1] == pr:
                    out.append(pl + pr)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expect = {}
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ):
        words = re.sub("[^a-z]+", " ", r["text"].lower()).split()
        if words:
            expect[r["doc_id"]] = (
                len(words),
                sum(tokenize(w) for w in words),
                sum(len(w) for w in words),
            )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars_az"])
        for r in registry.QUERIES["pipeline_bpe_tokenize"](spark, sf_dir).collect()
    }
    assert got == expect
    for nw, nt, nc in got.values():
        assert nw <= nt <= nc


def test_compaction_bins_laws(spark, sf_dir):
    """Bins are contiguous shard ranges covering the manifest exactly;
    every bin except possibly the last spans the target boundary iff
    its first byte range does (replay the cumsum rule)."""
    from kdcloganalyzer_spark.plans.round11_ops import _COMPACT_TARGET
    from kdcloganalyzer_spark.sources.tables import load_table

    manifest = sorted(
        (
            (r["shard_id"], r["bytes"])
            for r in load_table(spark, sf_dir, "documents")
            .groupBy((F.col("doc_id") / 20).cast("bigint").alias("shard_id"))
            .agg(F.sum("n_chars").cast("bigint").alias("bytes"))
            .collect()
        )
    )
    cum = 0
    expect = {}
    for sid, b in manifest:
        bin_id = cum // _COMPACT_TARGET
        n, bb, lo, hi = expect.get(bin_id, (0, 0, sid, sid))
        expect[bin_id] = (n + 1, bb + b, min(lo, sid), max(hi, sid))
        cum += b
    got = {
        r["bin_id"]: (
            r["n_shards"],
            r["bin_bytes"],
            r["first_shard"],
            r["last_shard"],
        )
        for r in registry.QUERIES["pipeline_compaction_bins"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
    # contiguity: ranges do not interleave across bins
    spans = sorted((v[2], v[3]) for v in got.values())
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_modularity_accounting(spark, sf_dir):
    """Degree sums partition the symmetric edge count; intra edges are
    bounded by degree; members partition the node set; total Q <= 1."""
    from kdcloganalyzer_spark.plans.analytics import _coorder_edges

    sym = _coorder_edges(spark, sf_dir)
    m2 = sym.count()
    n_nodes = sym.select("src").distinct().count()
    rows = registry.QUERIES["graph_community_modularity"](spark, sf_dir).collect()
    assert sum(r["deg_sum"] for r in rows) == m2
    assert sum(r["n_members"] for r in rows) == n_nodes
    for r in rows:
        assert 0 <= r["intra2"] <= r["deg_sum"]
        assert r["m2"] == m2
        assert r["q_num_scaled"] == r["intra2"] * m2 - r["deg_sum"] ** 2
    q = sum(r["q_num_scaled"] for r in rows) / (m2 * m2)
    assert -0.5 <= q <= 1.0


def test_gif_probe_bytes_roundtrip(spark, sf_dir):
    """Replay the GIF build in Python for every doc and parse the
    header back byte-for-byte."""
    import hashlib

    from kdcloganalyzer_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = registry.QUERIES["multimodal_gif_probe"](spark, sf_dir).collect()
    assert len(rows) == len(texts)
    for r in rows:
        data = texts[r["doc_id"]].encode("utf-8")
        w = 1 + len(data) % 1024
        h = 1 + int(hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()[:2], 16)
        payload = (
            b"GIF87a"
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + b"\xf7\x00\x00"
            + data
            + b"\x3b"
        )
        assert r["sig_ok"] and payload[:6] == b"GIF87a"
        assert r["width"] == int.from_bytes(payload[6:8], "little") == w
        assert r["height"] == int.from_bytes(payload[8:10], "little") == h
        assert r["n_data_bytes"] == len(payload) - 14 == len(data)


def test_csv_multiline_roundtrip_replay(spark, sf_dir):
    """Newline counts and md5s replayed from the base table — the
    round-trip preserved every byte including trailing newlines."""
    import hashlib

    from kdcloganalyzer_spark.sources.tables import load_table

    expect = {}
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ):
        note = '"' + r["text"][:80].replace(" ", "\n")
        expect[r["doc_id"]] = (
            note.count("\n"),
            hashlib.md5(note.encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_newlines"], r["note_md5"])
        for r in registry.QUERIES["scan_csv_multiline_quoted"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_mixture_plan_budget_accounting(spark, sf_dir):
    """Targets sum to the budget within per-source floor loss; epoch
    ratios are the claimed floor divisions."""
    from kdcloganalyzer_spark.plans.round11_ops import _MIX_BUDGET_TOKENS

    rows = registry.QUERIES["pipeline_mixture_plan"](spark, sf_dir).collect()
    assert rows
    w_sum = sum(r["weight"] for r in rows)
    t_sum = sum(r["target_tokens"] for r in rows)
    assert _MIX_BUDGET_TOKENS - len(rows) < t_sum <= _MIX_BUDGET_TOKENS
    for r in rows:
        assert r["weight"] == 1 + int(r["source"][3:]) % 5
        assert r["target_tokens"] == _MIX_BUDGET_TOKENS * r["weight"] // w_sum
        assert (
            r["epochs_x1000"]
            == _MIX_BUDGET_TOKENS * r["weight"] * 1000 // (w_sum * r["tokens"])
        )


def test_identifier_matches_direct(spark, sf_dir):
    """IDENTIFIER-bound names resolve to the same result as direct SQL."""
    from kdcloganalyzer_spark.sources.tables import load_table

    direct = {
        r["o_orderpriority"]: (r["n"], r["tc"])
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)"
            ).alias("tc"),
        )
        .collect()
    }
    got = {
        r["o_orderpriority"]: (r["n"], r["total_cents"])
        for r in registry.QUERIES["sql_identifier_dynamic"](spark, sf_dir).collect()
    }
    assert got == direct


def test_arrow_udf_plans_as_arrow(spark, sf_dir):
    """The useArrow UDF must plan as ArrowEvalPython (never the
    pickled-row BatchEvalPython node)."""
    df = registry.QUERIES["udf_arrow_surface"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_duplicate_payments_groups(spark, sf_dir):
    """Every reported group really has >1 orders at identical
    (custkey, cents, day); counts replayed from the base table."""
    from collections import Counter

    from kdcloganalyzer_spark.sources.tables import load_table

    base = Counter()
    for r in (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
            F.date_trunc("day", "o_orderdate").alias("d"),
        )
        .collect()
    ):
        base[(r["o_custkey"], r["c"], r["d"])] += 1
    expect = {k: n for k, n in base.items() if n > 1}
    got = {
        (r["o_custkey"], r["cents"], r["day"]): r["n_dups"]
        for r in registry.QUERIES["analytics_duplicate_payments"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_alert_debounce_episode_laws(spark, sf_dir):
    """Episodes replayed sequentially: one alert per >30min-gap-
    separated burst; suppressed counts partition the eligible set."""
    from kdcloganalyzer_spark.sources.tables import load_table

    tsus = sorted(
        r["tsu"]
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(F.unix_timestamp("ts").cast("bigint").alias("tsu"))
        .collect()
    )
    episodes = []
    for t in tsus:
        if not episodes or t - episodes[-1][-1] > 1800:
            episodes.append([t])
        else:
            episodes[-1].append(t)
    rows = sorted(
        registry.QUERIES["events_alert_debounce"](spark, sf_dir).collect(),
        key=lambda r: r["episode"],
    )
    assert len(rows) == len(episodes)
    assert sum(r["n_suppressed"] for r in rows) == len(tsus)
    for r, ep in zip(rows, episodes):
        assert r["n_suppressed"] == len(ep)
        assert r["episode_span_sec"] == ep[-1] - ep[0]


def test_assortativity_moment_replay(spark, sf_dir):
    """Replay the endpoint-degree moments in Python and bound r in
    [-1, 1]."""
    from collections import Counter

    from kdcloganalyzer_spark.plans.analytics import _coorder_edges

    edges = [
        (r["src"], r["dst"]) for r in _coorder_edges(spark, sf_dir).collect()
    ]
    deg = Counter(s for s, _ in edges)
    m2 = len(edges)
    s_jk = sum(deg[s] * deg[d] for s, d in edges)
    s_j = sum(deg[s] for s, _ in edges)
    s_j2 = sum(deg[s] ** 2 for s, _ in edges)
    row = registry.QUERIES["graph_degree_assortativity"](spark, sf_dir).collect()[0]
    assert (row["m2"], row["s_jk"], row["s_j"], row["s_j2"]) == (
        m2,
        s_jk,
        s_j,
        s_j2,
    )
    r = (m2 * s_jk - s_j * s_j) / (m2 * s_j2 - s_j * s_j)
    assert -1.0 <= r <= 1.0


def test_wav_probe_bytes_roundtrip(spark, sf_dir):
    """Rebuild each WAV header in Python and parse it back."""
    from kdcloganalyzer_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"].encode("utf-8")
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = registry.QUERIES["multimodal_wav_probe"](spark, sf_dir).collect()
    assert len(rows) == len(texts)
    for r in rows:
        data = texts[r["doc_id"]]
        rate = 8000 + 8000 * (r["doc_id"] % 3)
        header = (
            b"RIFF"
            + (len(data) + 36).to_bytes(4, "little")
            + b"WAVE"
            + b"fmt "
            + (16).to_bytes(4, "little")
            + b"\x01\x00\x01\x00"
            + rate.to_bytes(4, "little")
            + (rate * 2).to_bytes(4, "little")
            + b"\x02\x00\x10\x00"
            + b"data"
            + len(data).to_bytes(4, "little")
        )
        payload = header + data
        assert r["riff_ok"] and payload[:4] == b"RIFF"
        assert r["sample_rate"] == int.from_bytes(payload[24:28], "little") == rate
        assert r["n_samples"] == len(data) // 2
        assert r["duration_ms"] == (len(data) // 2) * 1000 // rate


def test_ols_trend_replay(spark, sf_dir):
    """Moments replayed from the daily series; slope agrees with a
    float least-squares fit to 1e-9 relative."""
    from kdcloganalyzer_spark.sources.tables import load_table

    daily = sorted(
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("y"))
        .collect(),
        key=lambda r: r["day"],
    )
    ys = [r["y"] for r in daily]
    xs = list(range(1, len(ys) + 1))
    n = len(xs)
    row = registry.QUERIES["analytics_ols_trend"](spark, sf_dir).collect()[0]
    assert row["n"] == n and row["s_y"] == sum(ys) and row["s_x"] == sum(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert (row["slope_num"], row["slope_den"]) == (num, den)
    mean_x, mean_y = sum(xs) / n, sum(ys) / n
    ref = sum((x - mean_x) * (y - mean_y) for x, y in zip(xs, ys)) / sum(
        (x - mean_x) ** 2 for x in xs
    )
    assert abs(num / den - ref) < 1e-9 * max(1.0, abs(ref))


def test_filter_clause_matches_case_form(spark, sf_dir):
    """FILTER aggregates equal their CASE-wrapped equivalents (with
    count(*) FILTER == sum of predicate, not count of CASE NULLs)."""
    from kdcloganalyzer_spark.sources.tables import load_table

    ref = {
        r["event_type"]: (
            r["nt"],
            r["nh"],
            r["hc"],
            r["nu"],
            r["mh"],
        )
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("nt"),
            F.sum(F.when(F.col("value") > 180, 1).otherwise(0)).alias("nh"),
            F.sum(
                F.when(
                    F.col("value") > 180,
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ).alias("hc"),
            F.countDistinct(
                F.when(F.col("value") > 180, F.col("user_id"))
            ).alias("nu"),
            F.min(
                F.when(
                    F.col("value") > 180,
                    F.round(F.col("value") * 100).cast("bigint"),
                )
            ).alias("mh"),
        )
        .collect()
    }
    got = {
        r["event_type"]: (
            r["n_total"],
            r["n_high"],
            r["high_cents"],
            r["n_high_users"],
            r["min_high_cents"],
        )
        for r in registry.QUERIES["agg_filter_clause_suite"](
            spark, sf_dir
        ).collect()
    }
    assert got == ref


def test_ignore_nulls_locf_replay(spark, sf_dir):
    """Replay LOCF / first / second non-null per user sequentially."""
    from collections import defaultdict

    from kdcloganalyzer_spark.sources.tables import load_table

    streams = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).alias("p"),
        )
        .collect()
    ):
        streams[r["user_id"]].append(r)
    expect = {}
    for uid, rs in streams.items():
        rs.sort(key=lambda x: (x["ts"], x["event_id"]))
        nn = [r["p"] for r in rs if r["p"] is not None]
        first = nn[0] if nn else None
        second = nn[1] if len(nn) > 1 else None
        carry = None
        for r in rs:
            if r["p"] is not None:
                carry = r["p"]
            expect[r["event_id"]] = (carry, first, second)
    got = {
        r["event_id"]: (
            r["locf_cents"],
            r["first_purchase_cents"],
            r["second_purchase_cents"],
        )
        for r in registry.QUERIES["fn_ignore_nulls_suite"](spark, sf_dir).collect()
    }
    assert got == expect


def test_rate_limit_sim_replay(spark, sf_dir):
    """Replay the token bucket sequentially per user: deficit
    recurrence max(0, s + cost - rate*dt), throttle when > burst."""
    from collections import defaultdict

    from kdcloganalyzer_spark.plans.round11_ops import (
        _RL_BURST,
        _RL_COST,
        _RL_RATE,
    )
    from kdcloganalyzer_spark.sources.tables import load_table

    per_user = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select("user_id", F.unix_timestamp("ts").cast("bigint").alias("tsu"))
        .collect()
    ):
        per_user[r["user_id"]].append(r["tsu"])
    expect = {}
    for uid, ts in per_user.items():
        ts.sort()
        s, prev = 0, None
        n_thr, mx = 0, 0
        for t in ts:
            dt = 0 if prev is None else t - prev
            s = max(0, s + _RL_COST - _RL_RATE * dt)
            prev = t
            mx = max(mx, s)
            if s > _RL_BURST:
                n_thr += 1
        expect[uid] = (len(ts), n_thr, mx)
    got = {
        r["user_id"]: (r["n_events"], r["n_throttled"], r["max_deficit_micro"])
        for r in registry.QUERIES["events_rate_limit_sim"](spark, sf_dir).collect()
    }
    assert got == expect


def test_dow_index_weighted_mean_is_one(spark, sf_dir):
    """The day-weighted mean of the indexes is 1.0 (up to per-dow
    floor loss) and each index replays from the emitted counts."""
    rows = registry.QUERIES["analytics_seasonal_dow_index"](spark, sf_dir).collect()
    all_events = sum(r["dow_events"] for r in rows)
    all_days = sum(r["dow_days"] for r in rows)
    for r in rows:
        assert (
            r["index_micro"]
            == r["dow_events"] * all_days * 1_000_000 // (r["dow_days"] * all_events)
        )
    # day-weighted mean of the indexes is 1.0 up to one floored
    # micro-unit per weekday: Σ dow_days·idx == 1e6·all_days − slack
    approx = sum(r["dow_days"] * r["index_micro"] for r in rows)
    slack = sum(r["dow_days"] for r in rows)
    assert 1_000_000 * all_days - slack <= approx <= 1_000_000 * all_days


def test_gap_percentiles_replay(spark, sf_dir):
    """Replay gaps and exact interpolated quantiles in Python."""
    from collections import defaultdict

    from kdcloganalyzer_spark.sources.tables import load_table

    per_type = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            "ts",
            F.unix_timestamp("ts").cast("bigint").alias("tsu"),
        )
        .collect()
    ):
        per_type[r["event_type"]].append((r["ts"], r["event_id"], r["tsu"]))

    def quant(sorted_vals, q):
        n = len(sorted_vals)
        pos = q * (n - 1)
        lo = int(pos)
        frac = pos - lo
        if lo + 1 < n:
            return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])
        return float(sorted_vals[lo])

    expect = {}
    for et, rows in per_type.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        gaps = sorted(
            b[2] - a[2] for a, b in zip(rows, rows[1:])
        )
        if not gaps:
            continue
        expect[et] = (
            len(gaps),
            min(gaps),
            int(2 * quant(gaps, 0.5) + 0.5),
            int(20 * quant(gaps, 0.95) + 0.5),
            max(gaps),
        )
    got = {
        r["event_type"]: (
            r["n_gaps"],
            r["min_gap"],
            r["med2_gap"],
            r["p95x20_gap"],
            r["max_gap"],
        )
        for r in registry.QUERIES["events_gap_percentiles_exact"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_activity_streaks_replay(spark, sf_dir):
    """Replay streaks per user from the distinct day sets."""
    from collections import defaultdict

    from kdcloganalyzer_spark.sources.tables import load_table

    days = defaultdict(set)
    for r in (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
        .collect()
    ):
        days[r["user_id"]].add(r["d"])
    corpus_last = max(max(s) for s in days.values())
    expect = {}
    for uid, ds in days.items():
        ds = sorted(ds)
        runs = []
        for d in ds:
            if runs and d == runs[-1][-1] + 1:
                runs[-1].append(d)
            else:
                runs.append([d])
        longest = max(len(r) for r in runs)
        current = len(runs[-1]) if runs[-1][-1] == corpus_last else 0
        expect[uid] = (longest, current, len(runs))
    got = {
        r["user_id"]: (
            r["longest_streak"],
            r["current_streak"],
            r["n_streaks"],
        )
        for r in registry.QUERIES["events_activity_streaks"](spark, sf_dir).collect()
    }
    assert got == expect
