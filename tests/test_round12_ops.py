"""Law tests for the round-12 operators — invariants the value oracles
alone do not pin (HLL-twin agreement with the exact forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_running_distinct_hll_matches_exact_twin(spark, sf_dir):
    """The HLL twin must emit exactly the exact twin's rows (same
    running counts) and every sketch estimate must sit inside the
    declared envelope (at the events type domain the sketch is in
    exact coupon mode, so the estimates are the counts)."""
    hll = registry.QUERIES["window_running_distinct_hll"](spark, sf_dir)
    exact = registry.QUERIES["window_running_distinct"](spark, sf_dir)
    assert hll.where(~F.col("hll_in_envelope")).count() == 0
    joined = exact.alias("e").join(
        hll.alias("h"), ["event_id", "user_id"], "full"
    )
    diverged = joined.where(
        (F.col("e.n_types_seen") != F.col("h.n_types_seen"))
        | F.col("e.n_types_seen").isNull()
        | F.col("h.n_types_seen").isNull()
    )
    assert diverged.count() == 0


def test_dau_mau_hll_matches_exact_twin(spark, sf_dir):
    """The HLL twin's reported metric columns must equal the exact
    twin's (the sketch path only feeds the envelope flag), and the
    flag must be TRUE on every month."""
    hll = registry.QUERIES["events_dau_mau_stickiness_hll"](spark, sf_dir)
    exact = registry.QUERIES["events_dau_mau_stickiness"](spark, sf_dir)
    assert hll.where(~F.col("hll_in_envelope")).count() == 0
    cols = ["month", "mau", "sum_dau", "n_days", "stickiness_micro"]
    assert (
        hll.select(*cols).exceptAll(exact.select(*cols)).count() == 0
        and exact.select(*cols).exceptAll(hll.select(*cols)).count() == 0
    )


def test_running_distinct_hll_single_window_node(spark, sf_dir):
    """The sketch and the exact set must share ONE Window operator (the
    swap adds zero shuffles): exactly one Window node in the plan."""
    df = registry.QUERIES["window_running_distinct_hll"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 1, plan


def test_user_entropy_matches_python_replay(spark, sf_dir):
    """h_micro must equal the sequential Python replay of the micro-nat
    idiom (per-term round(ln(c/n)*1e6), integer-weighted sum, one
    trunc-div), be 0 for single-type users, and never exceed ln(types)."""
    import math

    from kdcloganalyzer_spark.sources.tables import load_table

    rows = registry.QUERIES["events_user_entropy"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["count"])
    assert rows and len(rows) == len(by_user)
    for r in rows:
        cs = by_user[r["user_id"]]
        n = sum(cs)
        num = -sum(c * round(math.log(c / n) * 1_000_000) for c in cs)
        assert r["n_events"] == n
        assert r["n_types"] == len(cs)
        assert r["h_micro"] == num // n, r
        if len(cs) == 1:
            assert r["h_micro"] == 0
        assert r["h_micro"] <= math.log(len(cs)) * 1_000_000 + 1


def test_customer_nrr_cross_foots(spark, sf_dir):
    """nrr is the single scaled div of the emitted integers; churned
    cents never exceed the base; every month's base is positive."""
    rows = registry.QUERIES["analytics_customer_nrr"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["base_cents"] > 0
        assert 0 <= r["churned_cents"] <= r["base_cents"]
        assert (
            r["nrr_micro"]
            == r["retained_cents"] * 1_000_000 // r["base_cents"]
        )
        assert r["expansion_cents"] <= r["retained_cents"]


def test_abc_classification_partitions_parts(spark, sf_dir):
    """The 3x3 matrix partitions the part population and the revenue
    mass exactly; class labels stay in their domains."""
    from kdcloganalyzer_spark.sources.tables import load_table

    out = registry.QUERIES["analytics_abc_classification"](
        spark, sf_dir
    ).collect()
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in out) == n_parts
    assert {r["cls_abc"] for r in out} <= {"A", "B", "C"}
    assert {r["cls_xyz"] for r in out} <= {"X", "Y", "Z"}
    from kdcloganalyzer_spark.plans.relational import _rev_e4

    total = li.agg(F.sum(_rev_e4()).cast("bigint").alias("t")).collect()[
        0
    ]["t"]
    assert sum(r["rev_e4"] for r in out) == total


def test_url_suite_component_consistency(spark, sf_dir):
    """Every row's components must reassemble consistently: authority =
    host:8443, path inside the url, decode only rewrites %20."""
    rows = registry.QUERIES["fn_url_suite"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["authority"] == r["host"] + ":8443"
        assert r["proto"] == "https"
        assert r["q_decoded"] == r["q_raw"].replace("%20", " ")
        assert r["path"].startswith("/path/")
        assert r["ref"].startswith("frag")


def test_neyman_allocation_laws(spark, sf_dir):
    """Allocations must sum exactly to the budget, selection fills the
    allocation up to stratum size, and the milli-weight replays from
    the stratum stats."""
    import math

    from kdcloganalyzer_spark.plans.round12_ops import _NEYMAN_K
    from kdcloganalyzer_spark.sources.tables import load_table

    rows = registry.QUERIES["sample_stratified_neyman"](
        spark, sf_dir
    ).collect()
    assert sum(r["n_alloc"] for r in rows) == _NEYMAN_K
    stats = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("qq"),
        )
        .collect()
    )
    by_src = {r["source"]: r for r in stats}
    for r in rows:
        st = by_src[r["source"]]
        assert r["n_docs"] == st["n"]
        var_num = st["n"] * st["qq"] - st["s"] * st["s"]
        w = math.floor(abs(math.sqrt(float(var_num)) * 1000) + 0.5)
        assert r["w_milli"] == w, (r["source"], r["w_milli"], w)
        assert r["n_selected"] == min(r["n_alloc"], r["n_docs"])


def test_coreset_kcenter_laws(spark, sf_dir):
    """16 distinct centers; the selection distances are non-increasing
    (each new center can only shrink every dmin); the final coverage
    radius never exceeds the last selection distance."""
    rows = sorted(
        registry.QUERIES["sample_coreset_kcenter"](spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == list(range(16))
    assert len({r["vec_id"] for r in rows}) == 16
    sel = [r["d2_sel_r6"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(sel, sel[1:])), sel
    assert all(r["cover_d2_r6"] == rows[0]["cover_d2_r6"] for r in rows)
    assert rows[0]["cover_d2_r6"] <= sel[-1]


def test_pca_power_iteration_matches_numpy(spark, sf_dir):
    """Replaying the exact integer iteration in pure Python must
    reproduce the top-10 report, and the Rayleigh quotient must be
    non-decreasing across rounds (the invariant every power-iteration
    step guarantees — this synthetic corpus is near-isotropic, so a
    convergence-to-PC1 floor would be unmeetable by ANY rank-1 method;
    see the operator docstring)."""
    import math

    import numpy as np

    from kdcloganalyzer_spark.plans.round12_ops import (
        _PCA_ROUNDS,
        _PCA_SCALE,
        _duck_round_half_away,
    )
    from kdcloganalyzer_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").collect()
    x = np.array(
        [[float(v) for v in r["embedding"]] for r in emb], dtype="float64"
    )
    ids = np.array([r["vec_id"] for r in emb])
    s = _PCA_SCALE
    q = np.array(
        [[_duck_round_half_away(v * s) for v in row] for row in x],
        dtype="int64",
    )
    n = len(q)
    mbar = np.array(
        [_duck_round_half_away(float(int(c)) / n) for c in q.sum(axis=0)],
        dtype="int64",
    )
    c = q - mbar
    cf = c.astype("float64")
    cov = cf.T @ cf

    def rayleigh(vec):
        u = np.array(vec, dtype="float64")
        return float(u @ cov @ u) / float(u @ u)

    v = [s] * 64
    rq = [rayleigh(v)]
    for _ in range(_PCA_ROUNDS):
        dots = c @ np.array(v, dtype="int64")
        w = np.array(
            [int(math.floor(float(int(d)) / 268435456.0)) for d in dots],
            dtype="int64",
        )
        sd = c.T @ w
        t = [int(math.floor(float(int(x_)) / 1024.0)) for x_ in sd]
        acc = 0.0
        for td in t:
            acc += float(td) * float(td)
        nrm = math.sqrt(acc)
        v = [_duck_round_half_away(float(td) / nrm * s) for td in t]
        rq.append(rayleigh(v))
    proj = c @ np.array(v, dtype="int64")
    order = np.lexsort((ids, -np.abs(proj)))[:10]
    expect = [(int(ids[i]), int(proj[i])) for i in order]
    got = sorted(
        registry.QUERIES["embed_pca_power_iteration"](spark, sf_dir)
        .collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["vec_id"], r["proj_q"]) for r in got] == expect
    # Rayleigh quotient non-decreasing (tiny slack for the integer
    # re-quantization each round) and strictly improved overall.
    for a, b in zip(rq, rq[1:]):
        assert b >= a * (1 - 1e-9), rq
    assert rq[-1] > rq[0]
