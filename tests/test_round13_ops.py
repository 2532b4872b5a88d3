"""Law tests for the round-13 operators — invariants the value oracles
alone do not pin (twin agreement between regimes/forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans import registry

registry.load_all()


def test_calendar_heatmap_hll_matches_exact_twin(spark, sf_dir):
    """The HLL grid must emit exactly the exact grid's cells (same
    counts/cents/n_users — the sketch path only feeds the envelope
    flag), and the flag must be TRUE on every cell."""
    hll = registry.QUERIES["events_calendar_heatmap_hll"](spark, sf_dir)
    exact = registry.QUERIES["events_calendar_heatmap"](spark, sf_dir)
    assert hll.where(~F.col("hll_in_envelope")).count() == 0
    cols = ["dow", "hour", "n", "n_users", "value_cents"]
    assert (
        hll.select(*cols).exceptAll(exact.select(*cols)).count() == 0
        and exact.select(*cols).exceptAll(hll.select(*cols)).count() == 0
    )


def test_triangle_shuffle_regime_matches_broadcast_regime(spark, sf_dir):
    """The shuffle-regime twin must produce the broadcast regime's
    exact top-20 (node, tri_n) rows — the algebraic identity between
    the two physical layouts of the same wedge scheme."""
    a = registry.QUERIES["graph_triangle_count"](spark, sf_dir)
    b = registry.QUERIES["graph_triangle_count_shuffle"](spark, sf_dir)
    assert [tuple(r) for r in a.collect()] == [
        tuple(r) for r in b.collect()
    ]


def test_triangle_shuffle_plan_has_no_broadcast_joins(spark, sf_dir):
    """The twin must actually RUN the above-gate layout: no
    BroadcastHashJoin anywhere in its FINAL adaptive plan (ADVICE r13:
    inspecting executedPlan() before any action sees the non-final
    adaptive plan, and at bench scale AQE's runtime broadcast
    conversion would otherwise rewrite the shuffle joins back to
    broadcast — the SHUFFLE_HASH hints in operators/graph.py are what
    this pins). Execute first, then read the final plan."""
    df = registry.QUERIES["graph_triangle_count_shuffle"](spark, sf_dir)
    # collect() drives df's OWN QueryExecution (a .write would wrap the
    # plan in a fresh command execution whose adaptive plan this df
    # never sees); the query is a top-20, so this is bounded.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_dedup_rate_hll_matches_python_replay(spark, sf_dir):
    """Per-source exact counts and the trunc-div micro rate must equal
    a pandas replay of the first-8-words md5 fingerprint convention,
    and every source's envelope flag must be TRUE."""
    import hashlib

    from kdcloganalyzer_spark.sources.tables import load_table

    out = {
        r["source"]: r
        for r in registry.QUERIES["pipeline_dedup_rate_hll"](
            spark, sf_dir
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    per: dict[str, tuple[int, set]] = {}
    for r in docs:
        fp = hashlib.md5(
            " ".join(r["text"].split(" ")[:8]).encode()
        ).hexdigest()
        n, s = per.setdefault(r["source"], [0, set()])
        per[r["source"]][0] += 1
        s.add(fp)
    assert set(per) == set(out)
    for src, (n, s) in per.items():
        row = out[src]
        assert row["n_docs"] == n and row["n_unique"] == len(s)
        assert row["dup_rate_micro"] == (n - len(s)) * 1_000_000 // n
        assert row["hll_in_envelope"]
