"""Late-round-4 operators: temperature source mixing, lagged
cross-correlation, alert hysteresis, and MMR diversification.

Each operator's oracle twin checks cross-engine value equality; these
tests check the SEMANTICS — flattening direction, Pearson agreement
with numpy, state-machine agreement with a straight-line simulator,
and greedy-objective agreement with a brute-force MMR."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from blueflood_spark.operators.similarity import mmr_diversify
from blueflood_spark.operators.text import temperature_mix

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------


def test_temperature_mix_flattens_toward_uniform(spark):
    # alpha=0.5 compresses shares: vs proportional allocation, sources
    # below the mean token share gain, sources above lose.
    rows = (
        temperature_mix(E._t(spark, SF, "documents"), total_budget_tokens=100_000)
        .collect()
    )
    total = sum(r["n_tokens"] for r in rows)
    assert all(r["alloc_tokens"] >= 0 for r in rows)
    # budget respected (integer floor division leaves a small remainder)
    assert sum(r["alloc_tokens"] for r in rows) <= 100_000
    mean_share = 1.0 / len(rows)
    for r in rows:
        share = r["n_tokens"] / total
        alloc_share = r["alloc_tokens"] / 100_000
        if share < mean_share * 0.9:
            assert alloc_share > share, (r["source"], share, alloc_share)
        if share > mean_share * 1.1:
            assert alloc_share < share, (r["source"], share, alloc_share)


def test_temperature_mix_weight_monotone(spark):
    rows = temperature_mix(E._t(spark, SF, "documents")).collect()
    by_tokens = sorted(rows, key=lambda r: (r["n_tokens"], r["source"]))
    weights = [r["weight_q"] for r in by_tokens]
    assert weights == sorted(weights)


def test_temperature_mix_matches_closed_form(spark):
    rows = temperature_mix(
        E._t(spark, SF, "documents"), total_budget_tokens=10_000
    ).collect()
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        wq = math.floor(math.sqrt(r["n_tokens"] / total) * 1_000_000_000_000)
        assert r["weight_q"] == wq, r["source"]


# ---------------------------------------------------------------------------
# bf_xcorr_lag
# ---------------------------------------------------------------------------


def _window_cents(spark):
    raw = E._raw_metrics(spark, SF).toPandas()
    raw["w"] = raw["ts"] // 14400000
    raw["cents"] = (raw["value"] * 100).round().astype("int64")
    return raw.groupby(["tenant_id", "metric_name", "w"])["cents"].sum().reset_index()


def test_xcorr_matches_numpy_pearson(spark):
    got = {
        (r["tenant_id"], r["metric_a"], r["metric_b"], r["lag"]): (
            r["n_windows"],
            r["xcorr"],
        )
        for r in E.bf_xcorr_lag(spark, SF).collect()
    }
    assert got, "no pairs produced"
    pw = _window_cents(spark)
    checked = 0
    for (tid, ma, mb, lag), (n, corr) in list(got.items())[:40]:
        a = pw[(pw.tenant_id == tid) & (pw.metric_name == ma)].set_index("w")["cents"]
        b = pw[(pw.tenant_id == tid) & (pw.metric_name == mb)].set_index("w")["cents"]
        joined = pd.DataFrame({"x": a, "y": b.rename(lambda w: w - lag)}).dropna()
        assert len(joined) == n
        if corr is None:
            continue
        expect = np.corrcoef(joined.x, joined.y)[0, 1]
        assert corr == pytest.approx(expect, rel=1e-9), (tid, ma, mb, lag)
        checked += 1
    assert checked >= 10


def test_xcorr_perfect_on_shifted_copy(spark):
    # synthetic: y(w) = 3x(w-2) + 5 → Pearson at lag 2 must be exactly ~1
    rows = [("t0", "m.a", w * 14400000, float((w * 37) % 11 + 1)) for w in range(30)]
    rows += [
        ("t0", "m.b", (w + 2) * 14400000, float(3 * ((w * 37) % 11 + 1) + 5))
        for w in range(30)
    ]
    # feed through the same moment pipeline the operator uses (ts in ms)
    df = spark.createDataFrame(
        rows, "tenant_id string, metric_name string, ts long, value double"
    )
    per_w = df.groupBy(
        "tenant_id", "metric_name", F.expr("CAST(ts DIV 14400000 AS BIGINT)").alias("w")
    ).agg(F.expr("sum(CAST(round(value * 100) AS BIGINT))").alias("cents"))
    a = per_w.filter(F.col("metric_name") == "m.a").select(
        F.col("w").alias("wa"), F.col("cents").alias("xa")
    )
    b = per_w.filter(F.col("metric_name") == "m.b").select(
        F.col("w").alias("wb"), F.col("cents").alias("yb")
    )
    j = a.join(b, F.col("wb") == F.col("wa") + 2).toPandas()
    assert len(j) == 30  # every a-window has its +2-shifted b-window
    assert np.corrcoef(j.xa, j.yb)[0, 1] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# bf_alert_hysteresis
# ---------------------------------------------------------------------------


def _simulate(flags, K=3, M=2):
    """Straight-line reference: walk windows in order, K consecutive
    breaches → ALARM at the K-th, M consecutive clears → OK at the M-th."""
    episodes = []
    state = 0
    run_flag, run_len = None, 0
    run_positions = []
    for ws, flag in flags:
        if flag == run_flag:
            run_len += 1
            run_positions.append(ws)
        else:
            run_flag, run_len, run_positions = flag, 1, [ws]
        if flag == 1 and run_len == K and state == 0:
            state = 1
            episodes.append([run_positions[K - 1], None])
        elif flag == 0 and run_len == M and state == 1:
            state = 0
            episodes[-1][1] = run_positions[M - 1]
    return episodes


def test_hysteresis_matches_simulator(spark):
    got = E.bf_alert_hysteresis(spark, SF).collect()
    raw = E._raw_metrics(spark, SF).toPandas()
    raw["ws"] = (raw["ts"] // 3600000) * 3600000
    raw["cents"] = (raw["value"] * 100).round().astype("int64")
    pw = (
        raw.groupby(["tenant_id", "metric_name", "ws"])["cents"].sum().reset_index()
    )
    pw["flag"] = (pw["cents"] >= 7000).astype(int)
    by_series = {}
    for (tid, m), g in pw.groupby(["tenant_id", "metric_name"]):
        flags = list(zip(g.sort_values("ws")["ws"], g.sort_values("ws")["flag"]))
        eps = _simulate(flags)
        if eps:
            by_series[(tid, m)] = eps
    got_by = {}
    for r in got:
        got_by.setdefault((r["tenant_id"], r["metric_name"]), []).append(
            [r["trigger_ms"], r["resolve_ms"]]
        )
    for k in got_by:
        got_by[k].sort()
    assert got_by == by_series


def test_hysteresis_invariants(spark):
    rows = E.bf_alert_hysteresis(spark, SF).collect()
    assert rows, "no episodes at sf0.001 — thresholds degenerate"
    per_series = {}
    for r in rows:
        assert r["n_breach_windows"] >= 3
        if r["resolve_ms"] is not None:
            assert r["resolve_ms"] > r["trigger_ms"]
        per_series.setdefault((r["tenant_id"], r["metric_name"]), []).append(r)
    for eps in per_series.values():
        eps.sort(key=lambda r: r["trigger_ms"])
        # episodes don't overlap: each trigger follows the previous resolve
        for prev, cur in zip(eps, eps[1:]):
            assert prev["resolve_ms"] is not None
            assert cur["trigger_ms"] > prev["resolve_ms"]
        # at most the last episode may be unresolved
        assert all(e["resolve_ms"] is not None for e in eps[:-1])


# ---------------------------------------------------------------------------
# mmr_diversify
# ---------------------------------------------------------------------------


def _brute_mmr(emb_by_id, rels, pool_ids, k_out):
    """Reference greedy MMR on quantized scores."""

    def qcos(a, b):
        va, vb = emb_by_id[a], emb_by_id[b]
        c = float(np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb)))
        return math.floor(c * 1_000_000_000)

    selected = [min(pool_ids, key=lambda c: (-rels[c], c))]
    while len(selected) < k_out:
        best = None
        for c in pool_ids:
            if c in selected:
                continue
            maxsim = max(qcos(c, s) for s in selected)
            key = (-(rels[c] - maxsim), c)
            if best is None or key < best[0]:
                best = (key, c)
        selected.append(best[1])
    return selected


def test_mmr_matches_bruteforce_greedy(spark):
    out = mmr_diversify(
        E._t(spark, SF, "embeddings"), query_ids=(0, 3), pool=12, k_out=4
    ).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in E._t(spark, SF, "embeddings").collect()
    }
    by_q = {}
    for r in sorted(out, key=lambda r: (r["q_id"], r["pick_order"])):
        by_q.setdefault(r["q_id"], []).append((r["c_id"], r["rel_q"]))
    assert set(by_q) == {0, 3}
    for q_id, picks in by_q.items():
        assert len(picks) == 4
        assert len({c for c, _ in picks}) == 4, "picks must be distinct"
        # rebuild the pool: top-12 by quantized cosine to the query
        qv = emb[q_id]
        rels = {}
        for cid, cv in emb.items():
            if cid == q_id:
                continue
            c = float(np.dot(qv, cv) / (np.linalg.norm(qv) * np.linalg.norm(cv)))
            rels[cid] = math.floor(c * 1_000_000_000)
        pool_ids = sorted(rels, key=lambda c: (-rels[c], c))[:12]
        expect = _brute_mmr(emb, rels, pool_ids, 4)
        assert [c for c, _ in picks] == expect, q_id


def test_mmr_first_pick_is_most_relevant_and_diversity_binds(spark):
    div = mmr_diversify(
        E._t(spark, SF, "embeddings"), query_ids=(0,), pool=12, k_out=4
    ).collect()
    ranked = sorted(div, key=lambda r: r["pick_order"])
    assert ranked[0]["rel_q"] == max(r["rel_q"] for r in div)
    # diversification must actually bind on real data: the greedy picks
    # should NOT be the plain top-4 by relevance
    plain_top = sorted(div, key=lambda r: (-r["rel_q"], r["c_id"]))
    assert [r["c_id"] for r in ranked] != [r["c_id"] for r in plain_top] or len(
        {r["rel_q"] for r in div}
    ) == 1


def test_mmr_driver_path_equals_distributed_loop(spark):
    """r10: below driver_cells_limit the greedy runs driver-local on
    engine-computed BIGINTs; above it the clone-planned DataFrame loop
    runs. The two paths must be row-identical (values AND types) on the
    same input — including a non-bigint id column, which the driver
    path's schema derivation must preserve."""
    emb = E._t(spark, SF, "embeddings")
    drv = sorted(map(tuple, mmr_diversify(emb).collect()))
    dist = sorted(map(tuple, mmr_diversify(emb, driver_cells_limit=0).collect()))
    assert drv == dist
    assert drv  # non-degenerate

    se = emb.filter(F.col("vec_id") < 30).select(
        F.concat(F.lit("v"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    kw = dict(query_ids=("v0", "v7"), pool=4, k_out=3)
    drv_s = mmr_diversify(se, **kw)
    dist_s = mmr_diversify(se, driver_cells_limit=0, **kw)
    assert drv_s.schema == dist_s.schema  # id type preserved as string
    assert sorted(map(tuple, drv_s.collect())) == sorted(map(tuple, dist_s.collect()))
