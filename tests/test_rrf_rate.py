"""RRF hybrid fusion and rate-series: reference recomputation from the
component retrievers / a pandas lag model, plus contract checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from blueflood_spark.operators import similarity as SIM

SF0001 = "/root/testdata/sf0.001"


def test_rrf_fuse_matches_reference(spark):
    out = E.llm_hybrid_rrf(spark, SF0001).collect()
    docs = E._t(spark, SF0001, "documents")
    emb = E._t(spark, SF0001, "embeddings")
    from blueflood_spark.operators import text as TX

    lex = {r["doc_id"]: r["rank"] for r in TX.bm25_topk(docs, E._BM25_TERMS, k=50).collect()}
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    sem = {r["c_id"]: r["rank"] for r in SIM.cosine_topk(q, c, k=50).collect()}
    scores = {}
    for d in set(lex) | set(sem):
        scores[d] = (1.0 / (60 + lex[d]) if d in lex else 0.0) + (
            1.0 / (60 + sem[d]) if d in sem else 0.0
        )
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = sorted(out, key=lambda r: r["fused_rank"])
    assert [(r["doc_id"], r["rrf_score"]) for r in got] == [
        (d, pytest.approx(s, rel=1e-12)) for d, s in expect
    ]
    for r in got:
        assert r["in_lexical"] == (r["doc_id"] in lex)
        assert r["in_semantic"] == (r["doc_id"] in sem)
        assert r["in_lexical"] or r["in_semantic"]


def test_rrf_overlap_docs_outrank_single_list_docs(spark):
    """A doc near the top of BOTH lists must beat a doc appearing in
    only one list at a similar rank — the point of fusion."""
    rows = E.llm_hybrid_rrf(spark, SF0001).collect()
    both = [r["fused_rank"] for r in rows if r["in_lexical"] and r["in_semantic"]]
    if both:  # fixture-dependent; assert only when overlap exists
        single = [r["fused_rank"] for r in rows if not (r["in_lexical"] and r["in_semantic"])]
        assert not single or min(both) < min(single)


def test_rate_series_matches_pandas_lag(spark):
    out = E.bf_rate_series(spark, SF0001).collect()
    rows = sorted(
        (
            (r["tenant_id"], r["metric_name"], r["ts"], r["user_id"], r["value"])
            for r in E._raw_metrics(spark, SF0001).collect()
        )
    )
    by_series: dict[tuple, list] = {}
    for t, m, ts, uid, v in rows:
        by_series.setdefault((t, m), []).append((ts, uid, v))
    expect = {}
    for key, evs in by_series.items():
        evs.sort()
        prev = None
        for ts, uid, v in evs:
            if prev is None or ts == prev[0]:
                rate = None
            else:
                delta = v - prev[2] if v >= prev[2] else v  # counter reset
                rate = delta / ((ts - prev[0]) / 1000.0)
            expect[key + (ts, uid, v)] = rate
            prev = (ts, uid, v)
    assert len(out) == len(rows)
    for r in out:
        k = (r["tenant_id"], r["metric_name"], r["ts"], r["user_id"], r["value"])
        e = expect[k]
        if e is None:
            assert r["rate_per_s"] is None, k
        else:
            assert r["rate_per_s"] == pytest.approx(e, rel=1e-12), k


def test_rate_series_first_sample_null_and_reset_nonnegative(spark):
    rows = E.bf_rate_series(spark, SF0001).collect()
    per_series_nulls: dict[tuple, int] = {}
    for r in rows:
        if r["rate_per_s"] is None:
            k = (r["tenant_id"], r["metric_name"])
            per_series_nulls[k] = per_series_nulls.get(k, 0) + 1
        else:
            assert r["rate_per_s"] >= 0.0  # reset handling forbids negatives
    series = {(r["tenant_id"], r["metric_name"]) for r in rows}
    # every series has at least its first-sample NULL
    assert set(per_series_nulls) == series


def test_ewma_matches_python_fold(spark):
    out = E.bf_ewma_smooth(spark, SF0001).collect()
    rows = sorted(
        (
            (r["tenant_id"], r["metric_name"], r["ts"], r["user_id"], r["value"])
            for r in E._raw_metrics(spark, SF0001).collect()
        )
    )
    by_series: dict[tuple, list] = {}
    for t, m, ts, uid, v in rows:
        by_series.setdefault((t, m), []).append((ts, uid, v))
    expect = {}
    for key, evs in by_series.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        for i, (ts, uid, v) in enumerate(evs):
            trail = vals[max(0, i - 31) : i + 1]
            acc = float(trail[0])
            for x in trail[1:]:
                acc = 0.3 * x + 0.7 * acc
            expect[key + (ts, uid, v)] = acc
    assert len(out) == len(rows)
    for r in out:
        k = (r["tenant_id"], r["metric_name"], r["ts"], r["user_id"], r["value"])
        assert r["ewma"] == expect[k], k  # bit-identical fold, no tolerance


def test_ewma_constant_series_is_identity():
    # pure-arithmetic sanity: folding a constant keeps the constant
    acc = 5.0
    for _ in range(31):
        acc = 0.3 * 5.0 + 0.7 * acc
    assert acc == pytest.approx(5.0, rel=1e-12)


def test_histogram_buckets_cumulative_and_consistent(spark):
    rows = E.bf_histogram_buckets(spark, SF0001).collect()
    by_slot: dict[tuple, list] = {}
    for r in rows:
        by_slot.setdefault((r["tenant_id"], r["metric_name"], r["slot_ms"]), []).append(r)
    assert by_slot
    for key, bucket_rows in by_slot.items():
        bucket_rows.sort(key=lambda r: r["le"])
        assert [r["le"] for r in bucket_rows] == E._HIST_BOUNDS  # all bounds present
        counts = [r["cum_count"] for r in bucket_rows]
        assert counts == sorted(counts)  # cumulative → monotone in le
        totals = {r["n_total"] for r in bucket_rows}
        assert len(totals) == 1  # same slot population for every bound
        assert counts[-1] <= totals.pop()
    # slot alignment: every slot on a 20m boundary
    assert all(k[2] % 1_200_000 == 0 for k in by_slot)


def test_histogram_counts_match_direct_filter(spark):
    raw = E._raw_metrics(spark, SF0001).collect()
    import collections

    expect = collections.Counter()
    for r in raw:
        slot = r["ts"] - r["ts"] % 1_200_000
        for le in E._HIST_BOUNDS:
            if r["value"] <= le:
                expect[(r["tenant_id"], r["metric_name"], slot, le)] += 1
    for r in E.bf_histogram_buckets(spark, SF0001).collect():
        k = (r["tenant_id"], r["metric_name"], r["slot_ms"], r["le"])
        assert r["cum_count"] == expect.get(k, 0), k


def test_m4_downsample_reference(spark):
    """M4 on a hand-built series: first/last come from (ts, value)
    struct ordering, so same-timestamp ties resolve by VALUE — pinned
    here because that tie rule is what makes the operator
    engine-deterministic."""
    out = {
        (r["tenant_id"], r["metric_name"], r["bucket_ms"]): r
        for r in E.bf_m4_downsample(spark, SF0001).collect()
    }
    # recompute one bucket from the raw frame
    raw = E._raw_metrics(spark, SF0001).collect()
    from collections import defaultdict

    buckets = defaultdict(list)
    for r in raw:
        buckets[(r["tenant_id"], r["metric_name"], r["ts"] - r["ts"] % 21_600_000)].append(
            (r["ts"], r["value"])
        )
    assert len(out) == len(buckets)
    for key, pts in list(buckets.items())[:25]:
        got = out[key]
        vals = [v for _, v in pts]
        assert got["n"] == len(pts)
        assert got["min_v"] == min(vals) and got["max_v"] == max(vals)
        assert got["first_v"] == min(pts)[1]  # lexicographic (ts, value)
        assert got["last_v"] == max(pts)[1]


def test_topk_movers_ranks_by_abs_change(spark):
    rows = E.bf_topk_movers(spark, SF0001).collect()
    assert 0 < len(rows) <= 10
    deltas = [abs(r["avg_recent"] - r["avg_prior"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    for r in rows:
        assert r["n_recent"] > 0 and r["n_prior"] > 0
        assert r["avg_recent"] == pytest.approx(r["sum_recent"] / r["n_recent"])


def test_seasonal_baseline_weighted_mean_identity(spark):
    """series_avg must equal the n-weighted mean of the 24 hour_avgs —
    the exact-sums discipline (derive means at output, merge sums)."""
    rows = E.bf_seasonal_baseline(spark, SF0001).collect()
    from collections import defaultdict

    by_series = defaultdict(list)
    for r in rows:
        assert 0 <= r["hour_utc"] <= 23
        by_series[(r["tenant_id"], r["metric_name"])].append(r)
    for series, hrs in by_series.items():
        total_n = sum(r["n"] for r in hrs)
        weighted = sum(r["hour_avg"] * r["n"] for r in hrs) / total_n
        for r in hrs:
            assert r["series_avg"] == pytest.approx(weighted, rel=1e-9)


def test_ev_props_extract_counts(spark):
    rows = {r["event_type"]: r for r in E.ev_props_extract(spark, SF0001).collect()}
    ev = E._t(spark, SF0001, "events").collect()
    import json
    from collections import defaultdict

    want = defaultdict(list)
    for r in ev:
        want[r["event_type"]].append(json.loads(r["props"]).get("k"))
    assert set(rows) == set(want)
    for et, ks in want.items():
        present = [k for k in ks if k is not None]
        assert rows[et]["n_events"] == len(ks)
        assert rows[et]["n_with_k"] == len(present)
        assert rows[et]["sum_k"] == sum(present)
        assert rows[et]["n_distinct_k"] == len(set(present))


def test_winsorize_clips_to_series_percentiles(spark):
    rows = E.bf_winsorize(spark, SF0001).collect()
    assert rows
    n_clipped = 0
    for r in rows:
        assert r["p01"] <= r["p99"]
        assert r["p01"] <= r["clipped"] <= r["p99"]
        if r["was_clipped"]:
            n_clipped += 1
            assert r["value"] < r["p01"] or r["value"] > r["p99"]
            assert r["clipped"] in (r["p01"], r["p99"])
        else:
            assert r["clipped"] == r["value"]
    # ~2% of samples sit outside [p01, p99] by construction
    assert 0 < n_clipped < 0.1 * len(rows)


def test_histogram_quantile_reference(spark):
    """Recompute the Prometheus estimator in Python from the bucket frame
    and compare slot by slot, including the saturated (past-last-bound)
    branch."""
    buckets = E.bf_histogram_buckets(spark, SF0001).collect()
    out = {
        (r["tenant_id"], r["metric_name"], r["slot_ms"]): r
        for r in E.bf_histogram_quantile(spark, SF0001).collect()
    }
    from collections import defaultdict

    by_slot = defaultdict(dict)
    n_tot = {}
    for r in buckets:
        key = (r["tenant_id"], r["metric_name"], r["slot_ms"])
        by_slot[key][r["le"]] = r["cum_count"]
        n_tot[key] = r["n_total"]
    assert set(out) == set(by_slot)
    n_sat = 0
    for key, cums in by_slot.items():
        target = 0.95 * n_tot[key]
        lo, cum_lo = 0.0, 0
        want = None
        for le in sorted(cums):
            if cums[le] >= target and cum_lo < target:
                want = lo + (le - lo) * (target - cum_lo) / (cums[le] - cum_lo)
                break
            lo, cum_lo = le, cums[le]
        r = out[key]
        assert r["n_total"] == n_tot[key]
        if want is None:  # quantile past the last bound
            n_sat += 1
            assert r["saturated"] and r["p_est"] == max(cums)
        else:
            assert not r["saturated"]
            assert r["p_est"] == pytest.approx(want, rel=1e-12)
    assert n_sat > 0  # the fixture's value range exceeds the top bound


def test_sustained_breach_runs_are_consecutive(spark):
    """Every emitted breach must be a maximal run: length matches the
    slot span, all covered slots breach, and the slots flanking the run
    either don't exist or don't breach."""
    slot = E._BREACH_SLOT_MS
    breaches = E.bf_sustained_breach(spark, SF0001).collect()
    assert breaches
    from blueflood_spark.operators import granularity as G
    from blueflood_spark.operators import rollup as R

    r240 = {
        (r["tenant_id"], r["metric_name"], r["window_start"]): r["avg"]
        for r in R.basic_from_raw(E._raw_metrics(spark, SF0001), G.MIN_240).collect()
    }
    for b in breaches:
        k = (b["tenant_id"], b["metric_name"])
        n_span = (b["breach_end"] - b["breach_start"]) // slot + 1
        assert b["n_slots"] == n_span >= E._BREACH_MIN_SLOTS
        import math as m

        thr = int(E._BREACH_THRESHOLD * 1e6)
        covered = [r240[(*k, b["breach_start"] + i * slot)] for i in range(n_span)]
        # same floor-quantization as the engine (python round() is
        # HALF-EVEN on the exact binary value — a third rounding rule)
        assert all(m.floor(v * 1e6) > thr for v in covered)
        assert b["peak_avg"] == max(covered)
        for edge in (b["breach_start"] - slot, b["breach_end"] + slot):
            v = r240.get((*k, edge))
            assert v is None or m.floor(v * 1e6) <= thr


def test_seasonal_naive_forecast_is_week_shifted_self(spark):
    rows = E.bf_seasonal_naive_forecast(spark, SF0001).collect()
    assert rows
    from blueflood_spark.operators import granularity as G
    from blueflood_spark.operators import rollup as R

    r240 = {
        (r["tenant_id"], r["metric_name"], r["window_start"]): r
        for r in R.basic_from_raw(E._raw_metrics(spark, SF0001), G.MIN_240).collect()
    }
    for r in rows:
        k = (r["tenant_id"], r["metric_name"])
        prior = r240[(*k, r["window_start"] - E._WEEK_MS)]
        assert r["forecast_avg"] == prior["avg"] and r["n_prior"] == prior["num_points"]
        assert r["avg_val"] == r240[(*k, r["window_start"])]["avg"]
    # slots lacking a week-ago partner are excluded
    have = {(r["tenant_id"], r["metric_name"], r["window_start"]) for r in rows}
    for key in r240:
        t, m, ws = key
        assert (key in have) == ((t, m, ws - E._WEEK_MS) in r240)


def test_downtime_report_gaps_are_real_silences(spark):
    rows = E.bf_downtime_report(spark, SF0001).collect()
    assert rows
    samples = {}
    for r in E._raw_metrics(spark, SF0001).collect():
        samples.setdefault((r["tenant_id"], r["metric_name"]), []).append(r["ts"])
    for r in rows:
        assert r["gap_ms"] == r["gap_end"] - r["gap_start"] > E._GAP_MS
        series_ts = samples[(r["tenant_id"], r["metric_name"])]
        # no sample strictly inside the reported silence
        assert not any(r["gap_start"] < t < r["gap_end"] for t in series_ts)
    # every true >threshold gap is reported: recompute one series fully
    key = (rows[0]["tenant_id"], rows[0]["metric_name"])
    ts_sorted = sorted(samples[key])
    want = [
        (a, b) for a, b in zip(ts_sorted, ts_sorted[1:]) if b - a > E._GAP_MS
    ]
    got = sorted(
        (r["gap_start"], r["gap_end"]) for r in rows
        if (r["tenant_id"], r["metric_name"]) == key
    )
    assert got == sorted(want)
