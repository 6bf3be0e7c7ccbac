"""Funnel / retention semantics on hand-built frames: the greedy-earliest
ordering rule, the strictly-after constraint, the within-window cap, and
the cohort triangle's day-0 identity."""

from __future__ import annotations

from blueflood_spark.operators.events import funnel, retention_cohorts

DAY = 86_400_000


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string")


def _counts(df):
    return {r["step_name"]: r["n_users"] for r in df.collect()}


def test_funnel_orders_and_strictly_after(spark):
    rows = [
        # u1 completes all three in order
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # u2: click BEFORE view never counts; no click after view
        (2, 100, "click"), (2, 200, "view"), (2, 300, "purchase"),
        # u3: click at the SAME ts as view is not strictly after
        (3, 100, "view"), (3, 100, "click"),
    ]
    c = _counts(funnel(_ev(spark, rows), ["view", "click", "purchase"]))
    assert c == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_greedy_uses_earliest_qualifying_event(spark):
    rows = [
        # earliest view=100; click must be >100 (the 150 one), purchase >150
        (1, 100, "view"), (1, 50, "click"), (1, 150, "click"), (1, 160, "purchase"),
    ]
    c = _counts(funnel(_ev(spark, rows), ["view", "click", "purchase"]))
    assert c == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_within_window_caps_completion(spark):
    rows = [
        (1, 0, "view"), (1, DAY, "click"),          # inside a 2-day window
        (2, 0, "view"), (2, 3 * DAY, "click"),      # outside it
    ]
    c = _counts(funnel(_ev(spark, rows), ["view", "click"], within_ms=2 * DAY))
    assert c == {"view": 2, "click": 1}


def test_funnel_rejects_duplicate_steps(spark):
    import pytest

    with pytest.raises(ValueError):
        funnel(_ev(spark, [(1, 0, "view")]), ["view", "view"])


def test_retention_day0_equals_cohort_size(spark):
    rows = [
        (1, 0, "view"), (1, DAY + 5, "click"),        # cohort day 0, active d0+d1
        (2, 10, "view"),                               # cohort day 0, active d0
        (3, DAY, "view"), (3, 3 * DAY, "purchase"),    # cohort day 1, active d0+d2
    ]
    out = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(_ev(spark, rows), max_offset_days=7).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_retention_offset_cap(spark):
    rows = [(1, 0, "view"), (1, 30 * DAY, "view")]
    out = retention_cohorts(_ev(spark, rows), max_offset_days=7).collect()
    assert {(r["cohort_day"], r["day_offset"]) for r in out} == {(0, 0)}


def _expected_funnel(rows, steps, within_ms=None):
    """Reference implementation: iterative-min per user."""
    by_user: dict = {}
    for u, ts, et in rows:
        by_user.setdefault(u, []).append((ts, et))
    counts = dict.fromkeys(steps, 0)
    for evs in by_user.values():
        evs.sort()
        prev = None
        first = None
        for i, s in enumerate(steps):
            cand = [
                t for t, et in evs
                if et == s
                and (i == 0 or (prev is not None and t > prev))
                and (i == 0 or within_ms is None or t <= first + within_ms)
            ]
            if not cand or (i > 0 and prev is None):
                break
            prev = min(cand)
            if i == 0:
                first = prev
            counts[s] += 1
    return counts


def test_funnel_matches_reference_on_randomized_logs(spark):
    """Deterministic pseudo-random logs (seeded) across many shapes —
    the codegen fold must equal the iterative-min reference exactly."""
    import random

    rng = random.Random(42)
    types = ["view", "click", "purchase", "other"]
    for trial in range(6):
        n = rng.randint(1, 120)
        rows = [
            (rng.randint(1, 10), rng.randint(0, 50), rng.choice(types))
            for _ in range(n)
        ]
        within = rng.choice([None, 10, 25])
        got = _counts(funnel(_ev(spark, rows), ["view", "click", "purchase"], within_ms=within))
        want = _expected_funnel(rows, ["view", "click", "purchase"], within_ms=within)
        assert got == want, (trial, within, rows)


def test_funnel_conversion_waits(spark):
    from blueflood_spark.operators.events import funnel_conversion

    rows = [
        (1, 100, "view"), (1, 150, "click"), (1, 250, "purchase"),
        (2, 0, "view"), (2, 100, "click"),
        (3, 0, "view"),
    ]
    out = {r["step"]: r for r in funnel_conversion(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[1]["n_converted"] == 2
    assert out[1]["avg_wait_ms"] == 75.0       # (50 + 100) / 2
    assert out[1]["p50_wait_ms"] == 75.0
    assert out[2]["n_converted"] == 1
    assert out[2]["avg_wait_ms"] == 100.0
    assert out[1]["from_name"] == "view" and out[2]["to_name"] == "purchase"


def test_top_paths_orders_and_ties(spark):
    from blueflood_spark.operators.events import top_paths

    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"), (1, 3, "error"),
        (2, 0, "view"), (2, 1, "click"), (2, 2, "purchase"),
        (3, 5, "signup"),
        # same-ts tie: 'click' sorts before 'view'
        (4, 0, "view"), (4, 0, "click"),
    ]
    out = [(r["path"], r["n_users"]) for r in top_paths(_ev(spark, rows), depth=3, k=10).collect()]
    assert out[0] == ("view>click>purchase", 2)
    assert ("signup", 1) in out
    assert ("click>view", 1) in out


def test_retention_matches_python_reference_randomized(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.randint(1, 6), rng.randint(0, 12) * DAY + rng.randint(0, DAY - 1), "view")
        for _ in range(80)
    ]
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(_ev(spark, rows), max_offset_days=7).collect()
    }
    days = {}
    for u, ts, _ in rows:
        days.setdefault(u, set()).add(ts // DAY)
    want: dict = {}
    for u, ds in days.items():
        c = min(ds)
        for d in ds:
            if d - c <= 7:
                key = (c, d - c)
                want[key] = want.get(key, 0) + 1
    assert got == want
