"""Rollup operator math on hand-built frames, mirroring the reference's
type tests (BasicRollupTest, BluefloodTimerRollupTest,
BluefloodCounterRollupTest, BluefloodGaugeRollupTest, BluefloodSetRollupTest).

The key invariant everywhere: merge-of-partials == recompute-from-raw
(the reference's rollup ladder depends on it; so does Spark's partial/final
aggregation model)."""

import math

import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import rollup as R

MIN = 60_000


def raw_df(spark, rows):
    return spark.createDataFrame(rows, "tenant_id string, metric_name string, ts long, value double")


@pytest.fixture(scope="module")
def simple_raw(spark):
    # one metric, 10 samples across two 5m windows (0-5m, 5-10m)
    rows = [("t1", "m.a", i * MIN, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 10, 20, 30, 40, 50])]
    return raw_df(spark, rows)


def test_basic_from_raw(spark, simple_raw):
    out = {r["window_start"]: r for r in R.basic_from_raw(simple_raw, G.MIN_5).collect()}
    w0 = out[0]
    assert w0["num_points"] == 5
    assert w0["avg"] == 3.0
    assert w0["min"] == 1.0 and w0["max"] == 5.0 and w0["sum"] == 15.0
    assert math.isclose(w0["var_pop"], 2.0)  # population variance of 1..5
    w1 = out[300_000]
    assert w1["avg"] == 30.0 and w1["num_points"] == 5


def test_basic_merge_equals_recompute(spark, simple_raw):
    r5 = R.basic_from_raw(simple_raw, G.MIN_5)
    merged = R.basic_merge(r5, G.MIN_20).collect()[0]
    direct = R.basic_from_raw(simple_raw, G.MIN_20).collect()[0]
    for f in ("num_points", "sum", "min", "max"):
        assert merged[f] == direct[f]
    assert math.isclose(merged["avg"], direct["avg"], rel_tol=1e-12)
    # pooled variance == variance over all raw points (BaseRollup.java:152-177)
    assert math.isclose(merged["var_pop"], direct["var_pop"], rel_tol=1e-9)


def test_cascade_levels(spark, simple_raw):
    levels = R.cascade(simple_raw)
    assert set(levels) == {"5m", "20m", "60m", "240m", "1440m"}
    top = levels["1440m"].collect()
    assert len(top) == 1
    assert top[0]["num_points"] == 10
    assert top[0]["sum"] == 165.0


def test_counter_semantics(spark, simple_raw):
    c5 = {r["window_start"]: r for r in R.counter_from_raw(simple_raw, G.MIN_5).collect()}
    w0 = c5[0]
    # count = Σvalues, rate = count / (maxTs - minTs) (BluefloodCounterRollup.java:86-99)
    assert w0["count"] == 15.0
    assert math.isclose(w0["rate"], 15.0 / (4 * MIN))
    assert w0["sample_count"] == 5

    merged = R.counter_merge(R.counter_from_raw(simple_raw, G.MIN_5), G.MIN_20).collect()[0]
    # harmonic rate merge: Σcount / Σ(countᵢ/rateᵢ) (BluefloodCounterRollup.java:101-115)
    expected_secs = 15.0 / (15.0 / (4 * MIN)) + 150.0 / (150.0 / (4 * MIN))
    assert math.isclose(merged["rate"], 165.0 / expected_secs)
    assert merged["count"] == 165.0
    assert merged["sample_count"] == 10


def test_counter_single_sample_safe_div(spark):
    # single point → maxTs == minTs → safe_div gives 0.0 (reference gives Inf; documented divergence)
    df = raw_df(spark, [("t1", "m.b", 1000, 42.0)])
    row = R.counter_from_raw(df, G.MIN_5).collect()[0]
    assert row["rate"] == 0.0


def test_gauge_latest(spark):
    rows = [
        ("t1", "m.g", 1_000, 5.0),
        ("t1", "m.g", 200_000, 9.0),
        ("t1", "m.g", 100_000, 7.0),
    ]
    row = R.gauge_from_raw(raw_df(spark, rows), G.MIN_5).collect()[0]
    # latest = value at max timestamp (BluefloodGaugeRollup.java:64-96)
    assert row["latest_ts"] == 200_000
    assert row["latest_value"] == 9.0
    assert row["num_points"] == 3


def test_set_distinct(spark):
    rows = [("t1", "m.s", i * 1000, float(v)) for i, v in enumerate([1, 2, 2, 3, 3, 3])]
    row = R.set_from_raw(raw_df(spark, rows), G.MIN_5).collect()[0]
    # distinct members regardless of repetition (BluefloodSetRollup.java:30-43)
    assert row["distinct_count"] == 3


def test_timer_merge_unweighted_percentiles(spark):
    # two 5m children with different counts; percentile merge must be the
    # UNWEIGHTED mean of child means (BluefloodTimerRollup.java:241-254)
    t5 = spark.createDataFrame(
        [
            ("t1", "m.t", 0, 10, 100.0, 1040.0, 2.0, 10, 1.0, 20.0, 10.0, 4.0, 5.0),
            ("t1", "m.t", 300_000, 90, 900.0, 9810.0, 3.0, 90, 2.0, 30.0, 10.0, 9.0, 7.0),
        ],
        "tenant_id string, metric_name string, window_start long, count long, sum double,"
        " sum_sq double, rate double, sample_count long, min double, max double, avg double,"
        " var_pop double, pct_50 double",
    )
    row = R.timer_merge(t5, G.MIN_20, percentile_labels=("50",)).collect()[0]
    assert row["pct_50"] == 6.0  # (5+7)/2, NOT count-weighted (which would be 6.8)
    assert row["count"] == 100
    assert row["sum"] == 1000.0
    # harmonic rate: 100 / (10/2 + 90/3) = 100/35
    assert math.isclose(row["rate"], 100 / 35.0)
    assert row["min"] == 1.0 and row["max"] == 30.0
    assert math.isclose(row["avg"], 10.0)
    # pooled var from moments: Σx²/N − avg² = 10850/100 − 100 = 8.5
    assert math.isclose(row["var_pop"], 8.5)


def test_merge_variance_never_negative(spark):
    # Constant-valued series: true variance is exactly 0 at every level.
    # The moments form + greatest(0, ·) guard must yield 0.0, never a
    # cancellation-noise negative (round-1 driver-hash failure class).
    rows = [("t1", "m.c", i * MIN, 3.7) for i in range(40)]
    r5 = R.basic_from_raw(raw_df(spark, rows), G.MIN_5)
    for row in R.basic_merge(r5, G.MIN_20).collect():
        assert row["var_pop"] >= 0.0
        assert math.copysign(1.0, row["var_pop"]) > 0  # no -0.0
        assert row["var_pop"] < 1e-9


def test_merge_percentile_maps(spark):
    t5 = spark.createDataFrame(
        [
            ("t1", "m.t", 0, {"50": 5.0, "95": 10.0}),
            ("t1", "m.t", 300_000, {"50": 7.0, "95": 20.0, "99": 30.0}),
        ],
        "tenant_id string, metric_name string, window_start long, percentiles map<string,double>",
    )
    row = R.merge_percentile_maps(t5, G.MIN_20).collect()[0]
    assert row["percentiles"] == {"50": 6.0, "95": 15.0, "99": 30.0}
