"""Preaggregated rollup ladder: statsd payload → normalized rows →
per-family cascade (SURVEY S3 + A3-A7 merges; reference
metrics_preaggregated_* column families)."""

import math

import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import rollup as R
from blueflood_spark.schemas import PREAGG_METRICS

MIN = 60_000


@pytest.fixture(scope="module")
def preagg(spark):
    def row(ts, typ, **kw):
        base = {f.name: None for f in PREAGG_METRICS.fields}
        base.update(tenant_id="t1", metric_name=f"m.{typ}", ts=ts, rollup_type=typ, **kw)
        return tuple(base[f.name] for f in PREAGG_METRICS.fields)

    rows = [
        # two counter flushes in one 5m window, one in the next
        row(0, "counter", counter_value=10.0, counter_rate=2.0),
        row(60_000, "counter", counter_value=20.0, counter_rate=4.0),
        row(360_000, "counter", counter_value=30.0, counter_rate=6.0),
        # gauges: latest should win by ts
        row(0, "gauge", gauge_value=1.0),
        row(120_000, "gauge", gauge_value=5.0),
        row(420_000, "gauge", gauge_value=3.0),
        # timers with percentiles
        row(0, "timer", timer_count=10, timer_sum=100.0, timer_rate=2.0, timer_min=1.0,
            timer_max=20.0, timer_avg=10.0, timer_std=2.0, timer_percentiles={"50": 5.0}),
        row(360_000, "timer", timer_count=30, timer_sum=600.0, timer_rate=3.0, timer_min=2.0,
            timer_max=40.0, timer_avg=20.0, timer_std=4.0, timer_percentiles={"50": 7.0}),
        # sets with overlapping members across windows
        row(0, "set", set_values=["a", "b"]),
        row(60_000, "set", set_values=["b", "c"]),
        row(360_000, "set", set_values=["c", "d"]),
    ]
    df = spark.createDataFrame(rows, PREAGG_METRICS)
    # sample_count as ingest.normalize_aggregated would derive (flush=0 → 1)
    return df.withColumn(
        "sample_count",
        F.when(F.col("rollup_type") == "counter", F.lit(1).cast("long")),
    )


def test_counter_ladder(spark, preagg):
    out = R.preagg_cascade(preagg, grans=(G.MIN_5, G.MIN_20))
    c5 = {r["window_start"]: r for r in out["counter"]["5m"].collect()}
    # two flushes merged: count 30, rate = 30 / (10/2 + 20/4) = 3.0
    assert c5[0]["count"] == 30.0
    assert math.isclose(c5[0]["rate"], 3.0)
    c20 = out["counter"]["20m"].collect()[0]
    assert c20["count"] == 60.0
    # harmonic across both 5m windows: 60 / (30/3 + 30/6)
    assert math.isclose(c20["rate"], 60.0 / (10.0 + 5.0))


def test_gauge_ladder(spark, preagg):
    out = R.preagg_cascade(preagg, grans=(G.MIN_5, G.MIN_20))
    g20 = out["gauge"]["20m"].collect()[0]
    assert g20["num_points"] == 3
    assert g20["latest_ts"] == 420_000 and g20["latest_value"] == 3.0
    assert g20["min"] == 1.0 and g20["max"] == 5.0
    assert math.isclose(g20["avg"], 3.0)


def test_timer_ladder(spark, preagg):
    out = R.preagg_cascade(preagg, grans=(G.MIN_5, G.MIN_20))
    t20 = out["timer"]["20m"].collect()[0]
    assert t20["count"] == 40
    assert t20["sum"] == 700.0
    # harmonic rate: 40 / (10/2 + 30/3) = 40/15
    assert math.isclose(t20["rate"], 40.0 / 15.0)
    # unweighted percentile merge: (5 + 7) / 2
    assert t20["percentiles"]["50"] == 6.0
    # count-weighted mean: (10*10 + 30*20)/40
    assert math.isclose(t20["avg"], 17.5)


def test_set_ladder_exact_union(spark, preagg):
    out = R.preagg_cascade(preagg, grans=(G.MIN_5, G.MIN_20))
    s5 = {r["window_start"]: r["distinct_count"] for r in out["set"]["5m"].collect()}
    assert s5[0] == 3  # {a,b} ∪ {b,c}
    assert s5[300_000] == 2  # {c,d}
    s20 = out["set"]["20m"].collect()[0]
    assert s20["distinct_count"] == 4  # {a,b,c,d} — overlap not double-counted
