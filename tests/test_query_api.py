"""Query API: param parsing, stat selection/legality, response shaping,
repair-on-read (SURVEY §2.11, A8, O2/O3)."""

import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import repair as REP
from blueflood_spark.operators import rollup as R
from blueflood_spark.plans import query_api as Q

MIN = 60_000


@pytest.fixture(scope="module")
def rollups(spark):
    raw = spark.createDataFrame(
        [("t1", "m.a", i * MIN, float(i)) for i in range(60)],
        "tenant_id string, metric_name string, ts long, value double",
    )
    return R.basic_from_raw(raw, G.MIN_5).withColumn("resolution", F.lit("5m"))


def test_parse_params_happy():
    p = Q.parse_params({"from": ["0"], "to": ["100"], "points": ["10"]})
    assert p.points == 10 and p.from_ms == 0 and p.to_ms == 100
    p2 = Q.parse_params({"from": ["0"], "to": ["100"], "resolution": ["MIN5"]})
    assert p2.resolution is G.MIN_5


def test_parse_params_errors():
    with pytest.raises(Q.InvalidRequestError):
        Q.parse_params({})
    with pytest.raises(Q.InvalidRequestError):
        Q.parse_params({"from": ["0"], "to": ["100"]})  # neither points nor resolution
    with pytest.raises(Q.InvalidRequestError):
        Q.parse_params({"from": ["100"], "to": ["100"], "points": ["1"]})  # to <= from
    with pytest.raises(Q.InvalidRequestError):
        Q.parse_params({"from": ["x"], "to": ["100"], "points": ["1"]})
    with pytest.raises(Q.InvalidRequestError):
        Q.parse_params({"from": ["0"], "to": ["100"], "resolution": ["MIN7"]})


def test_parse_select_stats():
    p = Q.parse_params(
        {"from": ["0"], "to": ["9"], "points": ["1"], "select": ["average,min", "bogus", "MAX"]}
    )
    assert p.stats == ["average", "min", "max"]  # unknown silently dropped, case-folded


def test_effective_stats_legality():
    # illegal per-type stats silently dropped (serializer :166-168)
    assert Q.effective_stats(["average", "latest"], "basic") == ["average"]
    assert Q.effective_stats(["average", "latest"], "gauge") == ["latest"]
    assert Q.effective_stats([], "timer") == ["rate", "numPoints", "average"]  # defaults
    assert Q.effective_stats([], "set") == ["numPoints"]


def test_get_view_shape(rollups):
    p = Q.parse_params({"from": ["0"], "to": [str(60 * MIN)], "resolution": ["MIN5"]})
    out = Q.get_view(rollups, "t1", "m.a", p, unit="bytes")
    assert out["unit"] == "bytes"
    assert out["metadata"]["count"] == 12
    v0 = out["values"][0]
    assert set(v0) == {"timestamp", "average", "numPoints", "sum"}  # basic defaults
    assert v0["average"] == 2.0 and v0["numPoints"] == 5


def test_get_views_multi_and_limit(rollups):
    p = Q.parse_params({"from": ["0"], "to": [str(60 * MIN)], "resolution": ["MIN5"]})
    out = Q.get_views_multi(rollups, "t1", ["m.a", "m.missing"], p)
    assert out["m.a"]["metadata"]["count"] == 12
    assert out["m.missing"]["metadata"]["count"] == 0
    with pytest.raises(Q.InvalidRequestError):
        Q.get_views_multi(rollups, "t1", ["a", "b", "c"], p, max_metrics=2)


def test_points_budget_selection(rollups):
    p = Q.parse_params({"from": ["0"], "to": [str(86_400_000)], "points": ["288"]})
    assert Q.select_granularity(p).name == "5m"


def test_repair_on_read(spark, rollups):
    raw = spark.createDataFrame(
        [("t1", "m.a", i * MIN, float(i)) for i in range(60)],
        "tenant_id string, metric_name string, ts long, value double",
    )
    # stored rollups missing two windows
    stored = rollups.filter(~F.col("window_start").isin([10 * 5 * MIN, 0]))
    out = REP.repair_on_read(stored, raw, G.MIN_5, 0, 60 * MIN)
    rows = {r["window_start"]: r for r in out.collect()}
    assert len(rows) == 12  # all windows present again
    assert rows[0]["source"] == "repaired"
    assert rows[5 * MIN]["source"] == "stored"
    # repaired values equal what a full recompute gives
    assert rows[0]["avg"] == 2.0 and rows[0]["num_points"] == 5


def test_metadata_driven_rollup_type(spark, rollups):
    """J2: catalog decides the stat family — a gauge metric gets gauge
    defaults (numPoints, latest) without the caller naming the type."""
    cat = spark.createDataFrame(
        [("t1", "m.a", None, "gauge")],
        "tenant_id string, metric_name string, unit string, rollup_type string",
    )
    gauge_rollups = rollups.withColumn("latest_value", F.col("avg") * 2)
    p = Q.parse_params({"from": ["0"], "to": [str(60 * MIN)], "resolution": ["MIN5"]})
    out = Q.get_view(gauge_rollups, "t1", "m.a", p, rollup_type=None, catalog=cat)
    assert set(out["values"][0]) == {"timestamp", "numPoints", "latest"}  # gauge defaults
    # unknown metric falls back to basic defaults
    out2 = Q.get_view(gauge_rollups, "t1", "m.zzz", p, rollup_type=None, catalog=cat)
    assert out2["metadata"]["count"] == 0


def test_get_view_full_resolution_dispatch(spark):
    """FULL granularity selection must serve from the raw table (the
    rollups table has no 'full' rows) — and fail loudly without it."""
    import pytest as _pytest

    from blueflood_spark.plans import query_api as QA

    now = 1_700_000_000_000
    frm, to = now - 3_600_000, now  # 1 hour, recent
    raw = spark.createDataFrame(
        [("t1", "m.cpu", frm + i * 60_000, float(i)) for i in range(60)],
        "tenant_id string, metric_name string, ts long, value double",
    )
    rollups = spark.createDataFrame(
        [], "tenant_id string, metric_name string, resolution string,"
            " window_start long, num_points long, avg double, var_pop double,"
            " min double, max double, sum double",
    )
    params = QA.parse_params(
        {"points": ["500"], "from": [str(frm)], "to": [str(to)]}
    )
    # 1h at the 30s assumed interval → FULL provides 120 points; 5m only 12
    assert QA.select_granularity(params, now_ms=now).name == "full"
    resp = QA.get_view(rollups, "t1", "m.cpu", params, now_ms=now, raw=raw)
    assert len(resp["values"]) == 60
    assert resp["values"][0]["numPoints"] == 1  # raw sample shaped as point
    with _pytest.raises(QA.InvalidRequestError, match="FULL"):
        QA.get_view(rollups, "t1", "m.cpu", params, now_ms=now)


def test_points_zero_selects_last_like_reference(spark):
    from blueflood_spark.operators import granularity as G

    assert G.from_points_in_interval(0, 7_200_000, 0).name == "1440m"


def test_get_view_full_resolution_preagg_family_is_loud(spark):
    """A preagg-family metric whose budget selects FULL must raise (the
    basic metrics_full table cannot serve it), never silently return an
    empty series."""
    import pytest as _pytest

    from blueflood_spark.plans import query_api as QA

    now = 1_700_000_000_000
    frm, to = now - 3_600_000, now
    raw = spark.createDataFrame(
        [("t1", "m.req", frm + 60_000, 1.0)],
        "tenant_id string, metric_name string, ts long, value double",
    )
    rollups = spark.createDataFrame(
        [], "tenant_id string, metric_name string, resolution string,"
            " window_start long, num_points long, avg double, var_pop double,"
            " min double, max double, sum double",
    )
    params = QA.parse_params({"points": ["500"], "from": [str(frm)], "to": [str(to)]})
    assert QA.select_granularity(params, now_ms=now).name == "full"
    with _pytest.raises(QA.InvalidRequestError, match="preaggregated family 'timer'"):
        QA.get_view(rollups, "t1", "m.req", params, rollup_type="timer",
                    now_ms=now, raw=raw)
    with _pytest.raises(QA.InvalidRequestError, match="preaggregated family 'counter'"):
        QA.get_views_multi(rollups, "t1", ["m.req"], params, rollup_type="counter",
                           now_ms=now, raw=raw)
