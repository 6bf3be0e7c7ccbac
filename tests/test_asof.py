"""As-of join semantics: inclusive boundary, no-match nulls, tolerance,
key isolation (operators/asof.py; oracle-checked against DuckDB's native
ASOF JOIN via bf_asof_enrich)."""

from blueflood_spark.operators.asof import asof_join


def frames(spark):
    left = spark.createDataFrame(
        [("a", 100, "e1"), ("a", 250, "e2"), ("a", 50, "e0"), ("b", 100, "e3")],
        "key string, ts long, event string",
    )
    right = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 200, 2.0), ("b", 90, 9.0)],
        "key string, ts long, value double",
    )
    return left, right


def test_asof_basic(spark):
    left, right = frames(spark)
    out = {r["event"]: r for r in asof_join(left, right, on=["key"]).collect()}
    assert out["e1"]["asof_value"] == 1.0 and out["e1"]["asof_ts"] == 100  # inclusive ==
    assert out["e2"]["asof_value"] == 2.0  # most recent, not first
    assert out["e0"]["asof_value"] is None  # nothing at or before ts=50
    assert out["e3"]["asof_value"] == 9.0  # key isolation: b sees only b


def test_asof_tolerance(spark):
    left, right = frames(spark)
    out = {r["event"]: r for r in
           asof_join(left, right, on=["key"], tolerance_ms=30).collect()}
    assert out["e1"]["asof_value"] == 1.0  # exact match within tolerance
    assert out["e2"]["asof_value"] is None  # 250-200=50 > 30 → voided
    assert out["e2"]["asof_ts"] is None


def test_asof_preserves_left_rows(spark):
    left, right = frames(spark)
    assert asof_join(left, right, on=["key"]).count() == left.count()


def test_asof_null_right_value_is_preserved(spark):
    """A matched right row whose VALUE is NULL must yield asof_value NULL
    (not an older row's value) — struct-carry regression test."""
    left = spark.createDataFrame([("k", 25), ("k", 15)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 10, 5.0), ("k", 20, None)], "key string, ts long, value double"
    )
    from blueflood_spark.operators.asof import asof_join

    out = {r["ts"]: r for r in asof_join(left, right, ["key"]).collect()}
    assert out[15]["asof_ts"] == 10 and out[15]["asof_value"] == 5.0
    assert out[25]["asof_ts"] == 20 and out[25]["asof_value"] is None
