"""Range-join semantics: inclusive bounds, bucket spanning, key isolation
(operators/range_join.py; oracle-checked vs DuckDB via bf_range_join)."""

from blueflood_spark.operators.range_join import range_join


def test_range_join_bounds_and_buckets(spark):
    left = spark.createDataFrame(
        [("a", 0, "p0"), ("a", 100, "p1"), ("a", 500, "p2"), ("a", 501, "p3"), ("b", 100, "p4")],
        "key string, ts long, pid string",
    )
    # interval spans many buckets (width 100 → 6 buckets); second is tiny
    right = spark.createDataFrame(
        [("a", 100, 500, "r1"), ("a", 450, 460, "r2"), ("b", 0, 50, "r3")],
        "key string, start long, end long, rid string",
    )
    out = {(r["pid"], r["rid"]) for r in
           range_join(left, right, on=["key"], bucket_ms=100).collect()}
    assert ("p1", "r1") in out  # start boundary inclusive
    assert ("p2", "r1") in out  # end boundary inclusive
    assert ("p3", "r1") not in out  # just past end
    assert ("p0", "r1") not in out  # before start
    assert ("p4", "r3") not in out and ("p4", "r1") not in out  # key isolation + range
    assert len(out) == 2  # no duplicate matches despite multi-bucket interval


def test_range_join_wide_bucket(spark):
    # bucket wider than every interval still finds matches (interval fully
    # inside one bucket; left row in same bucket)
    left = spark.createDataFrame([("a", 150, "p")], "key string, ts long, pid string")
    right = spark.createDataFrame([("a", 100, 200, "r")], "key string, start long, end long, rid string")
    assert range_join(left, right, on=["key"], bucket_ms=10_000).count() == 1
