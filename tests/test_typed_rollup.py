"""F5 number promotion: long-preserving typed rollup (typed_from_raw /
typed_merge) against the reference's semantics:

- Long average is exact truncated division of the exact sum. The
  reference's incremental remainder form (Average.java:70-76) maintains
  sum = count*value + remainder exactly but is order-dependent within
  ±1 (see test_properties.py); trunc division is the canonical
  order-independent choice, and matches AverageTest.java:36-42's
  (2, 4, 4) -> 3.
- A stat promotes to floating iff any contributing value is floating
  (Average.java:115-121 handleRollupMetric).
- Min/max keep the type of the winning value (MinValue.java:52-95,
  MaxValue.java:49-92); ties keep the long (documented rule — the
  reference's tie outcome is arrival-order-dependent).
"""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, DoubleType, StructField, StructType, StringType

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import rollup as R

SCHEMA = StructType(
    [
        StructField("tenant_id", StringType()),
        StructField("metric_name", StringType()),
        StructField("ts", LongType()),
        StructField("value_l", LongType()),
        StructField("value_d", DoubleType()),
    ]
)


def _typed(spark, rows):
    return spark.createDataFrame(
        [("t0", "m", ts, vl, vd) for ts, vl, vd in rows], SCHEMA
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_long_average_reference_values(spark):
    # AverageTest.java testLongAverage: avg(2L, 4L, 4L) == 3L (trunc(10/3))
    out = _one(R.typed_from_raw(_typed(spark, [(0, 2, None), (1, 4, None), (2, 4, None)]), G.MIN_5))
    assert out.is_float is False
    assert out.avg_l == 3 and out.avg_d is None
    assert out.min_l == 2 and out.max_l == 4
    assert out.sum_l == 10


def test_long_average_negative_truncates_toward_zero(spark):
    # Java division truncates toward zero: (-2 + -4 + -4) / 3 = -10/3 -> -3
    out = _one(R.typed_from_raw(_typed(spark, [(0, -2, None), (1, -4, None), (2, -4, None)]), G.MIN_5))
    assert out.avg_l == -3


def test_promotion_on_any_double(spark):
    out = _one(
        R.typed_from_raw(_typed(spark, [(0, 2, None), (1, None, 4.0), (2, 4, None)]), G.MIN_5)
    )
    assert out.is_float is True
    assert out.avg_l is None
    assert abs(out.avg_d - 10.0 / 3) < 1e-12


def test_min_max_keep_winning_type(spark):
    # min winner is the long 1; max winner is the double 9.5
    out = _one(
        R.typed_from_raw(_typed(spark, [(0, 1, None), (1, None, 1.5), (2, None, 9.5), (3, 7, None)]), G.MIN_5)
    )
    assert out.min_l == 1 and out.min_d is None
    assert out.max_l is None and out.max_d == 9.5


def test_tie_keeps_long(spark):
    out = _one(R.typed_from_raw(_typed(spark, [(0, 3, None), (1, None, 3.0)]), G.MIN_5))
    assert out.min_l == 3 and out.min_d is None
    assert out.max_l == 3 and out.max_d is None


def test_merge_promotes_transitively(spark):
    # window 0-5m all-long, window 5-10m contains a double -> 20m merge floats
    rows = [(0, 2, None), (1, 4, None), (300_000, None, 8.0), (300_001, 6, None)]
    t5 = R.typed_from_raw(_typed(spark, rows), G.MIN_5)
    assert t5.count() == 2
    out = _one(R.typed_merge(t5, G.MIN_20))
    assert out.is_float is True
    assert out.num_points == 4
    assert abs(out.avg_d - (2 + 4 + 8.0 + 6) / 4) < 1e-12
    assert out.min_l == 2 and out.max_d == 8.0


def test_merge_long_path_exact(spark):
    # both 5m children long -> 20m stays long, avg = trunc(sum/count)
    rows = [(0, 5, None), (1, 6, None), (300_000, 9, None)]
    t5 = R.typed_from_raw(_typed(spark, rows), G.MIN_5)
    out = _one(R.typed_merge(t5, G.MIN_20))
    assert out.is_float is False
    assert out.avg_l == 6  # trunc(20/3)
    assert out.sum_l == 20
    assert out.min_l == 5 and out.max_l == 9


def test_merge_equals_direct_rollup(spark):
    # typed cascade associativity on a mixed series
    rows = [
        (i * 60_000, (i * 7) % 13 if i % 3 else None, None if i % 3 else float(i) / 7)
        for i in range(40)
    ]
    rows = [(ts, vl, vd) for ts, vl, vd in rows]
    df = _typed(spark, rows)
    via_merge = R.typed_merge(R.typed_from_raw(df, G.MIN_5), G.MIN_20)
    direct = R.typed_from_raw(df, G.MIN_20)
    cols = ["window_start", "num_points", "is_float", "sum_l", "avg_l", "min_l", "min_d", "max_l", "max_d"]
    a = {r.window_start: r for r in via_merge.select(cols).collect()}
    b = {r.window_start: r for r in direct.select(cols).collect()}
    assert a.keys() == b.keys()
    for k in a:
        for c in cols:
            av, bv = getattr(a[k], c), getattr(b[k], c)
            if isinstance(av, float) and av is not None and bv is not None:
                assert abs(av - bv) < 1e-9
            else:
                assert av == bv, (k, c, av, bv)
