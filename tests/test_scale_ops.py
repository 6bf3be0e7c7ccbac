"""Scale-path operators: skew-salted rollup equivalence and idempotent
window overwrite (T7)."""

import math

from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import rollup as R
from blueflood_spark.sources import tables as TBL

MIN = 60_000


def test_salted_equals_plain(spark):
    # one extremely hot locator + a normal one
    rows = [("t1", "hot.metric", i * 500, float(i % 17)) for i in range(4000)]
    rows += [("t1", "cold.metric", i * MIN, float(i)) for i in range(10)]
    raw = spark.createDataFrame(rows, "tenant_id string, metric_name string, ts long, value double")
    plain = {
        (r["metric_name"], r["window_start"]): r
        for r in R.basic_from_raw(raw, G.MIN_5).collect()
    }
    salted = {
        (r["metric_name"], r["window_start"]): r
        for r in R.basic_from_raw_salted(raw, G.MIN_5, salt_buckets=8).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        for f in ("num_points", "min", "max"):
            assert plain[k][f] == salted[k][f], (k, f)
        for f in ("avg", "sum", "var_pop"):
            assert math.isclose(plain[k][f], salted[k][f], rel_tol=1e-9, abs_tol=1e-9), (k, f)


def test_overwrite_windows_idempotent(spark, tmp_path):
    path = str(tmp_path / "rollups")
    base = 1_700_000_000_000

    def mk(avg):
        return spark.createDataFrame(
            [("t1", "m", "5m", base, 5, avg)],
            "tenant_id string, metric_name string, resolution string, window_start long,"
            " num_points long, avg double",
        )

    other = spark.createDataFrame(
        [("t1", "m", "60m", base - 40 * 86_400_000, 7, 9.9)],
        "tenant_id string, metric_name string, resolution string, window_start long,"
        " num_points long, avg double",
    )
    TBL.write_rollups(mk(1.0), path, mode="overwrite")
    TBL.write_rollups(other, path, mode="append")
    # re-running the 5m job must replace only the 5m partition
    TBL.overwrite_windows(mk(2.0), path)
    got = spark.read.parquet(path)
    assert got.count() == 2  # no duplicate 5m row, 60m untouched
    assert got.filter(F.col("resolution") == "5m").collect()[0]["avg"] == 2.0
    assert got.filter(F.col("resolution") == "60m").collect()[0]["avg"] == 9.9
    # …and is idempotent
    TBL.overwrite_windows(mk(2.0), path)
    assert spark.read.parquet(path).count() == 2


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "rollups")
    base = 1_700_000_000_000

    def mk(i):
        return spark.createDataFrame(
            [("t1", f"m{i}", "5m", base + i, 1, float(i))],
            "tenant_id string, metric_name string, resolution string, window_start long,"
            " num_points long, avg double",
        )

    # simulate 8 micro-batch appends → 8 tiny files in one partition
    for i in range(8):
        TBL.write_rollups(mk(i), path, mode="append")
    before = spark.read.parquet(path)
    assert before.count() == 8
    rewritten = TBL.compact(spark, path, target_bytes=128 * 1024 * 1024)
    assert any(k.startswith("5m/") for k in rewritten)
    after = spark.read.parquet(path)
    assert after.count() == 8  # no data change
    assert {r["avg"] for r in after.collect()} == {float(i) for i in range(8)}
    # compaction is idempotent: second run rewrites nothing
    assert TBL.compact(spark, path, target_bytes=128 * 1024 * 1024) == {}
