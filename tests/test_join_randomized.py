"""Randomized (seeded) cross-checks of the custom join operators against
brute-force Python reference implementations — one generated dataset per
seed, many rows, so Spark job overhead stays bounded."""

import random

import pytest

from blueflood_spark.operators.asof import asof_join
from blueflood_spark.operators.range_join import range_join


@pytest.mark.parametrize("seed", [3, 17])
def test_asof_join_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    keys = ["a", "b", "c"]
    left = [(rng.choice(keys), rng.randrange(0, 10_000), f"e{i}") for i in range(120)]
    right_raw = {(rng.choice(keys), rng.randrange(0, 10_000)) for _ in range(60)}
    right = [(k, ts, float(rng.randrange(100))) for (k, ts) in right_raw]

    ldf = spark.createDataFrame(left, "key string, ts long, eid string")
    rdf = spark.createDataFrame(right, "key string, ts long, value double")
    got = {
        r["eid"]: (r["asof_value"], r["asof_ts"])
        for r in asof_join(ldf, rdf, on=["key"]).collect()
    }

    for k, ts, eid in left:
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= ts]
        expect = max(cands) if cands else None
        if expect is None:
            assert got[eid] == (None, None), eid
        else:
            assert got[eid] == (expect[1], expect[0]), eid


@pytest.mark.parametrize("seed,bucket", [(5, 100), (5, 1000), (9, 137)])
def test_range_join_matches_bruteforce(spark, seed, bucket):
    rng = random.Random(seed)
    keys = ["a", "b"]
    left = [(rng.choice(keys), rng.randrange(0, 5_000), f"p{i}") for i in range(100)]
    right = []
    for i in range(40):
        start = rng.randrange(0, 5_000)
        right.append((rng.choice(keys), start, start + rng.randrange(0, 800), f"r{i}"))

    ldf = spark.createDataFrame(left, "key string, ts long, pid string")
    rdf = spark.createDataFrame(right, "key string, start long, end long, rid string")
    got = {
        (r["pid"], r["rid"])
        for r in range_join(ldf, rdf, on=["key"], bucket_ms=bucket).collect()
    }
    expect = {
        (pid, rid)
        for (lk, ts, pid) in left
        for (rk, s, e, rid) in right
        if lk == rk and s <= ts <= e
    }
    assert got == expect  # identical pairs at any bucket width
