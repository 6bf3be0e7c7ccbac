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


def test_bucketed_rollups_merge_without_shuffle(spark):
    """write_rollups_bucketed persists the cascade's shuffle into the
    table layout: the 5m→20m merge over the bucketed table must plan
    with ZERO exchanges (HashPartitioning(locator) from the bucketed
    scan satisfies the merge groupBy's clustering requirement)."""
    base = 1_700_000_000_000
    rows = [
        (f"t{i % 3}", f"m{i % 7}", "5m", base + (i // 21) * 300_000,
         2, float(i), 0.0, float(i), float(i), 2.0 * i, 2.0 * i * i)
        for i in range(84)
    ]
    t5 = spark.createDataFrame(
        rows,
        "tenant_id string, metric_name string, resolution string, window_start long,"
        " num_points long, avg double, var_pop double, min double, max double,"
        " sum double, sum_sq double",
    )
    spark.sql("DROP TABLE IF EXISTS t5m_bucketed_test")
    TBL.write_rollups_bucketed(t5, "t5m_bucketed_test", n_buckets=4)
    try:
        scan = TBL.read_rollups_bucketed(spark, "t5m_bucketed_test").drop("date")
        merged = R.basic_merge(scan, G.MIN_20)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result matches the same merge over the unbucketed frame
        expect = {
            (r["tenant_id"], r["metric_name"], r["window_start"]): r["num_points"]
            for r in R.basic_merge(t5, G.MIN_20).collect()
        }
        got = {
            (r["tenant_id"], r["metric_name"], r["window_start"]): r["num_points"]
            for r in merged.collect()
        }
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t5m_bucketed_test")


def test_bucketed_join_colocated(spark):
    """Rollups ⋈ per-locator metadata, both bucketed on the locator:
    joining on exactly the bucket key runs with no exchange on either
    side (the serving-path units-enrichment shape). Note co-partitioned
    joins need the join keys to BE the bucket keys
    (requireAllClusterKeysForCoPartition); aggregations only need the
    bucket keys as a subset of the grouping keys."""
    base = 1_700_000_000_000
    rows = [
        (f"t{i % 2}", f"m{i % 5}", "5m", base + i * 300_000, 1, float(i),
         0.0, float(i), float(i), float(i), float(i) * i)
        for i in range(40)
    ]
    schema = (
        "tenant_id string, metric_name string, resolution string, window_start long,"
        " num_points long, avg double, var_pop double, min double, max double,"
        " sum double, sum_sq double"
    )
    t5 = spark.createDataFrame(rows, schema)
    spark.sql("DROP TABLE IF EXISTS bj_rollups")
    spark.sql("DROP TABLE IF EXISTS bj_meta")
    TBL.write_rollups_bucketed(t5, "bj_rollups", n_buckets=4)
    meta = t5.groupBy("tenant_id", "metric_name").agg(F.lit("ms").alias("unit"))
    (
        meta.write.bucketBy(4, "tenant_id", "metric_name")
        .mode("overwrite").format("parquet").saveAsTable("bj_meta")
    )
    try:
        a = spark.table("bj_rollups").select("tenant_id", "metric_name", "window_start", "avg")
        b = spark.table("bj_meta")
        # disable broadcast so the test exercises the co-located sort-merge path
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, ["tenant_id", "metric_name"])
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == 40
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bj_rollups")
        spark.sql("DROP TABLE IF EXISTS bj_meta")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pack_sequences_no_corpus_global_sort(spark):
    """The corpus-side prefix window must be partitioned by shard; the
    only single-partition window is over the tiny per-shard totals
    frame."""
    from blueflood_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(i, "w " * (1 + i % 5)) for i in range(300)], "doc_id long, text string"
    )
    plan = _executed_plan(TX.pack_sequences(docs, budget=16, shard_size=32))
    # corpus window partitioned by _shard, never a bare global sort of docs
    assert "partitionBy(_shard" in plan.replace(" ", "") or "hashpartitioning(_shard" in plan, plan


def test_weighted_sample_is_take_ordered(spark):
    from blueflood_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(i, "x" * (1 + i % 40)) for i in range(500)], "doc_id long, text string"
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    plan = _executed_plan(TX.weighted_sample(docs, k=10))
    assert "TakeOrderedAndProject" in plan, plan


def test_simhash_pairs_no_cartesian(spark):
    from blueflood_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"tok{i % 11} tok{i % 7} tok{i % 5} filler words here") for i in range(60)],
        "doc_id long, text string",
    )
    plan = _executed_plan(D.simhash_near_pairs(docs, max_hamming=8, bits=60))
    assert "CartesianProduct" not in plan, plan


def test_kmeans_assignment_broadcasts_centroids(spark):
    """The corpus side must join centroids via broadcast (k·dim rows),
    never a shuffled cartesian."""
    from blueflood_spark.operators import similarity as SIM

    emb = spark.createDataFrame(
        [(i, [float(i % 13), float(i % 17)]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    plan = _executed_plan(SIM.kmeans_assign(emb, k=4, iterations=1))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_corpus_clustered_semdedup_pairs_without_shuffle(spark):
    """write_corpus_clustered persists the k-means clustering into the
    table layout: the SemDeDup pairwise stage (groupBy(cluster_id) →
    applyInPandas) over the bucketed table must plan with ZERO
    exchanges, and its pair set must equal the unbucketed path's."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], int(i % 4))
        for i in range(120)
    ]
    clustered = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster_id int"
    )

    def pair_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy(dtype=np.int64), kind="stable")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)[order]
        mat = np.array(list(pdf["embedding"].iloc[order]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ mat.T) / np.outer(norms, norms)
        ii, jj = np.nonzero(np.triu(sims >= 0.2, k=1))
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})

    spark.sql("DROP TABLE IF EXISTS corpus_clustered_test")
    TBL.write_corpus_clustered(clustered, "corpus_clustered_test", n_buckets=4)
    try:
        scan = spark.table("corpus_clustered_test")
        pairs = scan.groupBy("cluster_id").applyInPandas(
            pair_kernel, schema="id_a long, id_b long"
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        want = {
            (r["id_a"], r["id_b"])
            for r in clustered.repartition(4)
            .groupBy("cluster_id")
            .applyInPandas(pair_kernel, schema="id_a long, id_b long")
            .collect()
        }
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_clustered_test")
