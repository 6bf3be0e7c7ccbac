"""Product-quantization operators: code validity, partitioning
invariance, ADC ranking contract, recall floor vs exact L2, and the
map-only encode plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import similarity as SIM

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet").cache()


def test_pq_codes_in_range_and_cover_all_vectors(emb):
    out = SIM.pq_encode(emb).collect()
    assert len(out) == emb.count()
    for r in out:
        for s in range(SIM.M_SUB):
            assert 0 <= r[f"code_{s}"] < SIM.KS_PQ


def test_pq_codes_partitioning_invariant(emb):
    a = {r["vec_id"]: tuple(r[f"code_{s}"] for s in range(SIM.M_SUB))
         for r in SIM.pq_encode(emb).collect()}
    b = {r["vec_id"]: tuple(r[f"code_{s}"] for s in range(SIM.M_SUB))
         for r in SIM.pq_encode(emb.repartition(7)).collect()}
    assert a == b


def test_pq_encode_is_map_only_on_corpus(emb):
    plan = SIM.pq_encode(emb)._jdf.queryExecution().executedPlan().toString()
    # the only allowed exchanges are the 16-row codebook collapse
    # (SinglePartition) and its broadcast — never a corpus repartitioning
    assert "Exchange hashpartitioning" not in plan, plan


def test_adc_topk_ranks_are_dense_and_bounded(emb):
    out = SIM.pq_ann_topk(emb, F.col("vec_id") < 3, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        ordered = sorted(rows, key=lambda r: r["rank"])
        dists = [r["adc_dist"] for r in ordered]
        assert dists == sorted(dists)
        assert all(r["c_id"] != q for r in rows)


def test_adc_recall_floor_vs_exact_l2(emb):
    """ADC over an untrained 16-centroid codebook is a weak quantizer;
    pin a conservative floor so a broken distance-table lookup (recall
    ~random = k/N ≈ 0.02) cannot pass."""
    k = 10
    adc_sets: dict[int, set[int]] = {}
    for r in SIM.pq_ann_topk(emb, F.col("vec_id") < 5, k=k).collect():
        adc_sets.setdefault(r["q_id"], set()).add(r["c_id"])
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    recalls = []
    for q in range(5):
        exact = {c for _, c in sorted(((np.sum((V[q] - V[c]) ** 2), c) for c in V if c != q))[:k]}
        recalls.append(len(exact & adc_sets[q]) / k)
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_rerank_recall_beats_pure_adc(emb):
    """The exact re-rank over an ADC shortlist of 50 must recover
    substantially more of the true top-10 than pure ADC top-10."""
    from pyspark.sql import functions as F

    k = 10
    sets: dict[int, set[int]] = {}
    for r in SIM.pq_ann_rerank(emb, F.col("vec_id") < 5, k=k, shortlist=50).collect():
        sets.setdefault(r["q_id"], set()).add(r["c_id"])
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    recalls = []
    for q in range(5):
        exact = {c for _, c in sorted(((np.sum((V[q] - V[c]) ** 2), c) for c in V if c != q))[:k]}
        recalls.append(len(exact & sets[q]) / k)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_rerank_distances_are_true_l2(emb):
    """l2_dist in the re-ranked output must equal the exact squared L2 of
    the raw vectors (the ADC approximation must not leak through)."""
    from pyspark.sql import functions as F

    out = SIM.pq_ann_rerank(emb, F.col("vec_id") < 2, k=5, shortlist=20).collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for r in out:
        want = float(np.sum((V[r["q_id"]] - V[r["c_id"]]) ** 2))
        assert abs(r["l2_dist"] - want) < 1e-9 * max(1.0, want)
