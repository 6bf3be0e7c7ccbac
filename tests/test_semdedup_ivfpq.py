"""SemDeDup and IVF-PQ: pruning-rule semantics vs a numpy reference,
partitioning invariance, probe discipline, and recall floors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import similarity as SIM

SF0001 = "/root/testdata/sf0.001"
TAU = 0.35


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def sem(emb):
    return SIM.semdedup(emb, k=8, iterations=2, threshold=TAU).collect()


def test_semdedup_one_verdict_per_vector(emb, sem):
    assert len(sem) == emb.count()
    assert len({r["vec_id"] for r in sem}) == len(sem)


def test_semdedup_verdict_shape(sem):
    for r in sem:
        if r["is_kept"]:
            assert r["n_dups"] == 0 and r["dup_of"] is None and r["max_dup_cosine"] is None
        else:
            assert r["n_dups"] >= 1
            assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
            assert r["max_dup_cosine"] >= TAU


def test_semdedup_dup_of_is_a_cluster_mate(sem):
    cluster = {r["vec_id"]: r["cluster_id"] for r in sem}
    for r in sem:
        if not r["is_kept"]:
            assert cluster[r["dup_of"]] == r["cluster_id"]


def test_semdedup_matches_numpy_pairwise_reference(emb, sem):
    """Trusting the (separately tested) k-means assignment, re-derive
    every pruning verdict from an exact numpy cosine within the
    operator's own clusters."""
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    by_cluster: dict[int, list[int]] = {}
    for r in sem:
        by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    verdicts = {r["vec_id"]: r for r in sem}
    for cid, ids in by_cluster.items():
        ids.sort()
        for i, a in enumerate(ids):
            sims = []
            for b in ids[:i]:
                c = float(
                    V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
                )
                if c >= TAU - 1e-9:
                    sims.append((b, c))
            r = verdicts[a]
            # tolerance band: pairs within 1e-9 of the threshold may
            # legitimately differ between fold orders
            if sims and max(c for _, c in sims) >= TAU + 1e-9:
                assert not r["is_kept"], (a, sims)
                assert r["dup_of"] == min(b for b, _ in sims)
            elif not sims:
                assert r["is_kept"], (a, r)


def test_semdedup_partitioning_invariant(emb, sem):
    again = SIM.semdedup(emb.repartition(7), k=8, iterations=2, threshold=TAU).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(again) == key(sem)


# ---- IVF-PQ ---------------------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq(emb):
    return SIM.ivfpq_topk(emb, F.col("vec_id") < 5, k=10, n_lists=8, n_probe=2).collect()


def test_ivfpq_ranks_dense_no_self(ivfpq):
    by_q: dict[int, list] = {}
    for r in ivfpq:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: r["rank"])
        dists = [r["adc_dist"] for r in ordered]
        assert dists == sorted(dists)
        assert all(r["c_id"] != q for r in rows)


def test_ivfpq_candidates_come_only_from_probed_lists(emb, ivfpq):
    """Probe discipline: every returned candidate's coarse list must be
    among its query's n_probe nearest lists (numpy re-derivation)."""
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    cents = {i: V[i] for i in range(8)}

    def cos_to_cents(v):
        return sorted(
            ((float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))), -cid) for cid, c in cents.items()),
            reverse=True,
        )

    assigned = {i: -cos_to_cents(v)[0][1] for i, v in V.items()}
    probed = {q: {-t[1] for t in cos_to_cents(V[q])[:2]} for q in range(5)}
    for r in ivfpq:
        assert assigned[r["c_id"]] in probed[r["q_id"]], r


def test_ivfpq_adc_agrees_with_full_pq_on_shared_pairs(emb, ivfpq):
    full = {
        (r["q_id"], r["c_id"]): r["adc_dist"]
        for r in SIM.pq_ann_topk(emb, F.col("vec_id") < 5, k=500).collect()
    }
    shared = 0
    for r in ivfpq:
        key = (r["q_id"], r["c_id"])
        if key in full:
            assert abs(full[key] - r["adc_dist"]) < 1e-12, key
            shared += 1
    assert shared > 0


def test_ivfpq_recall_floor_vs_exact_l2(emb, ivfpq):
    """IVF pruning (2 of 8 untrained lists) stacked on an untrained PQ
    codebook is a coarse filter; pin a floor well above random (k/N
    ≈ 0.02) so a broken probe join or ADC lookup cannot pass."""
    k = 10
    got: dict[int, set[int]] = {}
    for r in ivfpq:
        got.setdefault(r["q_id"], set()).add(r["c_id"])
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    recalls = []
    for q in range(5):
        exact = {c for _, c in sorted(((np.sum((V[q] - V[c]) ** 2), c) for c in V if c != q))[:k]}
        recalls.append(len(exact & got.get(q, set())) / k)
    assert sum(recalls) / len(recalls) >= 0.1, recalls


# ---- contrastive pair mining ---------------------------------------------


def test_contrastive_pairs_match_numpy(emb):
    out = {r["q_id"]: r for r in SIM.contrastive_pairs(emb, F.col("vec_id") < 20).collect()}
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    L = {r["vec_id"]: r["label"] for r in rows}
    assert set(out) == {i for i in V if i < 20}
    for q, r in out.items():
        assert r["label"] == L[q]
        sims = {
            c: float(V[q] @ V[c] / (np.linalg.norm(V[q]) * np.linalg.norm(V[c])))
            for c in V
            if c != q
        }
        pos = [(s, c) for c, s in sims.items() if L[c] == L[q]]
        neg = [(s, c) for c, s in sims.items() if L[c] != L[q]]
        if pos:
            best = max(pos, key=lambda t: (t[0], -t[1]))
            assert r["pos_id"] == best[1]
            assert abs(r["pos_cosine"] - best[0]) < 1e-9
            assert L[r["pos_id"]] == L[q]
        else:
            assert r["pos_id"] is None and r["pos_cosine"] is None
        assert neg, "fixture always has other labels"
        best = max(neg, key=lambda t: (t[0], -t[1]))
        assert r["neg_id"] == best[1]
        assert abs(r["neg_cosine"] - best[0]) < 1e-9
        assert L[r["neg_id"]] != L[q]


def test_contrastive_pairs_corpus_not_shuffled(emb):
    plan = (
        SIM.contrastive_pairs(emb, F.col("vec_id") < 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only hash exchange allowed is the per-anchor aggregate (q_id
    # grouping); the corpus side reaches it via partial aggregation, so
    # exactly one hashpartitioning exchange may appear
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_label_centroids_partitioning_invariant(emb):
    a = sorted(tuple(r) for r in SIM.label_centroids(emb).collect())
    b = sorted(tuple(r) for r in SIM.label_centroids(emb.repartition(7)).collect())
    assert a == b  # ordered-fold centroids: bit-identical across layouts
