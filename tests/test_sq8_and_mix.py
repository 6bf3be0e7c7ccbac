"""New round-3 LLM-pipeline operators: int8 scalar quantization and
token-budget domain mixture."""

import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import similarity as SIM
from blueflood_spark.operators import text as TX


def test_sq8_roundtrip_error_bound(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 127.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, no div-by-zero
        (2, [-3.5, 2.0, 0.001, -0.002]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in SIM.sq8_quantize(emb).collect()}
    # half-up rounding bound: |x - code*scale| <= scale/2 (plus clamp at ±127)
    for vid, vec in rows:
        r = out[vid]
        assert len(r["codes"]) == len(vec)
        assert all(-127 <= c <= 127 for c in r["codes"])
        if r["scale"] > 0:
            assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
            assert r["mse"] <= (r["scale"] / 2) ** 2 + 1e-12
        else:
            assert r["codes"] == [0] * len(vec)
            assert r["mse"] == 0.0 and r["max_abs_err"] == 0.0
    # the max-magnitude element always quantizes to ±127 exactly
    assert out[0]["codes"][3] == 127
    assert out[2]["codes"][0] == -127


def test_sq8_deterministic(spark):
    import random

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(str, SIM.sq8_quantize(emb).collect()))
    b = sorted(map(str, SIM.sq8_quantize(emb).collect()))
    assert a == b


def _mix_docs(spark):
    rows = []
    for i in range(60):
        src = f"s{i % 3}"
        text = " ".join(f"w{j}" for j in range(5 + i % 7))
        rows.append((i, text, src))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_token_budget_mix_semantics(spark):
    docs = _mix_docs(spark)
    out = TX.token_budget_mix(docs, {"s0": 50, "s1": 20}, default_budget=35).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(out) == 60  # report covers every doc; `keep` is the verdict
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["cum_tokens"])
        budget = {"s0": 50, "s1": 20}.get(src, 35)
        run = 0
        for r in rs:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run  # contiguous running sum in order
            assert r["keep"] == (run <= budget)
            assert r["token_budget"] == budget


def test_token_budget_mix_monotone_under_budget_raise(spark):
    docs = _mix_docs(spark)
    small = {r["doc_id"] for r in TX.token_budget_mix(docs, {}, 30).collect() if r["keep"]}
    big = {r["doc_id"] for r in TX.token_budget_mix(docs, {}, 60).collect() if r["keep"]}
    assert small <= big  # raising the budget only appends


def test_bm25_ranking_semantics(spark):
    rows = [
        (0, "spark spark spark other words here pad pad pad pad"),
        (1, "spark other words here pad pad pad pad pad pad"),
        (2, "nothing relevant at all in this one pad pad pad"),
        (3, "vector vector spark pad pad pad pad pad pad pad"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.bm25_topk(docs, ["spark", "vector"], k=10).collect()}
    assert 2 not in out  # no query term → no row
    # doc 3 matches two terms incl. the rarer 'vector' → highest score
    assert out[3]["rank"] == 1
    # more 'spark' occurrences outrank fewer at equal length
    assert out[0]["score"] > out[1]["score"]
    ranks = sorted(r["rank"] for r in out.values())
    assert ranks == list(range(1, len(out) + 1))


def test_bm25_rejects_bad_terms(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TX.bm25_topk(docs, ["ok", "bad'term"])


def test_label_centroids_geometry(spark):
    # two tight opposite clusters + one orthogonal: cosines are known
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], 0))
        rows.append((100 + i, [-1.0, 0.0, 0.0, 0.0], 1))
        rows.append((200 + i, [0.0, 1.0, 0.0, 0.0], 2))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r["label_a"], r["label_b"]): r for r in SIM.label_centroids(emb, dims=4).collect()}
    assert out[(0, 1)]["centroid_cosine"] == pytest.approx(-1.0)
    assert out[(0, 2)]["centroid_cosine"] == pytest.approx(0.0, abs=1e-12)
    assert out[(1, 2)]["centroid_cosine"] == pytest.approx(0.0, abs=1e-12)
    assert out[(0, 1)]["n_a"] == 10 and out[(0, 1)]["n_b"] == 10


def test_bm25_differential_vs_pure_python(spark):
    """Randomized differential: the DataFrame BM25 must match an
    independently-written pure-Python scorer on random corpora."""
    import math
    import random

    rng = random.Random(77)
    vocab = [f"t{i}" for i in range(12)]
    corpus = {
        i: [rng.choice(vocab) for _ in range(rng.randrange(4, 30))] for i in range(40)
    }
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in corpus.items()], "doc_id long, text string"
    )
    terms = ["t1", "t3", "t7"]
    k1, b = 1.2, 0.75

    n = len(corpus)
    avgdl = sum(len(ws) for ws in corpus.values()) / n
    df = {t: sum(1 for ws in corpus.values() if t in ws) for t in terms}
    expected = {}
    for i, ws in corpus.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            expected[i] = s
    top_expected = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = TX.bm25_topk(docs, terms, k=10, k1=k1, b=b).collect()
    got_sorted = sorted(got, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got_sorted] == [i for i, _ in top_expected]
    for r, (_, s) in zip(got_sorted, top_expected):
        assert r["score"] == pytest.approx(s, rel=1e-12)


def test_sq8_ann_topk_semantics(spark):
    from pyspark.sql import functions as F

    from blueflood_spark.operators.similarity import sq8_ann_topk

    import __spark_entry__ as E

    emb = E._t(spark, "/root/testdata/sf0.001", "embeddings")
    out = sq8_ann_topk(emb, F.col("vec_id") < 3, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        # scores non-increasing in rank
        scores = [r["score_micro"] for r in rows]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(r["c_id"] != q for r in rows)


def test_sq8_ann_agrees_with_float_ordering_on_separated_data(spark):
    # vectors engineered so quantization noise cannot flip the ordering:
    # the int8 estimate must pick the same top-1 as exact float cosine
    from pyspark.sql import functions as F

    from blueflood_spark.operators.similarity import sq8_ann_topk

    rows = [
        (0, [1.0] * 8 + [0.0] * 8, 0),   # query
        (1, [1.0] * 8 + [0.0] * 8, 0),   # identical -> top-1
        (2, [0.5] * 8 + [0.5] * 8, 0),   # half aligned
        (3, [0.0] * 8 + [1.0] * 8, 0),   # orthogonal
        (4, [-1.0] * 8 + [0.0] * 8, 0),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = sorted(
        sq8_ann_topk(emb, F.col("vec_id") == 0, k=4).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["c_id"] for r in out] == [1, 2, 3, 4]
    assert out[0]["int_dot"] == 127 * 127 * 8
