"""Round-4 operators: URL canonicalization dedup, bigram LM scoring,
multi-window burn rate, full five-level cascade, and the delayed-metric
parity family (delayed locators / reroll diff / unit changes)."""

import math

from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.operators import rollup as R
from blueflood_spark.operators.dedup import canonical_url, url_dedup
from blueflood_spark.operators.text import bigram_lm_score


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_aliases_collapse(spark):
    aliases = [
        "https://foo.example.com/doc/3",
        "HTTPS://WWW.FOO.EXAMPLE.COM/doc/3",
        "http://foo.example.com/doc/3/",
        "foo.example.com/doc/3?utm_source=feed&utm_campaign=x",
        "https://foo.example.com/doc/3#section-2",
    ]
    got = set(_canon(spark, aliases))
    assert got == {"foo.example.com/doc/3"}, got


def test_canonical_url_preserves_content_params(spark):
    # a real query param is identity; only utm_* tracking is stripped
    keep, mixed = _canon(
        spark,
        [
            "https://foo.example.com/search?q=spark&page=2",
            "https://foo.example.com/search?utm_source=x&q=spark&page=2",
        ],
    )
    assert keep == "foo.example.com/search?q=spark&page=2"
    assert mixed == "foo.example.com/search?q=spark&page=2"


def test_canonical_url_idempotent(spark):
    urls = [
        "https://www.a.example.com/x/?utm_source=1#f",
        "HTTP://B.example.com//",
        "c.example.com/p?q=1",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_url_dedup_groups_and_keep(spark):
    rows = [
        (1, "https://a.example.com/p"),
        (2, "HTTP://WWW.A.EXAMPLE.COM/p/"),
        (3, "https://a.example.com/p#frag"),
        (4, "https://b.example.com/only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(docs).collect()
    assert len(out) == 1  # singleton b.example.com/only not emitted
    assert out[0]["canonical_url"] == "a.example.com/p"
    assert out[0]["n_docs"] == 3
    assert out[0]["keep_doc_id"] == 1


def test_bigram_lm_score_matches_reference_python(spark):
    corpus = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "colorless green ideas sleep furiously"),
        (3, "single"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    # reference implementation
    from collections import Counter

    c2, c1 = Counter(), Counter()
    grams_by_doc = {}
    for did, text in corpus:
        toks = text.split(" ")
        grams = list(zip(toks, toks[1:]))
        grams_by_doc[did] = grams
        for g in grams:
            c2[g] += 1
            c1[g[0]] += 1
    vocab = len({w2 for (_, w2) in c2})
    k = 0.5
    for did, grams in grams_by_doc.items():
        if not grams:
            assert did not in out  # single-token doc emits nothing
            continue
        expected = sum(math.log((c2[g] + k) / (c1[g[0]] + k * vocab)) for g in grams)
        assert out[did]["n_bigrams"] == len(grams)
        assert math.isclose(out[did]["sum_logp"], expected, rel_tol=1e-12)
    # the formulaic docs share mass; the rare-transition doc scores lower
    # per bigram than the repeated-pattern docs
    avg = lambda d: out[d]["sum_logp"] / out[d]["n_bigrams"]
    assert avg(2) < avg(0)


def test_burn_rate_requires_both_windows(spark):
    # construct directly: 5m spike inside a quiet hour -> no alert;
    # sustained bad hour -> alert
    H = 3_600_000
    rows = []
    # series A: one bad 5m window (5/5 bad), rest of hour good (55 samples)
    rows += [("t1", "a", i * 60_000, 200.0) for i in range(5)]  # bad
    rows += [("t1", "a", 300_000 + i * 60_000, 1.0) for i in range(55)]
    # series B: the whole hour bad
    rows += [("t1", "b", i * 60_000, 200.0) for i in range(60)]
    raw = spark.createDataFrame(
        rows, "tenant_id string, metric_name string, ts long, value double"
    )
    bad = F.when(F.col("value") > 114.0, 1).otherwise(0)
    flagged = raw.select("tenant_id", "metric_name", "ts", bad.alias("bad"))
    w5 = flagged.groupBy(
        "tenant_id", "metric_name", R.window_start(F.col("ts"), G.MIN_5).alias("window_start")
    ).agg(F.count("*").alias("n5"), F.sum("bad").alias("bad5"))
    w60 = flagged.groupBy(
        "tenant_id", "metric_name", R.window_start(F.col("ts"), G.MIN_60).alias("w60")
    ).agg(F.count("*").alias("n60"), F.sum("bad").alias("bad60"))
    joined = w5.withColumn("w60", R.window_start(F.col("window_start"), G.MIN_60)).join(
        w60, ["tenant_id", "metric_name", "w60"]
    )
    burn5 = F.col("bad5").cast("double") / F.col("n5")
    burn60 = F.col("bad60").cast("double") / F.col("n60")
    out = joined.select(
        "metric_name", "window_start", ((burn5 > 0.2) & (burn60 > 0.15)).alias("alerting")
    ).collect()
    a_alerts = [r["alerting"] for r in out if r["metric_name"] == "a"]
    b_alerts = [r["alerting"] for r in out if r["metric_name"] == "b"]
    assert not any(a_alerts)  # spike suppressed by the long window
    assert all(b_alerts)  # sustained burn fires in every 5m window


def test_cascade_1440m_single_exchange(spark):
    rows = [
        ("t1", "m1", i * 600_000, float(i % 7)) for i in range(288 * 3)
    ]  # 2 days at 10min
    raw = spark.createDataFrame(
        rows, "tenant_id string, metric_name string, ts long, value double"
    )
    levels = R.cascade(
        raw, grans=(G.MIN_5, G.MIN_20, G.MIN_60, G.MIN_240, G.MIN_1440)
    )
    day = levels["1440m"]
    plan = day._jdf.queryExecution().executedPlan().toString()
    import re

    n_exchanges = len(re.findall(r"Exchange (?:hash|range|SinglePartition|RoundRobin)", plan))
    assert n_exchanges == 1, plan  # the whole 5-level ladder shuffles once
    got = {r["window_start"]: r for r in day.collect()}
    # exact day totals
    import collections

    expect = collections.defaultdict(lambda: [0, 0.0])
    for _, _, ts, v in rows:
        d = ts // 86_400_000 * 86_400_000
        expect[d][0] += 1
        expect[d][1] += v
    assert set(got) == set(expect)
    for d, (n, s) in expect.items():
        assert got[d]["num_points"] == n
        assert math.isclose(got[d]["sum"], s, rel_tol=1e-12)


def test_embedding_outliers_rank_semantics(spark):
    # one tight cluster + one obvious outlier far away, k=1 so assignment
    # is trivial and the decile cutoff is pure rank arithmetic
    import __spark_entry__  # noqa: F401  (ensures package import path)
    from blueflood_spark.operators.similarity import kmeans_assign
    from pyspark.sql.window import Window

    rows = [(i, [float(i % 3) * 0.01] * 4) for i in range(19)]
    rows.append((99, [50.0] * 4))  # the far point
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assign = kmeans_assign(emb, k=1, iterations=1)
    w = Window.partitionBy("cluster_id").orderBy("sq_dist", "vec_id")
    n = Window.partitionBy("cluster_id")
    ranked = assign.withColumn("r", F.row_number().over(w)).withColumn(
        "nc", F.count("*").over(n)
    )
    out = {
        r["vec_id"]: r["out"]
        for r in ranked.select(
            "vec_id",
            (F.col("r") > F.greatest(F.floor(F.col("nc") * 0.9), F.lit(1))).alias("out"),
        ).collect()
    }
    assert out[99] is True  # the far point is flagged
    assert sum(out.values()) == 2  # 20 points -> ranks 19,20 flagged (top decile)


def test_glob_aggregate_selects_and_sums(spark):
    from blueflood_spark.functions.glob import anchored, glob_to_regex

    rx = anchored(glob_to_regex("events.*.value"))
    rows = [
        ("t1", "events.click.value", 0, 1.0),
        ("t1", "events.view.value", 0, 2.0),
        ("t1", "events.click.count", 0, 100.0),  # glob excludes .count
        ("t2", "events.click.value", 0, 100.0),  # other tenant excluded
    ]
    raw = spark.createDataFrame(
        rows, "tenant_id string, metric_name string, ts long, value double"
    )
    sel = raw.filter((F.col("tenant_id") == "t1") & F.col("metric_name").rlike(rx))
    got = sel.groupBy("tenant_id").agg(
        F.countDistinct("metric_name").alias("n_series"), F.sum("value").alias("s")
    ).collect()[0]
    assert got["n_series"] == 2 and got["s"] == 3.0


def test_kmeans_survives_empty_cluster(spark):
    # duplicate seed vectors: cid 0 wins every tie, cluster 1 loses all
    # members after the first assignment — labels must stay correct
    from blueflood_spark.operators.similarity import kmeans_assign

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),  # seed of cluster 1, identical to seed 0
        (2, [0.1, 0.0]),
        (3, [10.0, 10.0]),
        (4, [10.1, 10.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(emb, k=2, iterations=2).collect()}
    # all points collapse into the surviving cluster 0; crucially NO
    # vector may carry a position-shifted wrong id
    assert set(out.values()) == {0}


def test_cms_overestimates_and_merges(spark):
    from blueflood_spark.operators import sketches as SK

    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "tok string")
    est = SK.cms_estimates(df, "tok", depth=4, width=32).collect()
    assert all(r["est_n"] >= r["true_n"] for r in est)  # CMS never undercounts
    hot = [r for r in est if r["tok"] == "hot"][0]
    assert hot["est_n"] >= 500
    # MERGEABILITY: sketch(A ∪ B) == cellwise sum of sketch(A), sketch(B)
    a = spark.createDataFrame(rows[:1000], "tok string")
    b = spark.createDataFrame(rows[1000:], "tok string")
    whole = {(r["j"], r["b"]): r["cell"] for r in SK.count_min_sketch(df, "tok", width=32).collect()}
    sa = {(r["j"], r["b"]): r["cell"] for r in SK.count_min_sketch(a, "tok", width=32).collect()}
    sb = {(r["j"], r["b"]): r["cell"] for r in SK.count_min_sketch(b, "tok", width=32).collect()}
    merged = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert merged == whole


def test_hll_registers_merge_and_estimate_bound(spark):
    from blueflood_spark.operators import sketches as SK

    rows = [(1, i) for i in range(3000)]
    df = spark.createDataFrame(rows, "g int, v long")
    # MERGEABILITY: registers(A ∪ B) == elementwise max
    a, b = df.filter("v < 1500"), df.filter("v >= 1500")
    whole = {r["reg"]: r["max_rho"] for r in SK.hll_registers(df, "v", ["g"]).collect()}
    ra = {r["reg"]: r["max_rho"] for r in SK.hll_registers(a, "v", ["g"]).collect()}
    rb = {r["reg"]: r["max_rho"] for r in SK.hll_registers(b, "v", ["g"]).collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == whole
    # estimate within the ~3σ HLL error envelope (σ ≈ 1.04/√m, m=256)
    est = SK.hll_estimate(df, "v", ["g"], p=8).collect()[0]
    assert est["true_distinct"] == 3000
    rel = abs(est["est_distinct"] - 3000) / 3000
    assert rel < 3 * 1.04 / (256 ** 0.5), rel


def test_boilerplate_strip_removes_shared_chunks(spark):
    from blueflood_spark.operators.text import boilerplate_strip

    # width=2 chunks; "nav bar" opens docs 1 and 2 (shared → boilerplate);
    # every other chunk is unique. doc 3 is entirely boilerplate-free.
    docs = spark.createDataFrame(
        [
            (1, "nav bar alpha beta gamma delta"),
            (2, "nav bar epsilon zeta"),
            (3, "eta theta iota"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_strip(docs, width=2, min_docs=2).collect()
    }
    assert out[1]["n_chunks"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["cleaned_chars"] == len("alpha beta gamma delta")
    assert out[2]["n_chunks"] == 2 and out[2]["n_removed"] == 1
    assert out[3]["n_chunks"] == 2 and out[3]["n_removed"] == 0
    # reassembly preserves original order (md5 over the exact string)
    import hashlib

    assert (
        out[1]["cleaned_md5"]
        == hashlib.md5(b"alpha beta gamma delta").hexdigest()
    )


def test_boilerplate_strip_fully_boilerplate_doc(spark):
    from blueflood_spark.operators.text import boilerplate_strip

    import hashlib

    docs = spark.createDataFrame(
        [(1, "same same"), (2, "same same")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in boilerplate_strip(docs, width=2, min_docs=2).collect()}
    for d in (1, 2):
        assert rows[d]["n_removed"] == rows[d]["n_chunks"] == 1
        assert rows[d]["cleaned_chars"] == 0
        assert rows[d]["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_random_projection_matches_numpy(spark):
    import numpy as np

    from blueflood_spark.operators.similarity import random_projection, rp_signs

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in random_projection(df, out_dims=8).collect()}
    R = np.array(rp_signs(8), dtype=np.float64)  # (8, 64)
    expected = (vecs.astype(np.float64) @ R.T) * math.sqrt(3.0 / 8)
    for i in range(40):
        got = np.array([out[i][f"p{j}"] for j in range(8)])
        assert np.allclose(got, expected[i], rtol=1e-9), i


def test_random_projection_preserves_distances(spark):
    # JL sanity: with d'=16 the *average* pairwise sq-distance ratio is
    # near 1 (individual pairs vary); catches sign/scale errors without
    # flaking on the concentration bound.
    import numpy as np

    from blueflood_spark.operators.similarity import random_projection

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in random_projection(df, out_dims=16).collect()}
    proj = np.array([[rows[i][f"p{j}"] for j in range(16)] for i in range(30)])
    full = vecs.astype(np.float64)
    ratios = []
    for a in range(0, 30, 3):
        for b in range(a + 1, 30, 7):
            d_full = float(((full[a] - full[b]) ** 2).sum())
            d_proj = float(((proj[a] - proj[b]) ** 2).sum())
            ratios.append(d_proj / d_full)
    m = sum(ratios) / len(ratios)
    assert 0.7 < m < 1.3, m


def test_rp_signs_sparse_and_balanced():
    from blueflood_spark.operators.similarity import rp_signs

    flat = [s for row in rp_signs(16, dims=64) for s in row]
    n = len(flat)
    nz = sum(1 for s in flat if s != 0)
    pos = sum(1 for s in flat if s > 0)
    neg = sum(1 for s in flat if s < 0)
    # expectation: 1/3 nonzero, split evenly (loose binomial bounds)
    assert 0.25 * n < nz < 0.42 * n, nz / n
    assert 0.35 * nz < pos < 0.65 * nz, (pos, neg)


def test_morton_matches_python_reference(spark):
    from blueflood_spark.operators.layout import with_zorder_key

    def py_morton(x, y, bits=8):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    pts = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 2, 9, 128, 255)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = with_zorder_key(df, "x", "y", bits=8).collect()
    for r in rows:
        assert r["z"] == py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_write_bounds_both_dims(spark, tmp_path):
    # z-ordered files must cover small (x, y) rectangles; a y-sorted
    # layout bounds y only. Compare the total bounding-box area across
    # files — the quantity footer-stat skipping actually depends on.
    from blueflood_spark.operators.layout import write_zordered

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "ysort")
    write_zordered(df, zpath, "x", "y", bits=6, n_files=16)
    df.repartitionByRange(16, F.col("y")).sortWithinPartitions("y").write.parquet(spath)

    def files_touched(path):
        """Avg #files whose min/max box admits a point predicate on x
        alone, and on y alone — the footer-stat skipping cost."""
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()
        )
        assert len(per_file) >= 8
        tx = sum(
            sum(1 for r in per_file if r["min(x)"] <= c <= r["max(x)"])
            for c in range(64)
        ) / 64
        ty = sum(
            sum(1 for r in per_file if r["min(y)"] <= c <= r["max(y)"])
            for c in range(64)
        ) / 64
        return tx, ty

    zx, zy = files_touched(zpath)
    yx, yy = files_touched(spath)
    # y-sorted: an x predicate admits EVERY file (~16); y predicates are
    # tight (~1). z-order: BOTH dimensions prune to ~sqrt(files).
    assert yx > 12, yx
    assert zx < yx / 2, (zx, yx)
    assert zy < 8, (zy, yy)


def test_sampled_quantile_deterministic_and_close(spark):
    from blueflood_spark.operators.sketches import sampled_quantile

    n = 4000
    df = spark.createDataFrame(
        [("t0", "m", i, float(i % 1000)) for i in range(n)],
        "tenant_id string, metric_name string, ts long, value double",
    )
    r1 = sampled_quantile(df, p=0.9, rate=0.25).collect()[0]
    r2 = sampled_quantile(df, p=0.9, rate=0.25).collect()[0]
    assert r1 == r2  # pure function of the data — no RNG state anywhere
    assert r1["n"] == n
    # Bernoulli(0.25): ~1000 ± 5σ
    assert abs(r1["n_sampled"] - 1000) < 5 * (n * 0.25 * 0.75) ** 0.5
    # relative rank error O(1/sqrt(rate n)) → value error small on uniform
    assert abs(r1["est_q"] - r1["exact_q"]) < 25.0, (r1["est_q"], r1["exact_q"])


def test_duplicate_spans_merges_overlaps_and_crosses_chunk_boundaries(spark):
    from blueflood_spark.operators.dedup import duplicate_spans

    # w0..w19 unique filler; docs 1 and 2 share tokens 4..11 of doc 1
    # (an 8-token run) placed at a DIFFERENT offset in doc 2, so fixed
    # 8-token tiling (chunk_dedup) would never align on it. k=4 grams
    # at positions 4..8 of doc 1 all hit → one maximal span [4, 11].
    shared = "s0 s1 s2 s3 s4 s5 s6 s7"
    d1 = "a0 a1 a2 a3 " + shared + " a4 a5 a6"
    d2 = "b0 b1 b2 b3 b4 b5 b6 " + shared + " b7"
    d3 = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"  # no duplication
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = duplicate_spans(docs, k=4, min_docs=2)
    rows = {(r.doc_id, r.span_start, r.span_tokens) for r in out.collect()}
    assert rows == {(1, 4, 8), (2, 7, 8)}, rows


def test_duplicate_spans_distinct_islands_stay_separate(spark):
    from blueflood_spark.operators.dedup import duplicate_spans

    # two shared runs in the same doc separated by >k unique tokens →
    # two islands, not one merged span
    run1, run2 = "x0 x1 x2 x3", "y0 y1 y2 y3"
    d1 = run1 + " f0 f1 f2 f3 f4 f5 " + run2
    d2 = run1 + " g0 g1 g2 g3 g4 g5 " + run2
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    out = duplicate_spans(docs, k=4, min_docs=2)
    rows = sorted(
        (r.doc_id, r.span_start, r.span_tokens) for r in out.collect()
    )
    assert rows == [(1, 0, 4), (1, 10, 4), (2, 0, 4), (2, 10, 4)], rows


def test_duplicate_spans_within_doc_repeat_not_counted_without_second_doc(spark):
    from blueflood_spark.operators.dedup import duplicate_spans

    # the same 4-gram twice inside ONE doc: min_docs=2 counts DISTINCT
    # docs, so no span is emitted (cross-doc semantics, like chunk_dedup)
    d1 = "r0 r1 r2 r3 m0 m1 m2 r0 r1 r2 r3"
    docs = spark.createDataFrame([(1, d1)], "doc_id long, text string")
    assert duplicate_spans(docs, k=4, min_docs=2).count() == 0
