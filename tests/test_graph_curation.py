"""Round-4b additions: graph centrality and curation scoring operators."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _py_pagerank(edges, node_ids, n_iter, scale=1_000_000_000):
    """Independent pure-Python fixed-point reference."""
    base = scale * 3 // 20
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    rank = {n: scale for n in node_ids}
    for _ in range(n_iter):
        s = {n: 0 for n in node_ids}
        for src, dsts in out.items():
            c = rank[src] // len(dsts)
            for d in dsts:
                s[d] += c
        rank = {n: base + s[n] * 17 // 20 for n in node_ids}
    return rank


def test_pagerank_matches_python_reference(spark):
    from blueflood_spark.operators.graph import pagerank

    # path graph 0-1-2 (symmetrized) plus isolated node 3
    pairs = [(0, 1), (1, 2)]
    edges_list = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    for n_iter in (1, 3):
        got = {
            r.id: r.rank
            for r in pagerank(edges, nodes, n_iter=n_iter).collect()
        }
        assert got == _py_pagerank(edges_list, range(4), n_iter), n_iter


def test_pagerank_rejects_zero_iterations(spark):
    """n_iter=0 is the one input where the edge-touched loop and the
    old full-universe loop disagree (closed-form base vs initial scale
    for isolated nodes) — rejected rather than silently redefined."""
    import pytest

    from blueflood_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,)], "id long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edges, nodes, n_iter=0)


def test_pagerank_rehomes_to_explicit_caller(spark):
    """Inputs pre-rebound into the loop clone (the llm_dup_pagerank
    pattern): with caller=spark the result must plan in the CALLER's
    session, not stay pinned to the AQE-off clone (r9 ADVICE)."""
    from blueflood_spark.operators.graph import pagerank
    from blueflood_spark.session import loop_session, rebind

    child = loop_session(spark)
    pairs = [(0, 1), (1, 2)]
    edges_list = pairs + [(b, a) for a, b in pairs]
    edges = rebind(
        spark.createDataFrame(edges_list, "src long, dst long"), child
    )
    nodes = rebind(spark.createDataFrame([(i,) for i in range(4)], "id long"), child)
    out = pagerank(edges, nodes, n_iter=3, caller=spark)
    assert out.sparkSession is spark
    got = {r.id: r.rank for r in out.collect()}
    assert got == _py_pagerank(edges_list, range(4), 3)


def test_pagerank_hub_outranks_leaves(spark):
    from blueflood_spark.operators.graph import pagerank

    # star: hub 0 connected to 1..4 — hub must outrank every leaf,
    # leaves must tie exactly (fixed-point arithmetic is symmetric)
    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = {r.id: r.rank for r in pagerank(edges, nodes, n_iter=5).collect()}
    assert got[0] > got[1]
    assert len({got[i] for i in range(1, 5)}) == 1


def test_pagerank_sql_twin_bit_identical(spark):
    from blueflood_spark.operators.graph import pagerank, pagerank_sql

    # deterministic pseudo-random graph, 30 nodes / 60 undirected pairs
    pairs = [((i * 7 + 3) % 30, (i * i + 5 * i) % 30) for i in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(30)], "id long")
    got = {r.id: r.rank for r in pagerank(edges, nodes, n_iter=4).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in pairs)
        + ") t(doc_a, doc_b)"
    )
    sql = pagerank_sql(
        "SELECT doc_a, doc_b FROM p",
        "SELECT UNNEST(range(0, 30)) AS doc_id",
        n_iter=4,
    )
    want = dict(con.execute(sql).fetchall())
    assert got == want


def _brute_lev_pairs(words, k):
    def lev(a, b):
        if abs(len(a) - len(b)) > k:
            return k + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    import itertools

    return {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(set(words)), 2)
        if lev(a, b) <= k
    }


def test_fuzzy_word_pairs_complete_vs_bruteforce(spark):
    from blueflood_spark.operators.text import fuzzy_word_pairs

    # substitutions, insertions, deletions, transposition (=2 ops),
    # and far-apart words; one doc carries the whole vocabulary
    words = [
        "spark", "spar", "sparc", "stark", "sparky", "shark",
        "table", "cable", "tables", "tbale", "merge", "purge",
        "filter", "filler", "fitter", "window", "widow", "xylophone",
    ]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = {
        (r.w1, r.w2, r.dist)
        for r in fuzzy_word_pairs(docs, max_dist=2, min_len=3).collect()
    }
    assert got == _brute_lev_pairs(words, 2)


def test_fuzzy_word_pairs_dist1_only(spark):
    from blueflood_spark.operators.text import fuzzy_word_pairs

    words = ["spark", "stark", "sharp", "spork", "sparks"]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = {
        (r.w1, r.w2, r.dist)
        for r in fuzzy_word_pairs(docs, max_dist=1, min_len=3).collect()
    }
    assert got == _brute_lev_pairs(words, 1)


def test_ngram_novelty_first_doc_wins_and_short_docs_kept(spark):
    from blueflood_spark.operators.text import ngram_novelty

    # doc 1: 5 tokens → 2 distinct 4-grams, both first-seen here.
    # doc 2: copies doc 1's first 4-gram inside otherwise-new text →
    #        3 grams, 2 novel. doc 3: too short → 0 grams, kept.
    d1 = "a b c d e"
    d2 = "a b c d x y"          # grams: abcd (seen), bcdx, cdxy
    d3 = "q r"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_pct)
        for r in ngram_novelty(docs, n=4).collect()
    }
    assert rows[1] == (2, 2, 1.0)
    assert rows[2] == (3, 2, 2 / 3)
    assert rows[3] == (0, 0, 0.0)


def test_ngram_novelty_distinct_grains_not_occurrences(spark):
    from blueflood_spark.operators.text import ngram_novelty

    # the same 4-gram repeated inside one doc counts ONCE (distinct grain)
    docs = spark.createDataFrame(
        [(1, "a b c d a b c d")], "doc_id long, text string"
    )
    r = ngram_novelty(docs, n=4).collect()[0]
    # grams at pos 0..4: abcd, bcda, cdab, dabc, abcd → 4 distinct
    assert (r.n_grams, r.n_novel, r.novelty_pct) == (4, 4, 1.0)


def test_silhouette_separated_blobs_score_high(spark):
    from blueflood_spark.operators.similarity import silhouette

    # two tight blobs far apart in 4-d; k=2 seeds are ids 0 and 1 which
    # land in different blobs (id 0 in blob A, id 1 in blob B)
    blob_a = [[0.0, 0.0, 0.0, float(i) / 100] for i in range(5)]
    blob_b = [[10.0, 10.0, 10.0, float(i) / 100] for i in range(5)]
    rows = []
    for i in range(5):
        rows.append((2 * i, blob_a[i]))      # even ids: blob A
        rows.append((2 * i + 1, blob_b[i]))  # odd ids: blob B
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = silhouette(emb, k=2, iterations=2).collect()
    assert len(out) == 10
    clusters = {r.vec_id % 2: r.cluster_id for r in out}
    assert clusters[0] != clusters[1]  # blobs get distinct clusters
    for r in out:
        assert r.silhouette > 0.9, (r.vec_id, r.silhouette)
        assert r.next_dist > r.own_dist


def test_silhouette_single_cluster_scores_zero(spark):
    from blueflood_spark.operators.similarity import silhouette

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = silhouette(emb, k=1, iterations=1).collect()
    assert all(r.silhouette == 0.0 and r.next_dist == 0.0 for r in out)


def test_char_entropy_known_values(spark):
    import math

    from blueflood_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in char_entropy(docs).collect()}
    # uniform single char: H = 0; two chars 50/50: H = 1; four: H = 2
    assert rows[1].entropy_micro == 0 and rows[1].n_distinct_chars == 1
    assert rows[2].entropy_micro == 1_000_000
    assert rows[3].entropy_micro == 2_000_000
    # a skewed case against the float formula
    txt = "aab"
    h = -sum(
        (c / 3) * math.log2(c / 3) for c in (2, 1)
    )
    got = char_entropy(
        spark.createDataFrame([(9, txt)], "doc_id long, text string")
    ).collect()[0]
    assert got.entropy_micro == math.floor(h * 1e6) or abs(
        got.entropy_micro - math.floor(h * 1e6)
    ) <= 1
    assert got.n_chars_total == 3


def test_compaction_sequential_fill_semantics(spark):
    from blueflood_spark.operators.layout import compaction_manifest, compaction_plan

    # partition p: files of 60, 60, 60, 100, 40 bytes in key order with
    # target 100 → cum_before 0,60,120,180,280 → bins 0,0,1,1,2
    rows = [("p", i, b) for i, b in enumerate([60, 60, 60, 100, 40])]
    rows += [("q", 0, 250), ("q", 1, 10)]  # oversize file alone: bins 0, 2
    files = spark.createDataFrame(rows, "part string, key long, n_bytes long")
    plan = {
        (r.part, r.key): r.bin_idx
        for r in compaction_plan(files, "part", "key", "n_bytes", 100).collect()
    }
    assert plan == {
        ("p", 0): 0, ("p", 1): 0, ("p", 2): 1, ("p", 3): 1, ("p", 4): 2,
        ("q", 0): 0, ("q", 1): 2,
    }
    man = {
        (r.part, r.bin_idx): (r.n_files, r.total_bytes, r.first_key, r.last_key)
        for r in compaction_manifest(files, "part", "key", "n_bytes", 100).collect()
    }
    assert man[("p", 0)] == (2, 120, 0, 1)
    assert man[("p", 1)] == (2, 160, 2, 3)
    assert man[("q", 2)] == (1, 10, 1, 1)


def test_ivf_prefilter_fills_k_where_postfilter_cannot(spark):
    from pyspark.sql import functions as F

    from blueflood_spark.operators.similarity import ivf_topk

    # 20 vectors on a ring; labels alternate. With cand_filter on even
    # labels, pre-filter semantics still yield candidates for the query,
    # and every returned candidate satisfies the predicate.
    import math

    rows = [
        (i, [math.cos(i / 3.0), math.sin(i / 3.0), 1.0, 0.5], i % 2)
        for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = ivf_topk(
        emb,
        F.col("vec_id") == 7,
        k=5,
        n_lists=4,
        n_probe=4,  # probe everything: isolates the filter semantics
        cand_filter=F.col("label") % 2 == 0,
    ).collect()
    assert len(out) == 5
    assert all(r.c_id % 2 == 0 for r in out)          # predicate holds
    unfiltered = ivf_topk(emb, F.col("vec_id") == 7, k=5, n_lists=4, n_probe=4).collect()
    # post-filtering the unfiltered top-5 would keep fewer than 5
    assert sum(1 for r in unfiltered if r.c_id % 2 == 0) < 5


def test_pagerank_mass_and_base_bounds(spark):
    """Invariants: every rank ≥ teleport base; total rank ≤ total input
    mass (integer floors only ever LOSE mass, never create it)."""
    from blueflood_spark.operators.graph import pagerank

    pairs = [(i, (i * 13 + 1) % 12) for i in range(24)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    ranks = [r.rank for r in pagerank(edges, nodes, n_iter=6).collect()]
    base = 1_000_000_000 * 3 // 20
    assert len(ranks) == 12
    assert all(r >= base for r in ranks)
    assert sum(ranks) <= 12 * 1_000_000_000


def test_fuzzy_pairs_vocab_is_deduped_across_docs(spark):
    from blueflood_spark.operators.text import fuzzy_word_pairs

    # the same word in many docs must not produce self-pairs or dups
    docs = spark.createDataFrame(
        [(i, "merge marge") for i in range(5)], "doc_id long, text string"
    )
    out = fuzzy_word_pairs(docs, max_dist=1, min_len=3).collect()
    assert [(r.w1, r.w2, r.dist) for r in out] == [("marge", "merge", 1)]


def test_type_lift_exact_counts(spark):
    from blueflood_spark.operators.events import type_cooccurrence_lift

    # users: 1 {a,b}, 2 {a,b}, 3 {a}, 4 {b,c} → n_users=4
    rows = [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (4, "b"), (4, "c")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {(r.et_a, r.et_b): r for r in type_cooccurrence_lift(ev).collect()}
    ab = out[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_ab, ab.n_users) == (3, 3, 2, 4)
    assert ab.lift == (2 * 4) / (3 * 3)
    bc = out[("b", "c")]
    assert (bc.n_ab, bc.lift) == (1, (1 * 4) / (3 * 1))
    assert ("a", "c") not in out  # never co-occur


def test_unit_history_scd2_intervals(spark):
    import __spark_entry__ as E

    out = E.bf_unit_history(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_loc = {}
    for r in rows:
        by_loc.setdefault((r.tenant_id, r.metric_name), []).append(r)
    for loc, rs in by_loc.items():
        rs.sort(key=lambda r: r.valid_from_ms)
        # intervals chain: valid_to of run i == valid_from of run i+1;
        # only the last run is open-ended
        for i, r in enumerate(rs):
            if i + 1 < len(rs):
                assert r.valid_to_ms == rs[i + 1].valid_from_ms, loc
                assert rs[i].unit != rs[i + 1].unit, loc  # real changes
            else:
                assert r.valid_to_ms is None


def test_embedding_drift_zero_and_known_shift(spark):
    from blueflood_spark.operators.similarity import embedding_drift

    # label 0: both halves identical → drift 0. label 1: odd half
    # shifted by (3, 4) → drift 5 exactly.
    rows = []
    for i in range(4):
        rows.append((2 * i, [1.0, 2.0], 0))
        rows.append((2 * i + 1, [1.0, 2.0], 0))
        rows.append((100 + 2 * i, [0.0, 0.0], 1))
        rows.append((101 + 2 * i, [3.0, 4.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in embedding_drift(emb).collect()}
    assert out[0].drift_l2 == 0.0 and out[0].n_old == out[0].n_new == 4
    assert out[1].drift_l2 == 5.0


def test_last_touch_attribution_semantics(spark):
    from blueflood_spark.operators.events import last_touch_attribution

    # user 1: view@10, click@20, purchase@25 → click attributed, wait 5
    #         purchase@100 with window 50 → click@20 too old → NULL
    # user 2: purchase@5 with no prior touch → NULL
    # user 3: purchase@30 right after another purchase@20 and a view@10
    #         → purchases never attribute to purchases → view, wait 20
    rows = [
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 25, "purchase"),
        (4, 1, 100, "purchase"),
        (5, 2, 5, "purchase"),
        (6, 3, 10, "view"), (7, 3, 20, "purchase"), (8, 3, 30, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ms long, event_type string"
    )
    out = {
        r.event_id: (r.attributed_type, r.wait_ms)
        for r in last_touch_attribution(ev, "purchase", within_ms=50).collect()
    }
    assert out[3] == ("click", 5)
    assert out[4] == (None, None)
    assert out[5] == (None, None)
    assert out[7] == ("view", 10)
    assert out[8] == ("view", 20)


def test_cohort_ltv_cumulative_and_cents_exact(spark):
    from blueflood_spark.operators.events import MS_PER_DAY, cohort_ltv

    d = MS_PER_DAY
    rows = [
        (1, 0 * d + 5, 1.10), (1, 1 * d + 5, 2.05),   # user 1: cohort day 0
        (2, 0 * d + 9, 0.25), (2, 0 * d + 10, 0.50),  # user 2: same cohort
        (3, 1 * d + 1, 9.99),                          # user 3: cohort day 1
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    out = {
        (r.cohort_day, r.day_offset): (r.n_active_users, r.cents_day, r.cents_cum)
        for r in cohort_ltv(ev, max_offset_days=7).collect()
    }
    assert out[(0, 0)] == (2, 185, 185)     # 110 + 25 + 50
    assert out[(0, 1)] == (1, 205, 390)     # cumulative picks up day 0
    assert out[(1, 0)] == (1, 999, 999)


def test_ann_recall_report_perfect_when_exhaustive(spark):
    import math

    from blueflood_spark.operators.similarity import ann_recall_report

    # 20 well-separated vectors; probe EVERY list and use 1 giant band →
    # both arms see all candidates, so recall must be exactly 1.0
    rows = [
        (i, [math.cos(i / 2.0), math.sin(i / 2.0), 1.0, float(i) / 10]) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from pyspark.sql import functions as F

    out = ann_recall_report(
        emb, F.col("vec_id") < 3, k=5, planes_n=4, bands=1, n_lists=2, n_probe=2
    ).collect()
    assert len(out) == 6  # 3 queries × 2 methods
    ivf = [r for r in out if r.method == "ivf"]
    assert all(r.recall == 1.0 and r.n_hits == 5 for r in ivf), ivf
    # LSH with 1 band of 4 planes may split; recall is still bounded [0,1]
    assert all(0.0 <= r.recall <= 1.0 for r in out)


def test_slot_eligibility_quiet_slots_only(spark):
    import __spark_entry__ as E

    out = E.bf_slot_eligibility(spark, "/root/testdata/sf0.001").collect()
    assert out
    newest = max(r.last_arrival_ms for r in out)
    now = newest + 60_001
    for r in out:
        assert r.is_eligible == int(now - r.last_arrival_ms > 300_000)
        assert 0 <= r.slot < 1008 and 0 <= r.shard < 128
    # the slot holding the newest arrival is never eligible (quiet < delay)
    assert all(r.is_eligible == 0 for r in out if r.last_arrival_ms == newest)
    # 30-day fixture: old slots must be eligible
    assert any(r.is_eligible == 1 for r in out)


def test_ivf_index_roundtrip_prunes_partitions_and_matches_inmemory(spark, tmp_path):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from blueflood_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        probe_ivf_index,
    )

    emb = E._t(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_lists=8)

    queries = emb.filter(F.col("vec_id") < 5)
    got = probe_ivf_index(spark, path, queries, k=10, n_probe=2)

    # 1) the probed scan must read ONLY the probed lists' partitions
    import re

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan[:2000]
    assert re.search(r"PartitionFilters: \[list_id#\d+ IN \(", plan), plan[:2000]

    # 2) results identical to the in-memory kernel (same codebook/probes)
    want = ivf_topk(emb, F.col("vec_id") < 5, k=10, n_lists=8, n_probe=2)
    g = {(r.q_id, r.c_id, r.rank) for r in got.collect()}
    w = {(r.q_id, r.c_id, r.rank) for r in want.collect()}
    assert g == w and len(g) >= 40


def test_theil_sen_outlier_immunity(spark):
    """A clean slope of +100 cents/window with ONE wild outlier window:
    the pairwise-slope median must stay at 100 (OLS would not)."""
    import __spark_entry__  # noqa: F401  (ensures module import works)
    from pyspark.sql import functions as F

    rows = [("t", "m", w, 100 * w) for w in range(10)]
    rows[5] = ("t", "m", 5, 1_000_000)  # outlier
    per_w = spark.createDataFrame(
        rows, "tenant_id string, metric_name string, w long, cents long"
    )
    a, b = per_w.alias("a"), per_w.alias("b")
    slopes = a.join(
        b,
        (F.col("a.tenant_id") == F.col("b.tenant_id"))
        & (F.col("a.metric_name") == F.col("b.metric_name"))
        & (F.col("a.w") < F.col("b.w")),
    ).select(
        (
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.w") - F.col("a.w")).cast("double")
        ).alias("slope")
    )
    med = slopes.agg(F.expr("percentile(slope, 0.5D)").alias("m")).collect()[0].m
    assert med == 100.0, med


def test_ivf_index_append_equals_full_rebuild(spark, tmp_path):
    """Day-2 maintenance: building on day-1 vectors then APPENDING the
    day-2 batch must probe identically to a full rebuild with the same
    codebook — and the persisted codebook must be untouched by the
    append."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from blueflood_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        probe_ivf_index,
    )

    emb = E._t(spark, "/root/testdata/sf0.001", "embeddings")
    day1 = emb.filter(F.col("vec_id") < 400)
    day2 = emb.filter(F.col("vec_id") >= 400)

    inc_path = str(tmp_path / "ivf_inc")
    full_path = str(tmp_path / "ivf_full")
    build_ivf_index(day1, inc_path, n_lists=8)
    cb_before = sorted(
        r.cent_id for r in spark.read.parquet(inc_path + "/_codebook").collect()
    )
    append_ivf_index(spark, inc_path, day2)
    cb_after = sorted(
        r.cent_id for r in spark.read.parquet(inc_path + "/_codebook").collect()
    )
    assert cb_before == cb_after == list(range(8))

    # full rebuild uses the same codebook (centroids = vec_id < 8, all in
    # day-1), so incremental must equal rebuild exactly
    build_ivf_index(emb, full_path, n_lists=8)
    queries = emb.filter(F.col("vec_id") < 5)
    inc = {
        (r.q_id, r.c_id, r.rank)
        for r in probe_ivf_index(spark, inc_path, queries, k=10, n_probe=2).collect()
    }
    full = {
        (r.q_id, r.c_id, r.rank)
        for r in probe_ivf_index(spark, full_path, queries, k=10, n_probe=2).collect()
    }
    assert inc == full and len(inc) >= 40
    # day-2 vectors are actually reachable through the incremental index
    assert any(c >= 400 for (_, c, _) in inc) or any(
        c >= 400 for (_, c, _) in full
    )
