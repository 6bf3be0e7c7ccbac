"""Adversarial-input differentials: the oracle gate runs on the synthetic
corpus, whose text is clean ASCII words with single spaces. This suite
feeds EDGE documents — empty text, single char, unicode, embedded
tabs/newlines, a very long word, heavy repetition — through a set of
text operators on BOTH engines and requires exact agreement, so the
cross-engine contract isn't an artifact of friendly data."""

import math

import duckdb
import pytest

from blueflood_spark.operators import text as TX

EDGE_DOCS = [
    (0, "", "en", "s0", 0),
    (1, "a", "en", "s0", 1),
    (2, "héllo wörld grüße 日本語 テスト", "de", "s1", 30),
    (3, "tab\there and\nnewline inside tokens", "en", "s1", 35),
    (4, "x" * 300 + " short tail", "en", "s2", 311),
    (5, "a a a a a a a a a a a a", "en", "s2", 23),
    (6, "the the the quick quick brown fox fox fox fox", "en", "s3", 46),
    (7, "punct!@# $%^ &*() mixed 123 456 789 end", "en", "s3", 39),
]


@pytest.fixture(scope="module")
def engines(spark):
    docs = spark.createDataFrame(
        EDGE_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", EDGE_DOCS)
    return docs, con


def _diff(sdf, con, sql):
    scols = sdf.columns
    srows = sorted(tuple(r) for r in sdf.collect())
    res = con.execute(sql)
    dcols = [c[0] for c in res.description]
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    drows = sorted(tuple(r[dcols.index(c)] for c in scols) for r in res.fetchall())
    assert len(srows) == len(drows), (len(srows), len(drows))
    for a, b in zip(srows, drows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-12, abs_tol=0), (a, b)
            else:
                assert x == y, (a, b)


def test_edge_token_counts(engines):
    docs, con = engines
    _diff(TX.token_counts(docs), con, TX.token_counts_sql())


def test_edge_char_entropy(engines):
    docs, con = engines
    _diff(TX.char_entropy(docs), con, TX.char_entropy_sql())


def test_edge_winnowing(engines):
    docs, con = engines
    _diff(
        TX.winnowing_fingerprints(docs, k=4, w=5),
        con,
        TX.winnowing_fingerprints_sql(k=4, w=5),
    )


def test_edge_bpe_encode(engines):
    docs, con = engines
    _diff(TX.bpe_encode(docs), con, TX.bpe_encode_sql())


def test_edge_bpe_pairs(engines):
    docs, con = engines
    _diff(TX.bpe_pair_counts(docs, k=50), con, TX.bpe_pair_counts_sql(k=50))


def test_edge_vocab_growth(engines):
    docs, con = engines
    _diff(TX.vocab_growth(docs, bucket_docs=3), con, TX.vocab_growth_sql(bucket_docs=3))


def test_edge_source_kl(engines):
    docs, con = engines
    _diff(TX.source_kl_divergence(docs), con, TX.source_kl_divergence_sql())


def test_edge_rolling_fingerprint(engines):
    docs, con = engines
    _diff(TX.rolling_fingerprint(docs), con, TX.rolling_fingerprint_sql())


def test_edge_chunk_windows(engines):
    docs, con = engines
    _diff(
        TX.chunk_windows(docs, width=4, stride=3),
        con,
        TX.chunk_windows_sql(width=4, stride=3),
    )


def test_edge_quality_score(engines):
    docs, con = engines
    _diff(TX.quality_score(docs), con, TX.quality_score_sql())


def test_edge_language_id(engines):
    docs, con = engines
    _diff(TX.language_id(docs), con, TX.language_id_sql())


# -- dedup family over the same adversarial docs --

from blueflood_spark.operators import dedup as D  # noqa: E402


def test_edge_exact_dedup(engines):
    docs, con = engines
    _diff(
        D.exact_dedup(docs),
        con,
        """
SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY 1
""",
    )


def test_edge_minhash_signatures(engines):
    docs, con = engines
    _diff(D.minhash_signatures(docs), con, D.minhash_signatures_sql())


def test_edge_simhash(engines):
    docs, con = engines
    _diff(D.simhash(docs), con, D.simhash_sql())


def test_edge_ngram_stats(engines):
    docs, con = engines
    _diff(TX.ngram_stats(docs, n=3, k=20), con, TX.ngram_stats_sql(n=3, k=20))


def test_edge_pii_redact(engines):
    docs, con = engines
    _diff(TX.pii_redact(docs), con, TX.pii_redact_sql())


# -- series family end-to-end: an adversarial events.parquet (negative
#    values — exercising bf_change_cusum's non-negative shift device —
#    constant series, single-sample series, duplicate timestamps) run
#    through the REGISTERED queries against their registered oracles --


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0

    def add(user_id, etype, minutes, value):
        nonlocal eid
        rows.append(
            (
                eid,
                base + datetime.timedelta(minutes=minutes),
                user_id,
                etype,
                float(value),
                '{"k": 1}',
            )
        )
        eid += 1

    # negative sawtooth with a level shift (user 0 -> tenant t0)
    for i in range(40):
        add(0, "neg", i * 5, -50 - (i % 3) + (30 if i >= 25 else 0))
    # constant series: zero variance, zero MAD
    for i in range(30):
        add(1, "const", i * 5, 42.0)
    # single-sample series
    add(2, "solo", 0, 7.5)
    # duplicate timestamps (two samples in the same ms)
    for i in range(20):
        add(3, "dup", i * 5, 10.0 + i)
        add(3, "dup", i * 5, 12.0 + i)
    # multi-day correlated pair (user 4 → t0): hourly for 6 days, so the
    # 240m/4h-window estimators (trend, xcorr, movers) have real input
    for i in range(6 * 24):
        add(4, "load", i * 60, 100 + i + (i % 7))
        add(4, "lat", i * 60, 50 + i)
        # SAME-tenant constant series: zero variance must hit xcorr's
        # NULL-guard inside the pair join, not dodge it via tenant split
        add(8, "flat", i * 60, 5.0)
    # attribution/funnel journeys: touches then a purchase within 24h
    for u in (5, 6):
        add(u, "click", 10, 1.0)
        add(u, "view", 500, 2.0)
        add(u, "purchase", 700, 30.0)
    d = str(tmp_path_factory.mktemp("adv_sf"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).repartition(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


SERIES_QUERIES = [
    "bf_change_cusum",
    "bf_outlier_mad",
    "bf_apdex",
    "bf_anomaly_zscore",
    "ev_k_anonymity",
    "bf_basic_rollup_5m",
    "bf_rate_series",
    "bf_ewma_smooth",
    "bf_m4_downsample",
    "bf_histogram_buckets",
    "bf_histogram_quantile",
    "bf_sustained_breach",
    "bf_topk_movers",
    "bf_seasonal_baseline",
    "bf_winsorize",
    "bf_burn_rate",
    "bf_tenant_cardinality",
    "bf_downtime_report",
    "bf_heatmap_grid",
    "bf_trend_slope",
    "bf_xcorr_lag",
    "bf_alert_hysteresis",
    "ev_funnel_3step",
    "ev_retention_cohorts",
    "ev_attribution",
    "ev_cohort_ltv",
    "ev_type_lift",
    "bf_sessionize",
    "bf_gapfill_series",
    "bf_counter_rollup_5m",
    "bf_gauge_rollup_5m",
    "bf_set_rollup_20m",
    "bf_seasonal_naive_forecast",
    "ev_funnel_conversion",
    "ev_top_paths",
    "bf_ladder_audit",
    "bf_lttb_downsample",
    "bf_counter_resets",
    "bf_native_histogram",
    "bf_native_histogram_quantile",
    "bf_kmv_overlap",
]


@pytest.mark.parametrize("qname", SERIES_QUERIES)
def test_series_queries_on_adversarial_events(spark, adversarial_sf, qname):
    import __spark_entry__ as E

    sdf = E.queries()[qname](spark, adversarial_sf)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" '{adversarial_sf}/events.parquet/*.parquet'"
    )
    _diff(sdf, con, E.oracle_sql()[qname])


# -- ANN family end-to-end on adversarial embeddings: a zero vector (an
#    empty doc's embedding — guaranteed to exist at corpus scale), a
#    denormal-tiny vector, and exact duplicates. Before the zero-norm
#    guard the cosine kernels CRASHED under ANSI mode (DIVIDE_BY_ZERO);
#    a zero vector now scores cosine 0 on both engines. --


@pytest.fixture(scope="module")
def adversarial_emb(spark, tmp_path_factory):
    DIM = 64
    rows = []
    for i in range(40):
        if i == 7:
            v = [0.0] * DIM
        elif i == 9:
            v = [1e-30] * DIM
        elif i in (11, 12):
            v = [float((j % 5) - 2) for j in range(DIM)]
        else:
            v = [float(((i * 31 + j * 7) % 13) - 6) / 3 for j in range(DIM)]
        rows.append((i, v, i % 4))
    d = str(tmp_path_factory.mktemp("adv_emb"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(1).write.parquet(f"{d}/embeddings.parquet")
    return d


ANN_QUERIES = [
    "llm_ann_cosine_topk",
    "llm_ann_sq8_topk",
    "llm_ann_lsh_topk",
    "llm_ann_ivf_topk",
    "llm_ann_ivfpq_topk",
    "llm_ann_pq_rerank",
    "llm_semdedup",
    "llm_semdedup_pairs",
    "llm_ann_nprobe_sweep",
    "llm_contrastive_pairs",
    "llm_mmr_diversify",
    "llm_label_centroids",
    "llm_silhouette",
    "llm_ann_filtered_topk",
    "llm_embedding_near_dups",
    "llm_embedding_dup_clusters",
    "llm_kmeans_clusters",
]


@pytest.mark.parametrize("qname", ANN_QUERIES)
def test_ann_queries_on_adversarial_embeddings(spark, adversarial_emb, qname):
    import __spark_entry__ as E

    sdf = E.queries()[qname](spark, adversarial_emb)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" '{adversarial_emb}/embeddings.parquet/*.parquet'"
    )
    _diff(sdf, con, E.oracle_sql()[qname])


# -- full llm_* sweep on the adversarial corpus: every registered
#    document/embedding query runs against its registered oracle over
#    EDGE docs + adversarial embeddings in one fixture dir; no-oracle
#    (rows-only contract) entries must at least execute. This is the
#    suite that caught the weighted-sample zero-weight crash and the
#    RRF NaN-rank divergence. --


@pytest.fixture(scope="module")
def adversarial_corpus_sf(spark, tmp_path_factory):
    docs = EDGE_DOCS + [
        (
            i,
            f"doc {i} filler words alpha beta gamma {'delta ' * (i % 5)}end",
            "en",
            f"s{i % 4}",
            50,
        )
        for i in range(8, 40)
    ]
    DIM = 64
    emb = []
    for i in range(40):
        if i == 7:
            v = [0.0] * DIM
        elif i == 9:
            v = [1e-30] * DIM
        elif i in (11, 12):
            v = [float((j % 5) - 2) for j in range(DIM)]
        else:
            v = [float(((i * 31 + j * 7) % 13) - 6) / 3 for j in range(DIM)]
        emb.append((i, v, i % 4))
    d = str(tmp_path_factory.mktemp("adv_corpus"))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(1).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).repartition(1).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_all_llm_queries_on_adversarial_corpus(spark, adversarial_corpus_sf):
    import __spark_entry__ as E

    d = adversarial_corpus_sf
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for q in sorted(n for n in qs if n.startswith("llm_")):
        try:
            sdf = qs[q](spark, d)
            if q not in os_:
                sdf.collect()  # rows-only contract: must execute
                continue
            _diff(sdf, con, os_[q])
        except AssertionError as ex:
            failures.append(f"{q}: {str(ex)[:160]}")
        except Exception as ex:
            failures.append(f"{q}: {type(ex).__name__}: {str(ex).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)


# -- empty-input sweep: EVERY registered query must execute on empty
#    tables without crashing, and (where an oracle exists) agree with
#    DuckDB. Two known engine-semantics divergences are asserted in
#    shape instead: Spark returns 0 rows for CUBE/GROUPING SETS over
#    empty input, while DuckDB (per the SQL standard) emits the
#    grand-total grouping-set row — a real cross-engine difference that
#    only exists on empty input, documented in NOTES. --

EMPTY_DIVERGENT = {"q_cube_revenue", "q_grouping_sets"}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    src = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).repartition(1).write.parquet(
            f"{d}/{t}.parquet"
        )
    return d


def test_all_queries_on_empty_tables(spark, empty_sf):
    import __spark_entry__ as E

    d = empty_sf
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'")
    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for q in sorted(qs):
        try:
            sdf = qs[q](spark, d)
            srows = sdf.collect()
            if q in EMPTY_DIVERGENT:
                assert srows == [], q
                assert len(con.execute(os_[q]).fetchall()) == 1, q
                continue
            if q in os_:
                _diff(sdf, con, os_[q])
        except AssertionError as ex:
            failures.append(f"{q}: {str(ex)[:140]}")
        except Exception as ex:
            failures.append(
                f"{q}: {type(ex).__name__}: {str(ex).splitlines()[0][:140]}"
            )
    assert not failures, "\n".join(failures)
