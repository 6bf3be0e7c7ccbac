"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All expressions are built-in pyspark.sql.functions (JVM-side, codegen) —
the per-document work is embarrassingly parallel, no shuffles at all, so
these scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blueflood_spark.functions.hashing import (
    md5_bucket,
    md5_bucket_sql,
    md5_uniform,
    md5_uniform_sql,
    safe_div,
)

# tiny deterministic stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "pour", "dans"],
}

# BPE-ish token estimate: runs of word chars, runs of digits, or single
# punctuation — a deterministic proxy for subword tokenizer counts.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _sql_str(s: str) -> str:
    """Escape a caller-supplied string for a single-quoted DuckDB SQL
    literal via quote doubling. DuckDB-scoped on purpose: every consumer
    is an oracle *_sql builder, and quote doubling alone is NOT safe for
    Spark SQL, whose default lexer (escapedStringLiterals=false) also
    treats backslash as an escape — a value ending in '\\' would yield
    \\' and break/extend the literal there. Every *_sql builder that
    interpolates caller data (query terms, group keys) must route it
    through here; internal constants (stopword tables, salts) are
    quote-free by construction."""
    return s.replace("'", "''")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    txt = F.col(text_col)
    ws_tokens = F.size(F.split(txt, r"\s+"))
    bpe_tokens = F.size(F.regexp_extract_all(txt, F.lit(BPE_ISH_PATTERN), 0))
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        bpe_tokens.alias("bpe_tokens"),
        F.length(txt).alias("n_chars"),
    )


def token_counts_sql() -> str:
    return rf"""
SELECT doc_id,
       len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe_tokens,
       length(text) AS n_chars
FROM documents
"""


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: score = |tokens ∩ stopwords_L|
    / |tokens| per language, argmax wins ('und' = undetermined when all
    scores are 0)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    scores = {
        lang: safe_div(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).cast("double"),
            n.cast("double"),
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    best = None
    for lang, score in scores.items():
        best = score if best is None else F.greatest(best, score)
    pred = F.lit("und")
    # reversed so earlier languages win ties (deterministic)
    for lang in reversed(list(LANG_STOPWORDS)):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(pred)
    out = docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_STOPWORDS],
        pred.alias("pred_lang"),
    )
    return out


def language_id_sql() -> str:
    score_exprs = []
    for lang, words in LANG_STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        score_exprs.append(
            f"CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0 ELSE "
            f"CAST(len(list_intersect(string_split(text, ' '), {arr})) AS DOUBLE)"
            f" / len(string_split(text, ' ')) END AS score_{lang}"
        )
    langs = list(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN score_{lang} > 0 AND score_{lang} = {best} THEN '{lang}' ELSE {pred} END"
    cols = ",\n       ".join(score_exprs)
    return f"""
WITH scored AS (
  SELECT doc_id,
       {cols}
  FROM documents
)
SELECT doc_id, score_en, score_de, score_fr, {pred} AS pred_lang
FROM scored
"""


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristics: length band, punctuation density,
    stopword ratio, mean word length, uppercase ratio."""
    txt = F.col(text_col)
    toks = F.split(txt, " ")
    n_toks = F.size(toks)
    n_chars = F.length(txt)
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_punct = F.size(F.regexp_extract_all(txt, F.lit(r"[^A-Za-z0-9\s]"), 0))
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        safe_div(n_chars.cast("double"), n_toks.cast("double")).alias("mean_word_len"),
        safe_div(n_punct.cast("double"), n_chars.cast("double")).alias("punct_ratio"),
        safe_div(stop_hits.cast("double"), n_toks.cast("double")).alias("stopword_ratio"),
        ((n_toks >= 10) & (n_toks <= 100_000)).alias("length_ok"),
    )


def quality_score_sql() -> str:
    stop = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + "]"
    return rf"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
            ELSE CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) END AS mean_word_len,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) END AS punct_ratio,
       CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
            ELSE CAST(len(list_filter(string_split(text, ' '), t -> list_contains({stop}, t))) AS DOUBLE)
                 / len(string_split(text, ' ')) END AS stopword_ratio,
       len(string_split(text, ' ')) >= 10 AND len(string_split(text, ' ')) <= 100000 AS length_ok
FROM documents
"""


def train_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment: md5-derived bucket in
    [0,100) per id — stable across runs, engines, and partitionings
    (never use rand(): resplits on every retry). Salt the id string to
    re-deal the split without touching data."""
    bucket = md5_bucket(F.col(id_col), "split_")
    return docs.select(
        id_col,
        bucket.alias("bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def train_split_sql(id_col: str = "doc_id", train_pct: int = 90, val_pct: int = 5) -> str:
    bucket = md5_bucket_sql(id_col, "split_")
    return f"""
SELECT {id_col}, {bucket} AS bucket,
       CASE WHEN {bucket} < {train_pct} THEN 'train'
            WHEN {bucket} < {train_pct + val_pct} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): key = u^(1/w) with u drawn from an md5-derived
    uniform — reproducible across runs/engines/partitionings, unlike
    rand(). Selection = global top-k by key via orderBy(...).limit(k),
    which Catalyst plans as TakeOrderedAndProject: one partial top-k per
    partition + a tiny k·partitions final merge on the driver — no
    single-partition global sort (a Window.orderBy with no partitionBy
    would funnel the whole corpus into one task; round-1 scale-killer).
    Rank is derived AFTER the limit, over only k rows."""
    from pyspark.sql.window import Window

    u = md5_uniform(F.col(id_col), "samp_")
    # zero/negative weight ⇒ key 0 (never sampled): the A-Res limit of
    # u^(1/w) as w→0⁺ for u<1, and the only ANSI-safe reading — a raw
    # 1.0/0 kills the query under Spark 4's default ANSI mode
    w_d = F.col(weight_col).cast("double")
    key = F.when(w_d <= 0, F.lit(0.0)).otherwise(F.pow(u, 1.0 / w_d))
    ranked = docs.select(id_col, F.col(weight_col).alias("weight"), key.alias("samp_key"))
    topk = ranked.orderBy(F.col("samp_key").desc(), F.col(id_col)).limit(k)
    # window over ≤ k rows (post-limit) — cost is negligible and the plan
    # upstream of it is TakeOrderedAndProject, not a global sort
    w = Window.orderBy(F.col("samp_key").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "weight", "samp_key", "rank"
    )


def weighted_sample_sql(k: int = 50, weight_col: str = "n_chars", id_col: str = "doc_id") -> str:
    u = md5_uniform_sql(id_col, "samp_")
    return f"""
WITH ranked AS (
  SELECT {id_col}, {weight_col} AS weight,
         CASE WHEN CAST({weight_col} AS DOUBLE) <= 0 THEN 0.0
              ELSE power({u}, 1.0 / CAST({weight_col} AS DOUBLE)) END AS samp_key
  FROM documents
)
SELECT {id_col}, weight, samp_key, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY samp_key DESC, {id_col}) AS rank FROM ranked)
WHERE rank <= {k}
"""


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling-window hash over
    word 1-grams (a compact representative for containment checks) plus the
    full-content digest."""
    toks = F.split(F.col(text_col), " ")
    tok_hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("content_md5"),
        F.array_min(tok_hashes).alias("min_token_hash"),
        F.array_max(tok_hashes).alias("max_token_hash"),
    )


def rolling_fingerprint_sql() -> str:
    return """
SELECT doc_id,
       md5(text) AS content_md5,
       list_min(list_transform(string_split(text, ' '),
                t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))) AS min_token_hash,
       list_max(list_transform(string_split(text, ' '),
                t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))) AS max_token_hash
FROM documents
"""


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    top_word_max: float = 0.2,
    dup_2gram_max: float = 0.6,
) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of all words
    taken by the single most frequent word, and the fraction of word
    2-grams that are repeats of an earlier 2-gram. Documents exceeding
    either threshold are flagged for removal (the repetition-filter rules
    of Rae et al. 2021, word/n-gram variants).

    One explode + two-level aggregation per signal; the per-doc group is
    the shuffle key, so this scales with corpus splits."""
    words = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w"))
    word_stats = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.max("c").alias("top_word_count"),
        )
    )
    # r10: tokenize ONCE into a projected column — interpreted HOF
    # evaluation re-runs non-lambda subtrees per element, so the inlined
    # split(text) inside the slice lambda was O(tokens²) bytes touched
    # (the dsir/bigram lesson, d2aa48f). Values bit-identical.
    ws = F.col("_ws")
    grams = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_ws")
    ).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(ws) - 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
            )
        ).alias("g"),
    )
    gram_stats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_2grams"),
            F.count(F.lit(1)).alias("distinct_2grams"),
        )
    )
    top_frac = F.col("top_word_count").cast("double") / F.col("n_words")
    dup_frac = (F.col("n_2grams") - F.col("distinct_2grams")).cast("double") / F.col("n_2grams")
    return (
        word_stats.join(gram_stats, "doc_id")
        .select(
            "doc_id",
            "n_words",
            top_frac.alias("top_word_frac"),
            dup_frac.alias("dup_2gram_frac"),
            ((top_frac > top_word_max) | (dup_frac > dup_2gram_max)).alias("flagged"),
        )
    )


def repetition_stats_sql(top_word_max: float = 0.2, dup_2gram_max: float = 0.6) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
word_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_word_count
  FROM (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2)
  GROUP BY doc_id
),
grams AS (
  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       UNNEST(range(1, greatest(len(toks) - 1, 1) + 1)) AS t(i)
),
gram_stats AS (
  SELECT doc_id, sum(c) AS n_2grams, count(*) AS distinct_2grams
  FROM (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT w.doc_id, w.n_words,
       CAST(w.top_word_count AS DOUBLE) / w.n_words AS top_word_frac,
       CAST(g.n_2grams - g.distinct_2grams AS DOUBLE) / g.n_2grams AS dup_2gram_frac,
       (CAST(w.top_word_count AS DOUBLE) / w.n_words > {top_word_max}
        OR CAST(g.n_2grams - g.distinct_2grams AS DOUBLE) / g.n_2grams > {dup_2gram_max})
       AS flagged
FROM word_stats w JOIN gram_stats g ON w.doc_id = g.doc_id
"""


def tfidf_top_terms(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k salient terms per document: rank terms by df-normalized term
    frequency (tf/df — exactly-rounded IEEE division, so the ranking is
    bit-identical across engines; ln-based tf-idf is emitted as a scored
    column but deliberately NOT the sort key, since libm ln may differ in
    the last ulp between engines on mathematically-tied inputs).

    Corpus plan: one explode → per-(doc,term) counts; document frequency
    from a second small agg over distinct (doc,term) joined back; the
    per-doc top-k is a window over the doc partition key. The vocabulary
    join carries NO broadcast hint on purpose: a web-scale corpus has a
    vocabulary (billions of distinct terms) that would OOM a forced
    broadcast build side, while AQE promotes the join to broadcast at
    runtime whenever the measured df table is actually small — the safe
    direction at 100 TB."""
    from pyspark.sql import Window

    words = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term"))
    # r10: tf feeds BOTH the df aggregation and the ranking join — the
    # explode+agg corpus pass re-ran per consumer (2 copies in the plan).
    # AQE-eager localCheckpoint = sequential materialization of the
    # compact per-(doc,term) counts (smaller than the corpus), read by
    # both consumers: one tokenize pass instead of two at any scale.
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("term").asc()
    )
    return (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            "rank",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("tfidf"),
        )
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2
),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
ranked AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.term ASC
         ) AS INTEGER) AS rank,
         t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) AS tfidf
  FROM tf t JOIN df d ON t.term = d.term, n
)
SELECT doc_id, term, tf, df, rank, tfidf FROM ranked WHERE rank <= {k}
"""


# PII patterns kept to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass: replace emails and IPv4 literals with typed
    placeholder tokens, reporting per-doc redaction counts. Pure per-row
    regexp work — embarrassingly parallel, no shuffle."""
    txt = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(PII_EMAIL), 0))
    n_ips = F.size(F.regexp_extract_all(txt, F.lit(PII_IPV4), 0))
    clean = F.regexp_replace(
        F.regexp_replace(txt, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
    )


def pii_redact_sql() -> str:
    return rf"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                      '{PII_IPV4}', '<IP>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ips
FROM documents
"""


# ---------------------------------------------------------------------------
# corpus-composition reporting & segment-level dedup
# ---------------------------------------------------------------------------

def source_stats(docs: DataFrame) -> DataFrame:
    """Per-source training-mix report: volume, length, language spread,
    and the dominant language — the dashboard a data-mixing run reads
    before weighting sources.

    Two aggregations over (source[, lang]) — both shuffle only the
    grouped partials (map-side combine), and the dominant-language
    window partitions by source, so no global single-partition stage
    exists at any corpus size."""
    from pyspark.sql.window import Window

    per_lang = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    # asc_nulls_last: Spark default ASC puts NULLs FIRST, DuckDB's puts
    # them LAST — a NULL lang tied on count would otherwise win the
    # tiebreak on one engine only
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc_nulls_last("lang"))
    top = (
        per_lang.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    # avg derived from the exact integer sums with ONE IEEE division —
    # engine-pair avg() accumulators diverge in the last ulps (the r3
    # driver hash failure); identical bigint operands cannot
    avg = (F.col("total_chars").cast("double") / F.col("n_docs")).alias("avg_chars")
    return agg.withColumn("avg_chars", avg).join(top, "source")


def source_stats_sql() -> str:
    return """
WITH per_lang AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
),
top AS (
  SELECT source, lang AS top_lang
  FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
        FROM per_lang)
  WHERE rn = 1
)
SELECT a.source, a.n_docs, a.total_chars,
       CAST(a.total_chars AS DOUBLE) / a.n_docs AS avg_chars,
       a.n_langs, t.top_lang
FROM (SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
             count(DISTINCT lang) AS n_langs
      FROM documents GROUP BY 1) a
JOIN top t ON a.source = t.source
"""


def ngram_stats(docs: DataFrame, text_col: str = "text", n: int = 3, k: int = 100) -> DataFrame:
    """Corpus-level top-k word n-grams with occurrence and document
    frequency — the raw material for boilerplate detection and
    contamination review.

    explode → one count aggregation → orderBy().limit(k), which Catalyst
    plans as TakeOrderedAndProject (per-partition partial top-k, then a
    k·partitions merge) — no global sort of the n-gram table."""
    # r10: tokenize once into _ws (the HOF-hoist idiom — the inlined
    # split re-ran per gram position, O(tokens²)); values bit-identical
    ws = F.col("_ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )
    return (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("_ws"))
        .filter(F.size(ws) >= n)
        .select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("occurrences"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("occurrences"), F.asc("ngram"))
        .limit(k)
    )


def ngram_stats_sql(n: int = 3, k: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(l[i:i+{n - 1}], ' ') AS ngram
  FROM toks, UNNEST(range(1, len(l) - {n - 1} + 1)) AS t(i)
  WHERE len(l) >= {n}
)
SELECT ngram, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
FROM grams GROUP BY 1
ORDER BY occurrences DESC, ngram
LIMIT {k}
"""


def chunk_dedup(docs: DataFrame, text_col: str = "text", width: int = 8) -> DataFrame:
    """Segment-level exact dedup (C4-style, adapted to word chunks since
    the corpus has no line structure): split each document into
    non-overlapping `width`-word chunks and report every chunk that
    appears in ≥ 2 distinct documents, with its document and occurrence
    counts. A removal pass anti-joins documents' chunks against this
    relation.

    One explode + one aggregation: the groupBy shuffles only (chunk,
    partial-count) pairs after map-side combine — the classic shape that
    survives 100 TB because duplicated-chunk cardinality, not corpus
    size, bounds the reduce side."""
    # r10: tokenize once into _ws (HOF-hoist idiom; the inlined split
    # re-ran per chunk position, O(tokens²)); values bit-identical
    ws = F.col("_ws")
    n_chunks = F.floor(F.size(ws) / width).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i * width + 1, width)),
    )
    return (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("_ws"))
        .filter(F.size(ws) >= width)
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .groupBy("chunk")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def chunk_dedup_sql(width: int = 8) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
chunks AS (
  SELECT doc_id, array_to_string(l[(i - 1) * {width} + 1 : i * {width}], ' ') AS chunk
  FROM toks, UNNEST(range(1, len(l) // {width} + 1)) AS t(i)
  WHERE len(l) >= {width}
)
SELECT chunk, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
FROM chunks GROUP BY 1
HAVING count(DISTINCT doc_id) >= 2
"""


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    top_word_max: float = 0.14,
    dup_2gram_max: float = 0.08,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """The composite keep/drop verdict a C4/Gopher-style cleaning pass
    applies per document: length band, single-word and 2-gram repetition
    caps, and a minimum stopword presence. Emits the measured signals,
    the boolean verdict, and a deterministic `drop_reason` — the FIRST
    failing rule in fixed priority order, so downstream removal reports
    are stable across engines and runs.

    Plan shape: the per-row signals are codegen expressions; only the
    repetition signals aggregate (explode → two-level agg, per-doc
    shuffle key), then one join back on doc_id. Scales with corpus
    splits like repetition_stats."""
    txt = F.col(text_col)
    toks = F.split(txt, " ")
    n_toks = F.size(toks)
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    per_row = docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        safe_div(stop_hits.cast("double"), n_toks.cast("double")).alias("stopword_ratio"),
    )
    rep = repetition_stats(docs, text_col).select("doc_id", "top_word_frac", "dup_2gram_frac")
    joined = per_row.join(rep, "doc_id")
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("top_word_frac") > top_word_max, F.lit("repetitive_word"))
        .when(F.col("dup_2gram_frac") > dup_2gram_max, F.lit("repetitive_2gram"))
        .when(F.col("stopword_ratio") < min_stopword_ratio, F.lit("no_stopwords"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "stopword_ratio",
        "top_word_frac",
        "dup_2gram_frac",
        reason.alias("drop_reason"),
        (reason == "keep").alias("keep"),
    )


def quality_gate_sql(
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    top_word_max: float = 0.14,
    dup_2gram_max: float = 0.08,
    min_stopword_ratio: float = 0.01,
) -> str:
    stop = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + "]"
    return f"""
WITH rep AS ({repetition_stats_sql()}),
per_row AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
              ELSE CAST(len(list_filter(string_split(text, ' '), t -> list_contains({stop}, t))) AS DOUBLE)
                   / len(string_split(text, ' ')) END AS stopword_ratio
  FROM documents
),
joined AS (
  SELECT p.doc_id, p.n_tokens, p.stopword_ratio, r.top_word_frac, r.dup_2gram_frac,
         CASE WHEN p.n_tokens < {min_tokens} THEN 'too_short'
              WHEN p.n_tokens > {max_tokens} THEN 'too_long'
              WHEN r.top_word_frac > {top_word_max} THEN 'repetitive_word'
              WHEN r.dup_2gram_frac > {dup_2gram_max} THEN 'repetitive_2gram'
              WHEN p.stopword_ratio < {min_stopword_ratio} THEN 'no_stopwords'
              ELSE 'keep' END AS drop_reason
  FROM per_row p JOIN rep r ON p.doc_id = r.doc_id
)
SELECT doc_id, n_tokens, stopword_ratio, top_word_frac, dup_2gram_frac,
       drop_reason, drop_reason = 'keep' AS keep
FROM joined
"""


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    budget: int = 2048,
    shard_size: int = 1024,
) -> DataFrame:
    """Concat-and-split sequence packing: documents are concatenated in
    doc_id order and the token stream is cut every `budget` tokens — the
    packing GPT-style pretraining uses. Emits, per document, its absolute
    start offset in the stream and the first/last context windows it lands
    in.

    The global prefix sum is two-phase so nothing funnels into one task:
    (1) a running sum *within* contiguous doc_id shards (window partitioned
    by shard — parallel), (2) shard totals roll up to one row per shard and
    a prefix over THAT tiny frame (corpus_docs / shard_size rows; ~100k at
    100 TB with shard_size=1M — the only single-partition window runs on
    kilobytes) broadcasts back as each shard's base offset. Exact integer
    arithmetic throughout; `budget` splits use the divisible-remainder
    trick so every engine truncates identically.
    """
    from pyspark.sql import Window

    B = F.lit(budget).cast("long")
    toks = token_counts(docs, text_col).select(
        "doc_id", F.col("bpe_tokens").cast("long").alias("n_tokens")
    )
    sharded = toks.withColumn("_shard", F.expr(f"doc_id div {shard_size}"))
    w_in = (
        Window.partitionBy("_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = sharded.withColumn(
        "_prefix", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0).cast("long"))
    )
    shard_tot = sharded.groupBy("_shard").agg(F.sum("n_tokens").alias("_tot"))
    w_sh = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_sh), F.lit(0).cast("long"))
    ).select("_shard", "_off")
    start = (F.col("_off") + F.col("_prefix")).alias("start_token")

    def _div(c):
        return ((c - c % B) / B).cast("long")

    out = within.join(F.broadcast(offsets), "_shard").select(
        "doc_id",
        "n_tokens",
        start,
    )
    pack_first = _div(F.col("start_token"))
    pack_last = F.greatest(
        pack_first, _div(F.col("start_token") + F.col("n_tokens") - 1)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "start_token",
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_last - pack_first + 1).alias("n_packs"),
    )


def pack_sequences_sql(budget: int = 2048) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_token
  FROM toks
)
SELECT doc_id, n_tokens, start_token,
       start_token // {budget} AS pack_first,
       greatest(start_token // {budget}, (start_token + n_tokens - 1) // {budget}) AS pack_last,
       greatest(start_token // {budget}, (start_token + n_tokens - 1) // {budget})
         - start_token // {budget} + 1 AS n_packs
FROM cum
"""


def topk_per_group(
    docs: DataFrame,
    group_col: str = "source",
    order_col: str = "n_chars",
    k: int = 20,
) -> DataFrame:
    """Keep the k best documents per group (per-source curation cap) —
    rank by `order_col` descending, doc_id ascending as the deterministic
    tiebreak. The window is PARTITIONED by group, so each group ranks
    inside its own tasks; nothing global. At 100 TB the caveat is a
    single mega-group (one source = most of the corpus): pre-filter with
    an approximate per-group threshold (approx_percentile on a sample)
    before the exact window if one group dominates."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc("doc_id"))
    return (
        docs.select("doc_id", group_col, order_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_per_group_sql(group_col: str = "source", order_col: str = "n_chars", k: int = 20) -> str:
    return f"""
SELECT doc_id, {group_col}, {order_col}, rank FROM (
  SELECT doc_id, {group_col}, {order_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {order_col} DESC, doc_id) AS rank
  FROM documents
) WHERE rank <= {k}
"""


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_pct: int = 25,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group deterministic sampling: keep a document iff its md5
    bucket (0-99) falls under its group's percentage. Same
    hash-the-id-never-rand() rule as train_split — stable across runs,
    engines, partitionings, and retries; changing a group's rate is
    monotone (raising it only ADDS documents, it never re-deals the ones
    already kept). Shuffle-free: rate lookup is a literal map, the keep
    decision is a per-row expression."""
    bucket = md5_bucket(F.col(id_col), "strat_")
    rate = F.lit(default_pct)
    for src, pct in sorted(rates.items()):
        rate = F.when(F.col(group_col) == src, F.lit(pct)).otherwise(rate)
    return docs.select(
        id_col,
        group_col,
        bucket.alias("bucket"),
        rate.alias("rate_pct"),
    ).filter(F.col("bucket") < F.col("rate_pct"))


def stratified_sample_sql(
    rates: dict[str, int],
    default_pct: int = 25,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    bucket = md5_bucket_sql(id_col, "strat_")
    branches = " ".join(
        f"WHEN {group_col} = '{_sql_str(src)}' THEN {pct}"
        for src, pct in sorted(rates.items())
    )
    rate = f"CASE {branches} ELSE {default_pct} END"
    return f"""
SELECT {id_col}, {group_col}, {bucket} AS bucket, CAST({rate} AS INT) AS rate_pct
FROM documents
WHERE {bucket} < {rate}
"""


def rare_token_stats(
    docs: DataFrame,
    text_col: str = "text",
    rare_df_pct: int = 60,
    keep_max_rare_ratio_pct: int = 30,
) -> DataFrame:
    """Rare-token gibberish filter: tokens are scored by corpus document
    frequency; a document with too many corpus-rare tokens (df in fewer
    than rare_df_pct% of documents — relative, so the signal is
    scale-invariant) is flagged. The perplexity-filter idea (CCNet) with
    integer-exact outputs — counts, cross-multiplied percent thresholds,
    no log-probs — so the result is engine-reproducible (no libm in
    checked outputs; see NOTES.md ranking trap).

    One explode+agg builds the df table; it joins back onto the exploded
    tokens (at 100 TB the df table is vocabulary-sized — shuffle join on
    the token, or broadcast its rare subset: only tokens BELOW the df
    threshold matter, and that subset is small and broadcastable)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    # r10 note: toks is read twice (df table + join-back). A
    # localCheckpoint mark here was A/B'd WALL-FLAT at sf0.1 (1.52-1.68
    # vs 1.51-1.55 s) — materializing the exploded token stream costs
    # about what the second tokenize pass costs — and at corpus scale
    # storing a corpus-sized expansion is the wrong trade. Left unmarked
    # (contrast tfidf_top_terms, whose reused frame is the AGGREGATED
    # per-(doc,term) counts — compact, and its mark measured a win).
    n_docs = docs.select(F.count("*").alias("n_docs"))
    df_tbl = toks.distinct().groupBy("tok").agg(F.count("*").alias("df"))
    # only the rare subset joins back — broadcastable at any corpus size;
    # df*100 < n_docs*pct keeps the threshold in exact integer arithmetic
    rare = F.broadcast(
        df_tbl.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 100 < F.col("n_docs") * rare_df_pct)
        .select("tok")
    )
    per_doc = (
        toks.join(rare.withColumn("is_rare", F.lit(1)), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("is_rare"), F.lit(0))).alias("n_rare"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
        (
            F.coalesce("n_rare", F.lit(0)) * 100
            <= F.coalesce("n_tokens", F.lit(0)) * keep_max_rare_ratio_pct
        ).alias("keep"),
    )


def rare_token_stats_sql(rare_df_pct: int = 60, keep_max_rare_ratio_pct: int = 30) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
df_tbl AS (
  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
),
rare AS (SELECT tok FROM df_tbl
         WHERE df * 100 < (SELECT count(*) FROM documents) * {rare_df_pct}),
per_doc AS (
  SELECT t.doc_id,
         count(*) AS n_tokens,
         CAST(sum(CASE WHEN r.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM toks t LEFT JOIN rare r ON t.tok = r.tok
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0) AS n_tokens,
       coalesce(p.n_rare, 0) AS n_rare,
       coalesce(p.n_rare, 0) * 100 <= coalesce(p.n_tokens, 0) * {keep_max_rare_ratio_pct} AS keep
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def corpus_length_profile(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group document-length profile: count, exact mean, and exact
    p10/p50/p90 of n_chars. `percentile` is the exact sort-based
    aggregate and its linear interpolation is bit-identical to DuckDB's
    quantile_cont (verified at the gate, not assumed).

    Scale: the exact percentile keeps each group's values together in one
    aggregation buffer — right for a bounded group count (languages),
    which is this operator's contract. A percentile over an UNBOUNDED
    group (e.g. per-domain at 100 TB) should swap in approx_percentile
    (t-digest-style mergeable sketch) — same call shape, no sort."""
    p = F.expr("percentile(n_chars, array(0.1D, 0.5D, 0.9D))")
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("mean_chars"),
        p[0].alias("p10_chars"),
        p[1].alias("p50_chars"),
        p[2].alias("p90_chars"),
    )


def corpus_length_profile_sql(group_col: str = "lang") -> str:
    return f"""
SELECT {group_col}, count(*) AS n_docs, avg(n_chars) AS mean_chars,
       quantile_cont(n_chars, 0.1) AS p10_chars,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars
FROM documents GROUP BY {group_col}
"""


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    flag_above: float = 3.6,
) -> DataFrame:
    """CCNet-style statistical quality score: train a unigram LM on the
    corpus itself (p(w) = count(w) / total words) and score each document
    by mean surprisal −Σ ln p(w) / n — high = rare-token-heavy
    (gibberish, boilerplate soup), low = repetitive. `flagged` marks docs
    above `flag_above` nats. (CCNet filters on wiki-LM perplexity; the
    corpus-trained unigram form keeps it self-contained and exact.)

    Scale: explode → one map-side-combinable word-count agg, then the
    words stream joins the vocabulary WITHOUT a broadcast hint (web-scale
    vocabularies outgrow a forced broadcast build; AQE promotes small
    ones at runtime), then one per-doc agg. Every term of the surprisal
    sum is the same sign, so reassociation across partitionings stays in
    the last ulps — no cancellation class."""
    words = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = wc.agg(F.sum("c").cast("double").alias("t"))
    per_doc = (
        words.join(wc, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            (-F.sum(F.log(F.col("c") / F.col("t")))).alias("total_surprisal"),
        )
    )
    ms = F.col("total_surprisal") / F.col("n_words")
    return per_doc.select(
        "doc_id",
        "n_words",
        ms.alias("mean_surprisal"),
        (ms > flag_above).alias("flagged"),
    )


def unigram_surprisal_sql(flag_above: float = 3.6) -> str:
    return f"""
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, count(*) AS c FROM words GROUP BY w),
scored AS (
  SELECT doc_id, count(*) AS n_words,
         -sum(ln(wc.c / (SELECT CAST(sum(c) AS DOUBLE) FROM wc))) AS total_surprisal
  FROM words JOIN wc USING (w) GROUP BY doc_id
)
SELECT doc_id, n_words, total_surprisal / n_words AS mean_surprisal,
       total_surprisal / n_words > {flag_above} AS flagged
FROM scored
"""


def chunk_windows(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunker for context-window prep (RAG indexing,
    long-doc training): token windows of `width` every `stride` tokens
    (overlap = width − stride), final partial window kept with its true
    length. One row per (doc, chunk_idx) with the chunk text and its md5.

    Pure per-doc projection + explode — no shuffle, scales with input
    splits. The chunk count per doc is ⌈n/stride⌉-ish, so output rows ≈
    corpus tokens / stride — linear, never quadratic."""
    if stride <= 0 or width <= 0 or stride > width:
        raise ValueError("need 0 < stride <= width")
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = F.floor((n - 1) / F.lit(stride)).cast("int") + 1
    # filter BEFORE building the sequence: sequence(0, -1) would step
    # DOWNWARD ([0, -1] — two phantom chunks), not produce an empty array.
    # split() never yields size 0 today (split('', ' ') = ['']), but the
    # guard must not invert its intent if tokenization ever changes.
    chunks = docs.filter(n > 0).select(
        "doc_id",
        words.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, width)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


def chunk_windows_sql(width: int = 64, stride: int = 48) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
idx AS (
  SELECT doc_id, w,
         unnest(range(0, CAST(floor((n - 1) / {stride}) AS BIGINT) + 1)) AS chunk_idx
  FROM base WHERE n > 0
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       len(list_slice(w, chunk_idx * {stride} + 1, chunk_idx * {stride} + {width})) AS n_tokens,
       md5(array_to_string(list_slice(w, chunk_idx * {stride} + 1, chunk_idx * {stride} + {width}), ' ')) AS chunk_md5
FROM idx
"""


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Cross-source duplication matrix: for each source pair (a < b), how
    many distinct `width`-token chunks they share, plus each side's
    distinct-chunk total — the curation question "how much of B is
    already in A" before mixing sources into a training run.

    Scale shape: chunk-hash inverted index (distinct (chunk, source)),
    then a self-equi-join ON THE CHUNK HASH — pair rows are bounded by
    sources-per-chunk², never corpus²; the final matrix is #sources²
    rows. Same index discipline as the n-gram Jaccard join."""
    chunks = chunk_windows(docs, text_col=text_col, width=width, stride=width)
    cs = (
        docs.select("doc_id", "source")
        .join(chunks, "doc_id")
        .select("source", "chunk_md5")
        .distinct()
        # r10: cs feeds BOTH self-join sides and the totals — without a
        # mark the chunk pipeline (tokenize + md5 + join + distinct over
        # the corpus) re-ran once per consumer (4 copies in the plan, 4
        # corpus passes at scale; ~25 s of task time at sf0.1, measured).
        # An AQE-eager localCheckpoint is a SEQUENTIAL materialization
        # (persist-before-fan-out, the llm_dup_triangles seqmat class):
        # cs computes once (~#sources x distinct-chunks compact rows)
        # and every consumer reads the stored RDD.
        .localCheckpoint(eager=False)
    )
    totals = cs.groupBy("source").agg(F.count(F.lit(1)).alias("n_chunks"))
    a = cs.select(F.col("source").alias("src_a"), "chunk_md5")
    b = cs.select(F.col("source").alias("src_b"), "chunk_md5")
    shared = (
        a.join(b, "chunk_md5")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    ta = totals.select(F.col("source").alias("src_a"), F.col("n_chunks").alias("chunks_a"))
    tb = totals.select(F.col("source").alias("src_b"), F.col("n_chunks").alias("chunks_b"))
    return (
        shared.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select("src_a", "src_b", "shared_chunks", "chunks_a", "chunks_b")
    )


def source_overlap_sql(width: int = 8) -> str:
    return f"""
WITH chunks AS ({chunk_windows_sql(width=width, stride=width)}),
cs AS (
  SELECT DISTINCT d.source, c.chunk_md5
  FROM documents d JOIN chunks c USING (doc_id)
),
totals AS (SELECT source, count(*) AS n_chunks FROM cs GROUP BY source),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_chunks
  FROM cs a JOIN cs b ON a.chunk_md5 = b.chunk_md5 AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.src_a, s.src_b, s.shared_chunks,
       ta.n_chunks AS chunks_a, tb.n_chunks AS chunks_b
FROM shared s
JOIN totals ta ON ta.source = s.src_a
JOIN totals tb ON tb.source = s.src_b
"""


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 5_000,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture sampling by TOKEN budget: per source, documents are
    taken in deterministic md5(id) order until the source's token budget
    is exhausted (a doc is kept iff the running token total INCLUDING it
    fits). This is how a training mix is actually specified — "20M tokens
    of web, 5M of code" — rather than by document rates; hash order makes
    the selection stable across runs/engines/retries, and raising a
    budget only APPENDS documents to that source's selection.

    Plan shape: one shuffle on the group key for the per-source running
    sum (Window partitionBy source) — the window partitions are per-
    source slices, bounded and parallel across sources; no global sort,
    no driver state. At 100 TB with few sources the window key is
    low-cardinality: pre-aggregate per (source, md5-prefix) ranges or
    salt the running sum in two phases if a single source dominates."""
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split(F.col(text_col), " "))
    budget = F.lit(default_budget)
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(group_col) == src, F.lit(b)).otherwise(budget)
    order_key = F.md5(F.concat(F.lit("mix_"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            id_col,
            group_col,
            n_tokens.alias("n_tokens"),
            budget.alias("token_budget"),
            order_key.alias("order_key"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("keep", F.col("cum_tokens") <= F.col("token_budget"))
        .drop("order_key")
    )


def token_budget_mix_sql(
    budgets: dict[str, int],
    default_budget: int = 5_000,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    if budgets:
        branches = " ".join(
            f"WHEN {group_col} = '{_sql_str(src)}' THEN {b}"
            for src, b in sorted(budgets.items())
        )
        budget = f"CASE {branches} ELSE {default_budget} END"
    else:
        budget = str(default_budget)  # zero WHEN branches is invalid SQL
    return f"""
WITH scored AS (
  SELECT {id_col}, {group_col},
         len(string_split(text, ' ')) AS n_tokens,
         CAST({budget} AS INT) AS token_budget,
         md5('mix_' || CAST({id_col} AS VARCHAR)) AS order_key
  FROM documents
)
SELECT {id_col}, {group_col}, n_tokens, token_budget,
       CAST(sum(n_tokens) OVER (PARTITION BY {group_col} ORDER BY order_key
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       sum(n_tokens) OVER (PARTITION BY {group_col} ORDER BY order_key
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= token_budget AS keep
FROM scored
"""


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval over the corpus for a bag-of-terms query — the
    lexical-search half of a curation/RAG pipeline (select documents
    about X). Standard Robertson/Sparck-Jones BM25:

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))

    Plan shape: one explode of term-filtered tokens → (doc, term) tf agg
    (one shuffle on doc_id); df per term and the (N, avgdl) scalars are
    term-count-sized aggregates that broadcast back; final top-k is
    orderBy().limit(k) — TakeOrderedAndProject, no global sort, with
    rank assigned over only the ≤k surviving rows. At 100 TB the tf
    table carries only docs containing ≥1 query term."""
    for t in query_terms:
        if not t.isalnum():
            raise ValueError(f"query term {t!r} must be alphanumeric")
    from pyspark.sql.window import Window

    toks = docs.select(
        id_col,
        F.size(F.split(F.col(text_col), " ")).alias("doclen"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    scalars = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("doclen").alias("doclen"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            id_col,
            (idf * F.col("tf") * (k1 + 1.0) / denom).alias("term_score"),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(id_col, "score", "rank")


def bm25_topk_sql(
    query_terms: list[str], k: int = 20, k1: float = 1.2, b: float = 0.75
) -> str:
    terms = ", ".join(f"'{_sql_str(t)}'" for t in query_terms)
    return f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS doclen,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
scalars AS (
  SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, first(doclen) AS doclen
  FROM toks WHERE term IN ({terms}) GROUP BY 1, 2
),
df_t AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.doclen / s.avgdl))) AS score
  FROM tf JOIN df_t USING (term) CROSS JOIN scalars s
  GROUP BY 1
),
top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {k})
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
FROM top
"""


def dsir_weights(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    buckets: int = 512,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    represent each document as a bag of HASHED unigram+bigram features,
    fit two Laplace-smoothed bag-of-words models — p over the TARGET
    slice (`target_pred`, e.g. the domain you want more of) and q over
    the whole corpus — and score each document by its log importance
    weight  log w(x) = Σ_f n_f·(ln p_f − ln q_f).  Resampling by these
    weights tilts a raw corpus toward the target domain; this operator
    emits the weights plus the two per-doc log-likelihood sums so the
    caller can threshold/sample however they like.

    Engine-portability: feature hashing is md5-derived (md5_bucket — the
    NOTES oracle-portability rule), and the two log-likelihood sums are
    same-sign (every ln of a probability is negative) so their values
    survive reassociation; `log_weight` is their difference and is only
    near zero for documents equidistant from both models — ties feed no
    ranking here (NOTES ln-ranking trap: weights are emitted as data,
    ordered by doc_id).

    Scale shape: one explode over tokens (map-side), two global
    `buckets`-row count aggregations (map-side combinable, output is
    O(buckets) ≪ data), the ratio table broadcast (≤ a few KB), then one
    per-doc sum — no shuffle wider than the per-doc groupBy. At 100 TB
    the feature stream dominates; it is scanned exactly twice (model fit
    + scoring) and never joined against itself.
    """
    # r10: tokenize ONCE into a projected column. The previous form
    # re-inlined `split(lower(text), ' ')` inside the transform lambda;
    # interpreted HOF evaluation re-ran lower+split per element, and the
    # measured feats stage halved (0.68-0.85 → 0.40-0.44 s warm at
    # sf0.1, ~22 → ~11 s of task time per pass) with the hoisted array.
    # Values are bit-identical (same split, same concat order).
    bigrams = F.when(
        F.size(F.col("_ws")) >= 2,
        F.expr(
            "transform(sequence(1, size(_ws) - 1),"
            " i -> concat(element_at(_ws, i), '_',"
            "             element_at(_ws, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the target flag is evaluated on the doc row BEFORE the explode —
    # no id join anywhere; the feature stream carries a boolean
    feats = docs.select(
        "doc_id",
        target_pred.alias("is_t"),
        F.split(F.lower(F.col(text_col)), " ").alias("_ws"),
    ).select(
        "doc_id",
        "is_t",
        F.explode(F.concat(F.col("_ws"), bigrams)).alias("f"),
    ).select("doc_id", "is_t", md5_bucket(F.col("f"), "dsir", buckets).alias("bucket"))

    # both models from ONE conditional-count pass; totals derive from the
    # buckets-row counts table (a second full scan would be pure waste)
    counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    ).localCheckpoint(eager=False)  # consumed twice (ratio + totals): one corpus pass, not two
    totals = counts.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))

    spark = docs.sparkSession
    spine = spark.range(buckets).select(F.col("id").alias("bucket"))
    b = float(buckets)
    ratio = (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.log((F.col("ct") + 1.0) / (F.col("nt") + F.lit(b))).alias("ln_p"),
            F.log((F.col("cr") + 1.0) / (F.col("nr") + F.lit(b))).alias("ln_q"),
        )
    )
    return (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("ln_p").alias("target_ll"),
            F.sum("ln_q").alias("raw_ll"),
        )
        .select(
            "doc_id",
            "n_feats",
            "target_ll",
            "raw_ll",
            (F.col("target_ll") - F.col("raw_ll")).alias("log_weight"),
            (F.col("target_ll") > F.col("raw_ll")).alias("selected"),
        )
    )


def dsir_weights_sql(target_pred_sql: str, buckets: int = 512) -> str:
    bucket = md5_bucket_sql("f", "dsir", buckets)
    return f"""
WITH toks AS (
  SELECT doc_id, ({target_pred_sql}) AS is_t, string_split(lower(text), ' ') AS w
  FROM documents
),
feats AS (
  SELECT doc_id, is_t, {bucket} AS bucket
  FROM (
    SELECT doc_id, is_t, unnest(list_concat(
             w, list_transform(range(len(w) - 1), i -> w[i+1] || '_' || w[i+2])
           )) AS f
    FROM toks
  )
),
counts AS (
  SELECT bucket,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM feats GROUP BY 1
),
totals AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM counts),
ratio AS (
  SELECT s.bucket,
         ln((coalesce(c.ct, 0) + 1.0) / (t.nt + {buckets}.0)) AS ln_p,
         ln((coalesce(c.cr, 0) + 1.0) / (t.nr + {buckets}.0)) AS ln_q
  FROM (SELECT unnest(range({buckets})) AS bucket) s
  LEFT JOIN counts c USING (bucket)
  CROSS JOIN totals t
)
SELECT doc_id, count(*) AS n_feats,
       sum(ln_p) AS target_ll, sum(ln_q) AS raw_ll,
       sum(ln_p) - sum(ln_q) AS log_weight,
       sum(ln_p) > sum(ln_q) AS selected
FROM feats JOIN ratio USING (bucket)
GROUP BY doc_id
"""


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    divisor: int = 32,
) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER token i
    whenever md5(token_i) lands in bucket 0 of `divisor` — so boundaries
    are decided by content alone, and inserting or deleting text shifts
    only the chunks it touches (fixed-width chunking reflows everything
    downstream — the reason dedup-friendly storage and diff transfer use
    CDC). Expected chunk length = `divisor` tokens. This is the
    single-token threshold member of the CDC family (rsync/LBFS
    lineage); a windowed gear hash changes the boundary test, not the
    dataflow.

    Per chunk: (doc_id, chunk_idx, start_pos, n_tokens, chunk_md5) with
    chunk_md5 over the space-joined token slice — sub-document dedup
    keys robust to edits.

    Scale shape: boundary flags are map-side array math; the running
    boundary count is ONE window exchange partitioned by doc (bounded
    frames, parallel across docs); chunk text is recovered by slicing
    the doc's own token array after a doc-key join — token order never
    depends on aggregation order (no collect_list), so the digest is
    engine-deterministic."""
    toks = F.split(F.col(text_col), " ")
    from pyspark.sql.window import Window

    flags = docs.select(
        "doc_id",
        F.posexplode(toks).alias("pos", "tok"),
    ).select(
        "doc_id",
        "pos",
        (md5_bucket(F.col("tok"), "cdc", divisor) == 0).cast("int").alias("is_boundary"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunk_of = F.coalesce(F.sum("is_boundary").over(w_prev), F.lit(0))
    spans = (
        flags.withColumn("chunk_idx", chunk_of)
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.min("pos").alias("start0"),  # 0-based
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return (
        spans.join(docs.select("doc_id", toks.alias("toks")), "doc_id")
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("start0") + 1).cast("int").alias("start_pos"),  # 1-based out
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("toks"), F.col("start0") + 1, F.col("n_tokens"))
                )
            ).alias("chunk_md5"),
        )
    )


def cdc_chunks_sql(divisor: int = 32) -> str:
    bucket = md5_bucket_sql("tok", "cdc", divisor)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
flags AS (
  SELECT doc_id, pos, CASE WHEN {bucket} = 0 THEN 1 ELSE 0 END AS is_boundary
  FROM (
    SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
    FROM toks
  )
),
numbered AS (
  SELECT doc_id, pos,
         coalesce(sum(is_boundary) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
  FROM flags
),
spans AS (
  SELECT doc_id, chunk_idx, min(pos) AS start0, count(*) AS n_tokens
  FROM numbered GROUP BY 1, 2
)
SELECT s.doc_id,
       CAST(s.chunk_idx AS INTEGER) AS chunk_idx,
       CAST(s.start0 + 1 AS INTEGER) AS start_pos,
       CAST(s.n_tokens AS INTEGER) AS n_tokens,
       md5(array_to_string(t.toks[s.start0 + 1 : s.start0 + s.n_tokens], ' ')) AS chunk_md5
FROM spans s JOIN toks t USING (doc_id)
"""


def hash_embed(
    docs: DataFrame,
    text_col: str = "text",
    dims: int = 64,
) -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick,
    Weinberger et al. 2009): v[j] = Σ_{tokens t: bucket(t)=j} sign(t),
    L2-normalized — a model-free dense representation good enough for
    cheap clustering / near-dup blocking / ANN warm-starts, computable
    at 100 TB with zero trained artifacts. Bucket and sign both derive
    from md5 (portability rule), so vectors are bit-identical across
    engines: components are exact integer sums; the only IEEE ops are
    one sqrt and one division per component.

    Plan shape: explode tokens → ONE groupBy(doc) with `dims`
    conditional integer sums (map-side combinable; the wide-agg
    branchless lesson from simhash applies — these are sums of ±1/0,
    no nested CASE trees) → normalize in the projection. No joins, no
    second pass."""
    # ONE md5 per token: bucket from hex chars 1-8, sign from the parity
    # of char 9 — independent bits of the same digest (a second salted
    # digest measured ~2× the md5 cost for zero statistical gain).
    # Everything below is single-parse expr STRINGS: the 64 conditional
    # sums + 64-term norm + 64 array elements built through the Column
    # API cost ~2.3s of py4j round trips per call vs 0.25s of actual
    # execution (the simhash plan-build lesson, NOTES.md).
    md5h = "md5(concat('hemb', t))"
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).select(
        "doc_id",
        F.expr(f"pmod(CAST(conv(substring({md5h}, 1, 8), 16, 10) AS BIGINT), {dims})").alias("b"),
        F.expr(f"pmod(CAST(conv(substring({md5h}, 9, 1), 16, 10) AS BIGINT), 2) * 2 - 1").alias("s"),
    )
    sums = toks.groupBy("doc_id").agg(
        F.expr("count(1) AS n_tokens"),
        *[F.expr(f"sum(CASE WHEN b = {j} THEN s ELSE 0 END) AS v_{j}") for j in range(dims)],
    )
    norm_sq = " + ".join(f"v_{j} * v_{j}" for j in range(dims))
    # norm MUST be materialized as its own attribute before the element
    # expressions reference it: inlining the expression builds 2·dims
    # copies of the 64-term sum+sqrt into the projection (duplication
    # Catalyst never deduplicates), which blows past codegen limits the
    # moment a Generate sits above it (measured 4.4s → 26.9s at sf0.1
    # when the checked output added posexplode). As a separate non-cheap
    # alias used 65×, CollapseProject keeps the two-projection shape and
    # norm is computed once per row.
    normed = sums.withColumn("norm", F.expr(f"sqrt(CAST({norm_sq} AS DOUBLE))"))
    vec = ", ".join(
        f"CAST(CASE WHEN norm > 0 THEN v_{j} / norm ELSE 0.0D END AS FLOAT)"
        for j in range(dims)
    )
    return normed.select("doc_id", "n_tokens", "norm", F.expr(f"array({vec})").alias("embedding"))


def hash_embed_sql(dims: int = 64) -> str:
    bucket = f"CAST(('0x' || substr(md5('hemb' || t), 1, 8)) AS BIGINT) % {dims}"
    sign = "(CAST(('0x' || substr(md5('hemb' || t), 9, 1)) AS BIGINT) % 2 * 2 - 1)"
    comps = ",\n         ".join(
        f"sum(CASE WHEN b = {j} THEN s ELSE 0 END) AS v_{j}" for j in range(dims)
    )
    normsq = " + ".join(f"v_{j} * v_{j}" for j in range(dims))
    vec = ", ".join(
        f"CAST(CASE WHEN norm > 0 THEN v_{j} / norm ELSE 0.0 END AS FLOAT)"
        for j in range(dims)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {bucket} AS b, {sign} AS s
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
),
sums AS (
  SELECT doc_id, count(*) AS n_tokens,
         {comps}
  FROM toks GROUP BY doc_id
),
normed AS (SELECT *, sqrt(CAST({normsq} AS DOUBLE)) AS norm FROM sums)
SELECT doc_id, n_tokens, norm, [{vec}] AS embedding
FROM normed
"""


# ---------------------------------------------------------------------------
# Bigram language-model quality scoring (CCNet-style LM filter)
# ---------------------------------------------------------------------------

def bigram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: float = 0.5
) -> DataFrame:
    """Per-document corpus-trained bigram LM log-likelihood — the
    KenLM-perplexity quality signal of CCNet (Wenzek et al. 2020),
    self-trained so it needs no external model: documents whose word
    transitions are unusual under the corpus's own bigram statistics
    (boilerplate, tag soup, wrong-language fragments) score low.

    P(w2|w1) = (c(w1,w2) + k) / (c(w1→) + k·V) with add-k smoothing over
    the bigram-context vocabulary; the checked output carries n_bigrams
    and the SAME-SIGN log-likelihood sum (never a difference or a
    rank on it — the dsir/ln lessons in NOTES.md: same-sign sums are
    forward-stable and libm last-ulp noise stays ~1e-15 relative).

    Plan shape (r6, the third formulation): the document stream shuffles
    ONCE as per-doc DISTINCT bigram counts, then the corpus statistics
    are UNBOUNDED WINDOW SUMS over that same frame — c(w1,w2) =
    sum(n) over (partition by gk), c(w1→) = sum(n) over (partition by
    ck) — instead of materializing a model relation and joining it
    back. Four exchanges total (per_doc agg, two window repartitions,
    final per-doc agg) vs seven for the model-join shape; the window
    sorts replace the SMJ sorts the joins paid anyway, so the win holds
    at corpus scale, not just at the toy per-stage floor (2.47→1.36 s
    warm at sf0.1, bit-path-identical logp). History: formulation 1
    joined raw gram rows against c2/c1 (two corpus-sized shuffle
    joins, 3.2× wall at 10× data); formulation 2 built the model
    relation (2.0×); this one subsumes the model into the frame.
    sum_logp weights each distinct bigram's logp by its in-doc count
    (one exact-rounded multiply, mirrored in the twin)."""
    from pyspark.sql.window import Window
    # r10: tokenize ONCE into a projected column instead of re-inlining
    # `split(text, ' ')` inside the transform lambda (interpreted HOF
    # evaluation re-ran the split per element — the dsir_weights lesson,
    # measured ~2x on the gram stage). Values bit-identical.
    grams = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_ws")
    ).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "CASE WHEN size(_ws) < 2 THEN array()"
                " ELSE transform(sequence(0, size(_ws) - 2),"
                " i -> struct(_ws[i] AS w1,"
                " _ws[i + 1] AS w2)) END"
            )
        ).alias("g"),
    ).select(
        id_col,
        F.xxhash64(F.col("g.w1"), F.col("g.w2")).alias("gk"),
        F.xxhash64(F.col("g.w1")).alias("ck"),
        F.xxhash64(F.col("g.w2")).alias("wk"),
    )
    # join keys are xxhash64 of the words, never the words — the oracle-
    # portability pattern (b): the checked output depends only on key
    # EQUALITY (no keys are emitted), so each engine hashes its own way
    # and the shuffles carry fixed 8-byte keys instead of arbitrary-
    # length text at corpus scale. wk is functionally dependent on gk
    # (same w2 within a gram group), so min() is a constant pick.
    # lazily materialized: the vocab branch below reads per_doc too, and
    # WITHOUT the checkpoint Catalyst prunes min(wk) out of the main
    # branch's aggregate — the two branches' plans then differ, exchange
    # reuse never fires, and the corpus is tokenized+exploded TWICE
    # (measured: the whole vocab subtree re-ran as its own scan)
    per_doc = grams.groupBy(id_col, "gk", "ck").agg(
        F.count("*").alias("n"), F.min("wk").alias("wk")
    ).localCheckpoint(eager=False)
    # vocab stays IN the DAG as a broadcast 1-row frame: a driver-side
    # count() here would eagerly evaluate the whole bigram pipeline a
    # second time (tokenize twice, one extra job per call).
    # countDistinct(hash(w2)) == countDistinct(w2) under the same
    # collision-free assumption every hash join already makes; distinct
    # wk over per_doc == distinct wk over the bigram vocabulary.
    vocab = per_doc.agg(F.count_distinct(F.col("wk")).cast("double").alias("vocab"))
    wg = Window.partitionBy("gk")
    wc = Window.partitionBy("ck")
    scored = (
        per_doc.withColumn("c2", F.sum("n").over(wg))
        .withColumn("c1", F.sum("n").over(wc))
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "n",
            F.log(
                (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("vocab"))
            ).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("logp")).alias("sum_logp"),
    )


def bigram_lm_score_sql(k: float = 0.5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
  FROM toks, LATERAL unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
per_doc AS (SELECT doc_id, w1, w2, count(*) AS n FROM grams GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c2 FROM per_doc GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS vocab FROM c2),
model AS (
  SELECT c2.w1, c2.w2,
         ln((c2.c2 + {k}) / (c1.c1 + {k} * (SELECT CAST(vocab AS DOUBLE) FROM v))) AS logp
  FROM c2 JOIN c1 ON c2.w1 = c1.w1
)
SELECT p.doc_id,
       CAST(sum(p.n) AS BIGINT) AS n_bigrams,
       sum(p.n * m.logp) AS sum_logp
FROM per_doc p JOIN model m ON p.w1 = m.w1 AND p.w2 = m.w2
GROUP BY 1
"""


def boilerplate_strip(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate removal — the REMOVAL pass that `chunk_dedup` only
    reports on (CCNet's per-shard duplicated-paragraph strip, Dolma's
    paragraph dedup): segment each document into `width`-word chunks,
    find chunks shared by ≥ `min_docs` distinct documents (headers,
    footers, nav text — corpus-frequent segments), and emit each doc
    with those segments removed. Checked output is scalar-only:
    (n_chunks, n_removed, cleaned_chars, md5(cleaned_text)) — the md5
    pins the full reassembled string without emitting it.

    Scale shape: explode → map-side-combinable doc-frequency agg →
    LEFT ANTI join back on xxhash64(chunk) (fixed 8-byte shuffle keys;
    keys are compared, never emitted, so each engine hashes its own
    way) → per-doc reassembly agg. The boilerplate relation is bounded
    by duplicated-chunk cardinality, not corpus size, and broadcasts
    when small. The chunk subtree feeds both sides of the anti-join, so
    it is lazily materialized (the self-join-subtree rule) instead of
    exploding the corpus twice."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(width)).cast("long")
    # r10: tokenize once into _ws for the chunk explode (HOF-hoist
    # idiom; the inlined split re-ran per chunk position, O(tokens²));
    # the scalar `totals` branch keeps the direct split — one eval per
    # row either way. Values bit-identical.
    ws = F.col("_ws")
    n_chunks_ws = F.ceil(F.size(ws) / F.lit(width)).cast("long")
    chunk_structs = F.transform(
        F.sequence(F.lit(0), (n_chunks_ws - 1).cast("int")),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(ws, i * width + 1, width)).alias("chunk"),
        ),
    )
    ch = (
        docs.select(id_col, F.split(F.col(text_col), " ").alias("_ws"))
        .select(id_col, F.explode(chunk_structs).alias("c"))
        .select(
            id_col,
            F.col("c.pos").alias("pos"),
            F.col("c.chunk").alias("chunk"),
            F.xxhash64(F.col("c.chunk")).alias("ck"),
        )
        .localCheckpoint(eager=False)  # feeds freq agg AND anti-join probe
    )
    bp = (
        ch.groupBy("ck")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("ck")
    )
    kept = ch.join(bp, "ck", "left_anti")
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("cleaned"),
    )
    totals = docs.select(id_col, n_chunks.alias("n_chunks"))
    cleaned = F.coalesce(F.col("cleaned"), F.lit(""))
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_chunks",
        (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.length(cleaned).cast("long").alias("cleaned_chars"),
        F.md5(cleaned).alias("cleaned_md5"),
    )


def boilerplate_strip_sql(width: int = 8, min_docs: int = 2) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
chunks AS (
  SELECT doc_id, i AS pos,
         array_to_string(l[(i * {width}) + 1 : (i + 1) * {width}], ' ') AS chunk
  FROM toks, UNNEST(range(0, CAST(ceil(len(l) / {width}.0) AS BIGINT))) AS t(i)
),
bp AS (
  SELECT chunk FROM chunks GROUP BY 1
  HAVING count(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT c.doc_id, c.pos, c.chunk FROM chunks c
  WHERE NOT EXISTS (SELECT 1 FROM bp WHERE bp.chunk = c.chunk)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY pos) AS cleaned
  FROM kept GROUP BY 1
),
totals AS (
  SELECT doc_id,
         CAST(ceil(len(string_split(text, ' ')) / {width}.0) AS BIGINT) AS n_chunks
  FROM documents
)
SELECT t.doc_id, t.n_chunks,
       t.n_chunks - coalesce(p.n_kept, 0) AS n_removed,
       CAST(length(coalesce(p.cleaned, '')) AS BIGINT) AS cleaned_chars,
       md5(coalesce(p.cleaned, '')) AS cleaned_md5
FROM totals t LEFT JOIN per_doc p USING (doc_id)
"""


def fuzzy_word_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_dist: int = 2,
    min_len: int = 3,
) -> DataFrame:
    """Vocabulary-level fuzzy matching — every pair of corpus words
    within Levenshtein distance `max_dist` (1 or 2), the candidate
    generator behind spelling-variant normalization and fuzzy-key joins.

    Scale path: FastSS deletion neighborhoods (Bocek et al. 2007,
    "Fast Similarity Search in Large Dictionaries") — lev(a, b) ≤ k
    implies a's and b's ≤k-deletion neighborhoods intersect, so
    candidates come from an EQUI-join on deletion variants (≤ 1 + L +
    L² variants per word of length L) and `levenshtein()` verifies
    exactly; the vocabulary never cross-joins. The oracle twin IS the
    exhaustive O(|V|²) join, so the neighborhood scheme's recall is
    verified, not assumed (same stance as simhash_near_pairs).

    Exactness: strings and integer distances only."""
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_word_pairs supports max_dist 1 or 2")
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= min_len)
        .distinct()
    )
    # one-deletion variants of x (empty array for the empty string)
    d1 = (
        "CASE WHEN length({x}) >= 1 THEN transform(sequence(1, length({x})),"
        " i -> concat(substring({x}, 1, i - 1), substring({x}, i + 1, 1000000)))"
        " ELSE array() END"
    )
    variants = f"array_distinct(concat(array(w), {d1.format(x='w')}"
    if max_dist == 2:
        variants += f", flatten(transform({d1.format(x='w')}, u -> {d1.format(x='u')}))"
    variants += "))"
    wv = vocab.select("w", F.explode(F.expr(variants)).alias("v")).localCheckpoint(
        eager=False  # both sides of the candidate self-join
    )
    a, b = wv.alias("a"), wv.alias("b")
    cands = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.w") < F.col("b.w")))
        .select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .distinct()
    )
    return cands.select(
        "w1", "w2", F.levenshtein("w1", "w2").alias("dist")
    ).filter(F.col("dist") <= max_dist)


def fuzzy_word_pairs_sql(max_dist: int = 2, min_len: int = 3) -> str:
    """Exhaustive oracle: length-banded |V|² levenshtein join —
    deliberately NOT the deletion-neighborhood scheme, so Spark's
    candidate generation is recall-checked against ground truth."""
    return f"""
WITH words AS (
  SELECT DISTINCT UNNEST(string_split(text, ' ')) AS w FROM documents
),
vocab AS (SELECT w FROM words WHERE len(w) >= {int(min_len)})
SELECT a.w AS w1, b.w AS w2,
       CAST(levenshtein(a.w, b.w) AS INTEGER) AS dist
FROM vocab a JOIN vocab b
  ON a.w < b.w AND abs(len(a.w) - len(b.w)) <= {int(max_dist)}
WHERE levenshtein(a.w, b.w) <= {int(max_dist)}
"""


def ngram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document novelty score: the fraction of a doc's DISTINCT word
    n-grams whose first corpus occurrence (min doc_id) is this doc —
    the curation signal for ordering/weighting sources by how much new
    material each contributes (high duplication ⇒ low novelty), the
    per-doc complement of dup_spans' extent report.

    Scale shape: posexplode n-grams hashed to fixed-width xxhash64 keys
    (equality-only semantics — each engine hashes its own way), dedup to
    (doc, gram) grain, one min-agg on the gram key, one equi-join back,
    one per-doc count agg. Everything shuffles 8-byte keys; gram text
    never leaves the map side. Docs with fewer than n tokens keep a row
    (0 grams, novelty 0.0). novelty_pct is a single IEEE division of two
    exact integers — bit-identical cross-engine."""
    # r10: tokenize once into _ws (HOF-hoist idiom; the inlined split
    # re-ran per gram position, O(tokens²)); values bit-identical
    ws = F.col("_ws")
    # sequence(0, -1) DESCENDS in Spark — short docs must filter out
    # before the sequence, not rely on an empty range
    grams = F.transform(
        F.sequence(F.lit(0), (F.size(ws) - n).cast("int")),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i + 1, n))),
    )
    pg = (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_ws"))
        .filter(F.size(ws) >= n)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds the min-agg AND the join back
    )
    first = pg.groupBy("g").agg(F.min(id_col).alias("first_doc"))
    per_doc = (
        pg.join(first, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    novelty = F.when(
        F.col("n_grams") > 0,
        F.col("n_novel").cast("double") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            novelty.alias("novelty_pct"),
        )
    )


def ngram_novelty_sql(n: int = 8) -> str:
    """DuckDB twin on raw gram strings (equality-only; no shared hash)."""
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pg AS (
  SELECT DISTINCT doc_id, array_to_string(l[i + 1 : i + {n}], ' ') AS g
  FROM toks, UNNEST(range(0, greatest(len(l) - {n} + 1, 0))) AS t(i)
),
first AS (SELECT g, min(doc_id) AS first_doc FROM pg GROUP BY g),
per_doc AS (
  SELECT pg.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = pg.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM pg JOIN first f USING (g) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN coalesce(p.n_grams, 0) > 0
            THEN CAST(p.n_novel AS DOUBLE) / p.n_grams ELSE 0.0 END AS novelty_pct
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document character-distribution Shannon entropy — the
    gibberish/encoding-junk detector quality pipelines run beside
    length/stopword heuristics (low entropy ⇒ repeated filler, high ⇒
    random bytes; natural text sits in a stable band).

    H = log2(n) − (Σ c·log2(c))/n over per-char counts c — counts are
    exact integers, the Σ is an ORDERED fold (by char), and the output
    is floor-quantized to micro-bits (the repo's NOTES rule for any
    float that isn't a single division of shared integers), so the
    check is robust to last-ulp log/accumulation differences between
    engines. Scale shape: one explode (linear in corpus chars, ≤ ~100
    distinct groups per doc), two map-side-combinable aggs on the doc
    key — no joins."""
    chars = docs.select(
        id_col, F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy(id_col).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(ch, c))), 0D, "
            "(acc, s) -> acc + CAST(s.c AS DOUBLE) * log2(CAST(s.c AS DOUBLE)))"
        ).alias("clog"),
    )
    h = F.expr("log2(CAST(n AS DOUBLE)) - clog / CAST(n AS DOUBLE)")
    return per.select(
        id_col,
        F.col("n").alias("n_chars_total"),
        "n_distinct_chars",
        F.floor(h * 1_000_000).cast("long").alias("entropy_micro"),
    )


def char_entropy_sql() -> str:
    return """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars WHERE ch <> '' GROUP BY 1, 2
),
per AS (
  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct_chars,
         list_sum(list_transform(list(CAST(c AS DOUBLE) ORDER BY ch),
                                 x -> x * log2(x))) AS clog
  FROM counts GROUP BY 1
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars_total,
       CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
       CAST(floor((log2(CAST(n AS DOUBLE)) - clog / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
         AS entropy_micro
FROM per
"""


def temperature_mix(
    docs: DataFrame,
    total_budget_tokens: int = 10_000,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based source re-weighting (the multilingual-corpus
    sampling rule of XLM-R / mT5, arXiv:1911.02116 §3.1): a source's
    sampling weight is its token share raised to alpha < 1, flattening
    the head so low-resource sources aren't drowned. alpha is FIXED at
    0.5 because sqrt is an IEEE-754 correctly-rounded primitive — the
    one exponent whose per-engine pow() cannot diverge in the last ulp.

    Determinism: token counts are exact integer sums; share = one IEEE
    division of exact ints; weight = sqrt(share) (correctly rounded);
    the weight is floor-quantized to 1e-12 BIGINT before any further
    arithmetic, so the final allocation `budget * wq DIV sum(wq)` is
    pure integer math — bit-identical on any engine.

    Scale shape: one map-side-combinable groupBy on the source key, then
    a window over the SOURCE TABLE (rows = #sources, a constant — the
    single-partition WindowExec warning is about a k-row frame). No
    joins, no doc-level shuffle beyond the agg."""
    from pyspark.sql.window import Window

    per_src = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    per_src = per_src.withColumn("total_tokens", F.sum("n_tokens").over(w_all))
    wq = F.floor(
        F.sqrt(F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double"))
        * F.lit(1_000_000_000_000)
    ).cast("long")
    per_src = per_src.withColumn("weight_q", wq).withColumn(
        "sum_wq", F.sum("weight_q").over(w_all)
    )
    return per_src.select(
        group_col,
        "n_docs",
        "n_tokens",
        "weight_q",
        F.expr(f"CAST({total_budget_tokens}L * weight_q DIV sum_wq AS BIGINT)").alias(
            "alloc_tokens"
        ),
    )


def temperature_mix_sql(
    total_budget_tokens: int = 10_000,
    group_col: str = "source",
) -> str:
    return f"""
WITH per_src AS (
  SELECT {group_col},
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
weighted AS (
  SELECT *,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE))
                    * 1000000000000) AS BIGINT) AS weight_q
  FROM per_src
)
SELECT {group_col}, n_docs, n_tokens, weight_q,
       CAST({total_budget_tokens} * weight_q // sum(weight_q) OVER () AS BIGINT) AS alloc_tokens
FROM weighted
"""


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """MOSS winnowing (Schleimer, Wilkerson, Aiken, SIGMOD '03): hash
    every k-gram of words, then from each window of `w` consecutive
    k-gram hashes keep the minimum, breaking ties by the RIGHTMOST
    position. The distinct selected (position, hash) pairs are the
    document's fingerprint — guaranteed to share a fingerprint with any
    other doc it shares a (k+w−1)-token run with, which is the property
    plagiarism/copy detection at corpus scale relies on (and what the
    simpler global-min `rolling_fingerprint` cannot give).

    Engine-portable determinism: the (hash, rightmost-pos) argmin is
    encoded in ONE BIGINT — combined = h·2^21 + (2^21−1−pos) — so the
    window `min` is plain integer comparison on both engines (no struct
    ordering, no float). Positions are capped at 2^21−1 grams per doc;
    longer docs should be pre-chunked (chunk_windows), which winnowing
    composes with naturally.

    Scale shape: one explode (≈ corpus tokens), one shuffle on doc_id
    for the intra-doc window, then a distinct on the already-partitioned
    key — no joins, no driver state; linear at 100 TB."""
    if k <= 0 or w <= 0:
        raise ValueError("need k > 0 and w > 0")
    words = F.split(F.col(text_col), " ")
    # cap at the encoding's position budget (2^21−1): a longer doc gets
    # fingerprints for its first 2M grams instead of a corrupted argmin —
    # graceful, documented, and identical on both engines
    n_grams = F.least(
        F.greatest(F.size(words) - F.lit(k - 1), F.lit(0)), F.lit((1 << 21) - 1)
    )
    gram_hash = (
        "CAST(conv(substring(md5(array_join(slice(_w, i + 1, {k}), ' ')), 1, 8), 16, 10) "
        "AS BIGINT)"
    ).format(k=k)
    grams = (
        docs.filter(n_grams > 0)
        .select(
            "doc_id",
            words.alias("_w"),
            n_grams.alias("_ng"),
        )
        .select(
            "doc_id",
            "_ng",
            F.posexplode(
                F.expr(f"transform(sequence(0, _ng - 1), i -> {gram_hash})")
            ).alias("pos", "h"),
        )
        .select(
            "doc_id",
            "_ng",
            "pos",
            (F.col("h") * F.lit(1 << 21) + (F.lit((1 << 21) - 1) - F.col("pos"))).alias(
                "combined"
            ),
        )
    )
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # window start positions: 0 .. max(0, n_grams - w); a doc shorter than
    # one full window still emits one fingerprint (min over what exists)
    sel = (
        grams.withColumn("win_min", F.min("combined").over(win))
        .filter(F.col("pos") <= F.greatest(F.col("_ng") - F.lit(w), F.lit(0)))
        .select("doc_id", "win_min")
        .distinct()
    )
    return sel.select(
        "doc_id",
        (F.lit((1 << 21) - 1) - F.col("win_min") % F.lit(1 << 21)).alias("fp_pos"),
        (F.col("win_min") / F.lit(1 << 21)).cast("long").alias("fp_hash"),
    )


def winnowing_fingerprints_sql(k: int = 4, w: int = 5) -> str:
    # hlists is MATERIALIZED (r7 verdict task 7 — the BPE-twin fix):
    # without it DuckDB re-evaluates the whole O(ng) md5 list for EVERY
    # unnested position row (the list expression sits beside an unnest,
    # so it is repeated per output row) — O(ng²) md5 calls per doc,
    # ~17 s per twin at sf0.1. Materialized, each doc hashes its grams
    # once; the two equal-length unnests below zip row-wise, so each
    # combined row carries scalars only. Values are bit-identical: the
    # same hash/packing expressions over the same inputs.
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS _w,
         least(greatest(len(string_split(text, ' ')) - {k - 1}, 0), 2097151) AS _ng
  FROM documents
),
hlists AS MATERIALIZED (
  SELECT doc_id, _ng,
         list_transform(range(0, _ng),
           i -> CAST(('0x' || substr(md5(array_to_string(list_slice(_w, i + 1, i + {k}), ' ')), 1, 8)) AS BIGINT)
         ) AS hs
  FROM base WHERE _ng > 0
),
combined AS (
  SELECT doc_id, _ng,
         unnest(range(0, _ng)) AS pos,
         unnest(list_transform(range(0, _ng),
                i -> hs[i + 1] * 2097152 + (2097151 - i))) AS combined
  FROM hlists
),
sel AS (
  SELECT DISTINCT doc_id,
         min(combined) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS win_min
  FROM combined
  QUALIFY pos <= greatest(_ng - {w}, 0)
)
SELECT doc_id,
       CAST(2097151 - (win_min % 2097152) AS BIGINT) AS fp_pos,
       CAST(win_min // 2097152 AS BIGINT) AS fp_hash
FROM sel
"""


def vocab_growth(
    docs: DataFrame,
    text_col: str = "text",
    bucket_docs: int = 50,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct token
    types vs cumulative token occurrences, in doc_id order, reported per
    bucket of `bucket_docs` documents. The curve's flattening rate is the
    standard corpus-diversity diagnostic (a corpus whose vocab stops
    growing is repeating itself — a pre-training red flag that per-doc
    dedup misses).

    All-integer outputs (counts and exact cumulative sums) — no float
    hazard. Scale shape: one explode, a groupBy(token) min(doc_id) (the
    only big shuffle, map-side combinable), then per-bucket counts and a
    window cumsum over n_docs/bucket_docs rows. The final window is a
    single partition, but its input is already reduced to the bucket
    grain — size the bucket so curve points stay ≤ ~10^5 at any corpus."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    # exact integer division (doc_id ≥ 0, so Spark DIV == DuckDB //);
    # float division + cast would lose exactness past 2^53
    bucket = F.expr(f"doc_id DIV {bucket_docs}")
    per_bucket = toks.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_tokens_bucket")
    )
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    new_types = first_seen.groupBy(
        F.expr(f"first_doc DIV {bucket_docs}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new_types"))
    joined = per_bucket.join(new_types, "bucket", "left").select(
        "bucket",
        "n_tokens_bucket",
        F.coalesce("n_new_types", F.lit(0)).alias("n_new_types"),
    )
    from pyspark.sql.window import Window

    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        "n_tokens_bucket",
        "n_new_types",
        F.sum("n_tokens_bucket").over(cum).alias("cum_tokens"),
        F.sum("n_new_types").over(cum).alias("cum_vocab"),
    )


def vocab_growth_sql(bucket_docs: int = 50) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tok AS (SELECT * FROM toks WHERE token <> ''),
per_bucket AS (
  SELECT doc_id // {bucket_docs} AS bucket, count(*) AS n_tokens_bucket
  FROM tok GROUP BY 1
),
first_seen AS (
  SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1
),
new_types AS (
  SELECT first_doc // {bucket_docs} AS bucket, count(*) AS n_new_types
  FROM first_seen GROUP BY 1
)
SELECT p.bucket,
       p.n_tokens_bucket,
       COALESCE(n.n_new_types, 0) AS n_new_types,
       CAST(sum(p.n_tokens_bucket) OVER (ORDER BY p.bucket) AS BIGINT) AS cum_tokens,
       CAST(sum(COALESCE(n.n_new_types, 0)) OVER (ORDER BY p.bucket) AS BIGINT) AS cum_vocab
FROM per_bucket p LEFT JOIN new_types n ON p.bucket = n.bucket
"""


def source_kl_divergence(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source unigram KL divergence to the whole-corpus distribution,
    KL(P_src ‖ P_corpus) = Σ_t p log2(p/q) — the data-mixing diagnostic
    that tells you which sources are distributionally far from the blend
    (candidates for up/down-weighting in temperature_mix / dsir_weights).
    Every p-term's token also occurs in the corpus, so q > 0 always and
    the sum is finite and ≥ 0.

    Determinism follows the char_entropy pattern: counts are exact ints,
    the Σ is an ORDERED fold (by token) inside one aggregate, and the
    output is floor-quantized to micro-bits. The per-source fold
    collects that source's distinct vocabulary — bounded by |V| (≤ ~10^6
    for word vocabs), not by corpus size; the corpus-total counts arrive
    via a token-keyed join (map-side combinable aggs on both sides)."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    # ONE explode: corpus counts, source totals, and the grand total all
    # roll up from the (grp, token) relation — materialized once since
    # four branches reuse it (the repo's self-join-subtree rule)
    src_counts = (
        toks.groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint(eager=False)
    )
    corpus_counts = src_counts.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    src_totals = src_counts.groupBy("grp").agg(F.sum("c_st").alias("_ns_total"))
    totals = src_totals.agg(F.sum("_ns_total").alias("_n"))  # 1 row, broadcast
    joined = (
        src_counts.join(corpus_counts, "token")
        .join(src_totals, "grp")
        .crossJoin(F.broadcast(totals))
    )
    per = joined.groupBy("grp").agg(
        F.max("_ns_total").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(token, c_st, c_t, _ns_total, _n))), 0D, "
            "(acc, s) -> acc + CAST(s.c_st AS DOUBLE) / CAST(s._ns_total AS DOUBLE) * "
            "log2(CAST(s.c_st AS DOUBLE) * CAST(s._n AS DOUBLE) / "
            "(CAST(s._ns_total AS DOUBLE) * CAST(s.c_t AS DOUBLE))))"
        ).alias("_klsum"),
    )
    return per.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_types",
        F.floor(F.col("_klsum") * 1_000_000).cast("long").alias("kl_micro"),
    )


def source_kl_divergence_sql(group_col: str = "source") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp, unnest(string_split(text, ' ')) AS token FROM documents
),
tok AS (SELECT * FROM toks WHERE token <> ''),
src_counts AS (
  SELECT grp, token, count(*) AS c_st FROM tok GROUP BY 1, 2
),
corpus_counts AS (
  SELECT token, count(*) AS c_t FROM tok GROUP BY 1
),
totals AS (SELECT count(*) AS n FROM tok),
src_totals AS (SELECT grp, sum(c_st) AS ns FROM src_counts GROUP BY 1)
SELECT s.grp AS {group_col},
       CAST(max(st.ns) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       CAST(floor(list_sum(list_transform(
         list(struct_pack(token := s.token, c_st := s.c_st, c_t := c.c_t,
                          ns := st.ns, n := t.n) ORDER BY s.token),
         x -> CAST(x.c_st AS DOUBLE) / CAST(x.ns AS DOUBLE) *
              log2(CAST(x.c_st AS DOUBLE) * CAST(x.n AS DOUBLE) /
                   (CAST(x.ns AS DOUBLE) * CAST(x.c_t AS DOUBLE)))
       )) * 1000000) AS BIGINT) AS kl_micro
FROM src_counts s
JOIN corpus_counts c ON s.token = c.token
JOIN src_totals st ON s.grp = st.grp
CROSS JOIN totals t
GROUP BY 1
"""


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """One BPE merge-selection step (Sennrich et al. 2016): count adjacent
    character-pair frequencies across the corpus, weighted by word
    frequency, and rank the top-k merge candidates. Tokenizer training at
    corpus scale is exactly this groupBy repeated per merge — this
    operator is the distributed inner loop.

    Scale shape: the pair explosion runs over the DISTINCT-word relation
    (|V| rows, orders of magnitude smaller than the corpus), weighted by
    exact word counts — never over raw text. Ranking is exact-integer
    count with a lexicographic tiebreak, planned as
    TakeOrderedAndProject (no global sort)."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = wc.filter(F.length("word") >= 2).select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> concat(substring(word, i, 1), ' ', substring(word, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    counted = pairs.groupBy("pair").agg(F.sum("wc").alias("pair_count"))
    topk = counted.orderBy(F.col("pair_count").desc(), F.col("pair")).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "pair", "pair_count", "rank"
    )


def bpe_pair_counts_sql(k: int = 50) -> str:
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, count(*) AS wc FROM words WHERE word <> '' GROUP BY 1
),
pairs AS (
  SELECT wc,
         unnest(list_transform(range(1, len(word)),
                i -> substr(word, CAST(i AS INT), 1) || ' ' || substr(word, CAST(i AS INT) + 1, 1))) AS pair
  FROM wc WHERE len(word) >= 2
),
counted AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS pair_count FROM pairs GROUP BY 1
)
SELECT pair, pair_count, CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank
FROM counted
ORDER BY pair_count DESC, pair
LIMIT {k}
"""


# fixed 8-merge BPE table learned from the corpus at sf0.01 (creation-order
# greedy pair counting, ties broken lexicographically) — a tokenizer is a
# FIXED artifact applied at scale, so the merge list is a plan literal,
# never data-dependent at encode time. Includes a compound merge (m+er)
# so multi-char symbol handling is exercised.
BPE_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]


def bpe_encode(
    docs: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Distributed BPE tokenizer APPLICATION (the encode side of
    bpe_pair_counts' learn step): apply a fixed merge list in creation
    order, each merge fully applied corpus-wide before the next —
    Sennrich et al. 2016's learn-time semantics, deterministic on any
    engine.

    The whole operator is a chain of string `replace` calls in one
    codegen projection — zero joins, zero shuffles, linear at 100 TB.
    The trick making plain replace() correct BPE is the boundary
    encoding: a word becomes '·' + sym + '··' + sym + ... + '·' (double
    markers BETWEEN symbols, single at the edges), and merge (a,b) is
    replace('·a··b·' → '·ab·'). Each match consumes one marker from each
    side's double boundary and re-supplies edge markers, so the
    invariant survives every merge and left-to-right non-overlapping
    replace (identical in Spark and DuckDB) reproduces BPE's
    leftmost-first scan — including odd-length runs like 'a a a'.

    Output per doc: BPE token count and the md5 of the fully-encoded
    text (a strong whole-output check with no array columns).

    Input texts are stripped of U+00B7 '·' first: the character IS the
    boundary sentinel, and a literal one in the input would corrupt the
    symbol boundaries identically on both engines — an undetectable
    silent break. Stripping is the documented contract (mirrored in the
    twin and the pytest reference encoder); real tokenizers reserve
    their sentinel bytes the same way. Convention: a zero-length word
    (consecutive/trailing spaces, or a word that was all sentinels)
    still counts 1 toward n_tokens_bpe — both engines share the
    boundary-count formula, so the convention is engine-invariant."""
    if merges is None:
        merges = BPE_MERGES
    # '·' between every char (double between symbols), single at word edges
    # (?s) dotall: '.' must wrap EVERY char — without it a newline in the
    # text would skip its boundary markers and corrupt the encoding
    cleaned = F.expr(f"replace({text_col}, '·', '')")
    s = F.concat(F.lit("·"), F.regexp_replace(cleaned, "(?s)(.)", "$1··"))
    enc = docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("n_words"),
        s.alias("_s"),
    ).select(
        "doc_id",
        "n_words",
        F.expr("substring(replace(_s, '·· ··', '· ·'), 1, length(replace(_s, '·· ··', '· ·')) - 1)").alias("_s"),
    )
    for a, b in merges:
        enc = enc.withColumn("_s", F.expr(f"replace(_s, '·{a}··{b}·', '·{a}{b}·')"))
    return enc.select(
        "doc_id",
        (
            (F.length("_s") - F.length(F.expr("replace(_s, '··', '')"))) / 2
            + F.col("n_words")
        )
        .cast("long")
        .alias("n_tokens_bpe"),
        F.md5(F.col("_s")).alias("encoded_md5"),
    )


def bpe_encode_sql(merges: list[tuple[str, str]] | None = None) -> str:
    if merges is None:
        merges = BPE_MERGES
    expr = (
        "substr(replace('·' || regexp_replace(replace(text, '·', ''), '(?s)(.)', '\\1··', 'g'), '·· ··', '· ·'), 1, "
        "length(replace('·' || regexp_replace(replace(text, '·', ''), '(?s)(.)', '\\1··', 'g'), '·· ··', '· ·')) - 1)"
    )
    for a, b in merges:
        expr = f"replace({expr}, '·{a}··{b}·', '·{a}{b}·')"
    return f"""
WITH enc AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         {expr} AS s
  FROM documents
)
SELECT doc_id,
       CAST((length(s) - length(replace(s, '··', ''))) / 2 + n_words AS BIGINT) AS n_tokens_bpe,
       md5(s) AS encoded_md5
FROM enc
"""


def _bpe_train_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-local greedy merge rounds over the word-frequency table —
    the EXACT semantics of the distributed loop below (double-space
    symbol encoding, `cnt DESC, a, b` tie-break, left-to-right
    non-overlapping literal replace; Python str ops match Spark/DuckDB
    byte-for-byte on these ASCII-only symbols)."""
    syms = [
        (" " + "  ".join(list(w) + ["</w>"]) + " ", f) for w, f in word_freqs
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        cnt: dict[tuple[str, str], int] = {}
        for s, f in syms:
            toks = [t.strip() for t in s.strip().split("  ")]
            for a, b in zip(toks, toks[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((r, a, b, a + b, int(c)))
        pat, rep = f" {a}  {b} ", f" {a}{b} "
        syms = [(s.replace(pat, rep), f) for s, f in syms]
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    driver_vocab_limit: int = 5_000_000,
) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016 — the learn step
    whose output bpe_encode applies and bpe_pair_counts previews): N
    greedy merge rounds, each picking the corpus-wide most frequent
    adjacent symbol pair (ties broken lexicographically) and applying it
    everywhere before the next count. Output: the learned merge table
    (merge_rank, lhs, rhs, merged, pair_count) — the artifact a
    tokenizer ships.

    Scale design — THE production trainer shape: ONE corpus pass
    compresses text to the word-frequency table (Sennrich's own trainer
    does exactly this; pair statistics are identical because pairs never
    cross word boundaries), then the greedy rounds run DRIVER-LOCAL on
    that table — the learned merge list is CONTROL state, like a trained
    quantizer, and at 100 TB the word table is ~10⁷ rows (hundreds of
    MB) regardless of corpus size, which is exactly why every production
    trainer (Sennrich's learn_bpe.py, sentencepiece, HF tokenizers) is
    single-node after the counting pass. Vocabularies past
    `driver_vocab_limit` fall back to the distributed round loop
    (explode pairs weighted by word freq, one map-side-combined agg,
    top-1 to the driver, one map-only literal replace per round) — same
    semantics, O(vocab) per round, but each round pays a driver-sync job
    (~0.2 s), which is why the local path is the default.

    Cross-engine determinism: words are encoded as double-space-joined
    symbol strings (' w  o  r  d  </w> ') so each symbol owns its
    flanking spaces and adjacent pair matches share NO characters —
    left-to-right non-overlapping literal replace is then exactly the
    greedy merge fold, and Spark's replace() and DuckDB's replace()
    agree byte-for-byte. Words are lowercased ^[a-z]+$ (symbols stay
    literal-safe); counts are exact integers.

    EAGER AT CALL TIME — the one exception to the lazy-builder
    convention: choosing the driver-local vs distributed round loop
    requires the word-vocabulary size, so constructing this DataFrame
    runs the counting pass (wf.count(), then a collect of ≤
    driver_vocab_limit rows on the local path). Callers that only want
    a plan (explain tooling, plan-shape tests) must treat llm_bpe_train
    as an executing build — see tests/test_plan_shapes.py's module
    docstring."""
    wf = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # one corpus pass serves both the size probe and the collect
    wf = wf.localCheckpoint(eager=False)
    if wf.count() <= driver_vocab_limit:
        merges = _bpe_train_local(
            [(r["w"], int(r["freq"])) for r in wf.collect()], n_merges
        )
        return docs.sparkSession.createDataFrame(
            merges,
            "merge_rank int, lhs string, rhs string, merged string, pair_count long",
        ).repartition(1)
    s0 = F.concat(
        F.lit(" "),
        F.concat_ws(
            "  ",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
            F.lit("</w>"),
        ),
        F.lit(" "),
    )
    # tiny local frame: repartition(1) (NOT coalesce — the Spark 4.1
    # fast-path trap in NOTES) + lazy checkpoint per round keeps each
    # round's lineage flat
    syms = wf.select("freq", s0.alias("s")).repartition(1).localCheckpoint(eager=False)
    toks = (
        "transform(split(trim(s), '  '), x -> trim(x))"
    )
    pair_expr = (
        f"CASE WHEN size({toks}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - 1), "
        f"i -> struct(element_at({toks}, i) AS a, element_at({toks}, i + 1) AS b)) END"
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = (
            syms.select("freq", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((r, a, b, a + b, cnt))
        syms = syms.select(
            "freq",
            F.replace(F.col("s"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")).alias("s"),
        ).localCheckpoint(eager=False)
    return docs.sparkSession.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, merged string, pair_count long"
    ).repartition(1)


def bpe_train_sql(n_merges: int = 8) -> str:
    """DuckDB twin: the same greedy trainer with the rounds unrolled
    into chained CTEs (the pagerank_sql pattern); the double-space
    symbol encoding makes its replace() the same algorithm.

    Every CTE is AS MATERIALIZED: w_r references p_r three times and
    w_{r-1} once, and p_r references w_{r-1} again — inlined (DuckDB's
    default for single-reference CTEs feeding chains), the plan tree
    grows ~4^n and the optimizer never returns at n=6. Materialization
    makes each round O(vocab) like the Spark side's checkpoints."""
    ctes = [
        """wf AS MATERIALIZED (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w
)""",
        """w0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(
           list_append(list_transform(range(1, len(w) + 1), i -> w[i]), '</w>'),
           '  ') || ' ' AS s, freq
  FROM wf
)""",
    ]
    for r in range(1, n_merges + 1):
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT a, b, cnt FROM (
    SELECT t[i + 1] AS a, t[i + 2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (SELECT list_transform(string_split(trim(s), '  '), x -> trim(x)) AS t, freq
          FROM w{r - 1}),
         UNNEST(range(len(t) - 1)) AS u(i)
    GROUP BY 1, 2
  ) ORDER BY cnt DESC, a, b LIMIT 1
)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
  SELECT replace(s,
                 ' ' || (SELECT a FROM p{r}) || '  ' || (SELECT b FROM p{r}) || ' ',
                 ' ' || (SELECT a FROM p{r}) || (SELECT b FROM p{r}) || ' ') AS s, freq
  FROM w{r - 1}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_rank, a AS lhs, b AS rhs, a || b AS merged,"
        f" cnt AS pair_count FROM p{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def winnowing_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Copy detection ON the winnowing fingerprints: candidate pairs =
    docs sharing ≥ `min_shared` selected fingerprint hashes, found by a
    self-equi-join on the fingerprint hash — the MOSS pipeline's second
    half. The fingerprint relation is tiny relative to the corpus
    (≈ 2/(w+1) of the grams by the winnowing density bound), so the
    join shuffles 8-byte keys over a pre-shrunk input; pair fan-out is
    bounded by docs-per-fingerprint, never corpus².

    The guarantee inherited from winnowing: any two docs sharing a
    (k+w−1)-token run WILL share a fingerprint, so recall over
    longer-than-threshold copies is 1 by construction — no probabilistic
    tuning (the MinHash/LSH contrast)."""
    # dedupe to (doc, hash): the same hash selected at several positions
    # would otherwise cross-multiply in the join (n_shared counts DISTINCT
    # shared fingerprint hashes, the MOSS similarity unit)
    fps = (
        winnowing_fingerprints(docs, text_col, k, w)
        .select("doc_id", "fp_hash")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def winnowing_pairs_sql(k: int = 4, w: int = 5, min_shared: int = 2) -> str:
    inner = winnowing_fingerprints_sql(k, w).strip()
    # fps is MATERIALIZED: the self-join below reads it from BOTH sides,
    # and an inlined CTE would run the whole fingerprint pipeline twice
    return f"""
WITH fps_raw AS ({inner}),
fps AS MATERIALIZED (SELECT DISTINCT doc_id, fp_hash FROM fps_raw)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


# fixed-point linear quality model (micro-logit units): the artifact a
# FineWeb-Edu-style distilled classifier ships — weights are frozen at
# training time; application is a pure per-row projection
QC_WEIGHTS = {
    "bias": -1_500_000,
    "stop_pm": 9_000,        # stopword per-mille: natural prose has some
    "punct_pm": -4_000,      # punctuation per-mille: high = markup/code
    "wordlen_dev": -6_000,   # |mean word len − 5.0 chars| in centichar
    "len_bucket": 120_000,   # log2 length bucket: longer docs score up
}


def quality_classifier(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Classifier-based quality filtering — the application side of the
    FineWeb-Edu / DCLM recipe (a small distilled classifier scores every
    document; the pipeline keeps score >= threshold). The trained model
    here is a frozen fixed-point LINEAR scorer over integer text
    features (a stand-in artifact for a fasttext/regression checkpoint,
    which this container cannot ship), so APPLICATION — the part that
    runs at 100 TB — has the real shape: a map-only projection, no
    shuffles, no UDFs.

    Exactness: every feature is an exact integer (per-mille ratios via
    truncating `div` over non-negative counts — identical to DuckDB's
    flooring `//` on non-negatives; length bucket via length(bin(n))),
    and the logit is an integer dot product — bit-identical on any
    engine, so the keep verdict has NO threshold-ulp hazard, the
    failure mode a float sigmoid would smuggle in. The monotone sigmoid
    is left to the consumer: ranking/thresholding on the logit are
    equivalent. Note split('') = [''] (size 1) on both engines, so the
    token count is never 0; only the char count needs a zero guard."""
    W = QC_WEIGHTS
    stop_arr = ", ".join(repr(w) for w in LANG_STOPWORDS["en"])
    toks = f"split({text_col}, ' ')"
    feats = docs.select(
        "doc_id",
        F.expr(
            f"CAST(size(filter({toks}, t -> array_contains(array({stop_arr}), t))) AS BIGINT)"
            f" * 1000 div size({toks})"
        ).alias("stop_pm"),
        F.expr(
            f"CASE WHEN length({text_col}) > 0 THEN "
            f"CAST(size(regexp_extract_all({text_col}, '[^A-Za-z0-9\\\\s]', 0)) AS BIGINT)"
            f" * 1000 div length({text_col}) ELSE 0 END"
        ).alias("punct_pm"),
        F.expr(
            f"abs(CAST(length({text_col}) AS BIGINT) * 100 div size({toks}) - 500)"
        ).alias("wordlen_dev"),
        F.expr(f"CAST(length(bin(size({toks}))) AS BIGINT)").alias("len_bucket"),
    )
    logit = (
        F.lit(W["bias"])
        + F.lit(W["stop_pm"]) * F.col("stop_pm")
        + F.lit(W["punct_pm"]) * F.col("punct_pm")
        + F.lit(W["wordlen_dev"]) * F.col("wordlen_dev")
        + F.lit(W["len_bucket"]) * F.col("len_bucket")
    ).cast("long")
    return feats.select(
        "doc_id", "stop_pm", "punct_pm", "wordlen_dev", "len_bucket",
        logit.alias("logit_micro"),
        (logit >= 0).alias("is_kept"),
    )


def quality_classifier_sql() -> str:
    W = QC_WEIGHTS
    stop = "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + "]"
    return rf"""
WITH feats AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> list_contains({stop}, t))) AS BIGINT)
           * 1000 // len(string_split(text, ' ')) AS stop_pm,
         CASE WHEN length(text) > 0
              THEN CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) * 1000 // length(text)
              ELSE 0 END AS punct_pm,
         abs(CAST(length(text) AS BIGINT) * 100 // len(string_split(text, ' ')) - 500) AS wordlen_dev,
         CAST(length(bin(len(string_split(text, ' ')))) AS BIGINT) AS len_bucket
  FROM documents
)
SELECT doc_id, stop_pm, punct_pm, wordlen_dev, len_bucket,
       CAST({W["bias"]} + {W["stop_pm"]} * stop_pm + {W["punct_pm"]} * punct_pm
            + {W["wordlen_dev"]} * wordlen_dev + {W["len_bucket"]} * len_bucket AS BIGINT) AS logit_micro,
       ({W["bias"]} + {W["stop_pm"]} * stop_pm + {W["punct_pm"]} * punct_pm
            + {W["wordlen_dev"]} * wordlen_dev + {W["len_bucket"]} * len_bucket) >= 0 AS is_kept
FROM feats
"""
