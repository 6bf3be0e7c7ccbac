"""Long-document guard for the HOF token-array hoists (r10 d2aa48f /
36e6b37; promoted into the suite per r10 verdict task 8).

The bench corpus's documents are short, so an accidental re-inlining of
`split(text)` inside a gram kernel's per-position lambda — interpreted
HOF evaluation re-runs non-lambda subtrees per element, turning
O(tokens) into O(tokens²) bytes touched — is INVISIBLE in bench walls
(measured flat at sf0.1) while costing 8-18× on 1500-token documents
(the r10 microbench). This test re-runs that microbench shape on
synthetic long docs and asserts a RATIO against a linear reference pass
over the same tokens, so it is robust to ambient load on a shared box:
both sides scale with the machine.

Measured calibration (r11, 512 docs × 1500 tokens, min of 3): cold
reference 0.25 s with hoisted kernels at 1.5-2.5×; fully warm in-suite
the reference drops to ~0.10 s and the worst hoisted ratio reads 6.2×
(repetition_stats — two aggregation branches vs the reference's one).
The r10 quadratic form measured 8-18× the HOISTED kernels themselves,
i.e. ≥48× the warm reference. The threshold sits at 12× — ~2× above
the worst measured hoisted ratio, ~4× below the quadratic floor.
"""

import time

import pytest

from pyspark.sql import functions as F

N_DOCS = 512
TOKENS_PER_DOC = 1500
RATIO_MAX = 12.0


@pytest.fixture(scope="module")
def long_docs(spark):
    # ~1500 distinct-ish tokens per doc, deterministic, built JVM-side
    df = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
                lambda i: F.concat(F.lit("w"), ((i * 7919 + F.col("id")) % 997).cast("string")),
            ),
        ).alias("text"),
    )
    df = df.localCheckpoint()  # materialize: the generator must not be timed
    df.write.mode("overwrite").format("noop").save()
    return df


def _noop_time(df) -> float:
    best = None
    for _ in range(3):
        t = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t
        best = el if best is None else min(best, el)
    return best


def _reference_wall(long_docs) -> float:
    """Linear pass over the same tokens: split once, explode, count per
    doc — the O(tokens) floor every hoisted kernel should track."""
    ref = (
        long_docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id")
        .agg(F.count("tok").alias("n"), F.count_distinct("tok").alias("d"))
    )
    return _noop_time(ref)


@pytest.mark.slow
def test_shingles_expr_linear_in_tokens(spark, long_docs):
    from blueflood_spark.operators.dedup import shingles_expr

    kern = long_docs.select(
        "doc_id", F.size(shingles_expr("text")).alias("n_shingles")
    )
    wall = _noop_time(kern)
    ref = _reference_wall(long_docs)
    assert wall < RATIO_MAX * ref, (
        f"shingles_expr wall {wall:.2f}s vs linear reference {ref:.2f}s — "
        f"ratio {wall / ref:.1f}x exceeds {RATIO_MAX}x: the split() hoist "
        "has likely regressed to per-position re-evaluation (O(tokens^2))"
    )


@pytest.mark.slow
def test_ngram_stats_linear_in_tokens(spark, long_docs):
    from blueflood_spark.operators.text import ngram_stats

    wall = _noop_time(ngram_stats(long_docs, n=3, k=50))
    ref = _reference_wall(long_docs)
    assert wall < RATIO_MAX * ref, (
        f"ngram_stats wall {wall:.2f}s vs linear reference {ref:.2f}s — "
        f"ratio {wall / ref:.1f}x exceeds {RATIO_MAX}x (O(tokens^2) "
        "re-introduction?)"
    )


@pytest.mark.slow
def test_repetition_stats_linear_in_tokens(spark, long_docs):
    from blueflood_spark.operators.text import repetition_stats

    wall = _noop_time(repetition_stats(long_docs))
    ref = _reference_wall(long_docs)
    assert wall < RATIO_MAX * ref, (
        f"repetition_stats wall {wall:.2f}s vs linear reference {ref:.2f}s — "
        f"ratio {wall / ref:.1f}x exceeds {RATIO_MAX}x (O(tokens^2) "
        "re-introduction?)"
    )
