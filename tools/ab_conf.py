"""Interleaved A/B harness for engine-level conf candidates (guide §9).

One invocation = one process = one session with the given conf overrides,
running a fixed mixed subset (heavy + mid rows) twice, keeping per-query
mins, printing one JSON line. Drive alternating A/B/A/B runs from the
shell and compare medians — robust to the shared box's ambient drift.

Usage: python tools/ab_conf.py LABEL [k=v ...]
  k=v pairs are Spark confs; keys with dots given literally.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from blueflood_spark.session import get_spark  # noqa: E402

SUBSET = [
    # heavies (floors, but conf-sensitive: joins, shuffles, pandas paths)
    "llm_embedding_dup_clusters", "llm_dup_pagerank", "llm_dup_triangles",
    "llm_simhash_near_pairs", "llm_embedding_near_dups",
    # mid rows across families
    "bf_timer_pct_map_merge", "bf_timer_merge_20m", "llm_minhash_estimate",
    "bf_kmv_overlap", "bf_histogram_quantile", "llm_bigram_lm_score",
    "llm_ngram_jaccard", "q_sole_late_supplier", "llm_dedup_keep_best",
    "llm_hybrid_rrf", "llm_tfidf_top_terms",
]


def main() -> None:
    label = sys.argv[1]
    confs = dict(kv.split("=", 1) for kv in sys.argv[2:])
    global SUBSET
    if os.environ.get("SPARK_GRAFT_AB_SUBSET"):
        SUBSET = os.environ["SPARK_GRAFT_AB_SUBSET"].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"ab-{label}", shuffle_partitions=8, **confs)
    E.q01_pricing_summary(spark, sf_dir).write.mode("overwrite").format("noop").save()
    warm = spark.range(0, 1024, 1, 32)
    warm.mapInPandas(lambda it: it, schema="id long").write.mode("overwrite").format("noop").save()
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        E._t(spark, sf_dir, tbl).write.mode("overwrite").format("noop").save()
    qs = E.queries()
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in SUBSET:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            if name not in timings or el < timings[name]:
                timings[name] = round(el, 4)
            if el > 1.5:
                spark.sparkContext._jvm.System.gc()
    print(json.dumps({"label": label, "total": round(sum(timings.values()), 3),
                      "queries": timings}))


if __name__ == "__main__":
    main()
