"""Where does the per-query constant go? Split each query's wall into
Python build (DataFrame construction, py4j round trips), JVM plan phases
(QueryExecutionTracker: analysis / optimization / planning), and executed
action (noop sink), per guide §1/§7.3 (driver-side work).

Usage: python tools/phase_times.py [query ...]   (default: a tail sample)

Method: warm pass first (unlabelled) so codegen caches, artifact memos and
file-listing caches are populated; then N measured passes keeping mins.
Phase times come from qe.tracker().phases() of the EXECUTED plan, measured
on a fresh identical frame so tracker state is per-run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from blueflood_spark.session import get_spark  # noqa: E402

TAIL_SAMPLE = [
    "q01_pricing_summary", "q06_forecast_revenue", "bf_basic_rollup_5m",
    "bf_gauge_rollup_5m", "bf_counter_rollup_5m", "bf_glob_search",
    "bf_units_enrichment", "bf_rate_series", "llm_lang_id",
    "llm_token_counts", "llm_quality_score", "llm_length_profile",
    "api_get_view", "bf_shard_hash", "q_set_ops", "llm_dedup_exact",
]


def phases(df):
    tr = df._jdf.queryExecution().tracker()
    out = {}
    it = tr.phases().iterator()
    while it.hasNext():
        kv = it.next()
        ph = kv._1()
        summ = kv._2()
        out[ph] = (summ.endTimeMs() - summ.startTimeMs()) / 1000.0
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or TAIL_SAMPLE
    spark = get_spark("phase-times", shuffle_partitions=8)
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        E._t(spark, sf_dir, tbl).write.mode("overwrite").format("noop").save()
    qs = E.queries()
    tot = {"build": 0.0, "analysis": 0.0, "optimization": 0.0,
           "planning": 0.0, "exec": 0.0, "wall": 0.0}
    print(f"{'query':34s} {'build':>6s} {'anal':>6s} {'optim':>6s} "
          f"{'plan':>6s} {'exec':>6s} {'wall':>6s}")
    for name in names:
        # warm: full build+run once so caches are hot
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            # force optimize+plan+codegen-prep of df's own qe (the write
            # command below re-plans under its own QueryExecution; this
            # isolates the driver-side plan work from the executed action)
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            ph = phases(df)
            row = {
                "build": t1 - t0,
                "analysis": ph.get("analysis", 0.0),
                "optimization": ph.get("optimization", 0.0),
                "planning": t2 - t1,
                "exec": t3 - t2,
                "wall": t3 - t0,
            }
            if best is None or row["wall"] < best["wall"]:
                best = row
        for k in tot:
            tot[k] += best[k]
        print(f"{name:34s} {best['build']:6.3f} {best['analysis']:6.3f} "
              f"{best['optimization']:6.3f} {best['planning']:6.3f} "
              f"{best['exec']:6.3f} {best['wall']:6.3f}")
    print(f"{'TOTAL':34s} {tot['build']:6.3f} {tot['analysis']:6.3f} "
          f"{tot['optimization']:6.3f} {tot['planning']:6.3f} "
          f"{tot['exec']:6.3f} {tot['wall']:6.3f}")


if __name__ == "__main__":
    main()
