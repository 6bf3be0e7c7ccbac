"""Split per-query wall into plan-BUILD time (Python/py4j DataFrame
construction, analysis, any internal build actions) and EXEC time (the
noop-sink action), under bench-like conditions (warm session, cached
working set, 8 shuffle partitions, min over N reps).

Usage: python tools/buildexec.py [-n REPS] q1 [q2 ...]   (default reps=3)

The split is the r9/r10 disposition device (NOTES): at toy SF the build
component is pure per-query constant (plan construction + scheduling of
internal jobs) that amortizes in the concurrent arm and vanishes at real
SF; the exec component is where data work lives.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from blueflood_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if "-n" in args:
        i = args.index("-n")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("buildexec", shuffle_partitions=8)
    E.q01_pricing_summary(spark, sf_dir).write.mode("overwrite").format("noop").save()
    warm = spark.range(0, 1024, 1, 32)
    warm.mapInPandas(lambda it: it, schema="id long").write.mode("overwrite").format("noop").save()
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        E._t(spark, sf_dir, tbl).write.mode("overwrite").format("noop").save()
    qs = E.queries()
    for name in names:
        best_b = best_e = best_t = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            b, e, t = t1 - t0, t2 - t1, t2 - t0
            best_b = b if best_b is None else min(best_b, b)
            best_e = e if best_e is None else min(best_e, e)
            best_t = t if best_t is None else min(best_t, t)
            spark.sparkContext._jvm.System.gc()
        print(f"{name}: build={best_b:.3f}s exec={best_e:.3f}s total(min)={best_t:.3f}s")


if __name__ == "__main__":
    main()
