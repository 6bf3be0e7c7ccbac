"""Which queries launch Spark jobs during PLAN CONSTRUCTION?

Under AQE, a parent-session `localCheckpoint(eager=False)` executes its
whole subtree at mark time (the r7 finding) — so any registered query
that launches jobs while its callable merely BUILDS the DataFrame is
paying eager-mark cost (or a driver round trip) before the first
action. This tool runs every queries() entry at a small SF and reports
build-time job counts, sorted — the hit list for loop-session
conversions (session.loop_session) in future rounds.

Build-time jobs are not automatically bugs: memoized artifacts (k-means
centroids, PQ codebooks, statsd payload packs) deliberately pay a
one-time job, CC/pagerank fixpoints NEED driver round trips, and
`count()`-based branch choices execute by definition. The report is the
inventory; NOTES.md documents which entries are deliberate.

Usage: python tools/build_jobs.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from blueflood_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(a for a in args if not os.path.isdir(a))
    spark = get_spark("build-jobs", shuffle_partitions=8)
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    # warm the table/footer reads so their jobs don't attribute to queries
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        E._t(spark, sf_dir, tbl)

    rows = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        before = njobs()
        try:
            fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 - report, don't abort the sweep
            rows.append((999, name, f"ERROR {type(exc).__name__}: {exc}"))
            continue
        rows.append((njobs() - before, name, ""))
    rows.sort(reverse=True)
    payers = [r for r in rows if r[0] > 0]
    print(f"{len(payers)}/{len(rows)} queries launch jobs at build time:")
    for n, name, err in payers:
        print(f"  {n:>3}  {name}  {err}")
    if not payers:
        print("  (none)")


if __name__ == "__main__":
    main()
