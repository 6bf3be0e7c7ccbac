"""Noise-free per-query execution metrics (r10 optimization round).

Wall-clock on this shared box drifts ±30% with co-tenant load; job/stage
counts, task time and shuffle bytes do not. This tool runs each named
query (or every registered query) once under a jobGroup label in a
UI-enabled session and reports, per query, from the UI REST API:

  jobs, stages, tasks, taskTime(s), shuffleRead(MB), shuffleWrite(MB), input(MB)

Usage: python tools/query_metrics.py [--json OUT] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from blueflood_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    only = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("query-metrics", shuffle_partitions=8,
                      **{"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    E.q01_pricing_summary(spark, sf_dir).write.mode("overwrite").format("noop").save()
    warm = spark.range(0, 1024, 1, 32)
    warm.mapInPandas(lambda it: it, schema="id long").write.mode("overwrite").format("noop").save()
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        E._t(spark, sf_dir, tbl).write.mode("overwrite").format("noop").save()

    qs = E.queries()
    names = only if only else list(qs)
    warm = os.environ.get("SPARK_GRAFT_QM_WARM", "") == "1"
    for name in names:
        try:
            if warm:
                # un-labelled warm pass: one-time artifact memos, broadcast
                # prepares and cache population land OUTSIDE the labelled
                # window, so the labelled numbers are steady-state
                qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            sc.setJobGroup(f"qm:{name}", name)
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}")
        sc.setJobGroup(None, None)

    app_id = sc.applicationId
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{app_id}"

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    jobs = get("/jobs?status=succeeded") + get("/jobs?status=failed")
    stages = {s["stageId"]: s for s in get("/stages?status=COMPLETE")}
    per = {}
    for j in jobs:
        grp = j.get("jobGroup") or ""
        if not grp.startswith("qm:"):
            continue
        name = grp[3:]
        d = per.setdefault(name, {"jobs": 0, "stages": 0, "tasks": 0,
                                  "taskTime": 0.0, "shufRead": 0.0,
                                  "shufWrite": 0.0, "input": 0.0})
        d["jobs"] += 1
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if s is None:
                continue  # skipped stage (reused exchange) or still pending
            d["stages"] += 1
            d["tasks"] += s["numCompleteTasks"]
            d["taskTime"] += s["executorRunTime"] / 1000.0
            d["shufRead"] += s["shuffleReadBytes"] / 1e6
            d["shufWrite"] += s["shuffleWriteBytes"] / 1e6
            d["input"] += s["inputBytes"] / 1e6
    print(f"{'query':34s} {'jobs':>4} {'stg':>4} {'task':>5} {'tt(s)':>8} "
          f"{'shR(MB)':>8} {'shW(MB)':>8} {'in(MB)':>8}")
    for name in names:
        d = per.get(name)
        if not d:
            print(f"{name:34s}    -")
            continue
        print(f"{name:34s} {d['jobs']:4d} {d['stages']:4d} {d['tasks']:5d} "
              f"{d['taskTime']:8.2f} {d['shufRead']:8.2f} {d['shufWrite']:8.2f} "
              f"{d['input']:8.2f}")
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(per, fh, indent=1)


if __name__ == "__main__":
    main()
