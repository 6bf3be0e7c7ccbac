"""Time the DuckDB oracle suite at a given SF — the denominator of the
"bench within 2× of oracle" target. Prints one JSON line shaped like
bench.py's, with BOTH a serial sum of per-query minima and a 4-way
concurrent suite wall (symmetric with bench.py's two numbers, so
serial/serial and concurrent/concurrent ratios are both honest).
Usage: python tools/bench_oracle.py [sf_dir]"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _connect(sf_dir: str, threads: int) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = _connect(sf_dir, 32)
    suite = list(E.oracle_sql().items())

    # Pass 1 over everything, then a de-noising pass 2 ONLY for queries
    # slow enough for noise to matter (>0.15s — above that, run-to-run
    # variance is a visible fraction of the suite total; below it, the
    # contribution is bounded by 175 × 0.15s regardless). Keeps the whole
    # tool inside a 10-min budget at sf0.1 (r4 verdict item 8: the old
    # 2-full-pass shape stopped fitting once heavy twins joined the
    # registry).
    timings: dict[str, float] = {}
    for name, sql in suite:
        start = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - start, 4)
    for name, sql in suite:
        if timings[name] <= 0.15:
            continue
        start = time.perf_counter()
        con.execute(sql).fetchall()
        elapsed = time.perf_counter() - start
        if elapsed < timings[name]:
            timings[name] = round(elapsed, 4)
    serial_total = sum(timings.values())

    # 4-way concurrent suite wall, min of 2 — the same shape as bench.py's
    # headline. Each worker uses a cursor of the shared connection (shared
    # catalog + buffer pool, DuckDB's documented multi-thread pattern) and
    # threads are split so total CPU budget matches the serial pass.
    concurrency = int(os.environ.get("SPARK_GRAFT_BENCH_CONCURRENCY", "4"))
    con_conc = _connect(sf_dir, max(1, 32 // concurrency))

    def run_one(item):
        _name, sql = item
        con_conc.cursor().execute(sql).fetchall()

    # one concurrent pass (was min-of-2): the serial passes above already
    # warmed the page cache, and the wall is dominated by the slowest
    # twins, which de-noise poorly anyway — a second full pass bought
    # ~nothing for +40% tool runtime
    start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        list(pool.map(run_one, suite))
    conc_total = time.perf_counter() - start

    print(
        json.dumps(
            {
                "metric": "oracle_total_wall_sec",
                "value": round(conc_total, 4),
                "unit": "sec",
                "queries": timings,
                "serial_total_sec": round(serial_total, 4),
                "concurrency": concurrency,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
