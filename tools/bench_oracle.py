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

    # two passes, per-query min — symmetric with bench.py's steady-state
    # serial reporting (warm page cache, de-noised)
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, sql in suite:
            start = time.perf_counter()
            con.execute(sql).fetchall()
            elapsed = time.perf_counter() - start
            if name not in timings or elapsed < timings[name]:
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

    conc_total = None
    for _pass in range(2):
        start = time.perf_counter()
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(pool.map(run_one, suite))
        elapsed = time.perf_counter() - start
        conc_total = elapsed if conc_total is None else min(conc_total, elapsed)

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
