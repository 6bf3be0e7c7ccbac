"""Time the DuckDB oracle suite at a given SF — the denominator of the
"bench within 2× of oracle" target. Prints one JSON line shaped like
bench.py's. Usage: python tools/bench_oracle.py [sf_dir]"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # two passes, per-query min — symmetric with bench.py's steady-state
    # reporting (warm page cache, de-noised)
    timings = {}
    for _pass in range(2):
        for name, sql in E.oracle_sql().items():
            start = time.perf_counter()
            con.execute(sql).fetchall()
            elapsed = time.perf_counter() - start
            if name not in timings or elapsed < timings[name]:
                timings[name] = round(elapsed, 4)
    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "oracle_total_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
