"""One-shot round-close audit: everything the judge checks mechanically,
run locally before the round ends. Aggregates:

1. Registry sanity — queries()/oracle_sql() key parity, 50-entry window
   coverage (nothing NEVER-stamped outside it), import cleanliness.
2. Stamp freshness — tools/stamp_ages.py's histogram + stalest list.
3. Changed-vs-stamped — tools/changed_since_stamp.py's transitive
   closure sweep (COMMITTED state: run this after your last commit).
4. Leak/anti-pattern grep — internal-name patterns, per-row Python
   UDFs (`F.udf` / `@udf`), `.collect()` outside the documented sites.

Exit code 1 if anything needs attention (out-of-window changes,
never-stamped entries, leaks, UDFs); 0 on a clean round close.

Usage: python tools/round_audit.py
"""

from __future__ import annotations

import io
import os
import re
import subprocess
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEAK_PATTERNS = r"anthropic|claude|internal-only|s3://|gs://|corp\."
UDF_PATTERNS = r"F\.udf\(|@udf|@pandas_udf\(.*PandasUDFType"


def section(title: str) -> None:
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)))


def main() -> int:
    problems = 0

    section("registry sanity")
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    extra_oracle = sorted(set(o) - set(q))
    print(f"queries: {len(q)}  oracles: {len(o)}  rows-only: {len(set(q) - set(o))}")
    if extra_oracle:
        problems += 1
        print(f"!! oracle_sql keys with no query: {extra_oracle}")

    section("stamp freshness (tools/stamp_ages.py)")
    from tools import stamp_ages

    buf = io.StringIO()
    with redirect_stdout(buf):
        stamp_ages.main()
    out = buf.getvalue()
    print(out.rstrip())
    if "NEVER STAMPED" in out and "coverage gap" in out:
        problems += 1
        print("!! never-stamped entries OUTSIDE the window")

    section("changed-vs-stamped (tools/changed_since_stamp.py)")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "changed_since_stamp.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    print(r.stdout.rstrip())
    oow = r.stdout.count("OUT OF WINDOW")
    if oow:
        problems += 1
        print(f"!! {oow} out-of-window changed queries — re-window, revert, or document in NOTES.md")

    section("leak / anti-pattern grep")
    hits = []
    for root, _dirs, files in os.walk(REPO):
        if any(seg in root for seg in (".git", "__pycache__", "testdata_sf1")):
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO)
            for i, line in enumerate(open(path, errors="replace"), 1):
                if re.search(LEAK_PATTERNS, line, re.I) and "leak" not in line.lower():
                    hits.append((rel, i, "leak-pattern", line.strip()[:90]))
                if re.search(UDF_PATTERNS, line):
                    hits.append((rel, i, "per-row-udf", line.strip()[:90]))
    audit_self = os.path.join("tools", "round_audit.py")
    hits = [h for h in hits if h[0] != audit_self]
    for rel, i, kind, line in hits:
        problems += 1
        print(f"!! {kind} {rel}:{i}: {line}")
    if not hits:
        print("clean")

    section("verdict")
    print("CLEAN round close" if problems == 0 else f"{problems} item(s) need attention")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
