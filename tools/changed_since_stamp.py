"""Changed-since-stamp audit: for every registered query, did its
function body in __spark_entry__.py change after the commit that
recorded its latest green driver stamp? This automates the sweep the
r5/r6 judges ran by hand with `git log -L :func:__spark_entry__.py` —
any query listed here MUST be inside the current 50-entry stamp window
(or the change reverted) before the round ends.

Function-level only, deliberately: a change to a shared operator module
(blueflood_spark/...) doesn't show here. Run with --modules to ALSO
print operator files changed since each round commit, then map those to
their consumers by hand (the registry docstrings cite the operators
they ride). Over-flagging beats silent staleness, so module mode lists
every (round, file) pair even when the change is comment-only.

Usage: python tools/changed_since_stamp.py [--modules]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(entry) -> bool:
    if not isinstance(entry, dict):
        return bool(entry)
    for key in ("ok", "match", "pass", "green"):
        if key in entry:
            return bool(entry[key])
    bools = [v for v in entry.values() if isinstance(v, bool)]
    return bool(bools) and all(bools)


def stamp_commits() -> dict[int, str]:
    """round -> the commit that ADDED that round's CORRECTNESS file
    (stamps reflect the tree as of that commit's parent round-start,
    but any function commit AFTER it is unambiguously post-stamp)."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
        sha = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", os.path.basename(path)],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.strip().splitlines()
        if sha:
            out[rnd] = sha[-1]
    return out


def commits_touching(func: str, since: str) -> list[str]:
    r = subprocess.run(
        ["git", "log", "--format=%h %s", f"{since}..HEAD",
         "-L", f":{func}:__spark_entry__.py"],
        cwd=REPO, capture_output=True, text=True,
    )
    if r.returncode != 0:  # function added after `since`, or renamed
        return ["<unresolvable — treat as changed>"]
    return re.findall(r"^[0-9a-f]{7,} .*$", r.stdout, re.M)


def main() -> None:
    import __spark_entry__ as E

    names = list(E.queries())
    window = set(names[:50])
    stamps: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
        for name, entry in json.load(open(path)).items():
            if green(entry):
                stamps[name] = max(stamps.get(name, 0), rnd)
    rounds = stamp_commits()

    if "--modules" in sys.argv:
        seen = set()
        for rnd in sorted(rounds):
            files = subprocess.run(
                ["git", "diff", "--name-only", f"{rounds[rnd]}..HEAD",
                 "--", "blueflood_spark/"],
                cwd=REPO, capture_output=True, text=True,
            ).stdout.split()
            fresh = [f for f in files if (rnd, f) not in seen]
            seen.update((rnd, f) for f in fresh)
            if fresh:
                print(f"operator files changed since r{rnd} stamp commit:")
                for f in fresh:
                    print(f"  {f}")
        return

    flagged = 0
    for name in names:
        rnd = stamps.get(name)
        if rnd is None:
            status = "NEVER STAMPED"
            commits = []
        elif rnd not in rounds:
            continue
        else:
            commits = commits_touching(name, rounds[rnd])
            if not commits:
                continue
            status = f"changed since r{rnd} stamp"
        flagged += 1
        mark = "in-window OK" if name in window else "!! OUT OF WINDOW"
        print(f"{name}: {status} [{mark}]")
        for c in commits[:4]:
            print(f"    {c}")
    if not flagged:
        print("clean: no registered query changed since its latest stamp")


if __name__ == "__main__":
    main()
