"""Stamp-freshness audit: for every registered query, the latest round
whose CORRECTNESS_r*.json carries a green stamp, plus its position
relative to the driver's 50-entry window — the bookkeeping behind the
ORDER CONTRACT comment in __spark_entry__.queries().

Usage: python tools/stamp_ages.py
Prints (a) any entry with NO green stamp anywhere (must be in-window),
(b) the stamp-age histogram, (c) the stalest entries — the natural
candidates for the next round's refresh slots.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(entry) -> bool:
    """A stamp is green when the driver recorded no mismatch. The files'
    shape has varied slightly across rounds; treat any dict without an
    explicit failure marker and with ok/match truthy (when present) as
    green."""
    if not isinstance(entry, dict):
        return bool(entry)
    for key in ("ok", "match", "pass", "green"):
        if key in entry:
            return bool(entry[key])
    # fall back: all boolean sub-checks true
    bools = [v for v in entry.values() if isinstance(v, bool)]
    return bool(bools) and all(bools)


def main() -> None:
    import __spark_entry__ as E

    names = list(E.queries())
    stamps: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
        data = json.load(open(path))
        for name, entry in data.items():
            if green(entry):
                stamps[name] = max(stamps.get(name, 0), rnd)

    never = [n for n in names if n not in stamps]
    window = set(names[:50])
    print(f"registered: {len(names)}  stamped-green union: {len(stamps) - len(set(stamps) - set(names))}")
    if never:
        missing_window = [n for n in never if n not in window]
        print(f"NEVER STAMPED ({len(never)}): {never}")
        if missing_window:
            print(f"  !! not in the 50-entry window (coverage gap): {missing_window}")
    hist: dict[int, int] = {}
    for n in names:
        if n in stamps:
            hist[stamps[n]] = hist.get(stamps[n], 0) + 1
    print("stamp-round histogram:", dict(sorted(hist.items())))
    stale = sorted((n for n in names if n in stamps), key=lambda n: (stamps[n], n))
    print("stalest 15 (next refresh candidates):")
    for n in stale[:15]:
        pos = names.index(n)
        print(f"  r{stamps[n]}  pos{pos:>3}{'  IN-WINDOW' if pos < 50 else ''}  {n}")

    if "--plan" in sys.argv:
        _print_window_plan(names, stamps)


def _print_window_plan(names: list, stamps: dict) -> None:
    """Propose the NEXT round's 50-entry window: every query the
    changed-vs-stamped closure sweep flags OUT OF WINDOW (those are
    weak until re-stamped — they take priority), then the stalest
    stamps, oldest first. Prints the ordered list plus the deferral
    set when candidates exceed 50."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "changed_since_stamp.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    flagged = [
        line.split(":", 1)[0]
        for line in r.stdout.splitlines()
        if "OUT OF WINDOW" in line
    ]
    rest = sorted(
        (n for n in names if n in stamps and n not in set(flagged)),
        key=lambda n: (stamps[n], n),
    )
    ordered = flagged + rest
    window, deferred_round = ordered[:50], ordered[50:]
    # deferral fairness: report which same-staleness rows missed the cut
    cut_round = stamps.get(window[-1])
    spill = [n for n in deferred_round if stamps.get(n) == cut_round]
    print(f"\nproposed next window (50): {len(flagged)} changed-OOW first, then stalest")
    for i, n in enumerate(window):
        tag = "CHANGED-OOW" if n in set(flagged) else f"r{stamps[n]}"
        print(f"  {i:>2}  {tag:>11}  {n}")
    if spill:
        print(f"deferred r{cut_round} rows (verify untouched, note in ORDER CONTRACT): {spill}")


if __name__ == "__main__":
    main()
