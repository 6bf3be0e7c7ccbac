"""Changed-since-stamp audit: for every registered query, did ANY code
it transitively depends on change after the commit that recorded its
latest green driver stamp? Automates the sweep the r5-r7 judges ran by
hand with `git log -L` — any query listed here MUST be inside the
current 50-entry stamp window (or the change reverted) before the round
ends.

r8 rewrite (r7 verdict task 4 + ADVICE): the r7 version diffed only the
registered query FUNCTION in __spark_entry__.py, so the r7 fix to the
shared `_URL_CANON_STEPS` table in operators/dedup.py reached the
r4-stamped llm_url_dedup invisibly ("clean" while an out-of-window
query's behavior changed). The tool now builds each query's TRANSITIVE
SYMBOL CLOSURE by AST walk — entry function → helpers/constants in
__spark_entry__.py → functions/module constants in every
blueflood_spark module it imports, recursively — and flags the query if
any closure symbol's line span at HEAD intersects a `git diff -U0`
hunk since the stamp commit. Entry symbols come from
`queries()[name].__name__`, not the registry key (the r7 ADVICE alias/
prefix pitfall of funcname regexes — no regexes remain at all).

r10 extension: each query's closure is ALSO seeded with the references
of its own value expression in the oracle_sql() return dict, so
twin-builder functions and module-level twin SQL constants are tracked
per query (acceptance: flags llm_embedding_near_dups for the r10
_LLM_EMB_NEAR_DUPS_SQL rewrite, which the entry-side closure missed).

Over-approximation is the design: unresolvable names that match a
module-level symbol in any imported blueflood module are included, and
a deleted-lines-only hunk is widened by one line. Under-approximation
remains possible only for reflection/getattr dispatch, which the repo
does not use on query paths.

Usage: python tools/changed_since_stamp.py [--modules] [query ...]
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "blueflood_spark"


def green(entry) -> bool:
    if not isinstance(entry, dict):
        return bool(entry)
    for key in ("ok", "match", "pass", "green"):
        if key in entry:
            return bool(entry[key])
    bools = [v for v in entry.values() if isinstance(v, bool)]
    return bool(bools) and all(bools)


def stamp_commits() -> dict[int, str]:
    """round -> the commit that ADDED that round's CORRECTNESS file."""
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


# ---------------------------------------------------------------------------
# per-module symbol tables (memoized by relpath)
# ---------------------------------------------------------------------------

def _module_relpath(dotted: str) -> str | None:
    """blueflood_spark.operators.dedup -> blueflood_spark/operators/dedup.py
    (None for anything outside the package)."""
    if not dotted.startswith(PKG):
        return None
    rel = dotted.replace(".", "/")
    for cand in (rel + ".py", rel + "/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


class ModuleTable:
    """Top-level symbols of one file: name -> (start, end) line span,
    plus the names/attributes each symbol's body references and the
    import alias maps needed to resolve them."""

    def __init__(self, relpath: str):
        self.relpath = relpath
        src = open(os.path.join(REPO, relpath)).read()
        tree = ast.parse(src)
        self.spans: dict[str, tuple[int, int]] = {}
        self.refs: dict[str, set] = {}          # symbol -> raw Name ids
        self.attr_refs: dict[str, set] = {}     # symbol -> (alias, attr)
        self.alias_mod: dict[str, str] = {}     # alias -> relpath of module
        self.from_imports: dict[str, tuple[str, str]] = {}  # name -> (relpath, orig)
        self._collect_imports(tree.body, self.alias_mod, self.from_imports)
        for node in tree.body:
            names = self._targets(node)
            if not names:
                continue
            span = (node.lineno, node.end_lineno or node.lineno)
            raw, attrs, local_alias, local_from = set(), set(), {}, {}
            self._collect_imports(ast.walk(node), local_alias, local_from)
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name):
                    raw.add(sub.id)
                elif isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
                    attrs.add((sub.value.id, sub.attr))
            for n in names:
                self.spans[n] = span
                self.refs[n] = raw
                self.attr_refs[n] = attrs
            # function-scope imports resolve like module-level ones
            self.alias_mod.update(local_alias)
            self.from_imports.update(local_from)

    @staticmethod
    def _targets(node) -> list[str]:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            return [node.name]
        if isinstance(node, ast.Assign):
            return [t.id for t in node.targets if isinstance(t, ast.Name)]
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            return [node.target.id]
        return []

    @staticmethod
    def _collect_imports(nodes, alias_mod: dict, from_imports: dict) -> None:
        for node in nodes:
            if isinstance(node, ast.Import):
                for a in node.names:
                    rel = _module_relpath(a.name)
                    if rel:
                        alias_mod[a.asname or a.name.split(".")[0]] = rel
            elif isinstance(node, ast.ImportFrom) and node.module:
                rel = _module_relpath(node.module)
                if rel:
                    for a in node.names:
                        # `from pkg.operators import dedup as D` imports a
                        # MODULE through the package __init__ path
                        sub = _module_relpath(f"{node.module}.{a.name}")
                        if sub:
                            alias_mod[a.asname or a.name] = sub
                        else:
                            from_imports[a.asname or a.name] = (rel, a.name)


_TABLES: dict[str, ModuleTable] = {}


def table(relpath: str) -> ModuleTable:
    if relpath not in _TABLES:
        _TABLES[relpath] = ModuleTable(relpath)
    return _TABLES[relpath]


def closure(relpath: str, symbol: str, seen: set | None = None) -> set:
    """Transitive set of (relpath, symbol) reachable from one symbol."""
    seen = set() if seen is None else seen
    key = (relpath, symbol)
    if key in seen:
        return seen
    seen.add(key)
    t = table(relpath)
    if symbol not in t.spans:
        return seen
    _close_refs(relpath, t.refs.get(symbol, ()), t.attr_refs.get(symbol, ()), seen)
    return seen


def _close_refs(relpath: str, raw_names, attr_pairs, seen: set) -> None:
    """Resolve a bag of raw Name ids / (alias, attr) pairs the way a
    symbol body's references are resolved, extending `seen` in place."""
    t = table(relpath)
    for n in raw_names:
        if n in t.spans:
            closure(relpath, n, seen)
        elif n in t.from_imports:
            tgt_rel, orig = t.from_imports[n]
            closure(tgt_rel, orig, seen)
    for alias, attr in attr_pairs:
        if alias in t.alias_mod:
            closure(t.alias_mod[alias], attr, seen)


def oracle_value_refs(relpath: str) -> dict[str, tuple[set, set]]:
    """query name -> (raw Name ids, (alias, attr) pairs) referenced by
    its value EXPRESSION in the oracle_sql() return dict. The r10 blind
    spot: twins are strings built inside one oracle_sql() function, so
    the per-query entry-function closure never saw them — a rewritten
    module-level twin constant (_LLM_EMB_NEAR_DUPS_SQL) or twin builder
    reached an out-of-window query invisibly. Seeding each query's
    closure with its own dict value's references (not the whole
    function, which would flag every query on any twin change) closes
    it."""
    tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    out: dict[str, tuple[set, set]] = {}
    for node in tree.body:
        if not (isinstance(node, ast.FunctionDef) and node.name == "oracle_sql"):
            continue
        for sub in ast.walk(node):
            if not (isinstance(sub, ast.Return) and isinstance(sub.value, ast.Dict)):
                continue
            for k, v in zip(sub.value.keys, sub.value.values):
                if not isinstance(k, ast.Constant):
                    continue
                raw, attrs = set(), set()
                for w in ast.walk(v):
                    if isinstance(w, ast.Name):
                        raw.add(w.id)
                    elif isinstance(w, ast.Attribute) and isinstance(w.value, ast.Name):
                        attrs.add((w.value.id, w.attr))
                out[k.value] = (raw, attrs)
    return out


# ---------------------------------------------------------------------------
# git change detection: +side hunk ranges since a commit, per file
# ---------------------------------------------------------------------------

_HUNKS: dict[tuple[str, str], list[tuple[int, int]] | None] = {}


def changed_ranges(relpath: str, since: str) -> list[tuple[int, int]] | None:
    """HEAD-side line ranges changed in since..HEAD for relpath; None
    means the file didn't exist at `since` (treat everything changed)."""
    key = (relpath, since)
    if key in _HUNKS:
        return _HUNKS[key]
    probe = subprocess.run(
        ["git", "cat-file", "-e", f"{since}:{relpath}"], cwd=REPO, capture_output=True
    )
    if probe.returncode != 0:
        _HUNKS[key] = None
        return None
    diff = subprocess.run(
        ["git", "diff", "--unified=0", f"{since}..HEAD", "--", relpath],
        cwd=REPO, capture_output=True, text=True,
    ).stdout
    ranges: list[tuple[int, int]] = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        if count == 0:
            # a pure deletion lands BETWEEN start and start+1 at HEAD —
            # cover both neighbors so it can't slip through
            ranges.append((max(1, start), start + 1))
        else:
            # +start,count covers HEAD lines [start, start+count-1]
            # INCLUSIVE; overshooting by one falsely flags the symbol
            # that begins on the next line
            ranges.append((start, start + count - 1))
    _HUNKS[key] = ranges
    return ranges


def symbol_changed(relpath: str, symbol: str, since: str) -> bool:
    ranges = changed_ranges(relpath, since)
    if ranges is None:
        return True
    lo, hi = table(relpath).spans[symbol]
    return any(s <= hi and e >= lo for s, e in ranges)


def commits_for(relpath: str, lo: int, hi: int, since: str) -> list[str]:
    r = subprocess.run(
        ["git", "log", "--format=%h %s", f"{since}..HEAD", "-L", f"{lo},{hi}:{relpath}"],
        cwd=REPO, capture_output=True, text=True,
    )
    if r.returncode != 0:
        return ["<unresolvable>"]
    return re.findall(r"^[0-9a-f]{7,} .*$", r.stdout, re.M)


def main() -> None:
    import __spark_entry__ as E

    qmap = E.queries()
    names = list(qmap)
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
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
                ["git", "diff", "--name-only", f"{rounds[rnd]}..HEAD", "--", PKG + "/"],
                cwd=REPO, capture_output=True, text=True,
            ).stdout.split()
            fresh = [f for f in files if (rnd, f) not in seen]
            seen.update((rnd, f) for f in fresh)
            if fresh:
                print(f"operator files changed since r{rnd} stamp commit:")
                for f in fresh:
                    print(f"  {f}")
        return

    entry_rel = "__spark_entry__.py"
    oracle_refs = oracle_value_refs(entry_rel)
    flagged = 0
    for name in names:
        if only and name not in only:
            continue
        rnd = stamps.get(name)
        if rnd is None:
            mark = "in-window OK" if name in window else "!! OUT OF WINDOW"
            print(f"{name}: NEVER STAMPED [{mark}]")
            flagged += 1
            continue
        if rnd not in rounds:
            continue
        since = rounds[rnd]
        # ADVICE r7: audit the FUNCTION the registry points at, not the key
        fname = qmap[name].__name__
        seen = closure(entry_rel, fname)
        # r10: seed the query's ORACLE-side references too (twin
        # builders / module-level twin SQL constants)
        oref = oracle_refs.get(name)
        if oref:
            _close_refs(entry_rel, oref[0], oref[1], seen)
        hits = [
            (rel, sym)
            for rel, sym in sorted(seen)
            if sym in table(rel).spans and symbol_changed(rel, sym, since)
        ]
        if not hits:
            continue
        flagged += 1
        mark = "in-window OK" if name in window else "!! OUT OF WINDOW"
        print(f"{name}: changed since r{rnd} stamp [{mark}]")
        for rel, sym in hits[:6]:
            lo, hi = table(rel).spans[sym]
            print(f"    via {rel}:{sym} (lines {lo}-{hi})")
            for c in commits_for(rel, lo, hi, since)[:3]:
                print(f"        {c}")
        if len(hits) > 6:
            print(f"    ... and {len(hits) - 6} more closure symbols")
    if not flagged:
        print("clean: no registered query's closure changed since its latest stamp")


if __name__ == "__main__":
    main()
