"""Property-based invariants (hypothesis): for every rollup family,
merging partials must equal recomputing from raw — the contract the whole
resolution ladder stands on (reference enforces it via hand-picked unit
values; we let hypothesis pick them)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blueflood_spark.functions.hashing import shard_of
from blueflood_spark.operators import granularity as G

# -- pure-python properties (no Spark session: fast, thousands of cases) --


@given(st.integers(min_value=0, max_value=2**41))
def test_snap_is_idempotent_and_aligned(ms):
    for g in G.ROLLUP_GRANULARITIES:
        snapped = g.snap_millis(ms)
        assert snapped % g.milliseconds == 0
        assert g.snap_millis(snapped) == snapped
        assert 0 <= ms - snapped < g.milliseconds


@given(st.integers(min_value=0, max_value=2**41))
def test_slot_consistency(ms):
    # coarser slot is the finer slot integer-scaled (Granularity.slotFromFinerSlot)
    for fine, coarse in zip(G.ROLLUP_GRANULARITIES, G.ROLLUP_GRANULARITIES[1:]):
        assert coarse.slot(ms) == (fine.slot(ms) * coarse.num_slots) // fine.num_slots


@given(st.text(min_size=1, max_size=60))
def test_shard_in_range(s):
    assert 0 <= shard_of(s) < 128


@given(
    st.integers(min_value=0, max_value=2**40),
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1, max_value=100_000),
)
def test_granularity_selection_total(from_ms, span, points):
    g = G.from_points_in_interval(from_ms, from_ms + span, points)
    assert g in G.GRANULARITIES  # never crashes, always picks something


# -- merge == recompute on the numeric formulas (python mirror of the
#    Column expressions, so hypothesis can run thousands of cases) --


def _merge_basic(children):
    n = sum(c["n"] for c in children)
    avg = sum(c["n"] * c["avg"] for c in children) / n
    ex2 = sum(c["n"] * (c["var"] + c["avg"] ** 2) for c in children) / n
    return {"n": n, "avg": avg, "var": ex2 - avg * avg}


@given(
    st.lists(
        st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    )
)
@settings(suppress_health_check=[HealthCheck.too_slow], deadline=None)
def test_pooled_variance_equals_recompute(groups):
    # children = per-group (n, mean, var_pop); merge must equal global stats
    children = []
    for g in groups:
        n = len(g)
        mean = sum(g) / n
        var = sum((x - mean) ** 2 for x in g) / n
        children.append({"n": n, "avg": mean, "var": var})
    merged = _merge_basic(children)
    allv = [x for g in groups for x in g]
    g_mean = sum(allv) / len(allv)
    g_var = sum((x - g_mean) ** 2 for x in allv) / len(allv)
    assert math.isclose(merged["avg"], g_mean, rel_tol=1e-9, abs_tol=1e-6)
    assert math.isclose(merged["var"], g_var, rel_tol=1e-6, abs_tol=1e-3)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**6),  # count
            st.floats(min_value=1e-3, max_value=1e6, allow_nan=False),  # rate
        ),
        min_size=1,
        max_size=6,
    )
)
def test_harmonic_rate_merge_associative(children):
    # rate merge Σc/Σ(cᵢ/rᵢ) must equal a single combine over concatenation
    def combine(cs):
        total = sum(c for c, _ in cs)
        secs = sum(c / r for c, r in cs)
        return total / secs

    left, right = children[: len(children) // 2], children[len(children) // 2 :]
    whole = combine(children)
    if left and right:
        merged = combine(
            [(sum(c for c, _ in left), combine(left)), (sum(c for c, _ in right), combine(right))]
        )
        assert math.isclose(whole, merged, rel_tol=1e-9)


# -- F5 typed promotion: python mirror of the _typed_output expressions --

def _py_mod(s: int, n: int) -> int:
    # % with the dividend's sign (Java/Spark/DuckDB integer %)
    m = s % n
    if m != 0 and (m < 0) != (s < 0):
        m -= n if m > 0 else -n
    return m


@given(
    st.lists(st.integers(min_value=-10**12, max_value=10**12), min_size=1, max_size=50)
)
def test_typed_long_avg_vs_reference_incremental(values):
    """The reference's incremental remainder average (Average.java:70-76)
    maintains sum = count*avg + remainder EXACTLY, but the remainder's
    sign convention drifts with arrival order — so the reference's own
    long average is order-dependent within ±1 (e.g. [100,1] → 51 but
    [1,100] → 50). typed_from_raw canonicalizes to truncated division of
    the exact sum: always inside the reference's ±1 envelope, and the
    unique order-independent choice (the documented divergence)."""
    avg, rem, count = 0, 0, 0
    for x in values:
        count += 1
        num = x + rem - avg
        avg = avg + _int_div_trunc(num, count)
        rem = _py_mod(num, count)
    s = sum(values)
    assert s == count * avg + rem and abs(rem) < count  # the exact invariant
    closed = (s - _py_mod(s, count)) // count
    assert abs(avg - closed) <= 1  # canonical form within the envelope
    if rem == _py_mod(s, count):  # canonical remainder sign → exact match
        assert avg == closed


def _int_div_trunc(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) or q == 0 else -q


@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=-10**6, max_value=10**6)),
        min_size=1,
        max_size=40,
    )
)
def test_typed_winner_min_max(rows):
    """Winner-typed min/max (MinValue/MaxValue.java): the output carries
    the type of the winning value; ties keep the long."""
    longs = [v for is_l, v in rows if is_l]
    doubles = [v + 0.5 for is_l, v in rows if not is_l]
    min_l = min(longs) if longs else None
    min_d = min(doubles) if doubles else None
    # mirror of _typed_winner: long wins when <= (ties keep long)
    long_wins = min_d is None or (min_l is not None and float(min_l) <= min_d)
    out_l = min_l if long_wins else None
    out_d = None if long_wins else min_d
    true_min = min([*longs, *doubles])
    assert (out_l if out_l is not None else out_d) == true_min


# -- URL canonicalization (round 4): pure-python triplet rendition --

_URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~/?&=#",
    max_size=80,
)


@given(_URL_CHARS)
def test_canonical_url_idempotent_property(u):
    from blueflood_spark.operators.dedup import canonical_url_py

    once = canonical_url_py(u)
    assert canonical_url_py(once) == once


@given(_URL_CHARS)
def test_canonical_url_invariants(u):
    import re

    from blueflood_spark.operators.dedup import canonical_url_py

    c = canonical_url_py("https://www." + u)
    assert c == c.lower()
    assert not c.startswith("http://") and not c.startswith("https://")
    assert not c.startswith("www.")
    assert "#" not in c
    assert not c.endswith("/")
    assert not re.search(r"utm_[a-z]+=", c)


@given(st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=4))
def test_canonical_url_consecutive_utm_params(parts):
    # any run of consecutive utm params must strip completely
    from blueflood_spark.operators.dedup import canonical_url_py

    qs = "&".join(f"utm_{p}={p}1" for p in parts)
    url = "https://x.example.com/p" + ("?" + qs if qs else "")
    assert canonical_url_py(url) == "x.example.com/p"


# -- BPE boundary-encoding: the chained-replace trick must equal the
#    leftmost-first reference merge for ANY word and ANY merge sequence
#    (python str.replace is left-to-right non-overlapping — the same
#    semantics as Spark's and DuckDB's replace(), so this fuzzes the
#    exact kernel llm_bpe_encode ships) --


def _ref_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    st.text(alphabet="abc", min_size=1, max_size=12),
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
        min_size=1,
        max_size=4,
    ),
)
def test_bpe_boundary_encoding_matches_reference(word, char_merges):
    # build a merge list where later merges may reference earlier outputs
    merges = []
    symbols = set("abc")
    for a, b in char_merges:
        merges.append((a, b))
        symbols.add(a + b)
    # reference: merge symbol lists
    syms = list(word)
    for a, b in merges:
        syms = _ref_merge(syms, a, b)
    # kernel: chained replace on the boundary encoding
    s = "·" + "··".join(list(word)) + "·"
    for a, b in merges:
        s = s.replace(f"·{a}··{b}·", f"·{a}{b}·")
    assert s == "·" + "··".join(syms) + "·"


@given(
    st.text(alphabet="ab", min_size=2, max_size=10),
)
def test_bpe_compound_merge_chain(word):
    # (a,b) then (ab,a) then (aba,b): deep compound merges through the
    # same encoding
    merges = [("a", "b"), ("ab", "a"), ("aba", "b")]
    syms = list(word)
    for a, b in merges:
        syms = _ref_merge(syms, a, b)
    s = "·" + "··".join(list(word)) + "·"
    for a, b in merges:
        s = s.replace(f"·{a}··{b}·", f"·{a}{b}·")
    assert s == "·" + "··".join(syms) + "·"


# -- winnowing's single-BIGINT argmin encoding: min over
#    h·2^21 + (2^21−1−pos) must decode to (min hash, RIGHTMOST pos) --


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=0, max_value=2**21 - 1),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_winnowing_combined_bigint_argmin(pairs):
    # distinct positions (a window never repeats a position)
    seen = set()
    window = [(h, p) for h, p in pairs if p not in seen and not seen.add(p)]
    combined = [h * (1 << 21) + ((1 << 21) - 1 - p) for h, p in window]
    m = min(combined)
    dec_h, dec_p = m >> 21, (1 << 21) - 1 - (m % (1 << 21))
    min_h = min(h for h, _ in window)
    rightmost = max(p for h, p in window if h == min_h)
    assert (dec_h, dec_p) == (min_h, rightmost)
