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
