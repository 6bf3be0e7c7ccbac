"""Granularity ladder + points-budget granularity selection (SURVEY O3).

Re-expresses /root/reference/blueflood-core/.../rollup/Granularity.java:
- 6 fixed resolutions full/5m/20m/60m/240m/1440m (Granularity.java:42-59)
- snapMillis floor-snapping (Granularity.java:130-133)
- slot math over 4032 base slots of 300000 ms (Granularity.java:141-145,
  millisToSlot :342-344)
- granularityFromPointsInInterval with GEOMETRIC / LINEAR / LESSTHANEQUAL
  algorithms and TTL-expired-granularity skip (Granularity.java:185-339)
- per-resolution retention defaults (io/CassandraModel.java:47-59)

This is "aggregate navigation": a pure planner function that picks which
(resolution=...) parquet partition to scan, *before* the DataFrame is
built — partition pruning then does the physical work.
"""

from __future__ import annotations

from dataclasses import dataclass

BASE_SLOTS = 4032
MILLISECONDS_IN_SLOT = 300_000
GET_BY_POINTS_ASSUME_INTERVAL = 30_000  # CoreConfig GET_BY_POINTS_ASSUME_INTERVAL default


@dataclass(frozen=True)
class Granularity:
    name: str  # short name: full|5m|20m|60m|240m|1440m
    milliseconds: int
    num_slots: int
    ttl_days: int  # retention default (CassandraModel.java:47-59)
    index: int

    def snap_millis(self, millis: int) -> int:
        """Floor to a granularity multiple; FULL keeps raw timestamps."""
        if self.name == "full":
            return millis
        return (millis // self.milliseconds) * self.milliseconds

    def slot(self, millis: int) -> int:
        full_slot = millis_to_slot(millis)
        return (self.num_slots * full_slot) // BASE_SLOTS

    @property
    def ttl_millis(self) -> int:
        return self.ttl_days * 86_400_000


def millis_to_slot(millis: int) -> int:
    return (millis % (BASE_SLOTS * MILLISECONDS_IN_SLOT)) // MILLISECONDS_IN_SLOT


FULL = Granularity("full", 300_000, BASE_SLOTS, 5, 0)
MIN_5 = Granularity("5m", 300_000, BASE_SLOTS, 10, 1)
MIN_20 = Granularity("20m", 1_200_000, BASE_SLOTS // 4, 20, 2)
MIN_60 = Granularity("60m", 3_600_000, BASE_SLOTS // 12, 155, 3)
MIN_240 = Granularity("240m", 14_400_000, BASE_SLOTS // 48, 300, 4)
MIN_1440 = Granularity("1440m", 86_400_000, BASE_SLOTS // 288, 1825, 5)

GRANULARITIES = [FULL, MIN_5, MIN_20, MIN_60, MIN_240, MIN_1440]
ROLLUP_GRANULARITIES = [MIN_5, MIN_20, MIN_60, MIN_240, MIN_1440]
LAST = MIN_1440
BY_NAME = {g.name: g for g in GRANULARITIES}

# resolution query-param aliases (types/Resolution.java:19-40)
RESOLUTION_ALIASES = {
    "full": FULL, "min5": MIN_5, "min20": MIN_20,
    "min60": MIN_60, "min240": MIN_240, "min1440": MIN_1440,
}


class TtlProvider:
    """Retention lookup chain mirroring the reference's
    ConfigTtlProvider → SafetyTtlProvider composition
    (cache/CombinedTtlProvider.java, cache/ConfigTtlProvider.java,
    cache/SafetyTtlProvider.java): per-tenant/per-resolution config
    overrides win; otherwise the safety default = 5× the resolution's
    base retention (SafetyTtlProvider uses a generous fallback so data is
    never silently expired by a missing config)."""

    def __init__(
        self,
        config: dict[tuple[str, str], int] | None = None,
        safety_multiplier: int = 5,
    ) -> None:
        # config: {(tenant_id, resolution_name): ttl_millis}
        self.config = dict(config or {})
        self.safety_multiplier = safety_multiplier

    def ttl_millis(self, tenant_id: str, g: "Granularity") -> int:
        override = self.config.get((tenant_id, g.name))
        if override is not None:
            return override
        return g.ttl_millis * self.safety_multiplier

    def as_dict(self, tenant_id: str) -> dict[str, int]:
        """Per-resolution map for from_points_in_interval's ttl_millis arg."""
        return {g.name: self.ttl_millis(tenant_id, g) for g in GRANULARITIES}


def ranges_for_interval(g: Granularity, from_ms: int, to_ms: int) -> list[tuple[int, int]]:
    """Window [start, end] pairs covering [from, to] at granularity g —
    the reference's Range.rangesForInterval iterator (Range.java:84-137);
    FULL uses the 5m slot width like the reference's slot partitioning."""
    width = MILLISECONDS_IN_SLOT if g.name == "full" else g.milliseconds
    start = (from_ms // width) * width
    out = []
    while start <= to_ms:
        out.append((start, start + width - 1))
        start += width
    return out


def derive_range(g: Granularity, slot: int, reference_ms: int) -> tuple[int, int]:
    """Recover the time range of a (possibly wrapped) slot relative to a
    reference time (Granularity.deriveRange, Granularity.java:164-172) —
    used when a late slot resurfaces and we must find its window."""
    reference_ms = g.snap_millis(reference_ms)
    ref_slot = g.slot(reference_ms)
    slot_diff = (g.num_slots - slot + ref_slot) if slot > ref_slot else (ref_slot - slot)
    start = reference_ms - slot_diff * g.milliseconds
    return (start, start + g.milliseconds - 1)


def coarser(g: Granularity) -> Granularity:
    if g.index >= LAST.index:
        raise ValueError(f"No granularity coarser than {g.name}")
    return GRANULARITIES[g.index + 1]


def finer(g: Granularity) -> Granularity:
    if g.index == 0:
        raise ValueError(f"No granularity finer than {g.name}")
    return GRANULARITIES[g.index - 1]


def from_points_in_interval(
    from_ms: int,
    to_ms: int,
    points: int,
    algorithm: str = "GEOMETRIC",
    assumed_interval_ms: int = GET_BY_POINTS_ASSUME_INTERVAL,
    now_ms: int | None = None,
    ttl_millis: dict[str, int] | None = None,
) -> Granularity:
    """Pick the granularity whose point count best fits `points`
    (Granularity.java:185-238 dispatch)."""
    if from_ms >= to_ms:
        raise ValueError("Invalid interval specified for fromPointsInInterval")
    duration = float(to_ms - from_ms)
    if algorithm.startswith("LINEAR"):
        return _from_points_linear(duration, points, assumed_interval_ms)
    if algorithm.startswith("LESSTHANEQUAL"):
        return _from_points_lte(duration, points, assumed_interval_ms)
    return _from_points_geometric(from_ms, duration, points, assumed_interval_ms, now_ms, ttl_millis)


def _from_points_linear(duration: float, points: int, assumed_interval_ms: int) -> Granularity:
    """Minimize |points - providable| (Granularity.java:248-287); the scan
    stops at the first non-improving granularity, like the reference."""
    closest = None
    best = None
    for g in GRANULARITIES:
        period = assumed_interval_ms if g is FULL else g.milliseconds
        diff = int(abs(points - duration / period))
        if closest is None or diff < closest:
            closest = diff
            best = g
        else:
            break
    return best


def _from_points_lte(duration: float, points: int, assumed_interval_ms: int) -> Granularity:
    """Linear pick, then coarsen once if it would still overshoot
    (Granularity.java:261-271)."""
    g = _from_points_linear(duration, points, assumed_interval_ms)
    if duration / g.milliseconds > points:
        try:
            g = coarser(g)
        except ValueError:
            pass
    return g


def _from_points_geometric(
    from_ms: int,
    duration: float,
    requested_points: int,
    assumed_interval_ms: int,
    now_ms: int | None,
    ttl_millis: dict[str, int] | None,
) -> Granularity:
    """Minimize the "absolute ratio" max(p/r, r/p); skip granularities whose
    TTL has already expired for the range start (Granularity.java:298-339)."""
    best_ratio = 1.7976931348623157e308  # Double.MAX_VALUE, like the reference
    best = None
    for g in GRANULARITIES:
        if now_ms is not None:
            ttl = (ttl_millis or {}).get(g.name, g.ttl_millis)
            if from_ms < now_ms - ttl:
                continue
        period = assumed_interval_ms if g is FULL else g.milliseconds
        providable = duration / period
        # Java double division never raises: providable/0 is Infinity, so
        # the reference breaks on the first granularity and falls through
        # to LAST for points <= 0 (Granularity.java:298-339). Mirror that
        # instead of letting Python raise ZeroDivisionError.
        if requested_points == 0:
            ratio = float("inf") if providable > 0 else float("nan")
        elif providable == 0:
            ratio = float("inf")
        else:
            ratio = (
                providable / requested_points
                if providable > requested_points
                else requested_points / providable
            )
        if ratio < best_ratio:
            best_ratio = ratio
            best = g
        else:
            break
    return best if best is not None else LAST
