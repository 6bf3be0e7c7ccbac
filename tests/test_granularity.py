"""Granularity ladder + points-budget selection, mirroring the reference's
GranularityTest (reference: blueflood-core .../rollup/GranularityTest.java)."""

from blueflood_spark.operators import granularity as G

HOUR = 3_600_000
DAY = 86_400_000
BASE = 1_335_796_192_000  # arbitrary epoch ms, like the reference's baseMillis


def sel(from_ms, to_ms, points, **kw):
    return G.from_points_in_interval(from_ms, to_ms, points, **kw).name


def test_geometric_ladder_one_day():
    # GranularityTest.java:96-101 — 24h span, decreasing point budgets
    assert sel(BASE, BASE + DAY, 86400) == "full"
    assert sel(BASE, BASE + DAY, 288) == "5m"
    assert sel(BASE, BASE + DAY, 72) == "20m"
    assert sel(BASE, BASE + DAY, 24) == "60m"
    assert sel(BASE, BASE + DAY, 6) == "240m"
    assert sel(BASE, BASE + DAY, 1) == "1440m"


def test_geometric_half_day():
    # GranularityTest.java:106-111
    assert sel(BASE, BASE + 43_200_000, 800) == "full"
    assert sel(BASE, BASE + 43_200_000, 288) == "5m"
    assert sel(BASE, BASE + 43_200_000, 144) == "5m"
    assert sel(BASE, BASE + 43_200_000, 35) == "20m"
    assert sel(BASE, BASE + 43_200_000, 11) == "60m"
    assert sel(BASE, BASE + 43_200_000, 3) == "240m"


def test_geometric_spot_checks():
    # GranularityTest.java:197-212 — 300 points across widening ranges
    assert sel(BASE, BASE + HOUR, 300) == "full"
    assert sel(BASE, BASE + 8 * HOUR, 300) == "5m"
    assert sel(BASE, BASE + 12 * HOUR, 300) == "5m"
    assert sel(BASE, BASE + DAY, 300) == "5m"
    assert sel(BASE, BASE + 7 * DAY, 300) == "20m"
    assert sel(BASE, BASE + 30 * DAY, 300) == "240m"


def test_geometric_ttl_skip():
    # Granularity.java:305-309: grans whose TTL expired for `from` are skipped
    now = BASE + 400 * DAY
    g = G.from_points_in_interval(BASE, BASE + DAY, 86400, now_ms=now)
    assert g.name == "1440m"  # everything shorter-lived has expired


def test_invalid_interval():
    import pytest

    with pytest.raises(ValueError):
        G.from_points_in_interval(BASE + 2, BASE + 1, 3)


def test_linear_and_lte():
    # LINEAR minimizes |points - providable|; LESSTHANEQUAL coarsens once on overshoot
    assert sel(BASE, BASE + DAY, 288, algorithm="LINEAR") == "5m"
    # 5m provides 288 points: ≤300 keeps 5m; 200 overshoots → coarsen to 20m
    assert sel(BASE, BASE + DAY, 300, algorithm="LESSTHANEQUAL") == "5m"
    assert sel(BASE, BASE + DAY, 200, algorithm="LESSTHANEQUAL") == "20m"


def test_snap_millis():
    # GranularityTest.java:552-561
    assert G.FULL.snap_millis(1234) == 1234
    assert G.FULL.snap_millis(1_234_567) == 1_234_567
    assert G.MIN_5.snap_millis(1234) == 0
    assert G.MIN_5.snap_millis(300_000) == 300_000
    assert G.MIN_1440.snap_millis(86_399_999) == 0


def test_slot_math():
    # Granularity.java:141-145, millisToSlot :342-344
    assert G.millis_to_slot(0) == 0
    assert G.millis_to_slot(300_000) == 1
    assert G.millis_to_slot(G.BASE_SLOTS * 300_000) == 0  # wraps
    assert G.MIN_20.slot(1_200_000) == 1
    assert G.MIN_1440.slot(86_400_000) == 1


def test_coarser_finer():
    assert G.coarser(G.FULL) is G.MIN_5
    assert G.finer(G.MIN_1440) is G.MIN_240
    import pytest

    with pytest.raises(ValueError):
        G.coarser(G.MIN_1440)


def test_ttl_provider_chain():
    # ConfigTtlProvider override wins; SafetyTtlProvider 5x fallback otherwise
    p = G.TtlProvider(config={("t1", "5m"): 86_400_000})
    assert p.ttl_millis("t1", G.MIN_5) == 86_400_000
    assert p.ttl_millis("t2", G.MIN_5) == G.MIN_5.ttl_millis * 5
    d = p.as_dict("t1")
    assert d["5m"] == 86_400_000 and d["1440m"] == G.MIN_1440.ttl_millis * 5
    # selection consults the per-tenant map: short 5m TTL skips 5m for old ranges
    now = BASE + 30 * DAY
    tight = G.TtlProvider(config={("t1", "full"): DAY, ("t1", "5m"): DAY})
    g = G.from_points_in_interval(
        BASE, BASE + DAY, 288, now_ms=now, ttl_millis=tight.as_dict("t1")
    )
    assert g.name != "5m" and g.name != "full"
