"""Events endpoint with human date grammar (SURVEY §2.11, F3)."""

from datetime import datetime

import pytest

from blueflood_spark.plans.events_api import get_events

NOW = datetime(2024, 3, 14, 10, 0, 0)


@pytest.fixture(scope="module")
def events(spark):
    def ts(d, h):
        return int(datetime(2024, 3, d, h).timestamp())

    rows = [
        ("t1", ts(13, 9), "deploy", "v1 rollout", "deploy"),
        ("t1", ts(13, 22), "alarm", "cpu spike", "alert"),
        ("t1", ts(14, 8), "deploy", "v2 rollout", "deploy"),
        ("t2", ts(14, 8), "deploy", "other tenant", "deploy"),
    ]
    return spark.createDataFrame(rows, "tenant_id string, when long, what string, data string, tags string")


def test_range_with_human_dates(events):
    out = get_events(events, "t1", "yesterday", "now", now=NOW).collect()
    # yesterday 00:00 .. now 10:00 → the two 3/13 events + 3/14 08:00
    assert [r["what"] for r in out] == ["deploy", "alarm", "deploy"]


def test_offset_grammar(events):
    out = get_events(events, "t1", "now-3h", None, now=NOW).collect()
    assert len(out) == 1 and out[0]["data"] == "v2 rollout"


def test_tag_filter_and_tenant_isolation(events):
    out = get_events(events, "t1", "yesterday", "tomorrow", tags="deploy", now=NOW).collect()
    assert len(out) == 2
    assert all(r["tags"] == "deploy" and r["tenant_id"] == "t1" for r in out)
