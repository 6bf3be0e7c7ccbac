"""Ingest validation + preagg normalization (SURVEY P1/P2/P4/P5, S3)."""

import json

from pyspark.sql import functions as F

from blueflood_spark.sources import ingest as I

NOW = 1_700_000_000_000


def payload_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "tenantId string, metricName string, metricValue double, collectionTime long,"
        " ttlInSeconds int, unit string",
    )


def test_validation_split(spark):
    rows = [
        ("t1", "ok.metric", 1.0, NOW - 1000, 3600, "bytes"),
        ("t1", "", 1.0, NOW, 3600, None),  # empty name
        ("t1", "old.metric", 1.0, NOW - 4 * 86_400_000, 3600, None),  # too old
        ("t1", "future.metric", 1.0, NOW + 3_600_000, 3600, None),  # too far ahead
        ("t1", "badttl.metric", 1.0, NOW, 0, None),  # ttl < 1
        (None, "notenant.metric", 1.0, NOW, 60, None),
    ]
    raw = I.parse_ingest_json(spark, payload_df(spark, rows))
    valid, rejected = I.validate(raw, NOW)
    assert valid.count() == 1
    errs = {r["metric_name"]: r["error"] for r in rejected.collect()}
    assert errs[""] == "missing metricName"
    assert "past" in errs["old.metric"]
    assert "future" in errs["future.metric"]
    assert "ttl" in errs["badttl.metric"].lower()
    assert errs["notenant.metric"] == "missing tenantId"


def test_parse_json_file(spark, tmp_path):
    p = tmp_path / "ingest.json"
    with open(p, "w") as f:
        for i in range(5):
            f.write(
                json.dumps(
                    {
                        "metricName": f"m.{i}",
                        "metricValue": float(i),
                        "collectionTime": NOW + i,
                        "ttlInSeconds": 60,
                    }
                )
                + "\n"
            )
    df = I.parse_ingest_json(spark, str(p), tenant_id="tX")
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["tenant_id"] == "tX" for r in rows)  # path tenant fallback (S1 vs S2)


def test_force_ttls(spark):
    raw = I.parse_ingest_json(
        spark, payload_df(spark, [("t1", "m", 1.0, NOW, 3600, None), ("t1", "m2", 1.0, NOW, None, None)])
    )
    forced = I.force_ttls(raw, 86400)
    assert {r["ttl_seconds"] for r in forced.collect()} == {86400}


def test_flag_delayed(spark):
    raw = I.parse_ingest_json(
        spark,
        payload_df(
            spark,
            [("t1", "fresh", 1.0, NOW - 1000, 60, None), ("t1", "late", 1.0, NOW - 600_000, 60, None)],
        ),
    )
    flagged = {r["metric_name"]: r["is_delayed"] for r in I.flag_delayed(raw, NOW).collect()}
    assert flagged == {"fresh": False, "late": True}


def aggregated_payload_df(spark):
    data = [
        {
            "tenantId": "t1",
            "timestamp": NOW,
            "flushInterval": 10_000,
            "counters": [{"name": "c1", "value": 50.0, "rate": 5.0}],
            "gauges": [{"name": "g1", "value": 42.0}],
            "timers": [
                {
                    "name": "tm1",
                    "count": 100,
                    "rate": 10.0,
                    "min": 1.0,
                    "max": 9.0,
                    "sum": 500.0,
                    "avg": 5.0,
                    "std": 2.0,
                    "percentiles": {"50": {"avg": 5.0}, "95": {"avg": 8.5}},
                }
            ],
            "sets": [{"name": "s1", "values": ["a", "b", "a"]}],
        }
    ]
    return spark.createDataFrame(data, I.AGGREGATED_PAYLOAD)


def test_normalize_aggregated(spark):
    out = I.normalize_aggregated(aggregated_payload_df(spark))
    rows = {r["rollup_type"]: r for r in out.collect()}
    assert set(rows) == {"counter", "gauge", "timer", "set"}
    c = rows["counter"]
    # sampleCount = rate * flushInterval/1000 (PreaggregateConversions.java:61-64)
    assert c["sample_count"] == 50
    assert c["counter_value"] == 50.0
    t = rows["timer"]
    assert t["timer_percentiles"] == {"50": 5.0, "95": 8.5}
    assert t["timer_std"] == 2.0
    assert rows["gauge"]["gauge_value"] == 42.0
    assert rows["set"]["set_values"] == ["a", "b", "a"]


def test_normalize_aggregated_zero_flush(spark):
    df = aggregated_payload_df(spark).withColumn("flushInterval", F.lit(0).cast("long"))
    c = [r for r in I.normalize_aggregated(df).collect() if r["rollup_type"] == "counter"][0]
    assert c["sample_count"] == 1  # flushInterval 0 → sampleCount 1


def test_route_by_type(spark):
    routed = I.route_by_type(I.normalize_aggregated(aggregated_payload_df(spark)))
    assert routed["counter"].count() == 1
    assert routed["timer"].count() == 1
    assert routed["counter"].collect()[0]["metric_name"] == "c1"
