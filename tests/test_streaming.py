"""End-to-end streaming: ingest topology → raw table → watermarked 5m
rollup → late-data re-roll (SURVEY §2.9 T1-T5, mirroring the reference's
integration tests ingest→rollup→query)."""

import json
import time

import pytest
from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G
from blueflood_spark.sources import tables as TBL
from blueflood_spark.streaming import pipeline as P

MIN = 60_000


def write_payload(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def sample(tenant, name, ts, value):
    return {
        "tenantId": tenant,
        "metricName": name,
        "metricValue": value,
        "collectionTime": ts,
        "ttlInSeconds": 3600,
    }


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("input", "raw", "rejected", "delayed", "rollups", "ckpt_ingest", "ckpt_rollup")
    }
    import os

    os.makedirs(d["input"])
    return d


def test_ingest_to_rollup_end_to_end(spark, dirs):
    now = int(time.time() * 1000)
    # 20m-aligned base 40 min back: the 10 samples are all > ROLLUP_DELAY old
    # (so P2 flags them delayed) and land in exactly one 20m slot
    base = (now // (20 * MIN)) * 20 * MIN - 40 * MIN
    rows = [sample("t1", "svc.cpu", base + i * MIN, float(i)) for i in range(10)]
    # trailing samples push the watermark (max_event − 5m) past the first window
    rows.append(sample("t1", "svc.cpu", base + 12 * MIN, 100.0))
    rows.append(sample("t1", "svc.cpu", base + 14 * MIN, 101.0))
    rows.append(sample("t1", "", base, 1.0))  # invalid → rejected
    rows.append(sample("t1", "svc.cpu", now - 2 * 86_400_000, 99.0))  # very late
    write_payload(f"{dirs['input']}/batch1.json", rows)

    q = P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], dirs["ckpt_ingest"]
    )
    q.awaitTermination(120)

    raw = spark.read.parquet(dirs["raw"])
    assert raw.count() == 13  # 12 samples + 1 very-late; invalid row excluded
    rejected = spark.read.parquet(dirs["rejected"])
    assert rejected.count() == 1 and rejected.collect()[0]["error"] == "missing metricName"
    delayed = spark.read.parquet(dirs["delayed"])
    # two distinct delayed 20m slots: the 10-sample slot + the 2-day-old row's
    assert delayed.count() == 2

    rq = P.start_streaming_rollup(
        spark, dirs["raw"], dirs["rollups"], dirs["ckpt_rollup"], G.MIN_5
    )
    rq.awaitTermination(120)
    rolled = spark.read.parquet(dirs["rollups"])
    rows5 = {r["window_start"]: r for r in rolled.filter(F.col("metric_name") == "svc.cpu").collect()}
    # watermark = 5 min: the max-event-time window is held back, earlier ones emitted
    assert len(rows5) >= 2
    first = rows5[base]
    assert first["num_points"] == 5 and first["avg"] == 2.0


def test_reroll_recomputes_late_windows(spark, dirs):
    now = int(time.time() * 1000)
    late_ts = now - 2 * 86_400_000
    slot = (late_ts // (20 * MIN)) * 20 * MIN
    rows = [sample("t1", "svc.mem", late_ts + i * 1000, 10.0) for i in range(4)]
    write_payload(f"{dirs['input']}/late.json", rows)
    q = P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], dirs["ckpt_ingest"]
    )
    q.awaitTermination(120)

    out = P.reroll(spark, dirs["raw"], dirs["delayed"], G.MIN_5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["num_points"] == 4 and r["avg"] == 10.0
    assert (r["window_start"] // (20 * MIN)) * 20 * MIN == slot


def test_tables_roundtrip_and_retention(spark, tmp_path):
    path = str(tmp_path / "rollups")
    now = 1_700_000_000_000
    df = spark.createDataFrame(
        [
            ("t1", "m.a", "5m", now - 2 * 86_400_000, 5, 1.0),
            ("t1", "m.a", "5m", now - 20 * 86_400_000, 5, 2.0),  # past 10d retention of 5m
            ("t1", "m.a", "60m", now - 20 * 86_400_000, 5, 3.0),
        ],
        "tenant_id string, metric_name string, resolution string, window_start long,"
        " num_points long, avg double",
    )
    TBL.write_rollups(df, path, mode="overwrite")
    got = TBL.read_rollups(
        spark, path, "5m", tenant_id="t1", metric_names=["m.a"],
        from_ms=now - 30 * 86_400_000, to_ms=now,
    )
    assert got.count() == 2  # resolution pruning works
    live = got.filter(TBL.retention_predicate("5m", now))
    assert live.count() == 1  # TTL predicate hides the 20-day-old 5m row
    # partition-drop candidates: the expired 5m partition, not the 60m one
    expired = TBL.expired_partitions(spark, path, now)
    assert any(res == "5m" for res, _ in expired)
    assert not any(res == "60m" for res, _ in expired)
    # the drop job removes exactly those partitions; surviving data intact
    dropped = TBL.drop_expired(spark, path, now)
    assert sorted(dropped) == sorted(expired)
    left = spark.read.parquet(path)
    assert left.filter("resolution = '60m'").count() == 1
    assert left.filter("resolution = '5m'").count() == 1  # recent 5m row only
    assert TBL.expired_partitions(spark, path, now) == []  # idempotent


def test_slot_tracker_stateful(spark, dirs, tmp_path):
    """Custom stateful operator: slots emit only after the quiet period
    (delay), surviving across restarts via the state store."""
    import os

    now = int(time.time() * 1000)
    base = (now // (20 * MIN)) * 20 * MIN - 60 * MIN
    rows = [sample("t1", "svc.disk", base + i * MIN, 1.0) for i in range(5)]
    write_payload(f"{dirs['input']}/s1.json", rows)
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], dirs["ckpt_ingest"]
    ).awaitTermination(120)

    slots_out = str(tmp_path / "slots")
    ckpt = str(tmp_path / "ckpt_slots")
    # run 1: samples arrive, state created, nothing eligible yet
    P.start_slot_tracker(spark, dirs["raw"], slots_out, ckpt, delay_ms=2000).awaitTermination(120)
    import glob

    def emitted():
        if not glob.glob(f"{slots_out}/*.parquet"):
            return []
        return spark.read.parquet(slots_out).collect()

    # (whether run 1 already emitted depends on micro-batch timing vs the
    # 2s delay — availableNow may run several batches; don't assert here)
    # wait past the delay, then poke the stream with an unrelated sample so
    # a new micro-batch runs and fires the timeout (the reference's poll tick)
    time.sleep(3)
    write_payload(f"{dirs['input']}/s2.json", [sample("t1", "other.metric", base, 1.0)])
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], dirs["ckpt_ingest"]
    ).awaitTermination(120)
    P.start_slot_tracker(spark, dirs["raw"], slots_out, ckpt, delay_ms=2000).awaitTermination(120)
    out = {r["metric_name"]: r for r in emitted()}
    assert "svc.disk" in out
    assert out["svc.disk"]["n_samples"] == 5


def test_discovery_upsert_no_reupsert(spark, dirs, tmp_path):
    """P7 locator-cache filter: a second batch with already-known locators
    must not re-upsert them — the catalog stays one row per locator
    (cache/LocatorCache.java role as a left-anti join)."""
    catalog = str(tmp_path / "catalog")
    now = int(time.time() * 1000)
    rows = [
        sample("t1", "svc.cpu", now - 60_000, 1.0),
        sample("t1", "svc.mem", now - 60_000, 2.0),
    ]
    write_payload(f"{dirs['input']}/b1.json", rows)
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"],
        dirs["ckpt_ingest"], catalog_path=catalog,
    ).awaitTermination(120)
    assert spark.read.parquet(catalog).count() == 2

    # batch 2: one known locator (re-sent) + one new
    rows2 = [
        sample("t1", "svc.cpu", now - 30_000, 3.0),
        sample("t1", "svc.disk", now - 30_000, 4.0),
    ]
    write_payload(f"{dirs['input']}/b2.json", rows2)
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"],
        dirs["ckpt_ingest"], catalog_path=catalog,
    ).awaitTermination(120)
    cat = spark.read.parquet(catalog)
    assert cat.count() == 3  # svc.cpu NOT re-upserted
    assert cat.groupBy("tenant_id", "metric_name").count().filter("count > 1").count() == 0


def test_rollup_event_emission(spark, dirs, tmp_path):
    """T6 rollup-completion events (RollupEventEmitter.java): every
    finalized window's rollup write also emits an event row."""
    events = str(tmp_path / "rollup_events")
    now = int(time.time() * 1000)
    base = (now // (20 * MIN)) * 20 * MIN - 40 * MIN
    rows = [sample("t1", "svc.io", base + i * MIN, float(i)) for i in range(10)]
    rows.append(sample("t1", "svc.io", base + 14 * MIN, 100.0))  # advances watermark
    write_payload(f"{dirs['input']}/e1.json", rows)
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], dirs["ckpt_ingest"]
    ).awaitTermination(120)
    P.start_streaming_rollup(
        spark, dirs["raw"], dirs["rollups"], dirs["ckpt_rollup"], G.MIN_5, events_path=events
    ).awaitTermination(120)
    rolled = spark.read.parquet(dirs["rollups"]).select(
        "tenant_id", "metric_name", "window_start", "resolution"
    )
    ev = spark.read.parquet(events)
    assert set(ev.columns) == {
        "tenant_id", "metric_name", "window_start", "resolution", "emitted_at_ms", "batch_id"
    }
    # exactly one event per emitted rollup window
    missing = rolled.join(
        ev, ["tenant_id", "metric_name", "window_start", "resolution"], "left_anti"
    )
    assert missing.count() == 0
    assert ev.count() == rolled.count()


def test_ingest_dedup_within_watermark(spark, dirs):
    """Duplicate samples (client retry) are dropped when dedup=True."""
    now = int(time.time() * 1000)
    rows = [sample("t1", "svc.net", now - 60_000, 5.0)] * 3  # same locator+ts 3x
    rows.append(sample("t1", "svc.net", now - 30_000, 7.0))
    write_payload(f"{dirs['input']}/dup.json", rows)
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"],
        dirs["ckpt_ingest"], dedup=True,
    ).awaitTermination(120)
    raw = spark.read.parquet(dirs["raw"])
    assert raw.count() == 2  # 3 identical rows collapse to 1, plus the distinct one


def test_preagg_streaming_ingest(spark, tmp_path):
    """S3 statsd stream: payloads → normalize → per-family tables, with
    the counter sampleCount derivation surviving the trip."""
    import os

    inp = str(tmp_path / "agg_input")
    tables = str(tmp_path / "preagg_tables")
    ckpt = str(tmp_path / "ckpt_preagg")
    os.makedirs(inp)
    now = int(time.time() * 1000)
    payload = {
        "tenantId": "t1",
        "timestamp": now,
        "flushInterval": 30000,
        "counters": [{"name": "c.hits", "value": 60.0, "rate": 2.0}],
        "gauges": [{"name": "g.depth", "value": 7.5}],
        "timers": [
            {
                "name": "t.req",
                "count": 10,
                "rate": 0.33,
                "min": 1.0,
                "max": 9.0,
                "sum": 50.0,
                "avg": 5.0,
                "std": 2.0,
                "percentiles": {"p99": {"avg": 8.8}},
            }
        ],
        "sets": [{"name": "s.users", "values": ["a", "b", "a"]}],
    }
    write_payload(f"{inp}/batch1.json", [payload])
    q = P.start_preagg_ingest(spark, inp, tables, ckpt)
    q.awaitTermination(120)

    counters = spark.read.parquet(f"{tables}/preagg_counter").collect()
    assert len(counters) == 1
    c = counters[0]
    assert c["metric_name"] == "c.hits" and c["counter_value"] == 60.0
    # sampleCount = rate * flushInterval/1000 = 2.0 * 30 = 60
    assert c["sample_count"] == 60
    gauges = spark.read.parquet(f"{tables}/preagg_gauge").collect()
    assert gauges[0]["gauge_value"] == 7.5
    timers = spark.read.parquet(f"{tables}/preagg_timer").collect()
    assert timers[0]["timer_percentiles"] == {"p99": 8.8}
    sets = spark.read.parquet(f"{tables}/preagg_set").collect()
    assert sorted(sets[0]["set_values"]) == ["a", "a", "b"]


def test_doc_ingest_stream_dedups_and_gates(spark, tmp_path):
    """Streaming corpus ingest: cross-batch (and cross-restart) content
    dedup via checkpointed state, quality gate fan-out to kept/rejected."""
    import json
    import os

    inp = str(tmp_path / "docs_in")
    kept = str(tmp_path / "kept")
    rejected = str(tmp_path / "rejected")
    ckpt = str(tmp_path / "doc_ckpt")
    os.makedirs(inp)

    good_a = "the quick brown fox jumps over a lazy dog and runs far away today"
    good_b = "a steady stream of documents flows into the corpus for training runs"
    junk = "zx qq"  # below min_tokens -> rejected

    def write_docs(name, rows):
        with open(f"{inp}/{name}", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_docs("b1.json", [
        {"doc_id": 1, "text": good_a, "lang": "en", "source": "s1"},
        {"doc_id": 2, "text": junk, "lang": "en", "source": "s1"},
    ])
    P.start_doc_ingest(spark, inp, kept, rejected, ckpt).awaitTermination(120)

    # second batch (fresh start, same checkpoint): duplicate of doc 1's
    # CONTENT under a new id must be dropped by the state store; one new doc
    write_docs("b2.json", [
        {"doc_id": 10, "text": good_a, "lang": "en", "source": "s2"},
        {"doc_id": 11, "text": good_b, "lang": "en", "source": "s2"},
    ])
    P.start_doc_ingest(spark, inp, kept, rejected, ckpt).awaitTermination(120)

    kept_rows = spark.read.parquet(kept).collect()
    assert sorted(r["doc_id"] for r in kept_rows) == [1, 11]
    assert len({r["content_md5"] for r in kept_rows}) == 2
    rej = spark.read.parquet(rejected).collect()
    assert [r["doc_id"] for r in rej] == [2]
    assert rej[0]["drop_reason"] == "too_short"


def test_ingest_replay_is_idempotent(spark, dirs):
    """T7 for the ingest sinks: re-processing the same micro-batch (same
    batch_id — here forced by replaying the same input against a FRESH
    checkpoint into the same sink paths) rewrites its batch_id partition
    instead of appending duplicates."""
    now = int(time.time() * 1000)
    rows = [sample("t1", "svc.replay", now - 60_000 - i * 1000, float(i)) for i in range(6)]
    rows.append(sample("t1", "", now, 1.0))  # one rejected row
    write_payload(f"{dirs['input']}/replay.json", rows)
    for attempt in range(2):
        ckpt = f"{dirs['ckpt_ingest']}_replay{attempt}"  # fresh ckpt → batch_id 0 again
        P.start_ingest(
            spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], ckpt
        ).awaitTermination(120)
    raw = spark.read.parquet(dirs["raw"])
    assert raw.count() == 6  # NOT 12: replay overwrote batch_id=0
    assert spark.read.parquet(dirs["rejected"]).count() == 1


def test_session_stream_matches_batch_session_window(spark, tmp_path):
    """Streaming gap sessions finalize exactly the sessions the batch
    session_window query computes on the same (watermark-closed) data."""
    import os

    ev_dir = str(tmp_path / "sess_events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt_sessions")
    os.makedirs(ev_dir)
    base = 1_700_000_000_000  # fixed epoch ms, deterministic
    rows = []
    # user 1: two sessions (3 events tight, then a 2-gap jump, 2 events)
    for i, off in enumerate([0, 5 * MIN, 9 * MIN]):
        rows.append((1, base + off, "click"))
    rows.extend([(1, base + 80 * MIN, "click"), (1, base + 85 * MIN, "buy")])
    # user 2: one long session bridged by sub-gap steps
    rows.extend([(2, base + i * 20 * MIN, "view") for i in range(4)])
    # late-but-inside-watermark event lands in user 1's first session
    rows.append((1, base + 12 * MIN, "late"))
    spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string").repartition(
        1
    ).write.mode("append").parquet(ev_dir)

    q = P.start_session_stream(spark, ev_dir, out_dir, ckpt, gap_seconds=30 * 60,
                               watermark_seconds=300)
    q.awaitTermination(120)
    # single availableNow run: watermark still at batch-1 floor — nothing final
    # now push the watermark far past every session and restart (same ckpt)
    spark.createDataFrame(
        [(99, base + 500 * MIN, "tick")], "user_id long, ts_ms long, event_type string"
    ).repartition(1).write.mode("append").parquet(ev_dir)
    q = P.start_session_stream(spark, ev_dir, out_dir, ckpt, gap_seconds=30 * 60,
                               watermark_seconds=300)
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"]): r
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = (
        spark.read.parquet(ev_dir)
        .filter(F.col("user_id") != 99)
        .groupBy("user_id", F.session_window(F.timestamp_millis(F.col("ts_ms")), "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts_ms").alias("session_start"),
             F.max("ts_ms").alias("session_end"))
        .collect()
    )
    expect = {(r["user_id"], r["session_start"]): r for r in batch}
    assert set(got) == set(expect)
    for k, r in expect.items():
        assert got[k]["n_events"] == r["n_events"], k
        assert got[k]["session_end"] == r["session_end"], k
    # semantic spot-checks: the late event extended session 1 (4 events),
    # user 2's sub-gap chain stayed ONE session
    assert got[(1, base)]["n_events"] == 4
    assert got[(2, base)]["n_events"] == 4
    assert got[(1, base + 80 * MIN)]["n_events"] == 2


def test_ingest_replay_reclassification_leaves_no_stale_rows(spark, dirs):
    """A replay of the same batch_id can classify rows DIFFERENTLY (the
    validation clock moved between attempts). Every sink static-
    overwrites its whole batch_id directory unconditionally, so a row
    that switches sinks on retry must vanish from its old sink. Here the
    drift is simulated by editing the input between two fresh-checkpoint
    runs that both process batch_id=0 into the same sink paths."""
    now = int(time.time() * 1000)
    good = [sample("t1", "svc.drift", now - 60_000 - i * 1000, float(i)) for i in range(3)]
    # attempt 1: one row invalid → lands in rejected
    write_payload(f"{dirs['input']}/drift.json", good + [sample("t1", "", now, 9.0)])
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"],
        f"{dirs['ckpt_ingest']}_a",
    ).awaitTermination(120)
    assert spark.read.parquet(dirs["rejected"]).count() == 1
    # attempt 2 (same batch_id=0, same sinks): the row is now valid
    write_payload(
        f"{dirs['input']}/drift.json", good + [sample("t1", "svc.drift", now - 1000, 9.0)]
    )
    P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"],
        f"{dirs['ckpt_ingest']}_b",
    ).awaitTermination(120)
    raw = spark.read.parquet(dirs["raw"]).filter(F.col("metric_name") == "svc.drift")
    assert raw.count() == 4  # 3 good + the re-classified row, once
    # the stale rejected copy from attempt 1 was overwritten away
    assert spark.read.parquet(dirs["rejected"]).count() == 0


def test_corpus_guard_stream(spark, tmp_path):
    """Streaming corpus-membership guard: incoming docs are checked
    against a materialized corpus — exact copies and LSH-verified
    near-dups divert to dup_path with their matched corpus id; fresh
    docs (including one REUSING a corpus doc_id with new text — the
    disjoint-key remap case) pass through."""
    import json
    import os

    inp = str(tmp_path / "guard_in")
    corpus_path = str(tmp_path / "corpus")
    kept = str(tmp_path / "guard_kept")
    dup = str(tmp_path / "guard_dup")
    ckpt = str(tmp_path / "guard_ckpt")
    os.makedirs(inp)

    base = ("the quick brown fox jumps over the lazy dog every day"
            " in the green field near the old mill")
    spark.createDataFrame(
        [(0, base), (1, "metrics rollups aggregate time series data in windows")],
        "doc_id long, text string",
    ).write.parquet(corpus_path)

    rows = [
        {"doc_id": 100, "text": base, "lang": "en", "source": "s"},  # exact dup of 0
        # all-band LSH collision with corpus doc 0 (J=0.889, verified offline)
        {"doc_id": 101, "text": base.replace("old mill", "old barn"),
         "lang": "en", "source": "s"},
        {"doc_id": 1, "text": "totally fresh content reusing a corpus id here",
         "lang": "en", "source": "s"},
    ]
    with open(f"{inp}/b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    P.start_corpus_guard(spark, inp, corpus_path, kept, dup, ckpt).awaitTermination(120)

    kept_ids = sorted(r["doc_id"] for r in spark.read.parquet(kept).collect())
    assert kept_ids == [1]
    dups = {r["doc_id"]: r for r in spark.read.parquet(dup).collect()}
    assert set(dups) == {100, 101}
    assert dups[100]["exact_dup"] and dups[100]["exact_match_id"] == 0
    assert dups[101]["near_dup"] and dups[101]["near_match_id"] == 0
    assert not dups[101]["exact_dup"]


def test_delayed_sink_matches_batch_locator_registry(spark, dirs):
    """S8 differential: the STREAMING delayed side-channel and the batch
    bf_delayed_locators derivation must register the same (slot,
    locator) set. The stream records slot_window_start (epoch ms); the
    batch registry keys by the reference's 20m slot INDEX — related by
    Granularity.slot/millisToSlot ((ws % 14d) / 300000 / 4)."""
    from blueflood_spark.functions.hashing import shard_of

    now = int(time.time() * 1000)
    base = (now // (20 * MIN)) * 20 * MIN - 80 * MIN
    rows = []
    for s in range(3):  # three distinct 20m slots, two locators
        rows.append(sample("t1", "svc.cpu", base + s * 20 * MIN, 1.0))
        rows.append(sample("t1", "svc.mem", base + s * 20 * MIN + MIN, 2.0))
    rows.append(sample("t1", "svc.cpu", now - MIN, 3.0))  # on time: excluded
    write_payload(f"{dirs['input']}/batch1.json", rows)
    q = P.start_ingest(
        spark, dirs["input"], dirs["raw"], dirs["rejected"], dirs["delayed"], dirs["ckpt_ingest"]
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(dirs["delayed"]).select(
        F.expr(
            "CAST(((slot_window_start % 1209600000) DIV 300000) DIV 4 AS INT)"
        ).alias("slot"),
        "tenant_id",
        "metric_name",
    )
    got = {(r["slot"], r["tenant_id"], r["metric_name"]) for r in streamed.collect()}
    # batch derivation from the same inputs (python twin of the query)
    expect = set()
    for r in rows[:-1]:  # the on-time row must not appear
        slot = ((r["collectionTime"] % 1_209_600_000) // 300_000) // 4
        expect.add((slot, r["tenantId"], r["metricName"]))
    assert got == expect
    # shard parity spot-check: the registry's shard column (batch path)
    # uses the same md5 hash as the reference's Util.computeShard
    assert 0 <= shard_of("t1,svc.cpu") < 128


def test_stream_stream_interval_join_matches_bruteforce(spark, tmp_path):
    """Stream-stream interval join (start_touch_join_stream): every
    (conversion, touch) pair of the same user with the touch strictly
    inside the preceding window — verified against a brute-force pair
    set, including the exclusive upper bound and the window cutoff."""
    import os

    t_dir, c_dir = str(tmp_path / "touch"), str(tmp_path / "conv")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(t_dir), os.makedirs(c_dir)
    base = 1_700_000_000_000
    touches = [
        (1, 10, base + 1_000, "view"),
        (2, 10, base + 5_000, "click"),
        (3, 10, base + 9_000, "view"),      # == conv ts → excluded (strict)
        (4, 20, base + 2_000, "view"),
        (5, 30, base + 1_000, "view"),      # 59s before conv → outside 30s
    ]
    convs = [
        (100, 10, base + 9_000, "purchase"),
        (101, 20, base + 4_000, "purchase"),
        (102, 30, base + 60_000, "purchase"),
    ]
    schema = "event_id long, user_id long, ts_ms long, event_type string"
    spark.createDataFrame(touches, schema).repartition(1).write.parquet(t_dir, mode="append")
    spark.createDataFrame(convs, schema).repartition(1).write.parquet(c_dir, mode="append")
    P.start_touch_join_stream(
        spark, t_dir, c_dir, out, ckpt, within_seconds=30
    ).awaitTermination(120)
    got = {
        (r.conv_id, r.touch_id, r.wait_ms)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (c_id, t_id, c_ts - t_ts)
        for (c_id, c_u, c_ts, _) in convs
        for (t_id, t_u, t_ts, _) in touches
        if c_u == t_u and c_ts - 30_000 <= t_ts < c_ts
    }
    assert got == want and len(want) == 3


def test_alert_stream_matches_sequential_machine(spark, tmp_path):
    """The streaming hysteresis machine (applyInPandasWithState) emits
    exactly the trigger/resolve events a sequential K=3/M=2 walk over
    the CLOSED windows produces — across a restart, with intra-window
    accumulation, out-of-order-but-in-horizon samples, and a too-late
    sample that must be dropped."""
    import os

    raw_dir = str(tmp_path / "alert_raw")
    out_dir = str(tmp_path / "alert_out")
    ckpt = str(tmp_path / "ckpt_alerts")
    os.makedirs(raw_dir)
    HOUR = 3_600_000
    base = 1_700_000_000_000 - (1_700_000_000_000 % HOUR)

    def sample(w, value, off=0):
        return ("t0", "m.cpu", base + w * HOUR + off, value, "", 0, 0, None)

    schema = (
        "tenant_id string, metric_name string, ts long, value double,"
        " unit string, ttl_seconds int, batch_id long, date date"
    )
    # window flags (7000-cent threshold): 1 1 1 0 1 0 0 1 1 1 1 0 0
    flags = [1, 1, 1, 0, 1, 0, 0, 1, 1, 1, 1, 0, 0]
    # expected events from the sequential machine:
    #   trigger @ w2 (3rd breach), resolve @ w6 (2nd clear after alarm),
    #   trigger @ w9 (3rd breach of the 4-run), resolve @ w12
    expect = [
        (base + 2 * HOUR, "trigger"),
        (base + 6 * HOUR, "resolve"),
        (base + 9 * HOUR, "trigger"),
        (base + 12 * HOUR, "resolve"),
    ]
    rows1 = []
    for w, f in enumerate(flags[:8]):
        if w == 1:
            # intra-window accumulation: two 40.0 samples = 8000 cents
            rows1 += [sample(w, 40.0), sample(w, 40.0, off=MIN)]
        elif w == 5:
            continue  # w5's sample arrives out of order in chunk 2
        else:
            rows1.append(sample(w, 80.0 if f else 10.0))
    # chunk 1 advances max_ts to w7; the 2h lateness allowance keeps
    # w5 and w6 open (closed horizon after chunk 1 = w0..w4)
    spark.createDataFrame(rows1, schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_alert_stream(spark, raw_dir, out_dir, ckpt,
                         close_delay_ms=2 * HOUR).awaitTermination(120)

    rows2 = [sample(5, 10.0)]  # late but in-horizon: w5 not yet closed
    rows2 += [sample(w, 80.0 if f else 10.0) for w, f in enumerate(flags) if w >= 8]
    rows2.append(sample(0, 9999.0))  # too late: w0 closed — MUST be dropped
    rows2.append(sample(20, 1.0))  # far future: closes everything ≤ w17
    spark.createDataFrame(rows2, schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_alert_stream(spark, raw_dir, out_dir, ckpt,
                         close_delay_ms=2 * HOUR).awaitTermination(120)

    got = sorted(
        (r["event_ms"], r["event"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == expect


def test_alert_stream_agrees_with_batch_hysteresis_prefix(spark, tmp_path):
    """Differential on real data: stream the sf0.001 raw samples in two
    chunks; the emitted trigger/resolve events must equal the batch
    bf_alert_hysteresis episodes restricted to each series' closed
    windows."""
    import os

    import __spark_entry__ as E

    raw_dir = str(tmp_path / "alert_raw2")
    out_dir = str(tmp_path / "alert_out2")
    ckpt = str(tmp_path / "ckpt_alerts2")
    os.makedirs(raw_dir)
    HOUR = 3_600_000
    raw = (
        E._raw_metrics(spark, "/root/testdata/sf0.001")
        .select(
            "tenant_id",
            "metric_name",
            "ts",
            "value",
            F.lit("").alias("unit"),
            F.lit(0).alias("ttl_seconds"),
            F.lit(0).cast("long").alias("batch_id"),
            F.lit(None).cast("date").alias("date"),
        )
        .cache()
    )
    mid = raw.agg(F.expr("percentile(ts, 0.5D)")).collect()[0][0]
    raw.filter(F.col("ts") <= mid).write.mode("append").parquet(raw_dir)
    P.start_alert_stream(spark, raw_dir, out_dir, ckpt).awaitTermination(180)
    raw.filter(F.col("ts") > mid).write.mode("append").parquet(raw_dir)
    P.start_alert_stream(spark, raw_dir, out_dir, ckpt).awaitTermination(180)

    got = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault((r["tenant_id"], r["metric_name"]), []).append(
            (r["event_ms"], r["event"])
        )
    for k in got:
        got[k].sort()

    # closed horizon per series: windows with ws + HOUR <= max(ts)
    closed = {
        (r["tenant_id"], r["metric_name"]): (r["mx"] - HOUR)
        for r in raw.groupBy("tenant_id", "metric_name")
        .agg(F.max("ts").alias("mx"))
        .collect()
    }
    expect = {}
    for r in E.bf_alert_hysteresis(spark, "/root/testdata/sf0.001").collect():
        k = (r["tenant_id"], r["metric_name"])
        if r["trigger_ms"] <= closed[k]:
            expect.setdefault(k, []).append((r["trigger_ms"], "trigger"))
        if r["resolve_ms"] is not None and r["resolve_ms"] <= closed[k]:
            expect.setdefault(k, []).append((r["resolve_ms"], "resolve"))
    for k in expect:
        expect[k].sort()
    raw.unpersist()
    assert got == expect


def test_cusum_stream_matches_sequential_machine(spark, tmp_path):
    """The streaming CUSUM detector (applyInPandasWithState) emits exactly
    the change events a sequential walk over the CLOSED windows produces —
    across a restart, with intra-window accumulation and a too-late sample
    that must be dropped. Calibration = first 12 closed windows."""
    import os

    raw_dir = str(tmp_path / "cusum_raw")
    out_dir = str(tmp_path / "cusum_out")
    ckpt = str(tmp_path / "ckpt_cusum")
    os.makedirs(raw_dir)
    W = 300_000
    base = 1_700_000_000_000 - (1_700_000_000_000 % W)
    schema = (
        "tenant_id string, metric_name string, ts long, value double,"
        " unit string, ttl_seconds int, batch_id long, date date"
    )

    # calibration: 12 windows alternating 10/12; then a sustained shift
    # to ~15, then back down to ~8
    vals = [10.0, 12.0] * 6 + [15.0, 15.2, 15.1, 14.9, 15.0] + [8.0, 8.1, 7.9, 8.0]

    def sample(w, value, off=0):
        return ("t0", "m.lat", base + w * W + off, value, "", 0, 0, None)

    # sequential reference implementing the machine's documented rules
    def reference(values):
        calib, events = [], []
        mu = h = cpos = cneg = 0
        for w, val in enumerate(values):
            v = (int(round(val * 100)) * 10_000) // 1
            if len(calib) < 12:
                calib.append(v)
                if len(calib) == 12:
                    mu = sum(calib) // 12
                    h = 6 * (sum(abs(x - mu) for x in calib) // 12)
                continue
            cpos = max(0, cpos + (v - mu))
            cneg = max(0, cneg + (mu - v))
            if cpos > h:
                events.append((base + w * W, "up", cpos, h))
                cpos = cneg = 0
            elif cneg > h:
                events.append((base + w * W, "down", cneg, h))
                cpos = cneg = 0
        return events

    expect = reference(vals)
    assert {e[1] for e in expect} == {"up", "down"}, "fixture must exercise both sides"

    # chunk 1: windows 0..14 (w13,w14 stay open: horizon = max_ts - W)
    rows1 = [sample(w, v) for w, v in enumerate(vals[:15])]
    spark.createDataFrame(rows1, schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_cusum_stream(spark, raw_dir, out_dir, ckpt).awaitTermination(120)

    # chunk 2 (restart from checkpoint): the rest + a too-late sample for
    # w0 (MUST be dropped) + a far-future sample closing everything
    rows2 = [sample(w, v) for w, v in enumerate(vals) if w >= 15]
    rows2.append(sample(0, 9999.0))
    rows2.append(sample(len(vals) + 3, 10.0))
    spark.createDataFrame(rows2, schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_cusum_stream(spark, raw_dir, out_dir, ckpt).awaitTermination(120)

    got = sorted(
        (r["window_start"], r["direction"], r["cusum"], r["threshold"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == sorted(expect)


def test_sketch_maintenance_merge_equals_batch(spark, tmp_path):
    """Micro-batched sketch partials merged at read time must equal the
    batch sketches over the same rows EXACTLY — CMS by linearity, HLL by
    the register lattice — across a restart, and a replayed batch must
    not double-merge (overwrite idempotence)."""
    import os

    from blueflood_spark.operators.sketches import count_min_sketch, hll_registers

    raw_dir = str(tmp_path / "sk_raw")
    sk_dir = str(tmp_path / "sk_out")
    ckpt = str(tmp_path / "ckpt_sk")
    os.makedirs(raw_dir)
    schema = (
        "tenant_id string, metric_name string, ts long, value double,"
        " unit string, ttl_seconds int, batch_id long, date date"
    )

    def rows(lo, hi):
        return [
            (f"t{i % 3}", f"m.{i % 17}", 1_700_000_000_000 + i, float(i), "", 0, 0, None)
            for i in range(lo, hi)
        ]

    spark.createDataFrame(rows(0, 400), schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_sketch_maintenance(spark, raw_dir, sk_dir, ckpt).awaitTermination(120)
    spark.createDataFrame(rows(400, 1000), schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_sketch_maintenance(spark, raw_dir, sk_dir, ckpt).awaitTermination(120)

    full = spark.createDataFrame(rows(0, 1000), schema)
    want_cms = {(r.j, r.b): r.cell for r in count_min_sketch(full, "metric_name").collect()}
    got_cms = {(r.j, r.b): r.cell for r in P.read_cms_sketch(spark, sk_dir).collect()}
    assert got_cms == want_cms

    want_hll = {
        (r.tenant_id, r.reg): r.max_rho
        for r in hll_registers(full, "metric_name", ["tenant_id"]).collect()
    }
    got_hll = {
        (r.tenant_id, r.reg): r.max_rho
        for r in P.read_hll_sketch(spark, sk_dir).collect()
    }
    assert got_hll == want_hll

    # replay idempotence: re-running a micro-batch's merge must overwrite,
    # not double-count — replay whatever partial batch 0 actually stored
    # (chunk-agnostic: no assumption about how the stream split the input)
    df0 = spark.read.parquet(sk_dir + "/cms/sk_batch=0")
    schema0, part0 = df0.schema, df0.collect()
    spark.createDataFrame(part0, schema0).write.mode("overwrite").parquet(
        sk_dir + "/cms/sk_batch=0"
    )
    got_cms2 = {(r.j, r.b): r.cell for r in P.read_cms_sketch(spark, sk_dir).collect()}
    assert got_cms2 == want_cms


def test_kmv_maintenance_merge_equals_batch(spark, tmp_path):
    """Micro-batched KMV partials merged at read time (k-minimum lattice)
    must equal the batch sketch over the same rows EXACTLY, across a
    restart and any chopping — including values repeated across batches
    (dedup by distinct hash, not by provenance)."""
    import os

    from blueflood_spark.operators.sketches import kmv_sketch

    ev_dir = str(tmp_path / "kmv_ev")
    kmv_dir = str(tmp_path / "kmv_out")
    ckpt = str(tmp_path / "ckpt_kmv")
    os.makedirs(ev_dir)
    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )

    def rows(lo, hi):
        # user ids overlap across the two chunks on purpose
        return [
            (i, 1_700_000_000_000 + i, (i * 7) % 300, f"et{i % 4}", float(i), "")
            for i in range(lo, hi)
        ]

    spark.createDataFrame(rows(0, 250), schema).repartition(1).write.mode("append").parquet(ev_dir)
    P.start_kmv_maintenance(spark, ev_dir, kmv_dir, ckpt, k=16).awaitTermination(120)
    spark.createDataFrame(rows(200, 600), schema).repartition(1).write.mode("append").parquet(ev_dir)
    P.start_kmv_maintenance(spark, ev_dir, kmv_dir, ckpt, k=16).awaitTermination(120)

    full = spark.createDataFrame(rows(0, 250) + rows(200, 600), schema)
    want = {
        (r.event_type, r.rank, r.h)
        for r in kmv_sketch(full, "user_id", ["event_type"], k=16).collect()
    }
    got = {
        (r.event_type, r.rank, r.h)
        for r in P.read_kmv_sketch(spark, kmv_dir, k=16).collect()
    }
    assert got == want

    # replay idempotence: overwrite batch 0's partial with itself
    df0 = spark.read.parquet(kmv_dir + "/kmv_batch=0")
    schema0, part0 = df0.schema, df0.collect()
    spark.createDataFrame(part0, schema0).write.mode("overwrite").parquet(
        kmv_dir + "/kmv_batch=0"
    )
    got2 = {
        (r.event_type, r.rank, r.h)
        for r in P.read_kmv_sketch(spark, kmv_dir, k=16).collect()
    }
    assert got2 == want


def test_exp_histogram_maintenance_merge_equals_batch(spark, tmp_path):
    """Micro-batched exponential-histogram partials merged at read time
    (bucket-count addition) must equal the batch rollup over the same
    rows EXACTLY, across a restart and any chopping."""
    import os

    from blueflood_spark.operators import granularity as G
    from blueflood_spark.operators.rollup import exp_histogram_from_raw

    raw_dir = str(tmp_path / "eh_raw")
    eh_dir = str(tmp_path / "eh_out")
    ckpt = str(tmp_path / "ckpt_eh")
    os.makedirs(raw_dir)
    schema = (
        "tenant_id string, metric_name string, ts long, value double,"
        " unit string, ttl_seconds int, batch_id long, date date"
    )

    def rows(lo, hi):
        return [
            (f"t{i % 2}", f"m.{i % 5}", 1_700_000_000_000 + i * 20_000,
             (i % 40) * 1.75 - 3.0, "", 0, 0, None)
            for i in range(lo, hi)
        ]

    spark.createDataFrame(rows(0, 300), schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_exp_histogram_maintenance(spark, raw_dir, eh_dir, ckpt).awaitTermination(120)
    spark.createDataFrame(rows(300, 800), schema).repartition(1).write.mode("append").parquet(raw_dir)
    P.start_exp_histogram_maintenance(spark, raw_dir, eh_dir, ckpt).awaitTermination(120)

    full = spark.createDataFrame(rows(0, 800), schema)
    want = {
        (r.tenant_id, r.metric_name, r.window_start, r.bucket): (r.n, r.bucket_lo)
        for r in exp_histogram_from_raw(full, G.MIN_5).collect()
    }
    got = {
        (r.tenant_id, r.metric_name, r.window_start, r.bucket): (r.n, r.bucket_lo)
        for r in P.read_exp_histogram(spark, eh_dir).collect()
    }
    assert got == want


def test_bloom_maintenance_merge_equals_batch(spark, tmp_path):
    """Micro-batched Bloom partials merged at read time (bit_or lattice)
    must equal the batch filter over the same rows EXACTLY, across a
    restart and any chopping; the merged filter must then serve the
    probe path with no false negatives."""
    import os

    from pyspark.sql import functions as F

    from blueflood_spark.operators.sketches import bloom_words

    docs_dir = str(tmp_path / "bl_docs")
    bl_dir = str(tmp_path / "bl_out")
    ckpt = str(tmp_path / "ckpt_bl")
    os.makedirs(docs_dir)
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def rows(lo, hi):
        return [(i, f"doc body {i % 37}", "en", "s", 10) for i in range(lo, hi)]

    spark.createDataFrame(rows(0, 150), schema).repartition(1).write.mode("append").parquet(docs_dir)
    P.start_bloom_maintenance(spark, docs_dir, bl_dir, ckpt).awaitTermination(120)
    spark.createDataFrame(rows(150, 400), schema).repartition(1).write.mode("append").parquet(docs_dir)
    P.start_bloom_maintenance(spark, docs_dir, bl_dir, ckpt).awaitTermination(120)

    full = spark.createDataFrame(rows(0, 400), schema).select(
        F.md5(F.col("text")).alias("key")
    )
    want = {(r.word_idx, r.word) for r in bloom_words(full, "key").collect()}
    got = {(r.word_idx, r.word) for r in P.read_bloom_filter(spark, bl_dir).collect()}
    assert got == want

    # the merged filter answers membership with zero false negatives:
    # every key streamed in must hit all k bits
    from blueflood_spark.operators.sketches import bloom_membership

    probe = spark.createDataFrame(rows(0, 400), schema).select(
        "doc_id", F.md5(F.col("text")).alias("key")
    )
    out = bloom_membership(full.select("key"), probe).collect()
    assert all(r["bloom_maybe"] for r in out)


def test_preagg_cascade_stream_merge_equals_batch(spark, tmp_path):
    """T3/T5 for the PREAGGREGATED families (r6 verdict item 9): statsd
    payloads stream in across two micro-batch passes (the second pass is
    a checkpointed RESTART carrying a LATE flush into an already-rolled
    window), and the rollup-on-read cascade over the streamed per-family
    tables must equal the single-shot batch cascade over the same
    payloads — the merged≡batch differential the sketch-maintenance
    suites use, extended to counter/gauge/timer/set through
    start_preagg_ingest → preagg_cascade.

    Values are dyadic rationals (exactly representable doubles whose
    sums are order-independent), so 'equal' is exact equality even
    though the two arms aggregate from different partition layouts."""
    import os

    from blueflood_spark.operators.rollup import preagg_cascade
    from blueflood_spark.sources.ingest import AGGREGATED_PAYLOAD, normalize_aggregated

    inp = str(tmp_path / "agg_in")
    tables = str(tmp_path / "agg_tables")
    ckpt = str(tmp_path / "agg_ckpt")
    os.makedirs(inp)

    base = (1_700_000_000_000 // (20 * MIN)) * 20 * MIN  # 20m-aligned

    def payload(tenant, ts, scale):
        return {
            "tenantId": tenant,
            "timestamp": ts,
            "flushInterval": 30000,
            "counters": [
                {"name": "c.hits", "value": 8.0 * scale, "rate": 2.0 * scale},
                {"name": "c.errs", "value": 1.0 * scale, "rate": 0.5},
            ],
            "gauges": [{"name": "g.depth", "value": 4.5 + scale}],
            "timers": [
                {
                    "name": "t.req",
                    "count": 8 * scale,
                    "rate": 0.25,
                    "min": 1.0,
                    "max": 9.0 + scale,
                    "sum": 40.0 * scale,
                    "avg": 5.0,
                    "std": 2.0,
                    "percentiles": {"p50": {"avg": 4.0 + scale}, "p99": {"avg": 8.5 + scale}},
                }
            ],
            "sets": [{"name": "s.users", "values": [f"u{scale}", "u0", f"v{ts % 7}"]}],
        }

    # pass 1: three 5m windows for two tenants
    batch1 = [payload(t, base + w * 5 * MIN + off * 30_000, s)
              for t in ("t1", "t2")
              for w, off, s in ((0, 0, 1), (0, 3, 2), (1, 1, 1), (2, 4, 3))]
    write_payload(f"{inp}/b1.json", batch1)
    q = P.start_preagg_ingest(spark, inp, tables, ckpt)
    q.awaitTermination(120)

    # pass 2 (restart, same checkpoint): new window + LATE flush into w0
    batch2 = [payload("t1", base + 3 * 5 * MIN, 2),
              payload("t1", base + 2 * 30_000, 4),       # late into w0
              payload("t2", base + 5 * MIN + 7 * 30_000, 2)]
    write_payload(f"{inp}/b2.json", batch2)
    q = P.start_preagg_ingest(spark, inp, tables, ckpt)
    q.awaitTermination(120)

    # merged arm: the streamed family tables unioned back to the full
    # PREAGG schema (route_by_type preserves it), cascaded on read
    fams = ("counter", "gauge", "timer", "set")
    streamed = None
    for fam in fams:
        part = spark.read.parquet(f"{tables}/preagg_{fam}").drop("batch_id", "date")
        streamed = part if streamed is None else streamed.unionByName(part)
    merged = preagg_cascade(streamed, grans=(G.MIN_5, G.MIN_20))

    # batch arm: one normalize over all payloads, same cascade
    all_payloads = spark.createDataFrame(
        [tuple(p.get(f.name) for f in AGGREGATED_PAYLOAD.fields) for p in batch1 + batch2],
        AGGREGATED_PAYLOAD,
    )
    expected = preagg_cascade(normalize_aggregated(all_payloads), grans=(G.MIN_5, G.MIN_20))

    def rows(df):
        cols = sorted(df.columns)
        out = []
        for r in df.select(*cols).collect():
            d = r.asDict()
            for k, v in d.items():
                if isinstance(v, dict):
                    d[k] = tuple(sorted(v.items()))
                elif isinstance(v, list):
                    d[k] = tuple(sorted(v))
            out.append(tuple(d[c] for c in cols))
        return sorted(out)

    for fam in fams:
        for level in ("5m", "20m"):
            got, want = rows(merged[fam][level]), rows(expected[fam][level])
            assert got == want, f"{fam}/{level}: stream-merged != batch"
            assert len(got) > 0, f"{fam}/{level}: empty"
    # the late flush actually landed: t1's 20m window spans all four 5m
    # windows (scales 1+2, 1, 3, 2) PLUS the late pass-2 flush (scale 4)
    t20 = {(r["tenant_id"], r["window_start"]): r["count"]
           for r in merged["timer"]["20m"].collect()}
    assert t20[("t1", base)] == 8 * (1 + 2 + 1 + 3 + 2 + 4)


def test_preagg_reroll_matches_batch_for_late_slots(spark, tmp_path):
    """T4 for the PREAGGREGATED families (r7 verdict task 9): statsd
    payloads stream in with a subset of flushes arriving PAST the rollup
    delay; the delayed side-channel must record exactly the straggler
    (locator, family, 20m slot) groups, and reroll_preagg's recomputed
    rollups must BIT-EXACTLY equal a from-scratch batch cascade over the
    same payloads restricted to those groups — extending the re-roll
    differential from the basic path (test_reroll_recomputes_late_windows)
    to counter/gauge/timer/set. Dyadic values make equality exact."""
    import os
    import time as _time

    from blueflood_spark.operators.rollup import preagg_cascade, window_start
    from blueflood_spark.sources.ingest import AGGREGATED_PAYLOAD, normalize_aggregated

    inp = str(tmp_path / "agg_in")
    tables = str(tmp_path / "agg_tables")
    ckpt = str(tmp_path / "agg_ckpt")
    delayed_dir = str(tmp_path / "agg_delayed")
    os.makedirs(inp)

    def payload(tenant, ts, scale):
        return {
            "tenantId": tenant,
            "timestamp": ts,
            "flushInterval": 30000,
            "counters": [{"name": "c.hits", "value": 8.0 * scale, "rate": 2.0 * scale}],
            "gauges": [{"name": "g.depth", "value": 4.5 + scale}],
            "timers": [
                {
                    "name": "t.req",
                    "count": 8 * scale,
                    "rate": 0.25,
                    "min": 1.0,
                    "max": 9.0 + scale,
                    "sum": 40.0 * scale,
                    "avg": 5.0,
                    "std": 2.0,
                    "percentiles": {"p50": {"avg": 4.0 + scale}, "p99": {"avg": 8.5 + scale}},
                }
            ],
            "sets": [{"name": "s.users", "values": [f"u{scale}", "u0"]}],
        }

    now = int(_time.time() * 1000)
    # on-time = within the 5-min rollup delay of the WALL CLOCK (a
    # slot-aligned stamp can already be up to 20 min old)
    on_ts = now - 60_000
    on_base = (on_ts // (20 * MIN)) * 20 * MIN
    late_base = ((now - 2 * 86_400_000) // (20 * MIN)) * 20 * MIN
    on_time = [payload("t1", on_ts, 1), payload("t2", on_ts + 30_000, 2)]
    # two late flushes into the SAME 2-day-old slot (the re-rolled windows
    # must MERGE partials, not just copy one through) + one into another
    late = [
        payload("t1", late_base + 30_000, 2),
        payload("t1", late_base + 8 * 30_000, 4),
        payload("t2", late_base + 5 * MIN, 1),
    ]
    write_payload(f"{inp}/b1.json", on_time + late)
    q = P.start_preagg_ingest(spark, inp, tables, ckpt, delayed_path=delayed_dir)
    q.awaitTermination(120)

    # the delayed table holds EXACTLY the straggler groups — one row per
    # (tenant, metric, family, slot), nothing from the on-time flushes
    dl = spark.read.parquet(delayed_dir)
    got_groups = {
        (r.tenant_id, r.metric_name, r.rollup_type, r.slot_window_start)
        for r in dl.collect()
    }
    fams_by_metric = {
        "c.hits": "counter", "g.depth": "gauge", "t.req": "timer", "s.users": "set",
    }
    want_groups = {
        (p["tenantId"], name, fam, (p["timestamp"] // (20 * MIN)) * 20 * MIN)
        for p in late
        for name, fam in fams_by_metric.items()
    }
    assert got_groups == want_groups

    rerolled = P.reroll_preagg(spark, tables, delayed_dir, grans=(G.MIN_5, G.MIN_20))

    # batch arm: normalize ALL payloads, restrict to the affected groups
    # with the same semi-join, cascade identically
    all_df = spark.createDataFrame(
        [tuple(p.get(f.name) for f in AGGREGATED_PAYLOAD.fields) for p in on_time + late],
        AGGREGATED_PAYLOAD,
    )
    norm = normalize_aggregated(all_df)
    aff = dl.select("tenant_id", "metric_name", "rollup_type", "slot_window_start").distinct()
    pruned = norm.join(
        F.broadcast(aff),
        (norm.tenant_id == aff.tenant_id)
        & (norm.metric_name == aff.metric_name)
        & (norm.rollup_type == aff.rollup_type)
        & (window_start(norm.ts, G.MIN_20) == aff.slot_window_start),
        "left_semi",
    )
    expected = preagg_cascade(pruned, grans=(G.MIN_5, G.MIN_20))

    def rows(df):
        cols = sorted(df.columns)
        out = []
        for r in df.select(*cols).collect():
            d = r.asDict()
            for k, v in d.items():
                if isinstance(v, dict):
                    d[k] = tuple(sorted(v.items()))
                elif isinstance(v, list):
                    d[k] = tuple(sorted(v))
            out.append(tuple(d[c] for c in cols))
        return sorted(out)

    for fam in ("counter", "gauge", "timer", "set"):
        for level in ("5m", "20m"):
            got, want = rows(rerolled[fam][level]), rows(expected[fam][level])
            assert got == want, f"{fam}/{level}: reroll != batch-over-late-slots"
            assert len(got) > 0, f"{fam}/{level}: empty"
        # pruning: nothing from the on-time slot leaks into the re-roll
        assert all(
            r.window_start != on_base
            for r in rerolled[fam]["20m"].select("window_start").collect()
        ), fam
    # the same-slot merge really merged: t1's late 20m timer count is the
    # SUM of both late flushes (scales 2 + 4)
    t20 = {(r["tenant_id"], r["window_start"]): r["count"]
           for r in rerolled["timer"]["20m"].collect()}
    assert t20[("t1", late_base)] == 8 * (2 + 4)


def test_preagg_delayed_sink_replay_is_idempotent(spark, tmp_path):
    """T7 for the preagg delayed side-channel: replaying the same
    micro-batch (same batch_id via a fresh checkpoint into the same sink
    paths) rewrites the batch_id partition of BOTH the family tables and
    the delayed table instead of appending duplicates, so reroll_preagg
    recomputes from exactly one copy of every straggler row."""
    import os
    import time as _time

    inp = str(tmp_path / "agg_in")
    tables = str(tmp_path / "agg_tables")
    delayed_dir = str(tmp_path / "agg_delayed")
    os.makedirs(inp)
    now = int(_time.time() * 1000)
    late_ts = now - 86_400_000
    payloads = [
        {
            "tenantId": "t1",
            "timestamp": late_ts,
            "flushInterval": 30000,
            "counters": [{"name": "c.r", "value": 4.0, "rate": 1.0}],
            "gauges": None, "timers": None, "sets": None,
        },
        {
            "tenantId": "t1",
            "timestamp": now - 30_000,
            "flushInterval": 30000,
            "counters": [{"name": "c.r", "value": 2.0, "rate": 0.5}],
            "gauges": None, "timers": None, "sets": None,
        },
    ]
    write_payload(f"{inp}/b.json", payloads)
    for attempt in range(2):
        ckpt = str(tmp_path / f"ckpt{attempt}")  # fresh ckpt → batch_id 0 again
        P.start_preagg_ingest(
            spark, inp, tables, ckpt, delayed_path=delayed_dir
        ).awaitTermination(120)
    counters = spark.read.parquet(f"{tables}/preagg_counter")
    assert counters.count() == 2  # NOT 4
    dl = spark.read.parquet(delayed_dir)
    assert dl.count() == 1  # only the straggler, once
    r = dl.collect()[0]
    assert r.rollup_type == "counter"
    assert r.slot_window_start == (late_ts // (20 * MIN)) * 20 * MIN
    # and the re-roll over the replayed tables sees exactly one partial
    rerolled = P.reroll_preagg(spark, tables, delayed_dir, grans=(G.MIN_5,),
                               families=("counter",))
    rows = rerolled["counter"]["5m"].collect()
    assert len(rows) == 1 and rows[0]["count"] == 4.0
