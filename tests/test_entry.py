"""Contract checks on __spark_entry__ (smoke at sf0.001; full oracle runs
via tools/check_oracle.py and the driver)."""

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3


def test_every_query_has_oracle_or_is_declared(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles).issubset(set(qs))
    assert len(qs) >= 20


def test_all_queries_run_smoke(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        n = df.count()
        assert n >= 0, name


def test_checked_output_contract_no_complex_toplevel_types(spark):
    """Driver-canonicalizer contract: the correctness gate sorts checked
    outputs with pandas, which cannot hash/sort list or dict cells and
    renders timestamps tz-dependently. NOTES.md bans maps and raw
    timestamps; r3 proved top-level arrays crash the gate too
    (bf_statsd_normalize / llm_sq8_quantize / llm_multimodal_features
    red rows). Every registered query must emit scalars only — flatten
    arrays to csv/json or posexplode to (idx, value) rows at the
    registration layer."""
    from pyspark.sql import types as T

    banned = (T.ArrayType, T.MapType, T.TimestampType, T.TimestampNTZType)
    offenders = []
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        for field in df.schema.fields:
            if isinstance(field.dataType, banned):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"complex top-level types in checked outputs: {offenders}"


def test_statsd_payload_memo_keyed_by_sf_dir(spark):
    """r7: the memoized statsd payload fixture must not collide across
    sf dirs (a cache hit returning another SF's frame would silently
    pass the wrong corpus to normalize_aggregated), and repeated calls
    on the same dir must return the SAME checkpointed frame (the memo's
    whole point — the pack is timed out of the query)."""
    a1 = E._statsd_payloads(spark, "/root/testdata/sf0.001")
    a2 = E._statsd_payloads(spark, "/root/testdata/sf0.001")
    b = E._statsd_payloads(spark, "/root/testdata/sf0.01")
    assert a1 is a2
    assert a1 is not b
    assert a1.count() != b.count()
