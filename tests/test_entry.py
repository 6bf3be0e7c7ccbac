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
