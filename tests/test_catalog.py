"""Discovery catalog, token index, and glob search (SURVEY S9/S10, F1/F2)."""

from blueflood_spark.catalog import build_catalog, build_tokens, search_metric_names, search_metrics


def cat_df(spark):
    rows = [
        ("t1", "foo.bar.xxx", 1000, 1.0, "bytes"),
        ("t1", "foo.bar.baz.qux", 2000, 2.0, "seconds"),
        ("t1", "other.top", 3000, 3.0, None),
        ("t2", "foo.bar.other", 4000, 4.0, None),
    ]
    return spark.createDataFrame(
        rows, "tenant_id string, metric_name string, ts long, value double, unit string"
    )


def test_build_catalog_unit(spark):
    cat = build_catalog(cat_df(spark)).collect()
    by_name = {(r["tenant_id"], r["metric_name"]): r["unit"] for r in cat}
    assert by_name[("t1", "foo.bar.xxx")] == "bytes"
    assert len(cat) == 4


def test_tokens(spark):
    toks = build_tokens(build_catalog(cat_df(spark)))
    rows = {(r["tenant_id"], r["path"], r["is_leaf"]): r for r in toks.collect()}
    assert ("t1", "foo", False) in rows
    assert ("t1", "foo.bar", False) in rows
    assert ("t1", "foo.bar.xxx", True) in rows
    assert rows[("t1", "foo.bar.baz", False)]["parent"] == "foo.bar"
    # leaf + depth
    leaf = rows[("t1", "foo.bar.baz.qux", True)]
    assert leaf["depth"] == 4 and leaf["token"] == "qux"


def test_search_metrics_tenant_isolation(spark):
    cat = build_catalog(cat_df(spark))
    names = {r["metric_name"] for r in search_metrics(cat, "t1", "foo.bar.*").collect()}
    assert names == {"foo.bar.xxx", "foo.bar.baz.qux"}  # '*' crosses levels in full search
    names_t2 = {r["metric_name"] for r in search_metrics(cat, "t2", "foo.bar.*").collect()}
    assert names_t2 == {"foo.bar.other"}


def test_search_metrics_include_enum_values(spark):
    """Deprecated enum-metrics param: API shape served (empty enum_values
    column), dead feature not resurrected (HttpMetricsIndexHandler)."""
    cat = build_catalog(cat_df(spark))
    out = search_metrics(cat, "t1", "foo.bar.*", include_enum_values=True)
    assert "enum_values" in out.columns
    assert all(r["enum_values"] == [] for r in out.collect())
    # default shape unchanged
    assert "enum_values" not in search_metrics(cat, "t1", "foo.bar.*").columns


def test_search_metric_names_next_level(spark):
    # AbstractElasticIO javadoc example: foo.bar.* → (foo.bar.xxx leaf), (foo.bar.baz non-leaf)
    cat = build_catalog(cat_df(spark))
    rows = {r["metric_name"]: r for r in search_metric_names(cat, "t1", "foo.bar.*").collect()}
    assert set(rows) == {"foo.bar.xxx", "foo.bar.baz"}
    assert rows["foo.bar.xxx"]["is_leaf"] is True
    assert rows["foo.bar.baz"]["is_leaf"] is False
    assert rows["foo.bar.baz"]["has_next_level"] is True
