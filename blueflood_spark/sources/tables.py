"""Physical table layout: parquet partitioned by (resolution, date).

Replaces the reference's 12 per-granularity Cassandra column families
(/root/reference/blueflood-core/.../io/CassandraModel.java:28-86): the CF
split becomes a `resolution` partition value, so granularity selection is
partition pruning; the `date` partition bounds every time-range scan.

Per-row TTL (DMetricsCFPreparedStatements.java:39, defaults
CassandraModel.java:47-59) becomes (a) a retention predicate applied at
read time and (b) a partition-drop maintenance job — both operate on
whole partitions, which is the only TTL mechanism that scales to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blueflood_spark.operators import granularity as G


def with_date_partition(df: DataFrame, ts_col: str = "window_start") -> DataFrame:
    return df.withColumn("date", F.to_date(F.timestamp_millis(F.col(ts_col))))


def write_rollups(df: DataFrame, path: str, mode: str = "append") -> None:
    """Rollup writer: idempotent per-window overwrite at scale would use
    dynamic partition overwrite (replaceWhere); local tests append."""
    with_date_partition(df).write.partitionBy("resolution", "date").mode(mode).parquet(path)


def write_raw(df: DataFrame, path: str, mode: str = "append") -> None:
    out = df.withColumn("date", F.to_date(F.timestamp_millis(F.col("ts"))))
    out.write.partitionBy("date").mode(mode).parquet(path)


def overwrite_windows(df: DataFrame, path: str) -> None:
    """T7 exactly-once-ish rollup write: dynamic partition overwrite
    replaces exactly the (resolution, date) partitions present in `df`,
    leaving the rest of the table untouched — re-running a rollup job (or
    a re-roll of late windows) is idempotent, mirroring the reference's
    same-key-overwrite wide-row semantics
    (DMetricsCFPreparedStatements.java:39)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        with_date_partition(df).write.partitionBy("resolution", "date").mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_rollups(
    spark: SparkSession,
    path: str,
    resolution: str,
    tenant_id: str | None = None,
    metric_names: list[str] | None = None,
    from_ms: int | None = None,
    to_ms: int | None = None,
) -> DataFrame:
    """Pruned scan: resolution partition + date partition range + parquet
    row-group min/max on window_start, all pushed down by Catalyst."""
    df = spark.read.parquet(path).filter(F.col("resolution") == resolution)
    if from_ms is not None:
        df = df.filter(
            (F.col("window_start") >= from_ms)
            & (F.col("date") >= F.to_date(F.timestamp_millis(F.lit(from_ms))))
        )
    if to_ms is not None:
        df = df.filter(
            (F.col("window_start") <= to_ms)
            & (F.col("date") <= F.to_date(F.timestamp_millis(F.lit(to_ms))))
        )
    if tenant_id is not None:
        df = df.filter(F.col("tenant_id") == tenant_id)
    if metric_names is not None:
        df = df.filter(F.col("metric_name").isin(metric_names))
    return df


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Small-file compaction for streaming sinks: every micro-batch
    appends files, and a 5-minute trigger writes ~288 files/partition/day
    — parquet scan cost then scales with file count, not bytes. Rewrite
    each (resolution, date) partition into ceil(bytes/target) files via
    dynamic partition overwrite (same idempotent mechanism as
    overwrite_windows). Returns {partition: files_before} for the
    partitions it rewrote.

    At 100 TB this runs as a scheduled maintenance job per recent date
    partition; old partitions are write-once and never need it again.

    Atomicity: the compacted partition is fully written to a hidden
    sibling directory FIRST (readers never see it — Spark's path filter
    skips dot-prefixed names), then swapped in with two directory
    renames. A crash before the first rename leaves the partition
    untouched; between the renames it leaves a `<dir>.compact-old`
    sibling whose presence means "rename back to recover". The previous
    in-place dynamic-partition overwrite could lose the partition if the
    job died between task completion and commit."""
    import collections
    import math
    import os
    import shutil

    sizes: dict[tuple[str, str], int] = collections.defaultdict(int)
    counts: dict[tuple[str, str], int] = collections.defaultdict(int)
    for root, _dirs, files in os.walk(path):
        parts = [p for p in root.replace(path, "").split(os.sep) if "=" in p]
        kv = dict(p.split("=", 1) for p in parts)
        if "resolution" not in kv or "date" not in kv:
            continue
        key = (kv["resolution"], kv["date"])
        for f in files:
            if f.endswith(".parquet"):
                sizes[key] += os.path.getsize(os.path.join(root, f))
                counts[key] += 1
    rewritten = {}
    for (res, date), n_files in counts.items():
        n_target = max(1, math.ceil(sizes[(res, date)] / target_bytes))
        if n_files <= n_target:
            continue
        part_dir = os.path.join(path, f"resolution={res}", f"date={date}")
        tmp_dir = os.path.join(path, f"resolution={res}", f".date={date}.compact-tmp")
        old_dir = part_dir + ".compact-old"
        part = (
            spark.read.parquet(path)
            .filter((F.col("resolution") == res) & (F.col("date") == date))
            .drop("resolution", "date")  # re-derived from the directory layout
        )
        part.coalesce(n_target).write.mode("overwrite").parquet(tmp_dir)
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        rewritten[f"{res}/{date}"] = n_files
    return rewritten


def write_rollups_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Bucketed rollup storage: hash-bucket by locator (tenant_id,
    metric_name), sorted by window_start within each file.

    This persists the cascade's ONE shuffle into the table layout: a
    bucketed scan reports HashPartitioning(locator, n_buckets), which
    satisfies every rollup ladder groupBy's clustering requirement
    (locator ⊂ locator+window) and co-locates locator-equi-joins between
    two tables bucketed the same way — so the nightly coarsen job and
    multi-table serving joins run with ZERO exchanges
    (test_scale_ops asserts the exchange-free plan). This is the Spark
    analog of the reference's shard-per-locator placement
    (Util.java:47-48 computeShard): the same locator always lands in the
    same bucket file.

    At 100 TB: n_buckets sized so bucket × date-partition files stay
    ~128 MB-1 GB; bucketed tables require saveAsTable (metastore keeps
    the bucket spec)."""
    (
        with_date_partition(df)
        .write.partitionBy("resolution", "date")
        .bucketBy(n_buckets, "tenant_id", "metric_name")
        .sortBy("window_start")
        .mode(mode)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_rollups_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Bucket-aware scan — Catalyst sees HashPartitioning(tenant_id,
    metric_name) and elides exchanges for locator-clustered operations."""
    return spark.table(table_name)


def write_corpus_clustered(
    df: DataFrame,
    table_name: str,
    cluster_col: str = "cluster_id",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """The corpus analog of write_rollups_bucketed: persist a clustered
    corpus (k-means assignments joined to the vectors/documents)
    BUCKETED by cluster_id — the layout the SemDeDup docstrings promise.
    A bucketed scan reports HashPartitioning(cluster_id, n), which
    satisfies the cluster-bounded pairwise stage's ClusteredDistribution
    requirement, so semdedup/semdedup_pairs re-runs over the persisted
    table read co-located buckets with ZERO exchanges
    (test_scale_ops asserts the exchange-free plan). At 100 TB this is
    the difference between re-shuffling the embedding corpus on every
    dedup iteration and never shuffling it again after one write."""
    (
        df.write.bucketBy(n_buckets, cluster_col)
        .sortBy(cluster_col)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table_name)
    )


def retention_predicate(resolution: str, now_ms: int):
    """TTL-as-predicate: rows older than the resolution's retention are
    invisible even before the maintenance job drops their partitions."""
    gran = G.BY_NAME[resolution]
    return F.col("window_start") >= F.lit(now_ms - gran.ttl_millis)


def expired_partitions(spark: SparkSession, path: str, now_ms: int) -> list[tuple[str, str]]:
    """Maintenance: list (resolution, date) partitions entirely past
    retention — candidates for metadata-only drops."""
    import calendar

    df = spark.read.parquet(path).select("resolution", "date").distinct()
    rows = df.collect()
    out = []
    for r in rows:
        gran = G.BY_NAME[r["resolution"]]
        cutoff_ms = now_ms - gran.ttl_millis
        # timegm: the partition date is a UTC calendar day. (strftime('%s')
        # is a glibc extension that applies the HOST timezone — it shifted
        # cutoffs by the TZ offset and doesn't exist on non-glibc.)
        date_end_ms = (
            calendar.timegm(r["date"].timetuple()) * 1000 + 86_400_000
            if r["date"] is not None
            else 0
        )
        if date_end_ms < cutoff_ms:
            out.append((r["resolution"], str(r["date"])))
    return out


def drop_expired(spark: SparkSession, path: str, now_ms: int) -> list[tuple[str, str]]:
    """Maintenance: DROP every (resolution, date) partition entirely past
    its resolution's retention — the metadata-only deletion that replaces
    the reference's per-row Cassandra TTLs at 100 TB (expiring a day of
    a granularity is one directory remove, not a scan). Uses
    expired_partitions for the candidate list (whole-day-past-cutoff
    check, UTC calendar), removes each partition directory, and returns
    what it dropped. Rows inside a not-yet-droppable partition are
    already invisible through retention_predicate — the drop is space
    reclamation, never the correctness mechanism."""
    import os
    import shutil

    dropped = []
    for res, date in expired_partitions(spark, path, now_ms):
        part_dir = os.path.join(path, f"resolution={res}", f"date={date}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
            dropped.append((res, date))
    return dropped
