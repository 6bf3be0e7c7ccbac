"""Z-order (Morton) layout clustering for multi-dimension data skipping.

The reference prunes reads with one physical ordering only — Cassandra
wide rows keyed (locator, timestamp) (io/CassandraModel.java column
families): a locator-scoped time range is one contiguous slice, but a
time-scoped sweep ACROSS locators touches every row of every shard. At
100 TB on parquet the equivalent problem is file skipping: a file sorted
purely by time has min/max footer stats that bound `ts` tightly but
leave `shard` spanning the full 0..127 domain (and vice versa), so only
one predicate class ever prunes.

Z-ordering interleaves the bits of both keys so every file covers a
small RECTANGLE of (shard, time-slot) space — both columns' min/max
stats stay tight, and either predicate class skips ~proportionally.
This is the OPTIMIZE ZORDER technique of Delta/Iceberg re-expressed as
deterministic column arithmetic: no library, one expression, exact
integer math that any engine evaluates identically.

The interleave expression is built ONCE as a SQL string and evaluated
verbatim by both Spark (`F.expr`) and DuckDB — there is no second
rendition to keep in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_sql(x: str, y: str, bits: int = 8) -> str:
    """Bit-interleave expression: z = Σ_b ((x>>b)&1)<<2b + ((y>>b)&1)<<(2b+1).

    `x` and `y` must be integer expressions in [0, 2^bits). The terms
    write disjoint bit positions, so `+` is exactly `|` and every engine
    computes the same integer. Shared Spark-SQL/DuckDB grammar: >>, &,
    << and + only."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "z",
) -> DataFrame:
    """Append the Morton key as a column (codegen integer math, map-only)."""
    return df.withColumn(out_col, F.expr(morton_sql(x_col, y_col, bits)))


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered by Z-value: range-partition on the Morton key
    (each output file owns a contiguous z-range = a bounded rectangle of
    (x, y) space), sort within partitions so row groups inherit the same
    locality, and drop the key itself — the layout, not the column, is
    the product. At 100 TB this replaces `repartitionByRange(n_files)`
    with a per-date-partition job sized so files stay ~128 MB-1 GB,
    exactly like tables.write_rollups_bucketed."""
    keyed = with_zorder_key(df, x_col, y_col, bits)
    (
        keyed.repartitionByRange(n_files, F.col("z"))
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_tiles(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    tile_shift: int = 6,
) -> DataFrame:
    """Per-tile locality evidence: group rows by z >> tile_shift (each
    tile = 2^tile_shift consecutive z-cells ≈ one output file's worth of
    key space) and report the (x, y) bounding box each tile actually
    spans. Tight boxes are precisely what makes footer-stat skipping
    work — this relation is the checkable form of the layout claim."""
    keyed = with_zorder_key(df, x_col, y_col, bits)
    return (
        keyed.groupBy(F.shiftright(F.col("z"), tile_shift).alias("tile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias(f"min_{x_col}"),
            F.max(x_col).alias(f"max_{x_col}"),
            F.min(y_col).alias(f"min_{y_col}"),
            F.max(y_col).alias(f"max_{y_col}"),
        )
    )


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner — the manifest an OPTIMIZE job works
    from. The reference never needs this (Cassandra compacts its own
    SSTables in the background); a parquet lakehouse at 100 TB does:
    streaming micro-batches leave thousands of KB-scale files per
    partition, and scan throughput dies on file-open overhead until a
    maintenance pass rewrites them to ~128 MB-1 GB.

    Semantics: SEQUENTIAL FILL in `order_col` order (Delta/Iceberg
    OPTIMIZE's bin strategy — keeps time-adjacent files in the same
    output so the rewrite preserves clustering): a file joins bin k when
    the cumulative bytes BEFORE it lie in [k·target, (k+1)·target). All
    integer math — the plan compares exactly on any engine.

    Scale shape: one shuffle on the table partition key, a running-sum
    window, and a map-side-combinable manifest agg — the planning cost
    is linear in the FILE COUNT (metadata-sized), never the data."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum(bytes_col).over(w) - F.col(bytes_col)).cast("long")
    # integer DIV, not float /: cumulative bytes at 100 TB overflow the
    # 2^53 double mantissa long before they overflow a BIGINT
    return files.withColumn("_cb", cum_before).withColumn(
        "bin_idx", F.expr(f"_cb DIV {int(target_bytes)}")
    ).drop("_cb")


def compaction_manifest(
    files: DataFrame,
    partition_col: str,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """One row per planned output file: file count, byte total, and the
    `order_col` range each bin covers — what the rewrite job executes
    and what an operator reviews. Exact integers only."""
    plan = compaction_plan(files, partition_col, order_col, bytes_col, target_bytes)
    return plan.groupBy(partition_col, "bin_idx").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(bytes_col).cast("long").alias("total_bytes"),
        F.min(order_col).alias("first_key"),
        F.max(order_col).alias("last_key"),
    )


def compaction_manifest_sql(
    files_sql: str,
    partition_col: str,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
) -> str:
    """DuckDB twin over any `files_sql` relation with the same columns."""
    t = int(target_bytes)
    return f"""
WITH files AS ({files_sql}),
assigned AS (
  SELECT *,
         (SUM({bytes_col}) OVER (PARTITION BY {partition_col} ORDER BY {order_col}
            ROWS UNBOUNDED PRECEDING) - {bytes_col}) // {t} AS bin_idx
  FROM files
)
SELECT {partition_col}, CAST(bin_idx AS BIGINT) AS bin_idx,
       count(*) AS n_files,
       CAST(sum({bytes_col}) AS BIGINT) AS total_bytes,
       min({order_col}) AS first_key,
       max({order_col}) AS last_key
FROM assigned GROUP BY 1, 2
"""
