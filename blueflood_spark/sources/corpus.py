"""Batch corpus sources: JSONL document ingestion with malformed-row
quarantine.

Raw training-data dumps arrive as JSONL with no schema guarantees; the
failure mode that matters at 100 TB is SILENT row loss (DROPMALFORMED)
or a job-killing parse error (FAILFAST). This reader takes Spark's
PERMISSIVE path instead: bad lines land in `_corrupt_record`, rows
violating the corpus contract (null doc_id/text) are routed to a
quarantine frame beside the clean one, and nothing disappears — the
clean count plus the quarantine count equals the input line count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG,"
    " _corrupt_record STRING"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    quarantine_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into the documents contract, returning
    (clean, quarantined).

    - Unparseable lines arrive with `_corrupt_record` set (PERMISSIVE).
    - Parsed rows missing doc_id or text violate the contract and are
      quarantined with a reason.
    - `n_chars` is derived from the text when absent, so upstream dumps
      don't need to precompute it.
    - If `quarantine_path` is given the quarantine frame is also written
      there (append), for the reprocess-later workflow.

    One scan, no shuffles; the clean/quarantine split is two filters over
    the same cached parse (Catalyst shares the scan via the parsed
    column pruning, and JSONL scans split by line at any file size)."""
    raw = (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    reason = (
        F.when(F.col("_corrupt_record").isNotNull(), F.lit("unparseable"))
        .when(F.col("doc_id").isNull(), F.lit("missing doc_id"))
        .when(F.col("text").isNull(), F.lit("missing text"))
    )
    quarantined = raw.withColumn("reason", reason).filter(F.col("reason").isNotNull())
    clean = raw.filter(reason.isNull()).select(
        "doc_id",
        "text",
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.coalesce("source", F.lit("unknown")).alias("source"),
        F.coalesce("n_chars", F.length("text").cast("long")).alias("n_chars"),
    )
    if quarantine_path is not None:
        quarantined.write.mode("append").json(quarantine_path)
    return clean, quarantined


def write_corpus(
    docs: DataFrame,
    path: str,
    files_per_source: int = 4,
    mode: str = "overwrite",
) -> None:
    """Materialize a curated corpus for training consumption: parquet
    partitioned by `source` (mixture weighting and per-source sampling
    become partition pruning downstream) with doc_id-sorted row groups
    inside each file (repartition by source then sortWithinPartitions —
    range-clustered doc_ids give readers cheap split-level min/max
    pruning for id-range fetches and make re-reads deterministic).

    `files_per_source` bounds small-file explosion: the repartition key
    is (source, doc_id-bucket), so each source writes at most that many
    files regardless of executor count — at 100 TB this knob scales with
    per-source bytes, not cluster width."""
    bucket = F.expr(f"pmod(doc_id, {files_per_source})")
    (
        docs.repartition(F.col("source"), bucket)
        .sortWithinPartitions("source", "doc_id")
        .write.partitionBy("source")
        .mode(mode)
        .parquet(path)
    )
