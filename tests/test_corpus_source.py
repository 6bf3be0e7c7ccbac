"""JSONL corpus ingestion: clean rows pass, malformed and
contract-violating rows quarantine, nothing is silently dropped."""

import os


def test_jsonl_reader_quarantines_and_conserves(spark, tmp_path):
    from blueflood_spark.sources.corpus import read_documents_jsonl

    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}',
        '{"doc_id": 2, "text": "derive my nchars", "lang": "en", "source": "s1"}',
        '{"doc_id": 3, "text": "defaults please"}',
        'this is not json at all {{{',
        '{"doc_id": 4}',  # missing text
        '{"text": "missing id"}',
        '{"doc_id": 5, "text": ""}',  # empty text is VALID (gates decide)
    ]
    src = str(tmp_path / "dump.jsonl")
    with open(src, "w") as f:
        f.write("\n".join(lines) + "\n")
    qdir = str(tmp_path / "quarantine")

    clean, quarantined = read_documents_jsonl(spark, src, quarantine_path=qdir)
    c = {r["doc_id"]: r for r in clean.collect()}
    q = [(r["reason"], r["_corrupt_record"]) for r in quarantined.collect()]

    assert set(c) == {1, 2, 3, 5}
    assert c[2]["n_chars"] == 16  # derived
    assert c[3]["lang"] == "und" and c[3]["source"] == "unknown"
    assert c[5]["n_chars"] == 0
    reasons = sorted(r for r, _ in q)
    assert reasons == ["missing doc_id", "missing text", "unparseable"]
    assert any(cr and "not json" in cr for _, cr in q)
    # conservation: clean + quarantined == input lines
    assert len(c) + len(q) == len(lines)
    # quarantine persisted for reprocessing
    assert os.path.isdir(qdir)
    persisted = spark.read.json(qdir)
    assert persisted.count() == 3


def test_write_corpus_layout_and_roundtrip(spark, tmp_path):
    import glob

    from blueflood_spark.sources.corpus import write_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus")
    write_corpus(docs, out, files_per_source=2)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partitioned by source: one directory per source value
    src_dirs = sorted(
        p.split("source=")[1] for p in glob.glob(out + "/source=*")
    )
    want = sorted(r["source"] for r in docs.select("source").distinct().collect())
    assert src_dirs == want
    # file-count bound per source
    for s in src_dirs:
        files = glob.glob(f"{out}/source={s}/*.parquet")
        assert 1 <= len(files) <= 2, (s, files)
    # doc_ids sorted within each file in parquet row order (so row-group
    # min/max pruning actually works for id-range fetches)
    from pyspark.sql import functions as F

    rows = (
        back.withColumn("f", F.input_file_name())
        .select("f", "doc_id")
        .collect()
    )
    by_file = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["doc_id"])
    for f, ids in by_file.items():
        assert ids == sorted(ids), f
