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
