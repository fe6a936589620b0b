"""Corpus ingestion: JSONL with corrupt lines quarantined, CSV/ORC
round-trips, n_chars normalization, unsupported-format error."""

from __future__ import annotations

import os

import pytest

from random_cut_forest_by_aws_spark.sources.ingest import read_documents

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web",
     "n_chars": 11},
    {"doc_id": 2, "text": "guten tag", "lang": "de", "source": "web",
     "n_chars": None},  # n_chars missing -> recomputed
]


def _write_jsonl(path: str) -> None:
    import json

    with open(path, "w") as f:
        for row in GOOD:
            f.write(json.dumps(row) + "\n")
        f.write('{"doc_id": 3, "text": "broken\n')  # truncated JSON
        f.write("not json at all\n")


def test_jsonl_with_quarantine(spark, tmp_path):
    path = str(tmp_path / "docs.jsonl")
    _write_jsonl(path)
    docs, quarantine = read_documents(spark, path, fmt="jsonl")
    got = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [1, 2]
    assert got["n_chars"].tolist() == [11, 9]  # null recomputed from text
    bad = quarantine.toPandas()
    assert len(bad) == 2  # both malformed lines captured, none lost
    assert bad["raw_record"].notna().all()
    assert list(docs.columns) == ["doc_id", "text", "lang", "source", "n_chars"]


def test_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "docs.csv")
    with open(path, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('5,"a,b text",en,web,8\n')
        f.write("6,plain,de,books,\n")
    docs, quarantine = read_documents(spark, path, fmt="csv")
    got = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [5, 6]
    assert got.loc[0, "text"] == "a,b text"  # quoting honored
    assert got["n_chars"].tolist() == [8, 5]
    # materialize through the columns — a bare count() trips Spark's
    # corrupt-record-only-scan guard (see read_documents docstring)
    assert len(quarantine.toPandas()) == 0


def test_orc_and_parquet_roundtrip(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for fmt in ("orc", "parquet"):
        path = str(tmp_path / f"docs_{fmt}")
        getattr(src.write.mode("overwrite"), fmt)(path)
        docs, quarantine = read_documents(spark, path, fmt=fmt)
        assert docs.count() == src.count()
        assert quarantine.count() == 0
        assert list(docs.columns) == [
            "doc_id", "text", "lang", "source", "n_chars",
        ]


def test_unsupported_format(spark):
    with pytest.raises(ValueError):
        read_documents(spark, "/nonexistent", fmt="avro")


def test_read_media_binary_files(spark, tmp_path):
    """binaryFile ingestion into the media schema: payload bytes intact,
    mime from extension, glob + size filters applied at scan level."""
    from random_cut_forest_by_aws_spark.sources.ingest import read_media

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG\r\n" + b"x" * 10)
    (d / "b.JPG").write_bytes(b"\xff\xd8\xff" + b"y" * 200)
    (d / "c.bin").write_bytes(b"opaque")
    (d / "notes.txt").write_bytes(b"not media")

    media = read_media(spark, str(d), glob="*.{png,JPG,bin}")
    rows = {r["doc_id"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.JPG", "c.bin"}
    assert rows["a.png"]["mime"] == "image/png"
    assert rows["b.JPG"]["mime"] == "image/jpeg"  # extension lowercased
    assert rows["c.bin"]["mime"] == "application/octet-stream"
    assert bytes(rows["a.png"]["payload"]) == b"\x89PNG\r\n" + b"x" * 10
    assert rows["a.png"]["width"] is None  # dims unknown until decode

    small = read_media(spark, str(d), glob="*.{png,JPG,bin}", max_bytes=50)
    assert {r["doc_id"].rsplit("/", 1)[-1] for r in small.collect()} == {
        "a.png", "c.bin",
    }

    # the media schema plugs straight into the multimodal operators
    from random_cut_forest_by_aws_spark.operators.multimodal import (
        media_metadata_violations,
    )
    media_metadata_violations(media).collect()
