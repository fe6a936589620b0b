"""Raw-corpus ingestion: JSONL / CSV / ORC / parquet → the canonical
documents schema, with malformed-record capture.

Text corpora arrive as JSONL far more often than as parquet; the
production-relevant details this reader pins down:

* **Explicit schema, never inference** — schema inference is a full
  extra pass over the data before the real read (at 100 TB, a second
  100 TB scan), and a sampled inference can mis-type sparse columns.
* **PERMISSIVE + corrupt-record capture** — a trillion-line crawl WILL
  contain broken JSON; failing the job (FAILFAST) or silently nulling
  (DROPMALFORMED) are both wrong for pipelines that must account for
  every input byte. Malformed lines land in ``_corrupt_record`` and are
  split into a quarantine DataFrame the caller can persist.
* **Normalization** — ``n_chars`` is recomputed when absent/null so
  downstream operators can rely on it.

Reads stay lazy; the format branches only pick reader options, so
Catalyst pushdown/pruning applies as usual (JSON/CSV scans still parse
whole lines — converting to parquet after first ingest is the real
optimization, and that write is one ``df.write.parquet`` away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_FIELDS = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_CORRUPT = "_corrupt_record"


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
) -> tuple[DataFrame, DataFrame]:
    """Read a documents corpus; returns ``(docs, quarantine)``.

    ``docs`` has exactly the canonical columns (n_chars filled from the
    text when missing); ``quarantine`` holds the raw malformed records
    (empty for the binary formats, which cannot be partially corrupt at
    row level).

    Spark refuses queries against a raw JSON/CSV scan whose referenced
    columns prune down to only the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — so
    materialize the quarantine through its columns (``.write``,
    ``.toPandas()``, ``collect()``), which is what a pipeline does with
    it anyway; a bare ``quarantine.count()`` trips the guard.
    """
    fmt = fmt.lower()
    if fmt in ("parquet", "orc"):
        raw = getattr(spark.read, fmt)(path)
        quarantine = spark.createDataFrame([], "raw_record string, doc_id bigint")
    elif fmt in ("json", "jsonl", "csv"):
        reader = (
            spark.read.schema(f"{DOC_FIELDS}, {_CORRUPT} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
        )
        if fmt == "csv":
            raw = reader.option("header", "true").csv(path)
        else:
            raw = reader.json(path)
        # Spark disallows scans that reference ONLY the corrupt-record
        # column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
        # carrying doc_id (null for malformed lines) keeps the scan
        # legal without caching the parse.
        quarantine = raw.filter(F.col(_CORRUPT).isNotNull()).select(
            F.col(_CORRUPT).alias("raw_record"), "doc_id"
        )
        raw = raw.filter(F.col(_CORRUPT).isNull())
    else:
        raise ValueError(f"unsupported corpus format: {fmt}")

    docs = raw.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.coalesce(F.col("n_chars"), F.length("text")).cast("bigint").alias(
            "n_chars"
        ),
    )
    return docs, quarantine


_EXT_MIME = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "webm": "video/webm",
}


def read_media(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest raw media blobs via Spark's ``binaryFile`` source into the
    engine's media schema (``operators/multimodal.py``): ``doc_id`` (the
    file path — stable, dedupable), ``mime`` (from the extension; unknown
    extensions become application/octet-stream), ``payload`` (bytes),
    and NULL ``width/height/duration_ms`` — real dimensions only exist
    after decode (`media_features`), exactly like production lakes where
    the scan must not read pixel data to plan the pipeline.

    Scale notes: ``binaryFile`` is a FileFormat scan — partition pruning
    and the ``pathGlobFilter`` apply at file-listing time, one task per
    file group; ``max_bytes`` pushes ``spark.sql.sources.binaryFile
    .maxLength``-style protection down as a length filter BEFORE payload
    bytes reach Python (oversized assets are dropped by metadata, their
    content is still read by the scan only if selected)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    if max_bytes is not None:
        raw = raw.filter(F.col("length") <= int(max_bytes))
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = F.lit("application/octet-stream")
    for e, m in sorted(_EXT_MIME.items()):
        mime = F.when(ext == F.lit(e), F.lit(m)).otherwise(mime)
    return raw.select(
        F.col("path").alias("doc_id"),
        mime.alias("mime"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
