"""PII / structural-pattern scrubbing for text corpora (pre-training QC).

Large-scale training pipelines scrub personally identifiable information
and profile structural patterns (URLs, emails, phone-shaped strings,
long digit runs) before a corpus ships. Everything here is JVM-side
regex fused into the document scan — `regexp_count` / `regexp_replace`
inside whole-stage codegen, zero Python per row, no shuffle beyond the
caller's — so the plan at 10^12 documents is exactly the scan.

The patterns are deliberately written in the dialect-neutral regex
subset shared by Java (Spark) and RE2 (DuckDB): explicit character
classes, no backreferences, no lookaround. That keeps every output
DuckDB-oracle-checkable (`regexp_extract_all` lengths, `regexp_replace`
with the 'g' flag), so the gate certifies the exact hit counts AND the
redacted text byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dialect-neutral patterns (Java regex ∩ RE2): see module docstring.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "phone": r"\+?[0-9][0-9][0-9][-. ][0-9][0-9][0-9][-. ][0-9][0-9][0-9][0-9]",
    "ipv4": r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+",
    "url": r"https?://[A-Za-z0-9./_%-]+",
    "digit_run": r"[0-9][0-9][0-9][0-9][0-9]+",  # >=5 consecutive digits
}

REDACT_ORDER = ("email", "phone", "url", "ipv4", "digit_run")


def _redacted(text: Column) -> Column:
    out = text
    for name in REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def pii_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII/pattern hit counts plus the redacted text.

    Redaction applies the patterns in REDACT_ORDER, so an email is
    replaced before its digit runs could be — counts are measured on the
    ORIGINAL text, independently per pattern (a digit run inside a phone
    number counts for both; consumers filter on whichever they police).
    """
    from ._parallel import ensure_compute_parallelism

    # 10 regex passes per document fused into the scan: spread
    # single-file inputs first (no-op on real multi-split tables)
    docs = ensure_compute_parallelism(docs)
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(p)).cast("bigint").alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    return docs.select(
        F.col(id_col),
        *counts,
        _redacted(t).alias("redacted_text"),
    )
