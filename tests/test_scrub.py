"""PII scrub: planted-pattern counts, redaction order, dialect parity."""

from __future__ import annotations

import re

import pandas as pd

from random_cut_forest_by_aws_spark.operators.scrub import (
    PII_PATTERNS,
    REDACT_ORDER,
    pii_profile,
)

DOCS = [
    ("d1", "reach me at jane.doe+spam@example.co.uk or 555-867-5309 x2"),
    ("d2", "server 10.0.254.3 logged 1234567 hits from https://example.com/a_b%20c"),
    ("d3", "no pii here, just words and the number 42"),
    ("d4", "two mails: a@b.io c@d.org and +1 415-555-2671 calling 127.0.0.1"),
    ("d5", ""),
]


def test_pii_profile_counts_and_redaction(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    got = (
        pii_profile(df).toPandas().set_index("doc_id").sort_index()
    )
    # independently recompute with Python re (a third regex engine)
    for doc_id, text in DOCS:
        for name, pat in PII_PATTERNS.items():
            assert got.loc[doc_id, f"n_{name}"] == len(re.findall(pat, text)), (
                doc_id, name)
        red = text
        for name in REDACT_ORDER:
            red = re.sub(PII_PATTERNS[name], f"<{name.upper()}>", red)
        assert got.loc[doc_id, "redacted_text"] == red, doc_id
    # the fixtures actually exercise every pattern at least once
    assert got["n_email"].sum() >= 3
    assert got["n_phone"].sum() >= 2
    assert got["n_ipv4"].sum() >= 2
    assert got["n_url"].sum() >= 1
    assert got["n_digit_run"].sum() >= 1
    # redaction removed every counted hit
    for name in PII_PATTERNS:
        assert not got["redacted_text"].str.contains(
            PII_PATTERNS[name], regex=True).any(), name


def test_redaction_order_email_before_digit_run(spark):
    """An email containing digits must become <EMAIL>, not be torn apart
    by the digit-run pass — REDACT_ORDER is load-bearing."""
    df = spark.createDataFrame(
        pd.DataFrame([("x", "mail 12345user@host.com and raw 99999")],
                     columns=["doc_id", "text"])
    )
    out = pii_profile(df).toPandas().iloc[0]
    assert out["redacted_text"] == "mail <EMAIL> and raw <DIGIT_RUN>"
