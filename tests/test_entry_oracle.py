"""Rehearsal of the driver's correctness gate: run every queries() entry
at sf0.01 against its oracle_sql() via DuckDB and compare row counts,
schemas (column names) and values order-insensitively."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        else:
            # fail like the driver's canonicalizer fails: it sorts
            # object columns unstringified, which crashes on list
            # values (round-5 lesson — astype(str) masked that)
            import numpy as np

            head = pdf[c].head(100)
            if any(isinstance(v, (list, np.ndarray, dict, set)) for v in head):
                raise TypeError(
                    f"column {c!r} holds unhashable values — the driver "
                    "canonicalizer cannot sort it; flatten the output"
                )
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    exp = _normalize(duck.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), f"{name}: schema mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f":
            ok = np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = np.array_equal(a, b)
        assert ok, f"{name}: column {c} differs\n{got[c].head()}\n{exp[c].head()}"


def test_rows_only_queries_run(spark):
    """Queries without oracles must at least run and return a schema."""
    qs = entrymod.queries()
    no_oracle = set(qs) - set(entrymod.oracle_sql())
    assert no_oracle  # sketch ops exist
    for name in sorted(no_oracle):
        df = qs[name](spark, SF_DIR)
        assert df.columns  # schema resolves
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert {"check", "scope", "passed"} <= set(pdf.columns)


def test_doc_fingerprint_ansi_safe(spark):
    """fingerprint must evaluate under ANSI mode (xxhash64 chain, no
    arithmetic overflow) and discriminate distinct documents."""
    from random_cut_forest_by_aws_spark.operators.textqc import text_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with_ansi = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        pdf = text_profile(docs).select("doc_id", "fingerprint").toPandas()
    finally:
        if with_ansi is not None:
            spark.conf.set("spark.sql.ansi.enabled", with_ansi)
    assert pdf["fingerprint"].notna().all()
    assert pdf["fingerprint"].nunique() > 400


@pytest.fixture(scope="module")
def hostile_sf(spark, tmp_path_factory):
    """sf0.01 plus a multi-byte-character doc and an empty doc — the
    standard fixture is accidentally pure-ASCII, which masked byte-vs-
    codepoint divergences between Spark and DuckDB in round 1."""
    import shutil

    root = str(tmp_path_factory.mktemp("sfmod"))
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(f"{SF_DIR}/{t}.parquet", f"{root}/{t}.parquet")
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra = spark.createDataFrame(
        [(9001, "héllo wörld multi ™ bytes and more words for shingles",
          "xx", "srcX", 25),
         (9002, "", "xx", "srcX", 0),
         (9003, "contact jörg at jorg.müller+x@example.de or 555-123-4567, "
                "sée https://exämple.com/p?q=1 from 192.168.0.1 id 9876543210",
          "xx", "srcX", 120)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    src.unionByName(extra).coalesce(1).write.parquet(f"{root}/documents.parquet")
    return root


@pytest.mark.parametrize("name", [
    "media_decode_features", "media_resize_plan",
    "lang_quality_docs", "minhash_candidates_docs",
    "text_profile_docs", "token_counts_docs",
    "repetition_docs", "contamination_docs", "mixture_sample_docs",
    "pii_profile_docs", "pack_sequences_docs", "quota_sample_docs",
    "lm_logprob_docs",
    "winnow_fingerprints_docs", "winnow_candidates_docs",
    "winnow_containment_docs", "simhash_portable_docs",
    "chunk_docs", "rollup_report_docs", "tfidf_keywords_docs",
    "constraint_check_docs", "suggest_rules_docs",
    "constraint_profile_docs",
    "boilerplate_lines_docs", "line_dedup_docs",
    "token_drift_docs", "token_bigram_drift_docs",
    "snapshot_diff_docs", "snapshot_diff_summary_docs",
    "stats_state_merge_docs",
])
def test_text_oracles_survive_hostile_docs(spark, hostile_sf, name):
    """The text/media oracles must match DuckDB even with non-ASCII and
    empty documents present (guards byte-vs-codepoint and div-by-zero
    divergences)."""
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM "
                f"'{hostile_sf}/documents.parquet/*.parquet'"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{hostile_sf}/{t}.parquet'")
    got = _normalize(entrymod.queries()[name](spark, hostile_sf).toPandas())
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        ok = (np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
              if a.dtype.kind == "f" else np.array_equal(a, b))
        assert ok, f"{name}: column {c} differs"
