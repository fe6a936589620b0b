"""Structural schema validation (operators/schema.py): presence, type
canonicalization, nullability contract, extra-column policy, and the
ValidationSuite verdict surface."""

from __future__ import annotations

import pytest

from random_cut_forest_by_aws_spark.operators.schema import validate_schema


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [(1, "a", [1, 2], 2.5)],
        "doc_id bigint, source string, tokens array<int>, score double",
    )


def _idx(df):
    return df.toPandas().set_index("column")


def test_matching_schema_all_ok(spark, tbl):
    out = _idx(validate_schema(tbl, {
        "doc_id": "bigint", "source": "string",
        "tokens": "array<int>", "score": "double",
    }))
    assert out["passed"].all()
    assert (out["status"] == "ok").all()


def test_type_spelling_is_canonical(spark, tbl):
    # 'long' == 'bigint', 'array<integer>' == 'array<int>' after parsing
    out = _idx(validate_schema(tbl, {"doc_id": "long", "tokens": "array<integer>"}))
    assert out["passed"].all()


def test_missing_and_mismatch(spark, tbl):
    out = _idx(validate_schema(tbl, {
        "doc_id": "string",      # mismatch
        "missing_col": "int",    # missing
        "source": "string",      # ok
    }))
    assert out.loc["doc_id", "status"] == "type_mismatch"
    assert out.loc["doc_id", "actual_type"] == "bigint"
    assert out.loc["missing_col", "status"] == "missing"
    assert out.loc["source", "passed"]


def test_nullability_contract(spark, tbl):
    # createDataFrame columns are nullable -> a non-nullable contract on
    # doc_id must fail even though today's data has no nulls
    out = _idx(validate_schema(tbl, {"doc_id": "bigint"},
                               non_nullable=("doc_id",)))
    assert out.loc["doc_id", "status"] == "nullable_violation"
    # and a genuinely non-nullable column passes
    nn = tbl.selectExpr("coalesce(doc_id, 0) AS doc_id")
    out2 = _idx(validate_schema(nn, {"doc_id": "bigint"},
                                non_nullable=("doc_id",)))
    assert out2.loc["doc_id", "passed"]


def test_extra_columns_policy(spark, tbl):
    strict = _idx(validate_schema(tbl, {"doc_id": "bigint"}, allow_extra=False))
    assert set(strict[strict["status"] == "unexpected"].index) == {
        "source", "tokens", "score"
    }
    assert not strict.loc["source", "passed"]
    lax = _idx(validate_schema(tbl, {"doc_id": "bigint"}, allow_extra=True))
    assert list(lax.index) == ["doc_id"]


def test_builder_validation(spark, tbl):
    with pytest.raises(ValueError, match="at least one column"):
        validate_schema(tbl, {})
    with pytest.raises(ValueError, match="not in expected"):
        validate_schema(tbl, {"doc_id": "bigint"}, non_nullable=("source",))


def test_suite_schema_verdicts(spark, seqs):
    from random_cut_forest_by_aws_spark.operators.drift import DriftConfig
    from random_cut_forest_by_aws_spark.plans import SuiteConfig, ValidationSuite

    cfg = SuiteConfig(
        drift=DriftConfig(num_trees=5, sample_size=16, window=8,
                          min_baseline_windows=2, buckets=1, chunk_size=256),
        expected_schema={"doc_id": "string", "tokens": "array<int>",
                         "n_tok": "int", "source": "string",
                         "nope": "int"},
    )
    v = ValidationSuite(spark, cfg).run(seqs).verdicts.toPandas()
    sch = v[v["check"] == "schema"].set_index("scope")
    assert len(sch) == 5
    assert not sch.loc["nope", "passed"]
    assert sch.loc["nope", "detail"].startswith("missing")
    assert sch.loc["tokens", "passed"]


def test_job_cli_expect_schema(spark, tmp_path):
    """--expect-schema-json verifies the structural contract through the
    spark-submit entry point; schema verdicts land in the output."""
    import json

    import duckdb

    from random_cut_forest_by_aws_spark.plans.job import main
    from random_cut_forest_by_aws_spark.sources import sequences

    inp, out = str(tmp_path / "seqs"), str(tmp_path / "out")
    sequences(spark, 3_000, seed=13).write.parquet(inp)
    spec = {"columns": {"doc_id": "string", "tokens": "array<int>",
                        "bogus": "int"}}
    rc = main([
        "--input", inp, "--output", out, "--cpus", "8",
        "--trees", "5", "--sample-size", "16",
        "--expect-schema-json", json.dumps(spec),
    ])
    assert rc == 2
    v = duckdb.sql(
        f"SELECT scope, passed FROM '{out}/verdicts/*.parquet' "
        "WHERE \"check\" = 'schema' ORDER BY scope"
    ).fetchall()
    assert ("bogus", False) in v and ("doc_id", True) in v and len(v) == 3


def test_job_cli_baseline_profile_chain(spark, tmp_path):
    """Two chained runs: run 1 writes its histogram profile; run 2
    compares against it (check=baseline_drift). Same-distribution input
    passes; a shifted input fails."""
    import duckdb
    from pyspark.sql import functions as F

    from random_cut_forest_by_aws_spark.plans.job import main
    from random_cut_forest_by_aws_spark.sources import sequences

    in1, out1 = str(tmp_path / "in1"), str(tmp_path / "out1")
    in2, out2 = str(tmp_path / "in2"), str(tmp_path / "out2")
    in3, out3 = str(tmp_path / "in3"), str(tmp_path / "out3")
    sequences(spark, 3_000, seed=21).write.parquet(in1)
    sequences(spark, 3_000, seed=22).write.parquet(in2)  # same law
    # shifted corpus: n_tok scaled 4x moves the histogram bins
    shifted = sequences(spark, 3_000, seed=23).withColumn(
        "n_tok", (F.col("n_tok") * 4).cast("int")
    )
    shifted.write.parquet(in3)

    main(["--input", in1, "--output", out1, "--cpus", "8",
          "--trees", "5", "--sample-size", "16"])
    assert duckdb.sql(
        f"SELECT count(*) FROM '{out1}/profile/*.parquet'"
    ).fetchone()[0] > 0

    main(["--input", in2, "--output", out2, "--cpus", "8",
          "--trees", "5", "--sample-size", "16",
          "--baseline-profile", f"{out1}/profile"])
    bd = dict(duckdb.sql(
        f"SELECT scope, passed FROM '{out2}/verdicts/*.parquet' "
        "WHERE \"check\" = 'baseline_drift'"
    ).fetchall())
    assert set(bd) == {"n_tok", "source"}
    assert bd["n_tok"] and bd["source"]  # same generative law: no drift

    main(["--input", in3, "--output", out3, "--cpus", "8",
          "--trees", "5", "--sample-size", "16",
          "--baseline-profile", f"{out1}/profile"])
    bd3 = dict(duckdb.sql(
        f"SELECT scope, passed FROM '{out3}/verdicts/*.parquet' "
        "WHERE \"check\" = 'baseline_drift'"
    ).fetchall())
    assert not bd3["n_tok"]  # the planted 4x token shift is flagged
    assert bd3["source"]     # the source mix did not move
