"""End-to-end test of the spark-submit entry point (plans/job.py) — the
packaged driver the north rule ships via --py-files. VERDICT r4 #7:
this was the last §2.1 surface without a test. Invokes main() in-process
(get_spark getOrCreate reuses the test session) against a small planted
fixture and asserts the written parquet outputs match a direct
ValidationSuite run on the same input."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def job_io(spark, tmp_path_factory):
    from random_cut_forest_by_aws_spark.sources import sequences, sources_dim

    root = tmp_path_factory.mktemp("job_e2e")
    inp, dim = str(root / "seqs"), str(root / "dim")
    sequences(spark, 8_000, seed=7).write.parquet(inp)
    sources_dim(spark).write.parquet(dim)
    return root, inp, dim


def test_job_main_end_to_end(spark, job_io):
    from random_cut_forest_by_aws_spark.operators.drift import DriftConfig
    from random_cut_forest_by_aws_spark.plans import SuiteConfig, ValidationSuite
    from random_cut_forest_by_aws_spark.plans.job import main

    root, inp, dim = job_io
    out = str(root / "out")
    rc = main([
        "--input", inp, "--output", out, "--ref-dim", dim,
        "--cpus", "8", "--trees", "10", "--sample-size", "64",
    ])
    # the generator plants dup/null/mismatch violations → failing checks
    assert rc == 2

    # all four result tables landed as readable parquet
    con = duckdb.connect()
    verd = con.execute(
        f"SELECT \"check\", scope, passed FROM '{out}/verdicts/*.parquet' "
        "ORDER BY 1, 2"
    ).fetchall()
    assert len(verd) > 0
    n_viol = con.execute(
        f"SELECT count(*) FROM '{out}/violations/*.parquet'"
    ).fetchone()[0]
    assert n_viol > 0  # planted violations surfaced as rows
    for t in ["metrics", "stats", "lineage"]:
        assert (
            con.execute(f"SELECT count(*) FROM '{out}/{t}/*.parquet'").fetchone()[0]
            > 0
        )
    # lineage accounts for every input row exactly once across buckets
    n_in = con.execute(f"SELECT count(*) FROM '{inp}/*.parquet'").fetchone()[0]
    n_lin = con.execute(
        f"SELECT sum(n_rows) FROM '{out}/lineage/*.parquet'"
    ).fetchone()[0]
    assert int(n_lin) == n_in

    # the CLI result must equal a direct suite run with the same config
    cfg = SuiteConfig(
        drift=DriftConfig(num_trees=10, sample_size=64, rows_per_bucket=100_000)
    )
    res = ValidationSuite(spark, cfg).run(
        spark.read.parquet(inp), ref_dim=spark.read.parquet(dim)
    )
    direct = sorted(
        (r["check"], r["scope"], r["passed"])
        for r in res.verdicts.select("check", "scope", "passed").collect()
    )
    assert verd == direct
