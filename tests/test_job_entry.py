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


def test_job_metrics_history_anomaly_check(spark, tmp_path_factory):
    """deequ addAnomalyCheck loop end-to-end: three job runs sharing a
    --metrics-history dir. Runs 1+2 see identical input (same seed ⇒
    bit-identical per-check output_rows, zero prior variance); run 3's
    input is 3× larger, so its output_rows break the learned band and
    must surface as failing metrics_anomaly verdicts. Runs 1+2 have
    too little history (min 2 priors) and must all pass."""
    from random_cut_forest_by_aws_spark.plans.job import main
    from random_cut_forest_by_aws_spark.sources import sequences

    root = tmp_path_factory.mktemp("job_anom")
    small, big = str(root / "small"), str(root / "big")
    sequences(spark, 4_000, seed=11).write.parquet(small)
    sequences(spark, 12_000, seed=12).write.parquet(big)
    hist = str(root / "history")
    common = ["--cpus", "8", "--trees", "10", "--sample-size", "64",
              "--metrics-history", hist, "--anomaly-method", "zscore",
              "--anomaly-min-history", "2"]

    con = duckdb.connect()

    def anomaly_rows(out):
        return con.execute(
            f"SELECT scope, passed FROM '{out}/verdicts/*.parquet' "
            "WHERE \"check\" = 'metrics_anomaly_zscore' ORDER BY 1"
        ).fetchall()

    for i, inp in enumerate([small, small, big]):
        out = str(root / f"out{i}")
        main(["--input", inp, "--output", out] + common)

    # every run emitted one anomaly verdict per metric, on every run
    r0, r2 = anomaly_rows(str(root / "out0")), anomaly_rows(str(root / "out2"))
    assert len(r0) > 0 and len(r0) == len(r2)
    # runs 1+2: insufficient history ⇒ all pass (never flag while warming)
    assert all(p for _, p in r0)
    assert all(p for _, p in anomaly_rows(str(root / "out1")))
    # run 3: 3× input must break at least one metric's learned band
    assert any(not p for _, p in r2)
    # the history dir accumulated all three runs for every check
    n_hist, n_runs = con.execute(
        f"SELECT count(*), count(DISTINCT run_ts) FROM '{hist}/*.parquet'"
    ).fetchone()
    assert n_runs == 3 and n_hist == 3 * len(r0)

def test_job_reconciliation_check(spark, job_io, tmp_path_factory):
    """--reconcile-against end-to-end: the prior snapshot is the input
    with a slice of rows dropped and one n_tok perturbed, so the diff
    must report removed+changed churn; a tight --max-churn fails the
    churn verdict, a loose one passes it, and the per-status summary
    table lands in {output}/reconciliation."""
    from random_cut_forest_by_aws_spark.plans.job import main

    root, inp, dim = job_io
    prior = str(tmp_path_factory.mktemp("job_rec") / "prior")
    cur = spark.read.parquet(inp)
    # prior snapshot: 90% of current rows, one value changed
    from pyspark.sql import functions as F
    cur.filter(F.xxhash64("doc_id") % 10 != 0).withColumn(
        "n_tok",
        F.when(F.xxhash64("doc_id") % 7 == 0, F.col("n_tok") + 1)
        .otherwise(F.col("n_tok")),
    ).write.parquet(prior)

    con = duckdb.connect()

    def rec_verdicts(out):
        return dict(con.execute(
            f"SELECT scope, passed FROM '{out}/verdicts/*.parquet' "
            "WHERE \"check\" = 'reconciliation'"
        ).fetchall())

    common = ["--input", inp, "--ref-dim", dim, "--cpus", "8",
              "--trees", "10", "--sample-size", "64",
              "--reconcile-against", prior, "--reconcile-keys", "doc_id"]
    out_tight = str(root / "out_rec_tight")
    main(common + ["--output", out_tight, "--max-churn", "0.01"])
    v = rec_verdicts(out_tight)
    assert v["churn"] is False
    # the sequences generator PLANTS duplicate doc_ids — the
    # duplicate-key verdict must surface them
    assert v["duplicate_keys"] is False

    out_loose = str(root / "out_rec_loose")
    main(common + ["--output", out_loose, "--max-churn", "0.9"])
    v = rec_verdicts(out_loose)
    assert v["churn"] is True

    # summary table: statuses consistent with the construction
    s = dict(con.execute(
        f"SELECT status, n_keys FROM '{out_tight}/reconciliation/*.parquet'"
    ).fetchall())
    assert s.get("added", 0) > 0          # rows dropped from prior
    assert s.get("changed", 0) > 0        # perturbed n_tok
    assert s.get("removed", 0) == 0       # prior ⊆ current
    assert s.get("unchanged", 0) > 0
    assert s.get("duplicate_key", 0) > 0  # planted dup doc_ids


def test_job_stats_state_accumulates(spark, tmp_path_factory):
    """--stats-state end-to-end: two runs over two disjoint slices must
    leave cumulative statistics equal to a direct computation over the
    union, without either run reading the other's data."""
    from pyspark.sql import functions as F

    from random_cut_forest_by_aws_spark.plans.job import main
    from random_cut_forest_by_aws_spark.sources import sequences

    root = tmp_path_factory.mktemp("job_state")
    full = sequences(spark, 6_000, seed=21)
    a, b = str(root / "a"), str(root / "b")
    full.filter(F.col("seq") % 2 == 0).write.parquet(a)
    full.filter(F.col("seq") % 2 == 1).write.parquet(b)
    state = str(root / "state")
    common = ["--cpus", "8", "--trees", "10", "--sample-size", "64",
              "--stats-state", state]
    for i, inp in enumerate([a, b]):
        main(["--input", inp, "--output", str(root / f"out{i}")] + common)

    cum = spark.read.parquet(str(root / "out1/cumulative_stats")) \
        .collect()[0].asDict()
    direct = full.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_tok").cast("double")).alias("s"),
        F.min(F.col("n_tok").cast("double")).alias("mn"),
        F.max(F.col("n_tok").cast("double")).alias("mx"),
        F.countDistinct("source").alias("src"),
    ).collect()[0]
    assert cum["n_rows"] == direct["n"]
    assert cum["n_tok_sum"] == pytest.approx(direct["s"])
    assert cum["n_tok_min"] == direct["mn"]
    assert cum["n_tok_max"] == direct["mx"]
    # HLL estimate of source cardinality (tiny set -> exact in practice)
    assert abs(cum["source_cardinality"] - direct["src"]) <= 1
    # the state dir accumulated one row per run
    assert spark.read.parquet(state).count() == 2
