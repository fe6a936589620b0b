"""Metric-history anomaly detection (operators/metrics_anomaly.py)."""

from __future__ import annotations

import math

import pytest

from random_cut_forest_by_aws_spark.operators.metrics_anomaly import (
    metric_anomalies,
)

SCHEMA = "check string, scope string, run_ts bigint, value double"


def _series(check, scope, vals):
    return [(check, scope, i, float(v)) for i, v in enumerate(vals)]


@pytest.fixture(scope="module")
def history(spark):
    # stable series with one planted spike at t=10, plus a second key
    # whose scale is 100x — per-key normalization must keep it quiet
    rows = _series("stats", "n_tok", [100, 102, 98, 101, 99, 100, 102, 98,
                                      101, 99, 300, 100, 101])
    rows += _series("stats", "n_chars", [10_000 + (i % 3) * 50 for i in range(13)])
    return spark.createDataFrame(rows, SCHEMA)


def test_zscore_flags_planted_spike_only(history):
    out = metric_anomalies(history, ("check", "scope"), "run_ts", "value",
                           method="zscore", z=3.0, min_history=5).collect()
    flagged = {(r["scope"], r["run_ts"]) for r in out if r["is_anomaly"]}
    assert ("n_tok", 10) in flagged
    assert all(s != "n_chars" for s, _ in flagged)
    # warm-up: nothing before min_history prior points
    assert all(t >= 5 for _, t in flagged)


def test_zscore_matches_scalar_replay(history):
    out = {r["run_ts"]: r for r in metric_anomalies(
        history, ("check", "scope"), "run_ts", "value",
        method="zscore", z=3.0, min_history=5,
    ).filter("scope = 'n_tok'").collect()}
    vals = [100, 102, 98, 101, 99, 100, 102, 98, 101, 99, 300, 100, 101]
    for i, v in enumerate(vals):
        prior = vals[:i]
        r = out[i]
        assert r["n_prior"] == len(prior)
        if len(prior) == 0:
            assert r["mean_prior"] is None and r["z_score"] is None
            continue
        m = sum(prior) / len(prior)
        assert r["mean_prior"] == pytest.approx(m, abs=1e-6)
        if len(prior) > 1:
            var = sum((x - m) ** 2 for x in prior) / (len(prior) - 1)
            if var > 0:
                assert r["z_score"] == pytest.approx(
                    (v - m) / math.sqrt(var), abs=1e-4
                )


def test_zscore_constant_series_breach(spark):
    """Zero variance: any departure from the constant is anomalous once
    warm; the constant itself never is."""
    rows = _series("c", "s", [5, 5, 5, 5, 5, 5, 7, 5])
    out = {r["run_ts"]: r["is_anomaly"] for r in metric_anomalies(
        spark.createDataFrame(rows, SCHEMA), ("check", "scope"),
        "run_ts", "value", method="zscore", z=3.0, min_history=5,
    ).collect()}
    assert out[6] is True
    assert all(not out[t] for t in out if t != 6)


def test_online_flags_spike_and_adapts_to_drift(spark):
    """The discounted band follows a slow ramp (fixed all-history zscore
    would eventually alarm on pure drift); a genuine spike still fires."""
    drift = [100 + 2 * i for i in range(30)]          # slow ramp
    spike = drift + [400]                              # then a real jump
    rows = _series("c", "drift", drift) + _series("c", "spike", spike)
    out = metric_anomalies(
        spark.createDataFrame(rows, SCHEMA), ("check", "scope"),
        "run_ts", "value", method="online", z=4.0, min_history=5,
        discount=0.15,
    ).collect()
    drift_flags = [r for r in out if r["scope"] == "drift" and r["is_anomaly"]]
    spike_flags = [(r["run_ts"]) for r in out
                   if r["scope"] == "spike" and r["is_anomaly"]]
    assert drift_flags == []
    assert spike_flags == [30]


def test_abs_change_orders_match_scalar_diff(spark):
    """abs_change = deequ AbsoluteChangeStrategy: order-1 flags the jump
    rows; order-n equals n iterated scalar diffs (binomial identity)."""
    vals = [10.0, 12.0, 11.0, 60.0, 61.0, 59.0, 12.0]
    rows = _series("c", "s", vals)
    df = spark.createDataFrame(rows, SCHEMA)
    out1 = {r["run_ts"]: r for r in metric_anomalies(
        df, ("check", "scope"), "run_ts", "value",
        method="abs_change", lower=-10.0, upper=10.0,
    ).collect()}
    assert out1[0]["change"] is None and out1[0]["is_anomaly"] is False
    for i in range(1, len(vals)):
        assert out1[i]["change"] == pytest.approx(vals[i] - vals[i - 1])
    assert [t for t in sorted(out1) if out1[t]["is_anomaly"]] == [3, 6]

    out2 = {r["run_ts"]: r["change"] for r in metric_anomalies(
        df, ("check", "scope"), "run_ts", "value",
        method="abs_change", order=2, upper=1e9,
    ).collect()}
    d1 = [vals[i] - vals[i - 1] for i in range(1, len(vals))]
    d2 = [d1[i] - d1[i - 1] for i in range(1, len(d1))]
    assert out2[0] is None and out2[1] is None
    for i, expect in enumerate(d2, start=2):
        assert out2[i] == pytest.approx(expect)


def test_rel_change_ratio_and_zero_prev_quiet(spark):
    """rel_change = deequ RelativeRateOfChangeStrategy: ratio bounds;
    a zero or absent previous value yields NULL change, never a flag."""
    vals = [0.0, 100.0, 110.0, 300.0, 30.0, 33.0]
    rows = _series("c", "s", vals)
    out = {r["run_ts"]: r for r in metric_anomalies(
        spark.createDataFrame(rows, SCHEMA), ("check", "scope"),
        "run_ts", "value", method="rel_change", lower=0.5, upper=2.0,
    ).collect()}
    assert out[0]["change"] is None and out[0]["is_anomaly"] is False
    assert out[1]["change"] is None and out[1]["is_anomaly"] is False
    assert out[2]["change"] == pytest.approx(1.1)
    assert [t for t in sorted(out) if out[t]["is_anomaly"]] == [3, 4]


def test_online_matches_scalar_deviation_replay(spark):
    from random_cut_forest_by_aws_spark.core.thresholder import Deviation

    vals = [3.0, 4.0, 2.5, 8.0, 3.5, 3.0, 20.0, 4.0]
    rows = _series("c", "s", vals)
    out = {r["run_ts"]: r for r in metric_anomalies(
        spark.createDataFrame(rows, SCHEMA), ("check", "scope"),
        "run_ts", "value", method="online", z=2.0, min_history=2,
        discount=0.1,
    ).collect()}
    dev = Deviation(0.1)
    for i, v in enumerate(vals):
        r = out[i]
        if i > 0:
            assert r["mean_prior"] == pytest.approx(dev.mean, abs=1e-6)
            sd = dev.deviation
            expect = (
                i >= 2 and ((sd > 0 and abs(v - dev.mean) > 2.0 * sd)
                            or (sd == 0 and v != dev.mean))
            )
            assert r["is_anomaly"] == expect, (i, v)
        dev.update(v)
