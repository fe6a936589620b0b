"""PredictorCorrector suppression + RCFCaster calibrated forecasting."""

from __future__ import annotations

import numpy as np

from random_cut_forest_by_aws_spark.core import RCFForest
from random_cut_forest_by_aws_spark.core.caster import RCFCaster
from random_cut_forest_by_aws_spark.core.corrector import (
    ErrorCalibrator,
    PredictorCorrector,
)


def test_corrector_suppresses_single_dim_glitch():
    """A point anomalous in ONE dimension whose other dims are nominal:
    the expected point (imputed top dim) should score low ⇒ suppress is a
    legitimate outcome; a point far off in ALL dims must NOT be
    suppressed."""
    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, size=(3000, 3)).astype(np.float32)
    f = RCFForest(3, num_trees=30, sample_size=128, time_decay=0.0, seed=2)
    f.update_batch(X)
    pc = PredictorCorrector(max_attributed_dims=1)
    glitch = np.array([0.1, 8.0, -0.2], np.float32)  # one bad dim
    s_g = f.score(glitch[None])[0]
    thr = 1.0
    sup_g, expected = pc.should_suppress(f, glitch, s_g, thr)
    assert sup_g  # corrected point is in-distribution
    assert abs(expected[1]) < 2.5  # imputed the spiking dim back
    far = np.array([9.0, 9.0, 9.0], np.float32)
    sup_f, _ = pc.should_suppress(f, far, f.score(far[None])[0], thr)
    assert not sup_f  # no single expected point explains it


def test_error_calibrator_shifts_bounds():
    cal = ErrorCalibrator(horizon=1, dims=1, window=64)
    for _ in range(32):
        cal.observe(0, 0, 2.0)  # systematic +2 bias
    v, u, lo = cal.calibrate(0, 0, 10.0, 10.5, 9.5)
    assert v == 12.0  # median error folded in
    assert u >= 12.0 and lo <= 9.5
    assert abs(cal.rmse(0, 0) - 2.0) < 1e-9


def test_caster_forecasts_level_with_calibration():
    rng = np.random.default_rng(7)
    caster = RCFCaster(shingle_size=4, horizon=3, num_trees=20,
                       sample_size=64, time_decay=0.0, seed=3)
    out = None
    for v in 5.0 + rng.normal(0, 0.05, 1500):
        out = caster.process(float(v))
    assert out is not None
    assert np.all(np.abs(out["values"] - 5.0) < 0.5)
    assert np.all(out["upper"] >= out["values"])
    assert np.all(out["lower"] <= out["values"])
    assert all(np.isfinite(r) for r in out["rmse"])
    assert out["rmse"][0] < 0.5


def test_caster_settles_forecast_at_issue_tick_plus_horizon():
    """A horizon-h forecast issued at tick T predicts value #(T+h+1) and
    must be scored against exactly that value when it arrives (the
    pre-fix code popped one tick late, scoring against value #(T+h+2))."""
    caster = RCFCaster(shingle_size=2, horizon=2, num_trees=5,
                       sample_size=32, time_decay=0.0, seed=1, calibrate=False)
    for v in range(120):  # deterministic ramp so forecasts exist
        caster.process(float(v))
    T = caster._tick
    assert T + 1 in caster._pending  # next value realizes these forecasts
    expected = [(h, 999.0 - pred) for h, pred in caster._pending[T + 1]]
    seen: list[tuple[int, float]] = []
    caster.calib.observe = lambda h, d, e: seen.append((h, e))
    caster.process(999.0)
    assert len(seen) == len(expected) > 0
    for (h_got, e_got), (h_exp, e_exp) in zip(seen, expected):
        assert h_got == h_exp
        assert abs(e_got - e_exp) < 1e-9
