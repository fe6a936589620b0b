"""RCFCaster — calibrated streaming forecasting (parkservices parity).

Composes a shingled forest, iterative extrapolation, and rolling
error calibration (``parkservices/RCFCaster.java:43-109`` +
``calibration/ErrorHandler.java:51-80``): each ``process(value)`` tick
updates the forest with the new shingle, emits a ``horizon``-step
forecast with interval bounds, records realized errors for every
previously-issued forecast as values arrive, and adjusts bounds by the
rolling per-horizon error percentiles (Calibration.SIMPLE).
"""

from __future__ import annotations

import numpy as np

from .corrector import ErrorCalibrator
from .forest import RCFForest
from .queries import extrapolate


class RCFCaster:
    def __init__(
        self,
        shingle_size: int = 8,
        horizon: int = 4,
        num_trees: int = 30,
        sample_size: int = 256,
        time_decay: float | None = None,
        seed: int = 42,
        calibrate: bool | str = True,
        error_window: int = 256,
        percentile: float = 10.0,
    ):
        assert shingle_size >= 2 and horizon >= 1
        self.shingle_size = shingle_size
        self.horizon = horizon
        # calibration mode (config/Calibration.java): bool back-compat —
        # True = "simple", False = "none"; or "none" | "minimal" | "simple"
        if isinstance(calibrate, bool):
            calibrate = "simple" if calibrate else "none"
        assert calibrate in ErrorCalibrator.MODES, calibrate
        self.calibrate = calibrate
        self.forest = RCFForest(
            shingle_size, num_trees=num_trees, sample_size=sample_size,
            time_decay=time_decay, seed=seed,
        )
        self.calib = ErrorCalibrator(horizon, 1, window=error_window,
                                     percentile=percentile)
        self._window: list[float] = []
        self._tick = 0
        # forecasts awaiting their realized value:
        # due_tick -> [(h, pred, issued_upper, issued_lower)]
        self._pending: dict[int, list[tuple[int, float, float, float]]] = {}

    def process(self, value: float) -> dict | None:
        """Consume one value; return the calibrated forecast (or None
        while the shingle window is still filling)."""
        # settle errors for forecasts that predicted this tick. This value
        # is the (_tick+1)-th: a horizon-h forecast issued at tick T was
        # keyed T+h+1 with _tick already incremented, so it realizes when
        # the pre-increment _tick reads T+h — i.e. key _tick+1 here.
        for h, pred, up, low in self._pending.pop(self._tick + 1, []):
            self.calib.observe(h, 0, value - pred, inside=low <= value <= up)
        self._window.append(float(value))
        if len(self._window) > self.shingle_size:
            self._window.pop(0)
        self._tick += 1
        if len(self._window) < self.shingle_size:
            return None
        shingle = np.asarray(self._window, np.float32)
        self.forest.update(shingle, seq=self._tick)
        if not self.forest.is_output_ready:
            return None
        fc = extrapolate(self.forest, shingle, self.horizon, seed=self._tick)
        values = fc["values"].copy()
        upper = fc["upper"].copy()
        lower = fc["lower"].copy()
        for h in range(self.horizon):
            raw_pred = float(values[h])
            values[h], upper[h], lower[h] = self.calib.calibrate(
                h, 0, values[h], upper[h], lower[h], mode=self.calibrate
            )
            # errors settle against the raw model prediction; interval
            # precision against the ISSUED (calibrated) bounds
            self._pending.setdefault(self._tick + h + 1, []).append(
                (h, raw_pred, float(upper[h]), float(lower[h]))
            )
        return {
            "values": values,
            "upper": upper,
            "lower": lower,
            "rmse": [self.calib.rmse(h, 0) for h in range(self.horizon)],
            "interval_precision": [
                self.calib.interval_precision(h, 0) for h in range(self.horizon)
            ],
        }
