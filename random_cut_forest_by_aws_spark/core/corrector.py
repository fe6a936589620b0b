"""PredictorCorrector (simplified core) and RCFCaster-style calibration.

Re-expressed from the reference parkservices layer:

* ``PredictorCorrector`` (``parkservices/PredictorCorrector.java:49-61,
  719-1050``): after the thresholder grades a point anomalous, attribute
  the score to dimensions, impute the top-contributing dimensions from
  the forest (the "expected point"), re-score the corrected point, and
  suppress the anomaly when the corrected score falls back under the
  threshold or the point is within the ignore-near-expected band — the
  cascade/noise suppressor. (The reference's multi-mode machinery —
  shingle-aware time-slot analysis, run-length discounting — is out of
  scope; this is the correct-by-expected + re-score core.)
* ``ErrorCalibrator`` (``parkservices/calibration/ErrorHandler.java:
  51-80``, ``RCFCaster.java:43-109``): rolling per-horizon forecast-error
  percentiles applied additively to interval bounds
  (Calibration.SIMPLE).
"""

from __future__ import annotations

import numpy as np

from .forest import RCFForest
from .queries import impute


class PredictorCorrector:
    """Suppress anomaly cascades by checking the 'expected point'."""

    def __init__(
        self,
        max_attributed_dims: int = 2,
        ignore_near_expected_ratio: float = 0.1,
        suppression_factor: float = 1.0,
    ):
        self.max_attributed_dims = max_attributed_dims
        self.ignore_near_expected_ratio = ignore_near_expected_ratio
        self.suppression_factor = suppression_factor

    def expected_point(self, forest: RCFForest, x: np.ndarray) -> tuple[np.ndarray, list[int]]:
        """Impute the top score-contributing dimensions (attribution-led,
        AbstractAttributionVisitor + ImputeVisitor composition)."""
        hi, lo = forest.attribution(np.asarray(x, np.float32)[None, :])
        contrib = (hi + lo)[0]
        k = min(self.max_attributed_dims, forest.d)
        dims = np.argsort(-contrib, kind="stable")[:k].tolist()
        return impute(forest, x, missing=dims), dims

    def should_suppress(
        self, forest: RCFForest, x: np.ndarray, score: float, threshold: float
    ) -> tuple[bool, np.ndarray]:
        """True if the anomaly is explained away by the expected point:
        the corrected score drops under the threshold, or x is within the
        near-expected band of the expected point."""
        expected, dims = self.expected_point(forest, x)
        x32 = np.asarray(x, np.float32)
        scale = np.maximum(np.abs(expected), 1e-6)
        near = np.all(
            np.abs(x32[dims] - expected[dims])
            <= self.ignore_near_expected_ratio * scale[dims]
        )
        if near:
            return True, expected
        corrected = forest.score(expected[None, :])[0]
        return corrected < self.suppression_factor * threshold, expected

    def should_suppress_batch(
        self,
        forest: RCFForest,
        X: np.ndarray,
        thresholds: np.ndarray,
        return_dims: bool = False,
    ):
        """Vectorized suppression verdicts for a batch of flagged points.

        Batch analogue of ``should_suppress`` with one simplification for
        throughput: the expected point replaces the top-attributed dims
        with those of the forest's best exemplar (the reached leaf with
        the smallest distance on the *healthy* dims), instead of a full
        per-tree imputation — one vectorized descent over (rows × trees)
        plus one batched attribution and one batched re-score.
        """
        A, d = X.shape
        if A == 0:
            empty = np.zeros(0, bool)
            return (empty, np.zeros((0, d))) if return_dims else empty
        X32 = np.ascontiguousarray(X, np.float32)
        hi, lo = forest.attribution(X32)
        contrib = hi + lo
        k = min(self.max_attributed_dims, d)
        top_dims = np.argsort(-contrib, axis=1, kind="stable")[:, :k]  # [A,k]
        bad_mask = np.zeros((A, d), bool)
        np.put_along_axis(bad_mask, top_dims, True, axis=1)

        # one descent per (row, tree): leaf exemplars
        leafpts, _ = forest.leaf_points(X32)  # [A, L, d]
        if leafpts.shape[1] == 0:
            none = np.zeros(A, bool)
            if return_dims:
                sig = contrib / np.maximum(contrib.sum(1, keepdims=True), 1e-12)
                return none, sig
            return none
        # distance on healthy dims only
        healthy = ~bad_mask
        diffs = np.abs(leafpts - X32[:, None, :]) * healthy[:, None, :]
        dist = diffs.sum(-1)
        best = dist.argmin(1)  # [A]
        exemplar = leafpts[np.arange(A), best]  # [A, d]
        expected = np.where(bad_mask, exemplar, X32.astype(np.float64))

        scale = np.maximum(np.abs(expected), 1e-6)
        near = np.all(
            ~bad_mask | (np.abs(X32 - expected) <= self.ignore_near_expected_ratio * scale),
            axis=1,
        )
        corrected = forest.score(expected.astype(np.float32))
        sup = near | (corrected < self.suppression_factor * np.asarray(thresholds))
        if return_dims:
            # normalized attribution signature per row — the run-length
            # filter's "is this the same anomaly continuing?" signal
            sig = contrib / np.maximum(contrib.sum(1, keepdims=True), 1e-12)
            return sup, sig
        return sup

    def run_length_filter(
        self,
        suppressed: np.ndarray,
        seqs: np.ndarray,
        attribs: np.ndarray,
        state: dict,
        run_gap: int = 2,
        trigger: float = 0.5,
    ) -> np.ndarray:
        """Suppress continuing-run anomalies (run-length machinery,
        ``parkservices/PredictorCorrector.java:288``): a flagged row within
        ``run_gap`` of the previous anomaly whose normalized attribution
        signature matches the run's onset (L1 difference ≤ ``trigger``) is
        the SAME anomaly still in progress — report the onset once. The
        attribution shifting to different dimensions is the ``trigger``
        condition (:767-783) and re-alerts. ``state`` keys ``run_seq`` /
        ``run_attrib`` persist across chunks (and drift checkpoints)."""
        out = suppressed.copy()
        run_seq = state.get("run_seq", -1)
        run_vec = state.get("run_attrib")
        if run_vec is not None and len(np.atleast_1d(run_vec)) != attribs.shape[1]:
            run_vec = None
        for i in range(len(seqs)):
            if out[i]:
                continue  # already explained away by the expected point
            s = int(seqs[i])
            a = attribs[i]
            if (
                run_seq >= 0
                and s - run_seq <= run_gap
                and run_vec is not None
                and float(np.abs(a - run_vec).sum()) <= trigger
            ):
                out[i] = True  # continuing run: extend, do not re-emit
                run_seq = s  # signature stays the run onset's
            else:
                run_seq, run_vec = s, a.copy()  # onset (or trigger): emit
        state["run_seq"], state["run_attrib"] = run_seq, run_vec
        return out


class ErrorCalibrator:
    """Rolling forecast-error calibration (Calibration.SIMPLE).

    Track per-(horizon, dim) errors in a ring buffer; calibrated bounds
    add the error percentiles to the raw forecast (additive conformal
    intervals), plus RMSE for reporting.
    """

    def __init__(self, horizon: int, dims: int = 1, window: int = 256,
                 percentile: float = 10.0):
        self.window = window
        self.percentile = percentile
        self.errors = np.full((horizon, dims, window), np.nan)
        self.pos = np.zeros((horizon, dims), np.int64)
        self.count = np.zeros((horizon, dims), np.int64)

    def observe(self, h: int, dim: int, error: float) -> None:
        p = self.pos[h, dim] % self.window
        self.errors[h, dim, p] = error
        self.pos[h, dim] += 1
        self.count[h, dim] += 1

    def calibrate(self, h: int, dim: int, value: float,
                  upper: float, lower: float) -> tuple[float, float, float]:
        e = self.errors[h, dim]
        e = e[~np.isnan(e)]
        if len(e) < 8:
            return value, upper, lower
        lo_q = float(np.percentile(e, self.percentile))
        hi_q = float(np.percentile(e, 100 - self.percentile))
        med = float(np.median(e))
        return value + med, max(upper, value + hi_q), min(lower, value + lo_q)

    def rmse(self, h: int, dim: int) -> float:
        e = self.errors[h, dim]
        e = e[~np.isnan(e)]
        return float(np.sqrt(np.mean(e * e))) if len(e) else float("nan")
