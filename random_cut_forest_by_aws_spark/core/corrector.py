"""PredictorCorrector (simplified core) and RCFCaster-style calibration.

Re-expressed from the reference parkservices layer:

* ``PredictorCorrector`` (``parkservices/PredictorCorrector.java:49-61,
  719-1050``): after the thresholder grades a point anomalous, attribute
  the score to dimensions, impute the top-contributing dimensions from
  the forest (the "expected point"), re-score the corrected point, and
  suppress the anomaly when the corrected score falls back under the
  threshold or the point is within the ignore-near-expected band — the
  cascade/noise suppressor. For shingled streams the analysis is
  slot-aware (``detect:730-905``): attribution is rolled up per time
  slot, the driving slot is searched only among ticks that arrived
  AFTER the last reported anomaly (``maxContribution:195-213`` with
  ``relative = -min(gap, shingleSize)``), the expected point corrects
  only that slot's top contributors (``getExpectedPoint:227-270``), and
  a high score whose corrected version falls under threshold is the
  previous anomaly still sliding through the shingle
  (CorrectionMode.ANOMALY_IN_SHINGLE) — reported once, at onset, with
  the offending base dimension. (Multi-mode score vectors and the
  autoAdjust drift deviations remain out of scope.)
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

    @staticmethod
    def _pick_block_dims(
        block: np.ndarray, start: int, max_attributors: int, total_dims: int
    ) -> list[int] | None:
        """Reference dim-pick rules within one shingle slot
        (``getExpectedPoint``, PredictorCorrector.java:227-270): take the
        top contributors of the block while each stays above
        min(0.1·blockSum, 0.1); bail out (None) when the largest
        contributor is under 10% of the block, when more than
        ``max_attributors`` qualify, or when the picked set exceeds half
        the forest dimensions — an unusable, smeared correction."""
        base = len(block)
        if base == 1:
            dims = [start]
            return None if len(dims) > 0.5 * total_dims else dims
        s = float(block.sum())
        vals = np.sort(block)
        if vals[-1] < 0.1 * s:
            return None
        threshold = min(0.1 * s, 0.1)
        pick = 1
        while pick < base and vals[base - pick - 1] >= threshold:
            pick += 1
        if pick > max_attributors:
            return None
        cutoff = vals[base - pick]
        dims: list[int] = []
        for i in range(base):
            if len(dims) >= pick:
                break
            if block[i] >= cutoff and (len(dims) == 0 or block[i] > s * 0.1):
                dims.append(start + i)
        if len(dims) > 0.5 * total_dims:
            return None
        return dims

    def suppress_shingle_batch(
        self,
        forest: RCFForest,
        X: np.ndarray,
        thresholds: np.ndarray,
        seqs: np.ndarray,
        shingle_size: int,
        state: dict,
        differential_factor: float = 0.3,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Shingle-aware suppression over flagged shingled points
        (``PredictorCorrector.detect``, PredictorCorrector.java:795-905).

        Per flagged row (shingle layout: oldest slot first, newest last):

        1. the driving slot is the max-attribution slot among the newest
           ``min(gap, shingle_size)`` slots — only ticks that arrived after
           the last reported anomaly can start a new one
           (``relative = -min(gap, shingleSize)``, :806-863);
        2. the slot's top contributors (reference pick rules,
           ``getExpectedPoint:227-270``) are imputed out via the best
           healthy-dim leaf exemplar, giving the expected point;
        3. when the last anomaly still overlaps the shingle
           (gap < shingle_size), the reference ``trigger`` test
           (:288-303) decides: the L1 attribution differential between
           the point and the expected point over the NEW ticks must
           exceed ``differential_factor × lastAnomalyScore`` AND
           (scaled to the full shingle) ``1.2 × threshold`` — otherwise
           the high score is the previous anomaly sliding through
           (CorrectionMode.ANOMALY_IN_SHINGLE) and is suppressed;
        4. past the shingle (gap ≥ shingle_size) only the near-expected
           band suppresses (withinGap analogue, :539-568); a surviving
           row records (seq, score) as the new run onset.

        Returns (suppressed flags, relative slot index in [-shingle, -1]
        with -1 = newest, offending base dimension). ``state`` keys
        ``last_anomaly_seq`` / ``last_anomaly_score`` persist across
        chunks/checkpoints."""
        A, d_total = X.shape
        base = d_total // shingle_size
        sup = np.zeros(A, bool)
        rel_idx = np.full(A, -1, np.int64)
        bad_dim = np.full(A, -1, np.int64)
        if A == 0:
            return sup, rel_idx, bad_dim
        X32 = np.ascontiguousarray(X, np.float32)
        hi, lo = forest.attribution(X32)
        contrib = hi + lo  # [A, d_total]
        slot_sums = contrib.reshape(A, shingle_size, base).sum(-1)
        scores = contrib.sum(1)
        leafpts, _ = forest.leaf_points(X32)  # [A, L, d_total]
        last_seq = int(state.get("last_anomaly_seq", -(1 << 62)))
        last_score = float(state.get("last_anomaly_score", 0.0))
        for i in range(A):
            gap = int(seqs[i]) - last_seq
            m = max(1, min(gap, shingle_size))
            j0 = shingle_size - m  # oldest considered slot
            slot = j0 + int(np.argmax(slot_sums[i, j0:]))
            start = slot * base
            block = contrib[i, start : start + base]
            rel_idx[i] = slot - shingle_size
            bad_dim[i] = int(np.argmax(block))
            dims = self._pick_block_dims(
                block, start, self.max_attributed_dims, d_total
            )
            if dims is not None and leafpts.shape[1]:
                bad = np.zeros(d_total, bool)
                bad[dims] = True
                diffs = (np.abs(leafpts[i] - X32[i]) * ~bad).sum(-1)
                exemplar = leafpts[i, int(diffs.argmin())]
                expected = np.where(bad, exemplar, X32[i].astype(np.float64)).astype(
                    np.float32
                )
                if gap < shingle_size:
                    # trigger test over the ticks that arrived after the
                    # last anomaly (PredictorCorrector.java:288-303)
                    e_hi, e_lo = forest.attribution(expected[None, :])
                    nd = gap * base
                    differential = float(
                        np.abs(hi[i, d_total - nd :] - e_hi[0, d_total - nd :]).sum()
                        + np.abs(lo[i, d_total - nd :] - e_lo[0, d_total - nd :]).sum()
                    )
                    alert = (
                        differential > differential_factor * last_score
                        and differential * d_total / nd > 1.2 * float(thresholds[i])
                    )
                    if not alert:
                        sup[i] = True
                        continue
                # near-expected band (withinGap → CorrectionMode.FORECAST,
                # PredictorCorrector.java:888-894): applies both past the
                # shingle AND after a passing trigger — an in-shingle
                # candidate that triggers but sits within the expected band
                # is still suppressed by the reference.
                scale = np.maximum(np.abs(expected), 1e-6)
                near = np.all(
                    np.abs(X32[i][dims] - expected[dims])
                    <= self.ignore_near_expected_ratio * scale[dims]
                )
                if near:
                    sup[i] = True
                    continue
            last_seq, last_score = int(seqs[i]), float(scores[i])
        state["last_anomaly_seq"] = last_seq
        state["last_anomaly_score"] = last_score
        return sup, rel_idx, bad_dim

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
    """Rolling forecast-error calibration (``config/Calibration.java:
    18-35``, ``calibration/ErrorHandler.java:426-447``).

    Track per-(horizon, dim) errors in a ring buffer; calibrated bounds
    per mode (``ErrorHandler.calibrate``):

    * ``none`` — raw forecast intervals;
    * ``minimal`` — the center stays raw; bounds are only widened where
      the observed error percentiles exceed the raw interval
      (upper = max(raw_upper, value + err_p90), lower symmetric) —
      intervals are the minimal necessary given past error;
    * ``simple`` — the center shifts by the error median first, then the
    same widening applies — Markov-style additive; wider intervals,
      higher interval precision.

    Also tracks the interval-precision observable (``ErrorHandler.java:
    418-424``): the rolling fraction of realized values inside the issued
    calibrated interval.
    """

    MODES = ("none", "minimal", "simple")

    def __init__(self, horizon: int, dims: int = 1, window: int = 256,
                 percentile: float = 10.0):
        self.window = window
        self.percentile = percentile
        self.errors = np.full((horizon, dims, window), np.nan)
        self.pos = np.zeros((horizon, dims), np.int64)
        self.count = np.zeros((horizon, dims), np.int64)
        self.interval_hits = np.full((horizon, dims, window), np.nan)

    def observe(self, h: int, dim: int, error: float,
                inside: bool | None = None) -> None:
        p = self.pos[h, dim] % self.window
        self.errors[h, dim, p] = error
        if inside is not None:
            self.interval_hits[h, dim, p] = 1.0 if inside else 0.0
        self.pos[h, dim] += 1
        self.count[h, dim] += 1

    def calibrate(self, h: int, dim: int, value: float,
                  upper: float, lower: float,
                  mode: str = "simple") -> tuple[float, float, float]:
        if mode == "none":
            return value, upper, lower
        e = self.errors[h, dim]
        e = e[~np.isnan(e)]
        if len(e) < 8:
            return value, upper, lower
        lo_q = float(np.percentile(e, self.percentile))
        hi_q = float(np.percentile(e, 100 - self.percentile))
        v = value + float(np.median(e)) if mode == "simple" else value
        return v, max(upper, v + hi_q), min(lower, v + lo_q)

    def interval_precision(self, h: int, dim: int) -> float:
        """Rolling fraction of realized values that fell inside the
        issued interval (≈ 1 − 2·percentile/100 when calibrated)."""
        x = self.interval_hits[h, dim]
        x = x[~np.isnan(x)]
        return float(x.mean()) if len(x) else float("nan")

    def rmse(self, h: int, dim: int) -> float:
        e = self.errors[h, dim]
        e = e[~np.isnan(e)]
        return float(np.sqrt(np.mean(e * e))) if len(e) else float("nan")
