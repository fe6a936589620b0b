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


class _DimDeviations:
    """Vector of per-dimension exponentially discounted mean/deviation
    (``statistics/Deviation.java`` semantics, one per base dimension —
    the reference's ``deviationsActual``/``deviationsExpected`` arrays,
    PredictorCorrector.java:102-104,131-136)."""

    __slots__ = ("discount", "sum", "sumsq", "weight")

    def __init__(self, d: int, discount: float = 0.01):
        self.discount = discount
        self.sum = np.zeros(d)
        self.sumsq = np.zeros(d)
        self.weight = 0.0

    def update(self, x: np.ndarray) -> None:
        f = 1.0 - self.discount
        self.sum = self.sum * f + x
        self.sumsq = self.sumsq * f + x * x
        self.weight = self.weight * f + 1.0

    def reset(self) -> None:
        self.sum[:] = 0.0
        self.sumsq[:] = 0.0
        self.weight = 0.0

    @property
    def mean(self) -> np.ndarray:
        return self.sum / self.weight if self.weight > 0 else np.zeros_like(self.sum)

    @property
    def deviation(self) -> np.ndarray:
        if self.weight <= 0:
            return np.zeros_like(self.sum)
        m = self.sum / self.weight
        return np.sqrt(np.maximum(self.sumsq / self.weight - m * m, 0.0))

    def to_state(self) -> np.ndarray:
        return np.vstack([
            self.sum, self.sumsq,
            np.full_like(self.sum, self.weight),
            np.full_like(self.sum, self.discount),
        ])

    @classmethod
    def from_state(cls, a: np.ndarray) -> "_DimDeviations":
        dd = cls(a.shape[1], float(a[3, 0]))
        dd.sum = a[0].copy()
        dd.sumsq = a[1].copy()
        dd.weight = float(a[2, 0])
        return dd


class PredictorCorrector:
    """Suppress anomaly cascades by checking the 'expected point'."""

    RUN_ALLOWED = 2  # DEFAULT_RUN_ALLOWED (PredictorCorrector.java:60)

    def __init__(
        self,
        max_attributed_dims: int = 2,
        ignore_near_expected_ratio: float = 0.1,
        suppression_factor: float = 1.0,
        auto_adjust: bool = False,
        auto_adjust_discount: float = 0.01,
        noise_factor: float = 0.0,
    ):
        self.max_attributed_dims = max_attributed_dims
        self.ignore_near_expected_ratio = ignore_near_expected_ratio
        self.suppression_factor = suppression_factor
        # autoAdjust (PredictorCorrector.java:109,905-940): per-dimension
        # discounted Deviations over the candidate stream size the
        # suppression bands adaptively — a sustained run whose points stay
        # within 2·dev of the running per-dim means is DATA_DRIFT, not a
        # new anomaly. noise_factor adds an absolute band floor (the
        # reference's transformer-deviation/scale term lives outside this
        # layer; 0 disables the floor).
        self.auto_adjust = auto_adjust
        self.auto_adjust_discount = auto_adjust_discount
        self.noise_factor = noise_factor
        self.dev_actual: _DimDeviations | None = None
        self.dev_expected: _DimDeviations | None = None
        self.run_length = 0
        self._aa_prev_seq: int | None = None

    def auto_adjust_batch(
        self,
        sup: np.ndarray,
        X: np.ndarray,
        expected: np.ndarray,
        seqs: np.ndarray,
        cand_X: np.ndarray | None = None,
        cand_seqs: np.ndarray | None = None,
        base_d: int | None = None,
        step: int = 1,
    ) -> np.ndarray:
        """Apply the autoAdjust DATA_DRIFT suppression
        (PredictorCorrector.java:905-962).

        ``X``/``expected``/``seqs`` are the emit-grade rows being decided;
        ``cand_X``/``cand_seqs`` optionally carry the FULL candidate
        stream (every thresholder-positive row — the reference's
        ``candidate`` = inHighScoreRegion set, of which the emitted rows
        are a subset). Per candidate, in order: the per-dim actual
        Deviations absorb the newest base-dim block (deviationsExpected
        only where an expected point exists — the reference's
        ``expectedPoint != null`` guard); an emit-grade row in a run
        longer than RUN_ALLOWED is suppressed when every dim sits within
        max(2·actualDev, noise_factor) of the running actual mean AND the
        expected point sits within 2·max(expectedDev, actualDev) +
        0.1·|meanA − meanE| of the running expected mean. Run
        bookkeeping follows the reference: a positive-grade candidate
        extends the run, a suppressed one sustains a nonzero run, and a
        gap in the candidate stream (an intermediate grade-0,
        correction-NONE row) resets run and deviations."""
        if not self.auto_adjust or len(sup) == 0:
            return sup
        if cand_X is None or cand_seqs is None:
            cand_X, cand_seqs = X, seqs
        d_total = cand_X.shape[1]
        base = base_d or d_total
        if self.dev_actual is None or len(self.dev_actual.sum) != base:
            self.dev_actual = _DimDeviations(base, self.auto_adjust_discount)
            self.dev_expected = _DimDeviations(base, self.auto_adjust_discount)
        out = sup.copy()
        # position of each emitted row within the candidate stream
        emit_pos = {int(s): i for i, s in enumerate(seqs)}
        for j in range(len(cand_seqs)):
            s = int(cand_seqs[j])
            if self._aa_prev_seq is not None and s - self._aa_prev_seq > step:
                # non-candidate rows in between: grade 0 / CorrectionMode
                # NONE resets the run and the deviations (:957-962)
                self.run_length = 0
                self.dev_actual.reset()
                self.dev_expected.reset()
            x = np.asarray(cand_X[j, d_total - base:], np.float64)
            # reference order (:905-911): deviations absorb the candidate
            # FIRST, the within test then runs against the updated stats
            self.dev_actual.update(x)
            i = emit_pos.get(s)
            if i is not None:
                e = np.asarray(expected[i, d_total - base:], np.float64)
                self.dev_expected.update(e)
                if not out[i] and self.run_length > self.RUN_ALLOWED:
                    mean_a, dev_a = self.dev_actual.mean, self.dev_actual.deviation
                    mean_e, dev_e = self.dev_expected.mean, self.dev_expected.deviation
                    band_a = np.maximum(2.0 * dev_a, self.noise_factor)
                    within = bool(np.all(np.abs(mean_a - x) < band_a))
                    if within:
                        band_e = 2.0 * np.maximum(dev_e, dev_a) + 0.1 * np.abs(
                            mean_a - mean_e
                        )
                        within = bool(np.all(np.abs(mean_e - e) < band_e))
                    if within:
                        out[i] = True  # DATA_DRIFT
            if i is None or not out[i]:
                self.run_length += 1  # positive grade extends/starts the run
            elif self.run_length > 0:
                self.run_length += 1  # suppressed candidate sustains it
            self._aa_prev_seq = s
        return out

    def aa_state(self) -> dict:
        """autoAdjust state for checkpointing (numpy-serializable)."""
        if self.dev_actual is None:
            return {}
        return {
            "aa_act": self.dev_actual.to_state(),
            "aa_exp": self.dev_expected.to_state(),
            "aa_meta": np.array(
                [self.run_length,
                 -(1 << 62) if self._aa_prev_seq is None else self._aa_prev_seq],
                np.int64,
            ),
        }

    def load_aa_state(self, state: dict) -> None:
        if "aa_act" not in state:
            return
        self.dev_actual = _DimDeviations.from_state(np.asarray(state["aa_act"]))
        self.dev_expected = _DimDeviations.from_state(np.asarray(state["aa_exp"]))
        meta = np.asarray(state["aa_meta"], np.int64)
        self.run_length = int(meta[0])
        self._aa_prev_seq = None if int(meta[1]) == -(1 << 62) else int(meta[1])

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
        return_expected: bool = False,
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
            out = [empty]
            if return_dims:
                out.append(np.zeros((0, d)))
            if return_expected:
                out.append(np.zeros((0, d)))
            return tuple(out) if len(out) > 1 else empty
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
            out = [none]
            if return_dims:
                out.append(contrib / np.maximum(contrib.sum(1, keepdims=True), 1e-12))
            if return_expected:
                out.append(X.astype(np.float64).copy())
            return tuple(out) if len(out) > 1 else none
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
        out = [sup]
        if return_dims:
            # normalized attribution signature per row — the run-length
            # filter's "is this the same anomaly continuing?" signal
            sig = contrib / np.maximum(contrib.sum(1, keepdims=True), 1e-12)
            out.append(sig)
        if return_expected:
            out.append(expected)
        return tuple(out) if len(out) > 1 else sup

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

        def _expected_for(i: int, gap: int):
            """(dims, expected) for row i under a given gap — pure in
            (i, gap), so speculative and in-loop computations agree."""
            m = max(1, min(gap, shingle_size))
            j0 = shingle_size - m
            slot = j0 + int(np.argmax(slot_sums[i, j0:]))
            start = slot * base
            dims = self._pick_block_dims(
                contrib[i, start : start + base], start,
                self.max_attributed_dims, d_total,
            )
            if dims is None:
                return slot, None, None
            bad = np.zeros(d_total, bool)
            bad[dims] = True
            diffs = (np.abs(leafpts[i] - X32[i]) * ~bad).sum(-1)
            exemplar = leafpts[i, int(diffs.argmin())]
            expected = np.where(
                bad, exemplar, X32[i].astype(np.float64)
            ).astype(np.float32)
            return slot, dims, expected

        # Batched trigger attributions: the expected point depends on the
        # gap only through m = min(gap, shingle_size) (the slot-search
        # window), and the true last_seq at row i is always either the
        # incoming last_seq or some earlier flagged row's seq — so the
        # full set of reachable (row, m) pairs is enumerable upfront
        # (≤ shingle_size per row, typically ~1). All their expected
        # points go through ONE forest.attribution call; the sequential
        # loop then only does cache lookups, bit-identical to per-row
        # calls (per-lane attribution arithmetic is row-independent).
        spec: dict[tuple[int, int], tuple] = {}
        if leafpts.shape[1]:
            pairs: list[tuple[int, int]] = []
            seen_pairs = set()

            def _add(i: int, gap: int) -> None:
                if gap >= shingle_size:
                    return  # >= shingle: band check only, no attribution
                m = max(1, min(gap, shingle_size))
                if (i, m) not in seen_pairs:
                    seen_pairs.add((i, m))
                    pairs.append((i, m))

            for i in range(A):
                _add(i, int(seqs[i]) - last_seq)
                j = i - 1
                while j >= 0 and int(seqs[i]) - int(seqs[j]) < shingle_size:
                    _add(i, int(seqs[i]) - int(seqs[j]))
                    j -= 1
            exp_rows, meta = [], []
            for i, m in pairs:
                _, dims_s, exp_s = _expected_for(i, m)
                if exp_s is not None:
                    exp_rows.append(exp_s)
                    meta.append((i, m))
            if exp_rows:
                bh, bl = forest.attribution(np.stack(exp_rows))
                for (i, m), h_row, l_row in zip(meta, bh, bl):
                    spec[(i, m)] = (h_row, l_row)

        for i in range(A):
            gap = int(seqs[i]) - last_seq
            slot, dims, expected = _expected_for(i, gap)
            start = slot * base
            block = contrib[i, start : start + base]
            rel_idx[i] = slot - shingle_size
            bad_dim[i] = int(np.argmax(block))
            if dims is not None and leafpts.shape[1]:
                if gap < shingle_size:
                    # trigger test over the ticks that arrived after the
                    # last anomaly (PredictorCorrector.java:288-303)
                    cached = spec.get((i, max(1, min(gap, shingle_size))))
                    if cached is not None:
                        e_hi_r, e_lo_r = cached
                    else:  # misprediction: individual fallback
                        e2 = forest.attribution(expected[None, :])
                        e_hi_r, e_lo_r = e2[0][0], e2[1][0]
                    nd = gap * base
                    differential = float(
                        np.abs(hi[i, d_total - nd :] - e_hi_r[d_total - nd :]).sum()
                        + np.abs(lo[i, d_total - nd :] - e_lo_r[d_total - nd :]).sum()
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
