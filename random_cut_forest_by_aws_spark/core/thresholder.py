"""Score → (threshold, grade) calibration — raw RCF scores to verdicts.

From-scratch re-expression of the reference's parkservices thresholding
(``parkservices/threshold/BasicThresholder.java``), scoped to the paths
our drift operator uses (shingleSize 1, TransformMethod NONE/NORMALIZE):

* ``Deviation`` — exponentially discounted mean/variance
  (``statistics/Deviation.java:24-110``: sum/sumSquared/weight decayed by
  (1−discount) per update);
* threshold = max(absolute, f·(mean + scaledDev) + (1−f)·initial) with the
  intermediate-term ramp f over [minimumScores, 2·minimumScores]
  (``BasicThresholder.java:141-260``);
* grade = clipped surprise index ``min(floor(t·20)/16, 1)`` of
  (score − threshold)/scaledDev (``BasicThresholder.java:255-305``);
* update feeds min(score, 2.0) into the primary deviation and the
  below-mean gap into the threshold deviation
  (``BasicThresholder.java:308-330``).
"""

from __future__ import annotations

import math

DEFAULT_SCORE_DIFFERENCING = 0.5
DEFAULT_MINIMUM_SCORES = 10
DEFAULT_FACTOR_ADJUSTMENT_THRESHOLD = 0.9
DEFAULT_ABSOLUTE_THRESHOLD = 0.8
DEFAULT_INITIAL_THRESHOLD = 1.5
DEFAULT_Z_FACTOR = 3.0
MINIMUM_Z_FACTOR = 2.0


class Deviation:
    """Exponentially discounted streaming mean / standard deviation."""

    __slots__ = ("discount", "weight", "sum", "sum_squared", "count")

    def __init__(self, discount: float = 0.0):
        assert 0 <= discount < 1
        self.discount = discount
        self.weight = 0.0
        self.sum = 0.0
        self.sum_squared = 0.0
        self.count = 0

    def update(self, x: float) -> None:
        factor = 1.0 - self.discount
        self.sum = self.sum * factor + x
        self.sum_squared = self.sum_squared * factor + x * x
        self.weight = self.weight * factor + 1.0
        self.count += 1

    @property
    def mean(self) -> float:
        return 0.0 if self.weight <= 0 else self.sum / self.weight

    @property
    def deviation(self) -> float:
        if self.weight <= 0:
            return 0.0
        m = self.sum / self.weight
        v = self.sum_squared / self.weight - m * m
        return math.sqrt(v) if v > 0 else 0.0

    def to_state(self) -> list[float]:
        return [self.discount, self.weight, self.sum, self.sum_squared, float(self.count)]

    @classmethod
    def from_state(cls, s) -> "Deviation":
        d = cls(float(s[0]))
        d.weight, d.sum, d.sum_squared, d.count = float(s[1]), float(s[2]), float(s[3]), int(s[4])
        return d


class BasicThresholder:
    """Streaming threshold + anomaly grade over a score series."""

    def __init__(
        self,
        discount: float = 0.01,
        z_factor: float = DEFAULT_Z_FACTOR,
        absolute_threshold: float = DEFAULT_ABSOLUTE_THRESHOLD,
        initial_threshold: float = DEFAULT_INITIAL_THRESHOLD,
        minimum_scores: int = DEFAULT_MINIMUM_SCORES,
        auto_threshold: bool = True,
        score_differencing: float = DEFAULT_SCORE_DIFFERENCING,
    ):
        self.primary = Deviation(discount)
        self.secondary = Deviation(discount)
        self.threshold_dev = Deviation(discount / 2)
        self.z_factor = z_factor
        self.absolute_threshold = absolute_threshold
        self.initial_threshold = initial_threshold
        self.minimum_scores = minimum_scores
        self.auto_threshold = auto_threshold
        self.score_differencing = score_differencing
        self.factor_adjustment_threshold = DEFAULT_FACTOR_ADJUSTMENT_THRESHOLD
        self.count = 0
        self.last_score = 0.0

    # -- readiness / ramp (BasicThresholder.java:112-148) ----------------
    def is_deviation_ready(self) -> bool:
        if self.count < self.minimum_scores:
            return False
        if self.score_differencing != 0:
            return self.secondary.count >= self.minimum_scores
        return True

    def intermediate_fraction(self) -> float:
        if self.count < self.minimum_scores:
            return 0.0
        if self.count > 2 * self.minimum_scores:
            return 1.0
        return (self.count - self.minimum_scores) / self.minimum_scores

    # -- threshold + grade (BasicThresholder.java:255-285) ---------------
    def _adjusted_factor(self, factor: float, normalized: bool) -> float:
        corrected = factor
        if self.primary.mean < self.factor_adjustment_threshold and normalized:
            corrected = self.primary.mean * factor / self.factor_adjustment_threshold
        return max(corrected, MINIMUM_Z_FACTOR)

    def _long_term_deviation(self) -> float:
        # shingleSize==1, non-differencing path (BasicThresholder.java:236)
        return min(math.sqrt(2.0) * self.threshold_dev.deviation, self.primary.deviation)

    def threshold_and_grade(self, score: float, normalized: bool = True) -> tuple[float, float]:
        inter = self.intermediate_fraction()
        factor = self._adjusted_factor(self.z_factor, normalized)
        scaled_dev = (factor - 1.0) * self._long_term_deviation() + self.primary.deviation
        absolute = self.absolute_threshold
        if (
            self.auto_threshold
            and inter >= 1.0
            and self.primary.mean < self.factor_adjustment_threshold
        ):
            absolute = self.primary.mean * absolute / self.factor_adjustment_threshold
        if not self.is_deviation_ready():
            threshold = max(self.initial_threshold, absolute)
        else:
            threshold = max(
                absolute,
                inter * (self.primary.mean + scaled_dev) + (1.0 - inter) * self.initial_threshold,
            )
        if score < threshold or threshold <= 0:
            return threshold, 0.0
        t = self._surprise_index(score, threshold, factor, scaled_dev / factor)
        t = min(math.floor(t * 20) / 16.0, 1.0)
        if t == 0:
            threshold = score
        return threshold, t

    def _surprise_index(self, score, base, factor, deviation) -> float:
        if self.is_deviation_ready():
            t = 2 * factor
            if deviation > 0:
                t = min(factor, (score - base) / deviation)
            return max(0.0, t / factor)
        return min(1.0, max(0.0, (score - self.absolute_threshold) / self.absolute_threshold))

    # -- update (BasicThresholder.java:308-330) ---------------------------
    def update(self, score: float) -> None:
        capped = min(score, 2.0)
        gap = self.primary.mean - capped
        if gap > 0:
            self.threshold_dev.update(gap)
        self.primary.update(capped)
        self.secondary.update(score - self.last_score)
        self.last_score = score
        self.count += 1

    def process(self, score: float, normalized: bool = True) -> tuple[float, float]:
        """Threshold-then-update for one score; returns (threshold, grade)."""
        out = self.threshold_and_grade(score, normalized)
        self.update(score)
        return out

    # -- checkpoint -------------------------------------------------------
    def to_state(self) -> dict:
        return {
            "primary": self.primary.to_state(),
            "secondary": self.secondary.to_state(),
            "threshold_dev": self.threshold_dev.to_state(),
            "params": [
                self.z_factor,
                self.absolute_threshold,
                self.initial_threshold,
                float(self.minimum_scores),
                1.0 if self.auto_threshold else 0.0,
                self.score_differencing,
                float(self.count),
                self.last_score,
            ],
        }

    @classmethod
    def from_state(cls, s: dict) -> "BasicThresholder":
        p = s["params"]
        th = cls(
            z_factor=float(p[0]),
            absolute_threshold=float(p[1]),
            initial_threshold=float(p[2]),
            minimum_scores=int(p[3]),
            auto_threshold=bool(p[4]),
            score_differencing=float(p[5]),
        )
        th.primary = Deviation.from_state(s["primary"])
        th.secondary = Deviation.from_state(s["secondary"])
        th.threshold_dev = Deviation.from_state(s["threshold_dev"])
        th.count = int(p[6])
        th.last_score = float(p[7])
        return th
