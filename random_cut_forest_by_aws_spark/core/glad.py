"""Global-Local Anomaly Detector (GLAD) — clustering-based streaming
anomaly detection, re-expressed from
``parkservices/GlobalLocalAnomalyDetector.java:38-330``.

Shape of the algorithm (per the reference):

* a recency-biased reservoir of points (``store/StreamSampler.java``
  semantics; here the same counter-based weight trick the forest sampler
  uses, so accept/evict decisions are reproducible);
* periodic multi-center clustering of the reservoir (CURE-style
  representatives via ``queries.cluster_points``), retriggered when the
  thresholder's mean score drifts by > 0.1, exceeds 1.7, or a hard
  20x interval elapses (:218-227);
* score = min over clusters of ``distance(point, nearest usable
  representative) / cluster average radius`` (:280-330), with small
  clusters below ``ignore_below`` of total weight masked out so a
  handful of outliers cannot vouch for each other (:49-51);
* optional occlusion handling: a far cluster is not credited when a
  nearer cluster's representative sits between it and the point
  (right-triangle test, :316-329);
* a ``BasicThresholder`` (absolute threshold 1.2, :52) grades the score
  stream; thresholder updates use min(score, z_factor).

Distances are pluggable callables (the reference's BiFunction), default
L2. The expected score of in-distribution points is ≈ 1 (distance ≈ one
cluster radius).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from .forest import _splitmix64, _u01
from .queries import cluster_points
from .thresholder import BasicThresholder

FLOAT_MAX = 10.0
DEFAULT_GLAD_THRESHOLD = 1.2


def _l2(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64)))


class GladDetector:
    """Streaming global/local anomaly detector over arbitrary vectors."""

    def __init__(
        self,
        capacity: int = 512,
        time_decay: float | None = None,
        max_clusters: int = 10,
        representatives: int = 5,
        shrink: float = 0.3,
        ignore_below: float = 0.005,
        recluster_within: int | None = None,
        distance: Callable[[np.ndarray, np.ndarray], float] | None = None,
        z_factor: float = 3.0,
        seed: int = 42,
    ):
        self.capacity = capacity
        self.lam = 1.0 / (10.0 * capacity) if time_decay is None else float(time_decay)
        self.max_clusters = max_clusters
        self.representatives = representatives
        self.shrink = shrink
        self.ignore_below = ignore_below
        self.recluster_within = recluster_within or capacity // 2
        self.distance = distance or _l2
        self.seed = seed
        # auto_threshold off: GLAD pins the absolute threshold at 1.2
        # (setAbsoluteThreshold, :100-101) — the RCF-style mean-based
        # shrink would zero it out during the pre-clustering phase where
        # every score is 0
        self.thresholder = BasicThresholder(
            z_factor=z_factor, absolute_threshold=DEFAULT_GLAD_THRESHOLD,
            auto_threshold=False,
        )
        self._wkey = int(
            _splitmix64(np.array([(seed * 2654435761 + 13) & ((1 << 64) - 1)], np.uint64))[0]
        )
        self._points: list[np.ndarray] = []
        self._weights: list[float] = []  # sampler priority weights
        self._mass: list[float] = []  # user weights (clustering mass)
        self.sequence = 0
        self._last_cluster = 0
        self._last_mean = 1.0
        self.clusters: dict | None = None

    # -- recency-biased reservoir (StreamSampler semantics) ----------------
    def _offer(self, x: np.ndarray, weight: float) -> None:
        u = float(_u01(self._wkey, np.array([self.sequence], np.int64))[0])
        w = -self.sequence * self.lam + np.log(-np.log(u)) - np.log(max(weight, 1e-12))
        if len(self._points) < self.capacity:
            self._points.append(np.asarray(x, np.float64).copy())
            self._weights.append(w)
            self._mass.append(weight)
            return
        mx = int(np.argmax(self._weights))
        if w < self._weights[mx]:
            self._points[mx] = np.asarray(x, np.float64).copy()
            self._weights[mx] = w
            self._mass[mx] = weight

    def _maybe_recluster(self) -> None:
        if self.sequence <= self._last_cluster + self.recluster_within:
            return
        mean = self.thresholder.primary.mean
        if (
            abs(mean - self._last_mean) > 0.1
            or mean > 1.7
            or self.sequence > self._last_cluster + 20 * self.recluster_within
        ):
            self._last_cluster = self.sequence
            self._last_mean = mean
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.sequence, 17])
            )
            self.clusters = cluster_points(
                np.stack(self._points),
                np.asarray(self._mass),
                max_clusters=self.max_clusters,
                representatives=self.representatives,
                shrink=self.shrink,
                rng=rng,
            )

    # -- scoring -----------------------------------------------------------
    def score(
        self, x: np.ndarray, consider_occlusion: bool = False
    ) -> list[tuple[np.ndarray, float]]| None:
        """Per-cluster candidate list [(representative, score)], sorted
        least-anomalous first; None before the first clustering."""
        if self.clusters is None or len(self.clusters["centers"]) == 0:
            return None
        total_w = float(np.sum(self.clusters["weights"]))
        cands: list[tuple[np.ndarray, float, float]] = []  # (rep, radius, dist)
        for reps, radius, cw in zip(
            self.clusters["representatives"],
            self.clusters["radii"],
            self.clusters["weights"],
        ):
            if cw <= self.ignore_below * total_w:
                continue  # masked: tiny clusters cannot vouch for points
            dists = [self.distance(x, r) for r in reps]
            j = int(np.argmin(dists))
            cands.append((reps[j], float(radius), float(dists[j])))
        if not cands:
            return None
        cands.sort(key=lambda c: c[2])
        if cands[0][2] == 0.0:
            return [(cands[0][0], 0.0)]
        out: list[tuple[np.ndarray, float]] = []
        occluded = [False] * len(cands)
        for i, (rep, radius, dist) in enumerate(cands):
            if occluded[i]:
                continue
            s = min(FLOAT_MAX, dist / radius) if radius > 0 else FLOAT_MAX
            out.append((rep, float(s)))
            if consider_occlusion:
                # a farther cluster is occluded when this representative
                # sits between it and the point (right-triangle test,
                # GlobalLocalAnomalyDetector.java:316-329)
                for k in range(i + 1, len(cands)):
                    between = self.distance(rep, cands[k][0])
                    far = cands[k][2]
                    if between < far and far > np.sqrt(dist * dist + between * between):
                        occluded[k] = True
        out.sort(key=lambda c: c[1])
        return out

    def process(
        self,
        x: np.ndarray,
        weight: float = 1.0,
        consider_occlusion: bool = False,
    ) -> dict:
        """Score-then-update one point. Returns {score, threshold, grade,
        candidates: [(representative, attribution)]}.

        Attribution over candidates is exponential in the squared score
        (:236-249): close representatives soak up the explanation mass."""
        self._maybe_recluster()
        result = self.score(x, consider_occlusion)
        threshold = grade = 0.0
        score = 0.0
        attributed: list[tuple[np.ndarray, float]] = []
        if result is not None:
            score = min([s for _, s in result], default=FLOAT_MAX)
            raw = np.array([s for _, s in result])
            expw = np.where(raw >= FLOAT_MAX, 0.0, np.exp(-raw * raw))
            denom = expw.sum()
            shares = (
                np.minimum(1.0, expw / denom)
                if score < FLOAT_MAX and denom > 0
                else np.full(len(raw), 1.0 / len(raw))
            )
            attributed = [(rep, float(sh)) for (rep, _), sh in zip(result, shares)]
            threshold, grade = self.thresholder.threshold_and_grade(
                score, normalized=False
            )
        self.thresholder.update(min(score, self.thresholder.z_factor))
        self._offer(x, weight)
        self.sequence += 1
        return {
            "score": float(score),
            "threshold": float(threshold),
            "grade": float(grade),
            "candidates": attributed,
        }
