"""Anomaly detection over metric HISTORY — validate the validator.

Every suite run appends rows to a metrics table (check, scope, value,
run timestamp — ``plans/job.py`` writes it per run). A rule like
``has_mean(at_most=...)`` needs a human to pick the bound; this module
instead learns each metric's own history and flags runs that break it —
deequ's ``addAnomalyCheck`` over a ``MetricsRepository``, re-expressed
over DataFrames. Two detectors:

* ``method="zscore"`` — per key, each run is judged against the PRIOR
  runs only (expanding frame ending 1 row before current: no
  peeking-at-self, no look-ahead): mean and sample variance from
  explicit sum/sum² window aggregates, anomaly when |x−μ|/σ > z with at
  least ``min_history`` prior points. The expression shape is plain
  ANSI window SQL, so a DuckDB oracle replays it bit-for-bit (the gate
  feeds integer-valued metrics ⇒ the window sums are exact doubles and
  summation order cannot matter).
* ``method="abs_change"`` / ``method="rel_change"`` — deequ's
  AbsoluteChangeStrategy / RelativeRateOfChangeStrategy: flag a run
  when the change vs the previous run (nth-order discrete difference /
  first-order ratio) leaves a user bound. Pure lag arithmetic — the
  oracle replays it verbatim.
* ``method="online"`` — the engine's own discounted ``Deviation``
  sketch (``core/thresholder.py``, transcribing the reference's
  Deviation.java) per key: anomaly when |x − discounted mean| >
  z · discounted deviation, judged BEFORE the point updates the sketch.
  The discount forgets old regimes, so the band tracks slow drift in
  the metric itself — deequ's OnlineNormalStrategy, which a fixed
  all-history z cannot emulate. Sequentially defined (each state
  depends on the previous), hence no SQL oracle: the gate records it
  rows-only and the pytest pins it against a scalar replay.

Scale shape: the input is a METRICS table — rows = runs × checks, tiny
relative to the data it summarizes — but nothing here depends on that:
one shuffle on the key (window partition / groupBy), no driver collect,
no per-row Python in the zscore path. The online path loops over each
key's run series inside one Arrow batch — the series length is the
number of RUNS (the one axis of this problem that is small by
construction), never the row count of the validated data.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def metric_anomalies(
    history: DataFrame,
    key_cols: tuple[str, ...] = ("check", "scope"),
    order_col: str = "run_ts",
    value_col: str = "value",
    method: str = "zscore",
    z: float = 3.0,
    min_history: int = 5,
    round_dp: int = 6,
    discount: float = 0.05,
    lower: float | None = None,
    upper: float | None = None,
    order: int = 1,
) -> DataFrame:
    """Flag anomalous metric observations against each key's own prior
    history. Returns one row per observation:
    ``(key..., order, value, n_prior, mean_prior, z_score, is_anomaly)``.
    The ``online`` method's ``mean_prior``/``z_score`` are the
    discounted analogues (z_score = deviation multiples vs the
    discounted band, NULL while the sketch has no spread).

    ``order_col`` must be unique within a key (runs have distinct
    timestamps) — ties would make "prior" ambiguous.

    ``abs_change``/``rel_change`` return ``(key..., order, value,
    change, is_anomaly)`` instead — ``change`` is the nth-order
    difference (binomial-weighted lag sum, deequ's iterated discrete
    derivative) or the value/previous ratio; a run with fewer than
    ``order`` (resp. 1) prior points has NULL change and is never
    anomalous (deequ skips the first rows the same way). Bounds are
    inclusive-pass: anomaly when change < ``lower`` or > ``upper``
    (either may be None = unbounded, deequ's Option[] defaults).
    """
    keys = list(key_cols)
    x = F.col(value_col).cast("double")
    if method == "zscore":
        w = (
            Window.partitionBy(*keys).orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        n = F.count(x).over(w)
        s1 = F.sum(x).over(w)
        s2 = F.sum(x * x).over(w)
        nd = n.cast("double")
        # n guards keep every division ANSI-safe (empty prior frame has
        # n = 0; a single prior point leaves sample variance undefined)
        mean = F.when(n > 0, s1 / nd)
        # sample variance from the same sums the oracle computes;
        # greatest(...,0) absorbs the tiny negative residue of
        # catastrophic cancellation on near-constant series
        var = F.when(
            n >= 2,
            F.greatest((s2 - s1 * s1 / nd) / (nd - F.lit(1.0)), F.lit(0.0)),
        )
        zs = F.when(var > 0, (x - mean) / F.sqrt(var))
        ready = n >= F.lit(int(min_history))
        is_anom = ready & F.coalesce(
            F.when(var > 0, F.abs(zs) > F.lit(float(z)))
            .otherwise(x != mean),
            F.lit(False),
        )
        return history.select(
            *keys,
            F.col(order_col),
            x.alias("value"),
            F.coalesce(n, F.lit(0)).cast("bigint").alias("n_prior"),
            F.round(mean, round_dp).alias("mean_prior"),
            F.round(zs, round_dp).alias("z_score"),
            is_anom.alias("is_anomaly"),
        )
    if method in ("abs_change", "rel_change"):
        wlag = Window.partitionBy(*keys).orderBy(order_col)
        if method == "abs_change":
            if order < 1:
                raise ValueError("order must be >= 1")
            # nth-order discrete difference as one closed-form lag sum:
            # Δⁿx_t = Σ_k (-1)^k C(n,k) x_{t-k} (deequ applies diff() n
            # times; identical by induction on the binomial recurrence)
            coef, change = 1, x
            for kk in range(1, order + 1):
                coef = -coef * (order - kk + 1) // kk
                change = change + F.lit(float(coef)) * F.lag(x, kk).over(wlag)
        else:
            prev = F.lag(x, 1).over(wlag)
            # NULL-safe: first run per key has NULL prev ⇒ NULL ratio;
            # a zero previous value makes the ratio undefined — deequ
            # divides anyway (Inf/NaN); we return NULL and never flag,
            # failing quiet rather than ANSI-throwing
            change = F.when(prev != 0, x / prev)
        breach = F.lit(False)
        if lower is not None:
            breach = breach | (change < F.lit(float(lower)))
        if upper is not None:
            breach = breach | (change > F.lit(float(upper)))
        return history.select(
            *keys,
            F.col(order_col),
            x.alias("value"),
            F.round(change, round_dp).alias("change"),
            F.coalesce(breach, F.lit(False)).alias("is_anomaly"),
        )
    if method == "online":
        from ..core.thresholder import Deviation

        out_fields = ", ".join(
            f"`{k}` {history.schema[k].dataType.simpleString()}" for k in keys
        )
        order_t = history.schema[order_col].dataType.simpleString()
        schema = (
            f"{out_fields}, {order_col} {order_t}, value double, "
            "n_prior bigint, mean_prior double, z_score double, "
            "is_anomaly boolean"
        )
        mh, zf, disc, dp = int(min_history), float(z), float(discount), round_dp

        def judge(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            vals = pdf[value_col].astype("float64").to_numpy()
            dev = Deviation(disc)
            means, zs, anom = [], [], []
            for i, v in enumerate(vals):
                m, sd = dev.mean, dev.deviation
                means.append(round(m, dp) if i > 0 else None)
                zcur = (v - m) / sd if i > 0 and sd > 0 else None
                zs.append(round(zcur, dp) if zcur is not None else None)
                anom.append(bool(
                    i >= mh
                    and ((sd > 0 and abs(v - m) > zf * sd)
                         or (sd == 0 and v != m))
                ))
                dev.update(v)
            out = pdf[keys + [order_col]].copy()
            out["value"] = vals
            out["n_prior"] = pd.RangeIndex(len(vals)).astype("int64")
            out["mean_prior"] = pd.array(means, dtype="float64")
            out["z_score"] = pd.array(zs, dtype="float64")
            out["is_anomaly"] = anom
            return out

        return (
            history.select(*keys, order_col, value_col)
            .groupBy(*keys)
            .applyInPandas(judge, schema=schema)
        )
    raise ValueError(f"unknown method {method!r}")
