#!/usr/bin/env python
"""Cross-run scaling-evidence merge (round 5, VERDICT r4 #2).

Reads every BENCH/r5/scaling_report_*.json, applies the PRE-REGISTERED
pair-validity rules (each introduced by a commit before the data it
first filtered existed):

1. leg-calibration match: |low_cal - high_cal| / max <= 20%  (round 4)
2. per-leg pre/post calibration swing <= 35% — a leg whose own
   subprocess calibrations disagree ran across a capacity cliff
   (round 5, commit "Fix collapse-taint scale")
3. exit-window probe: post-pair in-session probe >= 0.8 x the 350-Mops
   entry gate (round 5, commit "Tighten pair exit-window taint")

and prints (a) every pair with its per-leg sec x Mops cost — the
suite's capacity-normalized cost is deterministic, so a high leg far
above the observed cost floor ran through a dip no probe saw — and
(b) the lower-median efficiency of the surviving pairs, the published
headline. Nothing is dropped silently: the full table IS the output.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = 350.0


def main() -> None:
    rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH", "r5", "scaling_report_*.json"))):
        run = os.path.basename(path).split("_")[-1].split(".")[0]
        try:
            with open(path) as fh:
                d = json.load(fh)
        except json.JSONDecodeError:
            print(f"skipping incomplete {path}", file=sys.stderr)
            continue
        rows_n = float(d.get("bench_rows") or 4e6)
        for i, p in enumerate(d["all_pairs"]):
            lo_s, hi_s = rows_n / p["low"], rows_n / p["high"]
            cal_mm = abs(p["low_cal"] - p["high_cal"]) / max(p["low_cal"], p["high_cal"])
            swing = max(
                abs(p["low_cal"] - (p.get("low_cal_pre") or p["low_cal"]))
                / max(p["low_cal"], p.get("low_cal_pre") or p["low_cal"]),
                abs(p["high_cal"] - (p.get("high_cal_pre") or p["high_cal"]))
                / max(p["high_cal"], p.get("high_cal_pre") or p["high_cal"]),
            )
            post_ok = p["post_cal"] >= 0.8 * GATE
            valid = cal_mm <= 0.2 and swing <= 0.35 and post_ok
            rows.append({
                "pair": f"{run}{i}",
                "eff": p["eff_raw"],
                "eff_trace": p.get("eff_trace"),
                "low_cost_kso": round(lo_s * p["low_cal"] / 1e3),
                "high_cost_kso": round(hi_s * p["high_cal"] / 1e3),
                "tcost_low": p.get("cost_low_kso"),
                "tcost_high": p.get("cost_high_kso"),
                "cal_mm_pct": round(100 * cal_mm, 1),
                "swing_pct": round(100 * swing, 1),
                "post": p["post_cal"],
                "valid": valid,
                "drift_eff": p["phase_eff"].get("drift"),
            })
    for r in rows:
        print(json.dumps(r))
    surv = sorted(r["eff"] for r in rows if r["valid"])
    summary = {"n_pairs": len(rows)}
    if surv:
        summary.update({
            "n_valid": len(surv),
            "valid_effs": surv,
            "lower_median_eff": surv[(len(surv) - 1) // 2],  # lower median
            "mean_valid_eff": round(statistics.mean(surv), 3),
        })
    # trace-era reports (run E onward): pre-registered headline is the
    # lower-median of trace-normalized efficiencies over pairs with valid
    # traces — capacity dips are normalized by the mid-leg trace rather
    # than filtered by endpoint probes, so nothing is excluded.
    traced = sorted(r["eff_trace"] for r in rows if r.get("eff_trace") is not None)
    if traced:
        summary.update({
            "n_traced": len(traced),
            "traced_effs": traced,
            "trace_lower_median_eff": traced[(len(traced) - 1) // 2],
            "trace_mean_eff": round(statistics.mean(traced), 3),
        })
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
