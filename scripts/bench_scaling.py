#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule): run the identical bench job
at two parallelism levels (sandbox proxy for N vs 4N executors — a real
multi-node cluster is unavailable here), report throughput at both and
efficiency = (throughput_4N / throughput_N) / 4, and write
BENCH/BASELINE.md.

The sandbox is a virtualized box whose aggregate CPU throughput itself
does not scale 4× from N to 4N busy cores (host overcommit): a raw
multiprocessing calibration measures that hardware ceiling, and the
report shows the job's efficiency both raw and normalized by the
ceiling — the normalized number is what a real 4×-executor cluster
(with 4× memory bandwidth and disks) would be expected to preserve.

Each level runs `repeats` times; the best run per level is used
(standard practice to suppress noisy-neighbor variance).

Usage: python scripts/bench_scaling.py [--low 4] [--high 16] [--repeats 2]
"""

from __future__ import annotations

import argparse
import atexit
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(n_iters: int) -> None:
    x = 0
    for i in range(n_iters):
        x += i * i


def calibrate_cpu(n_procs: int, n_iters: int = 60_000_000) -> float:
    """Aggregate ops/sec with n_procs busy python processes."""
    ps = [mp.Process(target=_burn, args=(n_iters,)) for _ in range(n_procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.time() - t0
    return n_procs * n_iters / wall


def _stream(q, mb: int = 64, secs: float = 3.0) -> None:
    import numpy as np

    a = np.ones(mb * 131072)  # mb MiB of float64, far beyond LLC
    b = np.empty_like(a)
    np.add(a, 1.0, out=b)  # warm pass: fault in both buffers untimed
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        np.add(a, 1.0, out=b)  # read a + write b: 2·mb MiB of traffic
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0))


def calibrate_bw(n_procs: int, reps: int = 3) -> float:
    """Aggregate memory bandwidth (bytes/sec) with n_procs numpy STREAM
    processes — the resource the JVM columnar scans and numpy gathers
    contend for, which the busy-loop CPU calibration cannot see. Max of
    ``reps`` trials: noisy-neighbor interference only ever depresses a
    trial, so the max is the box's capacity at that width."""
    best = 0.0
    for _ in range(reps):
        q: mp.Queue = mp.Queue()
        ps = [mp.Process(target=_stream, args=(q,)) for _ in range(n_procs)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        best = max(best, total)
    return best


def _trace_loop(path: str, procs: int, iters: int, interval: float) -> None:
    """Daemon: burst-sample aggregate CPU capacity (procs busy workers for
    ~0.2-0.6s) every `interval` seconds, appending JSONL {t0,t1,mops}.

    Round-5 motivation: 18 committed pairs across 4 harness runs show the
    host collapsing MID-LEG (high-leg sec x Mops cost 2-3.5x the observed
    clean floor) while every endpoint probe — entry gate, per-leg pre/post
    subprocess calibrations, exit probe — reads normal. Endpoint probes
    cannot see a dip that starts and ends inside one leg; a continuous
    trace can. The burst duty cycle (~0.2s busy / ~2.5s interval, 4 procs
    on a 32-cpu box) perturbs both legs equally by well under 5%.
    """
    while True:
        t0 = time.time()
        mops = calibrate_cpu(procs, iters) / 1e6
        t1 = time.time()
        with open(path, "a") as fh:
            fh.write(
                json.dumps(
                    {"t0": round(t0, 3), "t1": round(t1, 3), "mops": round(mops, 1)}
                )
                + "\n"
            )
        time.sleep(max(0.0, interval - (t1 - t0)))


def trace_stats(path: str, window) -> dict | None:
    """Mean/min capacity over trace bursts whose midpoint falls inside
    [t0, t1]. Bursts fire on a fixed cadence (the loop sleeps off its own
    burst time) so equal weights approximate time weighting. None if the
    window has fewer than 3 samples — too sparse to normalize honestly."""
    if not window or not os.path.exists(path):
        return None
    t0, t1 = window
    samples = []
    with open(path) as fh:
        for line in fh:
            try:
                s = json.loads(line)
            except json.JSONDecodeError:
                continue
            mid = (s["t0"] + s["t1"]) / 2
            if t0 <= mid <= t1:
                samples.append(s["mops"])
    if len(samples) < 3:
        return None
    return {
        "mean": round(sum(samples) / len(samples), 1),
        "min": round(min(samples), 1),
        "n": len(samples),
    }


def run_bench(cpus: int, bench_rows: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_ROWS=str(bench_rows),
        SPARK_GRAFT_SUITE_ONLY="1",  # the metric is the suite; standalone
        # queries would only contaminate the session (see bench.py note)
        SPARK_GRAFT_SUITE_RUNS="1",  # one clean run per leg: short legs
        # keep the low/high pair window-matched, which dominates accuracy
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench failed at cpus={cpus}:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--rows", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "8000000")),
    )
    ap.add_argument(
        "--no-trace", action="store_true",
        help="disable the continuous capacity tracer (legacy endpoint-probe mode)",
    )
    ap.add_argument(
        "--min-host-mops", type=float, default=0.0,
        help="poll the 32-proc calibration and wait (up to 20 min) for at "
             "least this much host capacity before starting each pair",
    )
    args = ap.parse_args()
    ratio = args.high / args.low

    # hardware ceiling calibration (quiet machine assumed): CPU busy-loop
    # AND memory-bandwidth STREAM, both at low/high widths — a faster
    # engine shifts suite wall toward scan/bandwidth work whose single-box
    # scaling the CPU ceiling alone cannot bound (round-3 verdict).
    cal_low = calibrate_cpu(args.low)
    cal_high = calibrate_cpu(args.high)
    ceiling = (cal_high / cal_low) / ratio
    bw_low = calibrate_bw(args.low)
    bw_high = calibrate_bw(args.high)
    s_cpu = cal_high / cal_low
    # sanity clamp: a shared-bandwidth box cannot give MORE than
    # proportional scaling, and more workers never reduce the aggregate
    s_bw = min(max(bw_high / bw_low, 1.0), ratio)
    print(
        f"[scaling] raw-CPU calibration: {args.low}p={cal_low/1e6:.0f} Mops/s "
        f"{args.high}p={cal_high/1e6:.0f} Mops/s ceiling={ceiling:.3f}",
        file=sys.stderr,
    )
    print(
        f"[scaling] memory-bandwidth calibration: {args.low}p={bw_low/2**30:.1f} GiB/s "
        f"{args.high}p={bw_high/2**30:.1f} GiB/s speedup={s_bw:.2f} "
        f"(bw ceiling {(s_bw/ratio):.3f})",
        file=sys.stderr,
    )

    # run the two levels as back-to-back PAIRS (not level-sequential):
    # host capacity on this box can quadruple between windows minutes
    # apart, which poisons any low-vs-high ratio measured in different
    # windows. Each pair is as window-matched as this box allows; the
    # pair whose two host calibrations agree best is the evidence.
    def wait_capacity(tag: str) -> None:
        if args.min_host_mops <= 0:
            return
        for _ in range(20):
            cal32 = calibrate_cpu(32, 6_000_000) / 1e6
            print(f"[scaling] host probe ({tag}): {cal32:.0f} Mops", file=sys.stderr)
            if cal32 >= args.min_host_mops:
                return
            time.sleep(60)

    # continuous capacity trace for the whole pair campaign (started AFTER
    # the ceiling calibrations above so they stay unperturbed). Each leg's
    # bench JSON carries its suite window (suite_min_window); the leg's
    # effective capacity is the trace mean over exactly that interval, and
    #   eff_trace = eff_raw * (low_trace_mean / high_trace_mean)
    # i.e. the ratio of capacity-integrated costs (wall x capacity), which
    # NORMALIZES mid-leg host dips instead of trying (and failing) to
    # detect them with endpoint probes. PRE-REGISTERED headline: the
    # lower-median of eff_trace across all pairs with >=3 trace samples in
    # both legs' windows; pairs without a valid trace fall back to the
    # endpoint rules and are excluded from the trace median. Committed
    # before any run-E data existed.
    trace_path = os.path.join(REPO, "BENCH", "r5", "capacity_trace.jsonl")
    os.makedirs(os.path.dirname(trace_path), exist_ok=True)
    # non-daemon (its burn bursts are themselves child processes, which
    # daemons may not spawn); atexit guarantees teardown on any exit path
    tracer = mp.Process(target=_trace_loop, args=(trace_path, 4, 3_000_000, 2.5))
    if not args.no_trace:
        tracer.start()
        atexit.register(lambda: tracer.terminate() if tracer.is_alive() else None)

    pairs: list[tuple[dict, dict]] = []
    for i in range(args.repeats):
        # gate EACH leg on capacity, and probe after the pair too: a leg
        # measured while the host collapses mid-run (capacity here can
        # drop 3x in minutes) poisons the ratio — such pairs are tainted
        # and excluded from the matched set.
        wait_capacity(f"pair{i} pre-low")
        lo_r = run_bench(args.low, args.rows)
        wait_capacity(f"pair{i} pre-high")
        hi_r = run_bench(args.high, args.rows)
        post = calibrate_cpu(32, 6_000_000) / 1e6 if args.min_host_mops > 0 else -1.0
        # pair validity requires the capacity window to HOLD through the
        # pair: entry gated at min_host_mops, exit must stay within 80%
        # of it (in-session probe scale). Round-5 pair evidence: a pair
        # whose post probe fell to 74% of the gate read eff 0.47 with
        # perfectly matched leg calibrations — the mid-suite dip is
        # invisible to per-leg cals and only the exit probe catches it.
        tainted = args.min_host_mops > 0 and post < 0.8 * args.min_host_mops
        # mid-leg capacity collapse: each leg's bench JSON carries its own
        # PRE and POST subprocess calibrations (same scale — the in-
        # session `post` probe above reads ~2-3x lower than subprocess
        # cals and must never be compared against them); a >35% swing
        # within one leg means the suite ran across a capacity cliff and
        # the ratio is unreliable even when the two legs' cals agree
        def _leg_collapsed(r: dict) -> bool:
            pre = r.get("host_cal_pre_mops") or 0.0
            pst = r.get("host_cal_mops") or 0.0
            if pre <= 0 or pst <= 0:
                return False
            return abs(pre - pst) / max(pre, pst) > 0.35

        if _leg_collapsed(lo_r) or _leg_collapsed(hi_r):
            tainted = True
        lo_r["post_cal_mops"] = hi_r["post_cal_mops"] = round(post, 1)
        lo_r["tainted"] = hi_r["tainted"] = tainted
        for r in (lo_r, hi_r):
            r["trace"] = trace_stats(trace_path, r.get("suite_min_window"))
        for tag, r in (("low", lo_r), ("high", hi_r)):
            print(
                f"[scaling] pair{i} {tag} cpus={r['cpus']}: {r['value']} rows/sec "
                f"(host {r.get('host_cal_mops', '?')} Mops, post {post:.0f}"
                f"{', TAINTED' if tainted else ''})",
                file=sys.stderr,
            )
        pairs.append((lo_r, hi_r))

    def cal_mismatch(p):
        a = p[0].get("host_cal_mops") or -1.0
        b = p[1].get("host_cal_mops") or -1.0
        if a <= 0 or b <= 0:  # failed calibration: never "matched"
            return float("inf")
        return abs(a - b) / max(a, b)

    # among window-matched pairs (≤20% calibration mismatch) the headline
    # is the MEDIAN efficiency: noise is one-sided (legs only slow down),
    # but max() preferentially selects pairs whose LOW leg straggled,
    # biasing the ratio upward — the median is robust to both directions.
    # The max is still reported (one-sided-noise argument) for context,
    # as are all pairs.
    def eff_trace_of(p) -> float | None:
        lo_t, hi_t = p[0].get("trace"), p[1].get("trace")
        if not lo_t or not hi_t:
            return None
        raw = (p[1]["value"] / p[0]["value"]) / ratio
        return raw * lo_t["mean"] / hi_t["mean"]

    matched = [
        p for p in pairs if cal_mismatch(p) <= 0.2 and not p[0].get("tainted")
    ] or [min(pairs, key=cal_mismatch)]
    # PRE-REGISTERED round-5 rule: when the capacity tracer produced valid
    # windows (>=3 samples per leg), the headline is the LOWER-median of
    # the trace-normalized efficiencies across ALL pairs — normalization
    # replaces exclusion, so no pair is dropped for window mismatch.
    # Without traces, fall back to the endpoint rules (round-4 behavior).
    trace_pairs = [p for p in pairs if eff_trace_of(p) is not None]
    if trace_pairs:
        by_eff = sorted(trace_pairs, key=eff_trace_of)
        sel_idx = (len(by_eff) - 1) // 2
        lo, hi = by_eff[sel_idx]
        eff = eff_trace_of(by_eff[sel_idx])
        eff_max = eff_trace_of(by_eff[-1])
        headline_rule = "lower-median of trace-normalized pairs"
    else:
        by_eff = sorted(matched, key=lambda p: p[1]["value"] / p[0]["value"])
        # LOWER median for even counts: round 4 published by_eff[n//2] of
        # two matched pairs and called it a median when it was the max; the
        # lower median under-reports efficiency, so the headline stays
        # conservative
        sel_idx = (len(by_eff) - 1) // 2
        lo, hi = by_eff[sel_idx]
        eff = (hi["value"] / lo["value"]) / ratio
        eff_max = (by_eff[-1][1]["value"] / by_eff[-1][0]["value"]) / ratio
        headline_rule = (
            "lower-median of calibration-matched untainted pairs"
            if len(by_eff) > 1 else "only matched pair"
        )
    eff_norm = eff / ceiling

    # combined ceiling: split the LOW leg's suite wall into a CPU-scaling
    # share (the drift check — Python/NumPy compute) and a bandwidth-
    # scaling share (the JVM columnar scan/aggregation checks), from the
    # per-check durations the suite records. Best possible high-leg time
    # T_hi = T_lo·(f_cpu/s_cpu + f_bw/s_bw) ⇒
    # ceiling_combined = 1 / (ratio·(f_cpu/s_cpu + f_bw/s_bw)).
    # Conservative by construction: drift itself contains bandwidth-bound
    # numpy gathers that are charged to the CPU share, which can only
    # RAISE this ceiling (and so lower the reported vs-ceiling number).
    phases = {
        k.removeprefix("suite_phase_"): v
        for k, v in lo.get("queries", {}).items()
        if k.startswith("suite_phase_")
    }
    phase_total = sum(phases.values())
    if phase_total > 0:
        f_cpu = phases.get("drift", 0.0) / phase_total
    else:  # older JSONs without phase timings: all-CPU (legacy behavior)
        f_cpu = 1.0
    f_bw = 1.0 - f_cpu
    ceiling_combined = 1.0 / (ratio * (f_cpu / s_cpu + f_bw / s_bw))
    eff_vs_combined = eff / ceiling_combined
    report = {
        "low_cpus": args.low,
        "high_cpus": args.high,
        "bench_rows": args.rows,
        "low_rows_per_sec": lo["value"],
        "high_rows_per_sec": hi["value"],
        "low_tokens_per_sec": lo["tokens_per_sec"],
        "high_tokens_per_sec": hi["tokens_per_sec"],
        "scaling_efficiency_raw": round((hi["value"] / lo["value"]) / ratio, 3),
        "scaling_efficiency_headline": round(eff, 3),
        "scaling_efficiency_max_pair": round(eff_max, 3),
        "n_pairs": len(pairs),
        "n_matched": len(matched),
        "n_trace_valid": len(trace_pairs),
        "headline_rule": headline_rule,
        "hardware_ceiling": round(ceiling, 3),
        "scaling_efficiency_vs_ceiling": round(eff_norm, 3),
        "cal_cpu_mops": [round(cal_low / 1e6, 1), round(cal_high / 1e6, 1)],
        "cal_bw_gibs": [round(bw_low / 2**30, 2), round(bw_high / 2**30, 2)],
        "bw_speedup": round(s_bw, 3),
        "phase_split_f_cpu": round(f_cpu, 3),
        "ceiling_combined": round(ceiling_combined, 3),
        "scaling_efficiency_vs_combined": round(eff_vs_combined, 3),
        "low_host_cal_mops": lo.get("host_cal_mops"),
        "high_host_cal_mops": hi.get("host_cal_mops"),
        "all_pairs": [
            {
                "low": p[0]["value"], "high": p[1]["value"],
                "low_cal": p[0].get("host_cal_mops"),
                "high_cal": p[1].get("host_cal_mops"),
                "low_cal_pre": p[0].get("host_cal_pre_mops"),
                "high_cal_pre": p[1].get("host_cal_pre_mops"),
                "post_cal": p[0].get("post_cal_mops"),
                "tainted": bool(p[0].get("tainted")),
                "eff_raw": round((p[1]["value"] / p[0]["value"]) / ratio, 3),
                "trace_low": p[0].get("trace"),
                "trace_high": p[1].get("trace"),
                "eff_trace": (
                    round(eff_trace_of(p), 3)
                    if eff_trace_of(p) is not None else None
                ),
                # capacity-integrated cost receipts (suite wall x trace-mean
                # capacity, k sec x Mops): deterministic work => these should
                # be level-constant across pairs; their spread validates (or
                # falsifies) the trace normalization itself
                "cost_low_kso": (
                    round(p[0]["suite_sec"] * p[0]["trace"]["mean"] / 1e3, 2)
                    if p[0].get("trace") else None
                ),
                "cost_high_kso": (
                    round(p[1]["suite_sec"] * p[1]["trace"]["mean"] / 1e3, 2)
                    if p[1].get("trace") else None
                ),
                # per-check scaling decomposition: which phase limits the
                # suite's single-box ratio
                "phase_eff": {
                    k.removeprefix("suite_phase_"): round(
                        (p[0]["queries"][k] / p[1]["queries"][k]) / ratio, 3
                    )
                    for k in p[0].get("queries", {})
                    if k.startswith("suite_phase_")
                    and p[1].get("queries", {}).get(k, 0) > 0
                },
            }
            for p in pairs
        ],
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE — measured throughput + scaling efficiency

North-rule target: throughput scaling efficiency >= 0.8 from N to 4N
executors. A real multi-node cluster is unavailable in this sandbox, so
(per driver instruction) the SAME job runs at two `local[N]` levels on
identical input; efficiency = (throughput_4N / throughput_N) / {ratio:.0f}.

**Hardware ceilings.** This sandbox is a virtualized single box whose
shared resources do not scale 4x with 4x busy workers. Two calibrations
(no Spark), run in the same session as the measurement:

| workers | CPU busy-loop (Mops/s) | memory STREAM (GiB/s) |
|---|---|---|
| {args.low} | {cal_low/1e6:,.0f} | {bw_low/2**30:,.1f} |
| {args.high} | {cal_high/1e6:,.0f} | {bw_high/2**30:,.1f} |

⇒ pure-CPU work can scale at most {s_cpu:.2f}x ({args.low}→{args.high};
ceiling {ceiling:.3f}), memory-bandwidth-bound work at most {s_bw:.2f}x
(ceiling {s_bw/ratio:.3f}) — the box's bandwidth is a shared resource
that {args.high} workers cannot multiply.

**Combined ceiling.** The suite's low-leg wall splits into a CPU-scaling
share (the drift check: Python/NumPy forest compute, f_cpu = {f_cpu:.2f})
and a bandwidth-scaling share (JVM columnar scans/aggregations:
column stats, uniqueness, referential, token invariants, f_bw =
{f_bw:.2f}), from the per-check durations the suite itself records.
Best achievable high-leg time is T_lo·(f_cpu/{s_cpu:.2f} + f_bw/{s_bw:.2f}),
so the maximum efficiency THIS job can exhibit on THIS box is

    ceiling_combined = 1 / ({ratio:.0f}·(f_cpu/s_cpu + f_bw/s_bw)) = **{ceiling_combined:.3f}**

The split is conservative: drift's own numpy gathers are bandwidth-bound
but charged to the CPU share, which can only raise the ceiling and lower
the reported vs-ceiling number. On a real 4x-executor cluster each
executor adds its own cores, memory bandwidth and disks — both shared-
resource ceilings disappear — so the combined-ceiling-normalized number
below is the cluster-relevant one.

## Measured job: full validation suite

Column stats + single-aggregate uniqueness + broadcast-anti-join referential +
token invariants + per-partition RCF drift sketches over the
deterministic tokenized-sequence table
({lo["bench_rows"]:,} rows, {lo["bench_tokens"]:,} tokens, seed 42), bench.py,
identical config at both levels. Levels run as back-to-back pairs
({args.repeats} pairs); the published pair is the
**{report["headline_rule"]}** — {len(matched)} of {len(pairs)} pairs
matched (<= 20% leg-calibration mismatch, no post-pair capacity
collapse). Max-pair efficiency {eff_max:.3f} for context: noise is
one-sided (legs only slow down) but the max preferentially selects
straggling low legs, so the median is the headline. All pairs:
{json.dumps(report["all_pairs"])}.

| parallelism | validated rows/sec | tokens/sec | suite wall (s) | host Mops at 32p |
|---|---|---|---|---|
| local[{args.low}] (N) | {lo["value"]:,.0f} | {lo["tokens_per_sec"]:,.0f} | {lo["suite_sec"]} | {lo.get("host_cal_mops", "n/a")} |
| local[{args.high}] (4N) | {hi["value"]:,.0f} | {hi["tokens_per_sec"]:,.0f} | {hi["suite_sec"]} | {hi.get("host_cal_mops", "n/a")} |

* headline scaling efficiency ({headline_rule}): **{eff:.3f}**
  (headline pair raw: {(hi["value"] / lo["value"]) / ratio:.3f})
* pure-CPU ceiling at {ratio:.0f}x on this box: {ceiling:.3f} (efficiency vs it: {eff_norm:.3f})
* combined CPU+bandwidth ceiling (derivation above): {ceiling_combined:.3f}
* **efficiency vs combined ceiling: {eff_vs_combined:.3f}** (target >= 0.8)

**Measurement methodology** (established round 2; encoded in bench.py):
the suite runs FIRST in a clean session — heavy work earlier in a
session leaves 32 dirty Python workers + a full JVM old-gen behind,
measured as a ~2x slowdown on a later identical suite run. Between
sessions the dominant variable is host capacity: clean-suite time
tracks the pure-Python calibration almost exactly (63.9s at 827 Mops
vs 133.8s at 397 Mops — ratio 2.09 vs 2.08), so every bench JSON
carries `host_cal_mops`; compare `suite_sec x host_cal_mops` across
runs, never raw seconds. The per-level host columns above show whether
the two levels were measured in comparable capacity windows.

Per-query seconds at local[{args.high}]:

```json
{json.dumps(hi["queries"], indent=2)}
```

Reproduce: `python scripts/bench_scaling.py --low {args.low} --high {args.high} --rows {args.rows}`.
"""
        )
    print(f"[scaling] wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
