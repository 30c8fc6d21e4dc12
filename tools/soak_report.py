#!/usr/bin/env python
"""Analyze a soak run's metrics.jsonl (tools/soak_run.sh — VERDICT r3 #6).

Checks:
- step sequence is continuous and strictly increasing across the
  SIGTERM+resume boundary (no gap, no replays);
- every logged loss is finite at every record;
- sustained steady-state throughput: img/s computed from wall-time deltas
  between records, excluding compile/restore records (the first record of
  each leg, detected by a >60s time delta) — reported as median + p10.

Prints one JSON line; exit 1 if continuity or finiteness fails.
"""

import json
import math
import os
import sys

import numpy as np


def main():
    run_dir = sys.argv[1]
    path = os.path.join(run_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(path) if l.strip()]
    recs = [r for r in recs if "loss_gen_total" in r]
    steps = [r["step"] for r in recs]
    ok_steps = all(b > a for a, b in zip(steps, steps[1:]))
    diffs = sorted(set(b - a for a, b in zip(steps, steps[1:])))
    # one logging stride throughout == no gap and no replay at the resume
    ok_stride = len(diffs) == 1
    finite = all(math.isfinite(v) for r in recs for k, v in r.items()
                 if k.startswith("loss_"))

    # throughput between consecutive records, per leg (a >60s delta is a
    # compile/restore boundary, excluded from the steady-state stats)
    batch = None
    for name in ("config.yaml",):
        cfg = os.path.join(run_dir, name)
        if os.path.exists(cfg):
            for line in open(cfg):
                if line.startswith("batch_size:"):
                    batch = int(line.split(":")[1])
    rates, boundaries = [], 0
    for a, b in zip(recs, recs[1:]):
        dt = b["time"] - a["time"]
        if dt > 60:
            boundaries += 1
            continue
        rates.append((b["step"] - a["step"]) * (batch or 8) / dt)
    out = {
        "records": len(recs), "first_step": steps[0], "last_step": steps[-1],
        "steps_continuous": ok_steps, "single_stride": ok_stride,
        "stride_set": diffs, "losses_finite": finite,
        "compile_boundaries": boundaries,
        "img_s_median": round(float(np.median(rates)), 3) if rates else None,
        "img_s_p10": round(float(np.percentile(rates, 10)), 3)
        if rates else None,
        "img_s_records": len(rates),
    }
    print(json.dumps(out))
    sys.exit(0 if (ok_steps and ok_stride and finite) else 1)


if __name__ == "__main__":
    main()
