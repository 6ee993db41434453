#!/usr/bin/env python3
"""Stall-robust view of the committed scaling matrix.

The headline `sustained_events_per_sec` is a MEAN over the 6 post-warm-up
micro-batches, so one host-stall batch (a 12-70 s outlier among 4-6 s
neighbors; see the per-batch walls in the raw logs) dominates a leg.
This script recomputes every committed run set's per-leg rate as the
MEDIAN per-batch rate (2M events / median post-warm-up batch wall) from
the raw logs in BENCH/scale_sweeps_r04/ — uniformly over ALL run sets,
no cherry-picking. It changes no headline number; it is the appendix
evidence that the sub-0.8 1->4 readings come from single stall batches,
not from the engine.

Run: python scripts/median_rates.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics

BENCH = os.path.join(os.path.dirname(__file__), "..", "BENCH", "scale_sweeps_r04")
BENCH_R05 = os.path.join(
    os.path.dirname(__file__), "..", "BENCH", "scale_sweeps_r05")
BATCH_EVENTS = 2_000_000
WARMUP = 2  # first 2 batches absorb JVM class-load + JIT


def legs(path: str) -> list[tuple[int, float]]:
    out = []
    for line in open(path):
        m = re.match(r"([0-9]) executors x 4 cores: (\{.*)", line)
        if m:
            walls = json.loads(m.group(2))["merge"]["per_batch_wall_ms"][WARMUP:]
            med_s = statistics.median(walls) / 1000.0
            out.append((int(m.group(1)), BATCH_EVENTS / med_s))
    return out


def main() -> None:
    eff4s = []
    files = (
        sorted(glob.glob(os.path.join(BENCH, "sweep*.out")))
        + sorted(glob.glob(os.path.join(BENCH, "set*.out")))
        + sorted(glob.glob(os.path.join(BENCH_R05, "set*.out")))
    )
    for f in files:
        rows = legs(f)
        # SLIDING scan for consecutive (1,2,4) triples, not a fixed
        # stride-3 walk: a builder-session restart can leave a partial
        # [1,2] prefix in a file before a complete appended rerun, and a
        # stride walk starting at 0 would misalign past the complete run
        # and silently DROP it — the opposite of "uniformly over ALL run
        # sets". Overlap is impossible (a matched triple consumes its
        # three legs).
        i = 0
        run_idx = 0
        while i <= len(rows) - 3:
            s = rows[i : i + 3]
            if [x[0] for x in s] != [1, 2, 4]:
                i += 1
                continue  # partial sweep fragment: slide one leg forward
            r1, r2, r4 = (x[1] for x in s)
            eff2, eff4 = r2 / (2 * r1), r4 / (4 * r1)
            eff4s.append(eff4)
            print(
                f"{os.path.basename(f):20s} run{run_idx} "
                f"1N={r1 / 1e3:6.1f}k 2N={r2 / 1e3:6.1f}k 4N={r4 / 1e3:6.1f}k "
                f"eff2={eff2:.3f} eff4={eff4:.3f}"
            )
            run_idx += 1
            i += 3
    print(f"median eff 1->4 (median-batch-rate) over {len(eff4s)} sets: "
          f"{statistics.median(eff4s):.3f}")


if __name__ == "__main__":
    main()
