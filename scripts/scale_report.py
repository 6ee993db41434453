#!/usr/bin/env python3
"""Compute scaling efficiency from two replay runs and append the evidence
table to BENCH/BASELINE.md.

Efficiency definition (north rule, N -> 4N cores):
    eff = (throughput_4N / throughput_N) / 4
i.e. 1.0 = perfect linear scaling; the target is >= 0.8.
"""

from __future__ import annotations

import datetime
import json
import os
import sys


def main() -> int:
    r8_path, r32_path, n_events = sys.argv[1], sys.argv[2], int(sys.argv[3])
    with open(r8_path) as f:
        r8 = json.load(f)
    with open(r32_path) as f:
        r32 = json.load(f)

    tp8 = r8["events_per_sec"]
    tp32 = r32["events_per_sec"]
    eff = (tp32 / tp8) / 4.0

    today = datetime.date.today().isoformat()
    os.makedirs("BENCH", exist_ok=True)
    block = f"""
## Scaling run {today} — {n_events:,} events, same input log, batch replay

| cores | wall (s) | events/sec | final rows |
|---|---|---|---|
| local[8]  (N)  | {r8['wall_sec']} | {tp8:,.0f} | {r8['final_rows']:,} |
| local[32] (4N) | {r32['wall_sec']} | {tp32:,.0f} | {r32['final_rows']:,} |

**Scaling efficiency (N -> 4N) = (tp_4N / tp_N) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json). Identical input, identical job
(`jobs/replay.py --mode batch`), submitted via `spark-submit --py-files`.
"""
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(block)
    print(json.dumps({
        "events": n_events,
        "tp_local8": tp8,
        "tp_local32": tp32,
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }))
    return 0


if __name__ == "__main__":
    main()
