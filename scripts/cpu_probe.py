#!/usr/bin/env python3
"""Host calibration: how much parallel speedup can this machine express
AT ALL, measured in the identical harness as the scaling runs
(spark-submit, local-cluster executor JVMs), with a pure-CPU workload —
sha2 + xxhash64 over spark.range, zero I/O, zero shuffle, zero JSON.

The CDC job's scaling efficiency is meaningless without this bound: on a
shared/overcommitted VM the deliverable speedup at 16 active threads can
be far below 4x, and the honest metric is job-speedup / probe-speedup at
the same executor span (reported in BENCH/BASELINE.md).

Run: python scripts/cpu_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

INNER = r'''
import time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
n = 60_000_000
df = spark.range(n, numPartitions=256)
expr = F.sha2(F.concat_ws("_", F.col("id"), F.xxhash64("id"), F.xxhash64("id", F.lit(1))), 256)
df.limit(1_000_000).select(F.max(expr)).collect()  # JIT warm-up
t0 = time.monotonic()
df.select(F.max(expr).alias("m")).collect()
print("PROBE_SEC", time.monotonic() - t0)
'''


def main() -> int:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(INNER)
        inner_path = f.name
    results: dict[int, list[float]] = {}
    try:
        # two interleaved rounds, same as scale_bench.sh
        for nexec in (1, 2, 4, 1, 2, 4):
            master = f"local-cluster[{nexec},4,8192]"
            out = subprocess.run(
                ["spark-submit", "--master", master,
                 "--conf", "spark.ui.enabled=false",
                 "--conf", "spark.driver.memory=4g",
                 "--conf", "spark.executor.memory=6g", inner_path],
                capture_output=True, text=True)
            sec = None
            for line in out.stdout.splitlines():
                if line.startswith("PROBE_SEC"):
                    sec = float(line.split()[1])
            results.setdefault(nexec, []).append(sec)
            print(f"# {nexec} executors: {sec}s", file=sys.stderr)
    finally:
        os.unlink(inner_path)
    best = {k: min(v) for k, v in results.items() if all(v)}
    print(json.dumps({
        "best_sec": best,
        "host_speedup_1to2": round(best[1] / best[2], 3) if 2 in best else None,
        "host_speedup_1to4": round(best[1] / best[4], 3) if 4 in best else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
