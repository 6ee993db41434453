#!/usr/bin/env python3
"""Merge-on-read amplification: read-path wall vs deltas outstanding.

Justifies the `compact_every` default (SCALING.md section on compaction
cadence): replays an sf1-sized log (20M events) in micro-batches with
compaction DISABLED, timing the full read path (resolve_lww over
base + k deltas) after each batch, then compacts once and times the
clean-base read. Prints a markdown table for BENCH/BASELINE.md.

Run: python scripts/read_amp.py [n_events] [policy] (default 20_000_000;
policy 'none' = compaction disabled sweep, 'tiered' = the default
compact_every=10/major_every=4 policy live, showing the minor fold
bounding the read wall).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    policy = sys.argv[2] if len(sys.argv) > 2 else "none"
    batches = 16
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark_cdc import generate
    from pyspark_cdc.session import get_spark
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import process_batch

    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pyspark_cdc_readamp_")
    log_dir = os.path.join(work, "log")
    generate.write_log(
        spark, log_dir, n_events=n_events, n_keys=max(2_000, n_events // 10),
        n_files=batches * 2, include_edge_cases=False,
    )
    files = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir) if f.endswith(".parquet")
    )
    per_batch = max(1, len(files) // batches)

    if policy == "tiered":
        # cadence chosen so 16 batches exercise BOTH tiers: major at
        # batch 5 (no base yet), minor folds at batches 10 and 15
        lake = ParquetLake(
            spark, os.path.join(work, "lake"), n_buckets=64, mode="mor",
            compact_every=5, major_every=3,
        )
    else:
        lake = ParquetLake(
            spark, os.path.join(work, "lake"), n_buckets=64, mode="mor",
            compact_every=10_000,  # never auto-compact inside the sweep
        )

    try:
        for b in range(batches):
            chunk = files[b * per_batch : (b + 1) * per_batch]
            if not chunk:
                break
            df = spark.read.parquet(*chunk)
            t0 = time.monotonic()
            process_batch(df, b, lake)
            ingest = time.monotonic() - t0
            t0 = time.monotonic()
            n = lake.read().count()
            read_wall = time.monotonic() - t0
            meta = lake.current_meta()
            n_deltas = len(meta.get("deltas", []))
            n_merged = n_deltas - ParquetLake._raw_delta_count(meta)
            tag = f"{n_deltas}" + (f" ({n_merged} merged)" if n_merged else "")
            print(f"| {tag} | {ingest:.2f} | {read_wall:.2f} | {n} |",
                  flush=True)

        if policy != "tiered":
            t0 = time.monotonic()
            lake._compact(lake.current_meta())
            compact_wall = time.monotonic() - t0
            t0 = time.monotonic()
            n = lake.read().count()
            read0 = time.monotonic() - t0
            print(f"| 0 (post-compaction, {compact_wall:.1f}s compact) "
                  f"| — | {read0:.2f} | {n} |", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
