#!/usr/bin/env python3
"""Subset-MAJOR compaction cost vs touched-bucket bytes.

Evidence for the round-5 surgery (sink.py `_compact(full=False)`): a MAJOR
fold must cost O(touched base + delta backlog), not O(table). This script
builds a lake whose base spans all n_buckets, then applies a key-skewed
delta wave confined (by filtering on the engine's own bucket expression
over the envelope key) to a small bucket subset, and times

  * subset major (the default): reads/rewrites only the touched buckets,
    carries the rest forward by manifest reference;
  * full major (full=True): the pre-round-5 behavior — reads and rewrites
    every bucket;

on clones of the SAME lake state, asserting both folds produce the same
final table (row count + order-insensitive whole-row sha256). It prints a
markdown table for BENCH/BASELINE.md: touched-bucket share of the base vs
the two fold walls — the subset wall should track the touched share, the
full wall the table size.

Run: python scripts/major_subset_bench.py [n_events] [n_keys]
(default 8_000_000 events / 800_000 keys — big enough that the base read
dominates task overhead at local[32]).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else max(2_000, n_events // 10)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_buckets = 64
    subset_max_bucket = 4  # delta wave touches buckets 0..3 only

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchutil import with_key_bucket

    from pyspark_cdc import generate
    from pyspark_cdc.session import get_spark
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import process_batch, replay_batch

    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pyspark_cdc_majorbench_")
    try:
        # ---- base wave: spread across every bucket, folded into a clean base
        log_dir = os.path.join(work, "log_base")
        generate.write_log(
            spark, log_dir, n_events=n_events, n_keys=n_keys,
            n_files=8, include_edge_cases=False,
        )
        lake_dir = os.path.join(work, "lake")
        lake = ParquetLake(spark, lake_dir, n_buckets=n_buckets, mode="mor",
                           compact_every=10**9)
        replay_batch(spark, log_dir, lake, batch_id=0)
        lake._commit_snapshot(
            lake._compact(lake.current_meta(), full=True))  # clean base

        # ---- delta wave: same generator, later LSNs, FILTERED to the keys
        # whose (repo, path) hash lands in buckets < subset_max_bucket —
        # the engine's own bucket expression applied to the envelope key,
        # so the delta is guaranteed to touch only that bucket subset.
        delta_raw = generate.bulk_events_df(
            spark, max(100_000, n_events // 40), n_keys=n_keys, seed=7,
        )
        delta_raw = (
            with_key_bucket(delta_raw, n_buckets)
            .where(F.col("__bench_bucket") < subset_max_bucket)
            .drop("__bench_bucket")
        )
        process_batch(delta_raw, 1, lake)

        meta = lake.current_meta()
        touched = lake._delta_touched_buckets(meta)
        assert touched is not None and len(touched) <= subset_max_bucket, (
            f"delta confinement failed: touched={touched}")
        base_bytes = sum(
            lake._tree_bytes(os.path.join(lake_dir, rel))
            for rel in meta["buckets"].values())
        touched_bytes = sum(
            lake._tree_bytes(os.path.join(lake_dir, meta["buckets"][str(b)]))
            for b in touched if str(b) in meta["buckets"])

        # ---- time both folds on clones of the SAME lake state
        def clone_and_fold(full: bool) -> tuple[float, int, str]:
            cdir = os.path.join(work, f"clone_{'full' if full else 'subset'}")
            shutil.copytree(lake_dir, cdir)
            cl = ParquetLake(spark, cdir, mode="mor")
            m = cl.current_meta()
            t0 = time.monotonic()
            cl._commit_snapshot(cl._compact(m, full=full))
            wall = time.monotonic() - t0
            out = (cl.read()
                   .select(F.sha2(F.to_json(F.struct("*")), 256).alias("h"))
                   .agg(F.count("*").alias("n"),
                        F.sha2(F.concat_ws(
                            "", F.sort_array(F.collect_list("h"))), 256)
                        .alias("state"))
                   .collect()[0])
            shutil.rmtree(cdir, ignore_errors=True)
            return wall, out["n"], out["state"]

        w_sub, n_sub, h_sub = clone_and_fold(full=False)
        w_full, n_full, h_full = clone_and_fold(full=True)
        assert n_sub == n_full and h_sub == h_full, (
            f"subset/full majors diverged: {n_sub}/{h_sub[:12]} vs "
            f"{n_full}/{h_full[:12]}")

        out = {
            "n_events_base": n_events,
            "n_buckets": n_buckets,
            "touched_buckets": len(touched),
            "touched_share": round(len(touched) / n_buckets, 4),
            "base_bytes": base_bytes,
            "touched_bytes": touched_bytes,
            "subset_major_wall_s": round(w_sub, 3),
            "full_major_wall_s": round(w_full, 3),
            "speedup": round(w_full / w_sub, 2) if w_sub else None,
            "final_rows": n_sub,
            "state_equal": True,
        }
        print(json.dumps(out))
        print()
        print("| fold | buckets read | base bytes read | wall (s) |")
        print("|---|---|---|---|")
        print(f"| subset major | {len(touched)}/{n_buckets} "
              f"| {touched_bytes:,} | {w_sub:.3f} |")
        print(f"| full major | {n_buckets}/{n_buckets} "
              f"| {base_bytes:,} | {w_full:.3f} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
