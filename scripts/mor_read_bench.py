#!/usr/bin/env python3
"""Subset MoR read cost vs the whole-base broadcast join.

Evidence for the round-5 read-path surgery (sink.py `_read_mor_subset`):
between compactions the steady-state read should pay the broadcast
anti/semi join only on the base buckets the outstanding deltas touch —
untouched buckets stream through join-free — so base scan work drops
from 2x the table (anti + semi passes) to (1 + touched_share)x. This
script builds the same lake shape as major_subset_bench.py (clean base
spanning all n_buckets, then a delta wave confined by the engine's own
bucket expression to a small subset) and INTERLEAVES timed reads
A/B/A/B on the SAME lake state (host drift hits both arms equally):

  * arm subset (the default read): broadcast join on touched buckets
    only, untouched buckets pass through;
  * arm whole: the legacy-manifest fallback — the broadcast key-set
    join probed against EVERY base bucket (forced by masking
    _delta_touched_buckets);

asserting both arms produce the same final table (row count +
order-insensitive whole-row sha256) before timing. The timed op is an
aggregate that forces a real content scan (count + max(length(content))
+ sum of a key hash) without driver-side collection of rows.

Run: python scripts/mor_read_bench.py [n_events] [n_keys] [reps] [content_words]
(default 8_000_000 events / 800_000 keys / 5 reps per arm / 1-token
content; content_words=64 gives document-shaped rows where the base
scan — the thing the subset read halves — dominates the wall).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else max(2_000, n_events // 10)
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    content_words = int(sys.argv[4]) if len(sys.argv) > 4 else 1
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
    work = tempfile.mkdtemp(prefix="pyspark_cdc_readbench_")
    try:
        # ---- base wave: spread across every bucket, folded into a clean base
        log_dir = os.path.join(work, "log_base")
        generate.write_log(
            spark, log_dir, n_events=n_events, n_keys=n_keys,
            n_files=8, include_edge_cases=False,
            content_words=content_words,
        )
        lake_dir = os.path.join(work, "lake")
        lake = ParquetLake(spark, lake_dir, n_buckets=n_buckets, mode="mor",
                           compact_every=10**9)
        replay_batch(spark, log_dir, lake, batch_id=0)
        lake._commit_snapshot(
            lake._compact(lake.current_meta(), full=True))  # clean base

        # ---- delta wave confined to buckets < subset_max_bucket by the
        # engine's own bucket expression over the envelope key
        delta_raw = generate.bulk_events_df(
            spark, max(100_000, n_events // 40), n_keys=n_keys, seed=7,
            content_words=content_words,
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
        assert lake._delta_bytes(meta) <= lake.broadcast_delta_bytes, (
            "delta backlog too large for the broadcast regime")
        base_bytes = sum(
            lake._tree_bytes(os.path.join(lake_dir, rel))
            for rel in meta["buckets"].values())
        touched_bytes = sum(
            lake._tree_bytes(os.path.join(lake_dir, meta["buckets"][str(b)]))
            for b in touched if str(b) in meta["buckets"])

        def state(df):
            """Order-insensitive whole-table fingerprint (equality check)."""
            h = df.select(F.sha2(F.to_json(F.struct("*")), 256).alias("h"))
            row = h.agg(
                F.count("*").alias("n"),
                F.sha2(F.concat_ws(
                    "", F.sort_array(F.collect_list("h"))), 256).alias("s"),
            ).collect()[0]
            return row["n"], row["s"]

        def timed_scan(df) -> float:
            """Force a real content scan through the read plan."""
            t0 = time.monotonic()
            df.agg(
                F.count("*"),
                F.max(F.length("content")),
                # pmod keeps the running sum bounded (ANSI mode: a raw
                # sum of 64-bit hashes overflows LongType)
                F.sum(F.pmod(F.xxhash64("repo", "path"), F.lit(1_000_000))),
            ).collect()
            return time.monotonic() - t0

        def force_whole(on: bool):
            if on:  # mask the bucket lists => legacy whole-base join
                lake._delta_touched_buckets = lambda m, route=None: None
            elif "_delta_touched_buckets" in lake.__dict__:
                del lake._delta_touched_buckets

        # structural metric, independent of host pace: how many base rows
        # enter the broadcast join branches (each is scanned TWICE there,
        # once per anti/semi pass) under each arm
        extra_cols = list(meta["extra_columns"])
        base_t, _ = lake._read_split(meta, extra_cols, buckets=touched)
        rows_joined_subset = base_t.count() if base_t is not None else 0
        all_base = lake._read_base(meta, extra_cols)
        rows_joined_whole = all_base.count() if all_base is not None else 0

        # equality first (untimed), then interleaved timed reps
        force_whole(False)
        n_sub, h_sub = state(lake.read())
        force_whole(True)
        n_whole, h_whole = state(lake.read())
        force_whole(False)
        assert (n_sub, h_sub) == (n_whole, h_whole), (
            f"subset/whole reads diverged: {n_sub}/{h_sub[:12]} vs "
            f"{n_whole}/{h_whole[:12]}")

        walls = {"subset": [], "whole": []}
        # warm up BOTH arms: with only the (default) subset arm warmed,
        # the whole-base arm's first timed rep absorbs its one-time
        # plan/broadcast build cost and the reported speedup inflates —
        # noticeable at low rep counts where the median can't hide it
        force_whole(False)
        timed_scan(lake.read())  # warm-up (file listing, JIT)
        force_whole(True)
        timed_scan(lake.read())
        for _ in range(reps):
            force_whole(False)
            walls["subset"].append(timed_scan(lake.read()))
            force_whole(True)
            walls["whole"].append(timed_scan(lake.read()))
        force_whole(False)

        med = {k: statistics.median(v) for k, v in walls.items()}
        out = {
            "n_events_base": n_events,
            "content_words": content_words,
            "n_buckets": n_buckets,
            "touched_buckets": len(touched),
            "touched_share": round(len(touched) / n_buckets, 4),
            "base_bytes": base_bytes,
            "touched_bytes": touched_bytes,
            "base_rows_joined_subset": rows_joined_subset,
            "base_rows_joined_whole": rows_joined_whole,
            "reps_per_arm": reps,
            "subset_read_wall_s": round(med["subset"], 3),
            "whole_read_wall_s": round(med["whole"], 3),
            "subset_walls": [round(w, 3) for w in walls["subset"]],
            "whole_walls": [round(w, 3) for w in walls["whole"]],
            "speedup": round(med["whole"] / med["subset"], 2)
            if med["subset"] else None,
            "final_rows": n_sub,
            "state_equal": True,
        }
        print(json.dumps(out))
        print()
        print("| read | base joined | base bytes joined | median wall (s) |")
        print("|---|---|---|---|")
        print(f"| subset broadcast | {len(touched)}/{n_buckets} buckets "
              f"| {touched_bytes:,} | {med['subset']:.3f} |")
        print(f"| whole-base broadcast | {n_buckets}/{n_buckets} buckets "
              f"| {base_bytes:,} | {med['whole']:.3f} |")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
