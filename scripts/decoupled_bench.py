#!/usr/bin/env python3
"""Decoupled maintenance vs inline compaction: ingest-latency evidence.

The OCC work (sink.py::_commit_with_rebase, ROUND5_NOTES.md §8) exists so
a 100 TB deployment can run compaction in a SEPARATE process and keep the
ingest job's micro-batch latency flat: inline folds couple the fold wall
(minutes at scale, even subset majors) into the batch that triggers them,
growing Kafka lag by exactly that stall. This script measures both arms
on the same host, same input, same Spark session:

  * inline    — the classic single-writer lake (compact_every=K): every
    K-th batch pays the fold inside its own wall;
  * decoupled — ingest lake with compact_every=None + a maintenance
    THREAD running compact_now() whenever the raw-delta backlog reaches
    K, committing through the optimistic-concurrency path while ingest
    keeps appending (live rebases, not the deterministic test hooks).

Reported per arm: ingest batch-wall p50 / p95 / max and the spike ratio
(max/p50 — the lag-growth number an SLO cares about), fold count, total
wall. Final states are asserted row-identical across arms (and each equals
the LWW oracle by construction — the same engine path the oracle gate
covers). On a shared local[32] box the decoupled arm's batches DO slow a
little while a fold runs concurrently (they share cores — on a real
cluster the maintenance job brings its own executors); the claim under
test is that no single batch absorbs a whole fold wall.

Run: python scripts/decoupled_bench.py [n_events] [n_keys] [n_batches]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMPACT_EVERY = 5
MAJOR_EVERY = 2


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))]


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else max(2_000, n_events // 10)
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark_cdc import generate
    from pyspark_cdc.session import get_spark
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import process_batch

    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pyspark_cdc_decoupled_")
    out = {"n_events": n_events, "n_keys": n_keys, "n_batches": n_batches,
           "compact_every": COMPACT_EVERY, "major_every": MAJOR_EVERY,
           "cpus": cpus}
    try:
        log_dir = os.path.join(work, "log")
        generate.write_log(spark, log_dir, n_events=n_events, n_keys=n_keys,
                           n_files=n_batches, include_edge_cases=False,
                           seed=11)
        files = sorted(
            os.path.join(log_dir, f) for f in os.listdir(log_dir)
            if f.endswith(".parquet")
        )
        schema = spark.read.parquet(log_dir).schema
        batches = [spark.read.schema(schema).parquet(f) for f in files]

        def run_inline():
            lake = ParquetLake(
                spark, os.path.join(work, "inline"), n_buckets=64,
                mode="mor", compact_every=COMPACT_EVERY,
                major_every=MAJOR_EVERY,
            )
            walls, folds = [], 0
            t_all = time.monotonic()
            for i, b in enumerate(batches):
                t0 = time.monotonic()
                s = process_batch(b, i, lake)
                walls.append(time.monotonic() - t0)
                if "compact_sec" in s:
                    folds += 1
            return lake, walls, folds, time.monotonic() - t_all

        def run_decoupled():
            tdir = os.path.join(work, "decoupled")
            ing = ParquetLake(spark, tdir, n_buckets=64, mode="mor",
                              compact_every=None, orphan_grace_sec=3600.0)
            mnt = ParquetLake(spark, tdir, n_buckets=64, mode="mor",
                              compact_every=None, orphan_grace_sec=3600.0)
            done = threading.Event()
            folds = [0]
            errs = []

            def maintain():
                try:
                    while not done.is_set():
                        meta = mnt.current_meta()
                        if (meta is not None and
                                ParquetLake._raw_delta_count(meta)
                                >= COMPACT_EVERY):
                            mnt.compact_now()
                            folds[0] += 1
                        else:
                            time.sleep(0.02)
                    # drain whatever backlog remains after ingest stops
                    meta = mnt.current_meta()
                    while meta is not None and meta.get("deltas"):
                        meta = mnt.compact_now()
                        folds[0] += 1
                except Exception as e:  # surfaced below, fail the bench
                    errs.append(e)

            th = threading.Thread(target=maintain, daemon=True)
            walls = []
            t_all = time.monotonic()
            th.start()
            try:
                for i, b in enumerate(batches):
                    t0 = time.monotonic()
                    process_batch(b, i, ing)
                    walls.append(time.monotonic() - t0)
            finally:
                done.set()
                th.join(timeout=600)
            if errs:
                raise errs[0]
            return ing, walls, folds[0], time.monotonic() - t_all

        # warmup: run one throwaway batch through a scratch lake so JVM /
        # codegen / parquet-footer warmup is not billed to the first arm
        scratch = ParquetLake(spark, os.path.join(work, "warmup"),
                              n_buckets=64, mode="mor", compact_every=None)
        process_batch(batches[0], 0, scratch)
        scratch.destroy()

        results = {}
        arms = {}
        for name, fn in (("inline", run_inline), ("decoupled", run_decoupled)):
            lake, walls, folds, total = fn()
            arms[name] = lake
            p50, p95, mx = pct(walls, 0.5), pct(walls, 0.95), max(walls)
            results[name] = {
                "total_wall_sec": round(total, 3),
                "ingest_wall_sec": round(sum(walls), 3),
                "batch_wall_p50_sec": round(p50, 3),
                "batch_wall_p95_sec": round(p95, 3),
                "batch_wall_max_sec": round(mx, 3),
                "spike_ratio_max_over_p50": round(mx / p50, 2),
                "stdev_sec": round(statistics.pstdev(walls), 3),
                "folds": folds,
                "walls": [round(w, 3) for w in walls],
            }
            print(f"{name}: {results[name]}", flush=True)

        # arms must agree row-for-row (order-insensitive content check)
        import pyspark.sql.functions as F

        def digest(lake):
            df = lake.read()
            row = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns)))))
                .alias("crc"),
            ).collect()[0]
            return row["n"], row["crc"]

        d_in, d_de = digest(arms["inline"]), digest(arms["decoupled"])
        assert d_in == d_de, (d_in, d_de)
        out["final_rows"] = d_in[0]
        out["arms"] = results
        out["identical_final_state"] = True
        print(json.dumps(out), flush=True)

        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/decoupled_r05.json", "w") as f:
            f.write(json.dumps(out) + "\n")
        return 0
    finally:
        import shutil
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
