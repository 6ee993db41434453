"""Tenant-pruned read benchmark (Q11): read(route=X) vs the full read,
on a lake with R tenant routes — the evidence that manifest-level
bucket/delta skipping + route PartitionFilters on the base actually buy
wall-clock, justifying the write-side cost of route dirs in the BASE
layout (deltas carry route as a data column; see sink.py).

Builds a MoR lake from a generated log whose route is a hash of the key's
repo (route stays functionally determined by the merge key), ingested in
batches so the bench covers BOTH read shapes: the compacted base (route
partition dirs -> PartitionFilters) and a base+delta mix (manifest route
lists -> whole-delta skips).

Run: python scripts/route_bench.py [n_events] [n_routes]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(xs):
    return sorted(xs)[len(xs) // 2]


def timed(fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 3))
    return median(walls), walls


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_routes = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from bench import build_spark
    from pyspark_cdc import generate
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import process_batch

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="pyspark_cdc_routebench_")
    out: dict = {"metric": "tenant_pruned_read", "n_events": n_events,
                 "n_routes": n_routes, "cpus": cpus}
    try:
        # R-tenant log: route = hash(repo) % R, carried as the topic
        # column (topic IS the route in the default engine mode)
        raw = generate.bulk_events_df(
            spark, n_events, n_keys=max(2_000, n_events // 10), seed=13
        ).withColumn(
            "topic",
            F.concat(
                F.lit("tenant_"),
                F.pmod(
                    F.xxhash64(F.coalesce(F.col("key"), F.lit(""))),
                    F.lit(n_routes),
                ).cast("string"),
            ),
        )
        log_dir = os.path.join(workdir, "log")
        raw.repartition(32).write.parquet(log_dir)

        lake = ParquetLake(
            spark, os.path.join(workdir, "lake"), n_buckets=64, mode="mor",
            compact_every=3, major_every=1,
        )
        files = sorted(
            os.path.join(log_dir, f) for f in os.listdir(log_dir)
            if f.endswith(".parquet")
        )
        # 3 batches -> major compaction folds to the base; a 4th batch
        # leaves one parsed delta outstanding (the steady-state mix)
        chunks = [files[i::4] for i in range(4)]
        for i, chunk in enumerate(chunks):
            process_batch(spark.read.parquet(*chunk), i, lake)
        meta = lake.current_meta()
        out["base_buckets"] = len(meta["buckets"])
        out["deltas_outstanding"] = len(meta.get("deltas", []))

        route = "tenant_0"
        full_med, full_walls = timed(lambda: lake.read().count())
        pruned_med, pruned_walls = timed(lambda: lake.read(route=route).count())
        out.update({
            "full_read_sec": full_med, "full_read_walls": full_walls,
            "pruned_read_sec": pruned_med, "pruned_read_walls": pruned_walls,
            "speedup": round(full_med / pruned_med, 2),
            "full_rows": lake.read().count(),
            "pruned_rows": lake.read(route=route).count(),
        })

        # sanity: pruning loses no rows and leaks no other tenant's
        flt = lake.read().filter(F.col("route") == route).count()
        assert flt == out["pruned_rows"], (flt, out["pruned_rows"])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
