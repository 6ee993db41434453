#!/usr/bin/env python3
"""Why rebucket() exists: maintenance + lookup cost on an UNDER-bucketed
lake, before vs after bucket-count evolution.

The bucket count fixes the granularity of every per-bucket cost: a
subset MAJOR fold reads the union of the backlog's touched buckets, and
a point lookup lists one bucket dir — both O(bucket size), and bucket
size = table/n_buckets. A lake created small (n_buckets=4 here) and
grown 1000x pays 25% of the table for a fold touching ONE key and a
quarter-table scan per point read. This script measures the same
workload on the same data at n_buckets=4, then runs `rebucket(256)`
(the one deliberately O(table) op, timed and reported honestly), then
re-measures:

  * a 10-key delta wave + `compact_now(tier='major')` — subset fold
    wall, plus the STRUCTURAL metric: touched-bucket share of the base
    (files and buckets read by the fold);
  * `lookup()` of one key — wall + base files listed by the plan.

Walls are sequential (the lake state necessarily differs between arms),
so the host-independent structural counts are the headline numbers; the
walls corroborate. Final state is asserted row-identical across the
rebucket (count + order-insensitive whole-row hash).

Run: python scripts/rebucket_bench.py [n_events] [n_keys] [reps]
(defaults 8_000_000 / 800_000 / 5).
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

N_BEFORE = 4
N_AFTER = 256
WAVE_KEYS = 10


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else max(2_000, n_events // 10)
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from pyspark_cdc import generate
    from pyspark_cdc.session import get_spark
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import process_batch, replay_batch

    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pyspark_cdc_rebucketbench_")
    try:
        log_dir = os.path.join(work, "log_base")
        generate.write_log(
            spark, log_dir, n_events=n_events, n_keys=n_keys,
            n_files=8, include_edge_cases=False, content_words=8,
        )
        lake = ParquetLake(spark, os.path.join(work, "lake"),
                           n_buckets=N_BEFORE, mode="mor",
                           compact_every=10**9)
        replay_batch(spark, log_dir, lake, batch_id=0)
        lake._compact(lake.current_meta(), full=True)  # clean base

        def digest():
            df = lake.read()
            row = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns)))))
                .alias("crc"),
            ).collect()[0]
            return row["n"], row["crc"]

        def base_file_count(meta):
            n = 0
            for rel in meta["buckets"].values():
                d = os.path.join(lake.table_dir, rel)
                for root, _dirs, files in os.walk(d):
                    n += sum(1 for f in files if f.endswith(".parquet"))
            return n

        def touched_files(meta, touched):
            n = 0
            for b in touched:
                rel = meta["buckets"].get(str(b))
                if rel is None:
                    continue
                d = os.path.join(lake.table_dir, rel)
                for root, _dirs, files in os.walk(d):
                    n += sum(1 for f in files if f.endswith(".parquet"))
            return n

        keys = [
            (r["repo"], r["path"])
            for r in lake.read().select("repo", "path")
            .orderBy(F.xxhash64("repo", "path")).limit(WAVE_KEYS + reps)
            .collect()
        ]
        wave_keys, point_keys = keys[:WAVE_KEYS], keys[WAVE_KEYS:]

        def wave_batch(batch_id, version):
            from pyspark_cdc.schemas import KAFKA_SHAPE

            recs = []
            for j, (repo, path) in enumerate(wave_keys):
                lsn = 10**9 + version * 1000 + j
                recs.append({
                    "key": None,
                    "value": json.dumps({"payload": {
                        "op": "u",
                        "after": {"repo": repo, "path": path,
                                  "commit": f"c{version}", "lang": "py",
                                  "content": f"rewrite v{version} {repo}/{path}"},
                        "source": {"lsn": lsn, "ts_ms": lsn},
                    }}),
                    "topic": "t", "partition": 0, "offset": lsn,
                })
            return spark.createDataFrame(recs, schema=KAFKA_SHAPE)

        def measure(tag, version_base):
            n = lake.current_meta()["n_buckets"]
            fold_walls, shares, tf_list, total_list = [], [], [], []
            for r in range(reps):
                process_batch(wave_batch(1000 + version_base + r,
                                         version_base + r),
                              1000 + version_base + r, lake)
                meta1 = lake.current_meta()
                touched = ParquetLake._delta_touched_buckets(meta1)
                tf_list.append(touched_files(meta1, touched))
                total_list.append(base_file_count(meta1))
                t0 = time.monotonic()
                lake.compact_now(tier="major")
                fold_walls.append(time.monotonic() - t0)
                shares.append(len(touched) / n)
            total_files = int(statistics.median(total_list))
            point_walls = []
            for k in point_keys[:reps]:
                t0 = time.monotonic()
                got = lake.lookup(*k).collect()
                point_walls.append(time.monotonic() - t0)
                assert len(got) == 1, k
            lk_base = [
                f for f in lake.lookup(*point_keys[0]).inputFiles()
                if any("/" + rel + "/" in f
                       for rel in lake.current_meta()["buckets"].values())
            ]
            lk_files = len(lk_base)
            # bytes are the honest pruning metric: one bucket dir is
            # listed either way, but a bucket is table/n_buckets big
            lk_bytes = sum(
                os.path.getsize(f.replace("file:", "")) for f in lk_base
            )
            return {
                "n_buckets": n,
                "base_files_total": total_files,
                "fold_wall_s": round(statistics.median(fold_walls), 3),
                "fold_walls": [round(w, 3) for w in fold_walls],
                "fold_touched_bucket_share": round(statistics.median(shares), 4),
                "fold_touched_files": int(statistics.median(tf_list)),
                "point_lookup_wall_s": round(statistics.median(point_walls), 3),
                "point_walls": [round(w, 3) for w in point_walls],
                "point_lookup_base_files": lk_files,
                "point_lookup_base_mb": round(lk_bytes / 1e6, 2),
            }

        before = measure("before", 0)

        d0 = digest()  # immediately brackets the rebucket: no mutations
        t0 = time.monotonic()
        new_meta = lake.rebucket(N_AFTER)
        rebucket_wall = time.monotonic() - t0
        assert new_meta is not None and new_meta["n_buckets"] == N_AFTER
        d1 = digest()
        assert d0 == d1, (d0, d1)

        after = measure("after", 100)

        out = {
            "n_events": n_events, "n_keys": n_keys, "cpus": cpus,
            "wave_keys": WAVE_KEYS, "reps": reps,
            "rebucket_wall_s": round(rebucket_wall, 3),
            "state_identical_across_rebucket": True,
            "before": before, "after": after,
        }
        print(json.dumps(out))
        print()
        print("| metric | n_buckets=4 | n_buckets=256 (after rebucket) |")
        print("|---|---|---|")
        print(f"| {WAVE_KEYS}-key wave: major-fold touched base share | "
              f"{before['fold_touched_bucket_share']:.0%} "
              f"({before['fold_touched_files']}/{before['base_files_total']} files) | "
              f"{after['fold_touched_bucket_share']:.1%} "
              f"({after['fold_touched_files']}/{after['base_files_total']} files) |")
        print(f"| major-fold median wall | {before['fold_wall_s']} s | "
              f"{after['fold_wall_s']} s |")
        print(f"| point lookup: base bytes listed | "
              f"{before['point_lookup_base_mb']} MB "
              f"({before['point_lookup_base_files']} files) | "
              f"{after['point_lookup_base_mb']} MB "
              f"({after['point_lookup_base_files']} files) |")
        print(f"| point lookup median wall | {before['point_lookup_wall_s']} s | "
              f"{after['point_lookup_wall_s']} s |")
        print(f"| rebucket(256) one-off wall | - | {rebucket_wall:.3f} s |")

        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/rebucket_r05.json", "w") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
