#!/usr/bin/env python3
"""Row-group skipping from key-sorted base files — quantifying the
SCALING.md §9 claim.

The fold's SortAggregate leaves every base file sorted by (repo, path)
(tests/test_sorted_base.py pins it), so parquet row-group min/max stats
on the key columns are TIGHT and a point lookup's pushed key predicate
skips row groups inside the bucket. This script builds one big base
bucket the engine's own way (sorted), clones it with rows shuffled (what
a hash-aggregate fold or a post-fold exchange would produce), and
measures the same pushed-predicate point read against both:

  * structural metric (host-independent): row groups whose [min, max]
    key range CONTAINS the probed key — the groups a reader must
    decompress — counted from the parquet footers;
  * wall metric: median of interleaved timed reads, same predicate,
    same file sizes, same host window for both arms.

Run: python scripts/sorted_lookup_bench.py [n_events] [n_keys] [probes] [reps]
(defaults 4_000_000 / 400_000 / 8 / 5; one bucket so the whole table is
one file with many row groups — the worst case sortedness has to help).
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
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else max(2_000, n_events // 10)
    probes = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pyspark_cdc import generate
    from pyspark_cdc.session import get_spark
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import replay_batch

    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # small parquet row groups so a file holds MANY of them — the
    # scaled-down model of a multi-GB production bucket with 128 MB
    # groups; without this the sandbox-sized bucket is 1-2 groups and
    # there is nothing to skip either way
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(2 * 1024 * 1024))
    work = tempfile.mkdtemp(prefix="pyspark_cdc_sortbench_")
    try:
        log_dir = os.path.join(work, "log")
        generate.write_log(
            spark, log_dir, n_events=n_events, n_keys=n_keys, n_files=8,
            include_edge_cases=False, content_words=8,
        )
        lake = ParquetLake(spark, os.path.join(work, "lake"), n_buckets=1,
                           mode="mor", compact_every=10**9)
        replay_batch(spark, log_dir, lake, batch_id=0)
        lake._commit_snapshot(lake._compact(lake.current_meta(), full=True))

        meta = lake.current_meta()
        bucket_rel = meta["buckets"]["0"]
        sorted_dir = os.path.join(work, "lake", bucket_rel)

        # shuffled clone: same rows, same schema, pseudo-random order —
        # what a non-sort-preserving fold would write
        def files(d):
            return sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(d) for f in fs
                if f.endswith(".parquet")
            )

        shuffled_dir = os.path.join(work, "shuffled_bucket")
        src = spark.read.parquet(sorted_dir)
        # same file count as the engine's layout so the arms differ ONLY
        # in row order (file sizes, group sizes, and task fan-out match)
        (src.repartition(len(files(sorted_dir)))
            .sortWithinPartitions(F.xxhash64("repo", "path", "content"))
            .write.mode("overwrite").parquet(shuffled_dir))

        def qualifying_row_groups(d, key):
            """Row groups whose key-range contains the probe — the groups
            a pushed predicate cannot skip."""
            repo, path = key
            total = hit = 0
            for fp in files(d):
                md = pq.ParquetFile(fp).metadata
                idx = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    total += 1
                    rs = rg.column(idx["repo"]).statistics
                    ps = rg.column(idx["path"]).statistics
                    # parquet prunes per COLUMN independently — exactly
                    # what the reader's pushed predicate can use
                    if (rs.min <= repo <= rs.max
                            and ps.min <= path <= ps.max):
                        hit += 1
            return hit, total

        # probe keys drawn from the table, spread across its key space
        keys = [
            (r["repo"], r["path"])
            for r in (spark.read.parquet(sorted_dir)
                      .select("repo", "path").distinct()
                      .orderBy(F.xxhash64("repo", "path")).limit(probes)
                      .collect())
        ]

        struct = {"sorted": [0, 0], "shuffled": [0, 0]}
        for k in keys:
            for arm, d in (("sorted", sorted_dir), ("shuffled", shuffled_dir)):
                h, t = qualifying_row_groups(d, k)
                struct[arm][0] += h
                struct[arm][1] += t

        def timed(d, key):
            repo, path = key
            t0 = time.monotonic()
            (spark.read.parquet(d)
             .filter((F.col("repo") == repo) & (F.col("path") == path))
             .collect())
            return time.monotonic() - t0

        walls = {"sorted": [], "shuffled": []}
        timed(sorted_dir, keys[0])  # warm-up
        timed(shuffled_dir, keys[0])
        for _ in range(reps):
            for k in keys:
                walls["sorted"].append(timed(sorted_dir, k))
                walls["shuffled"].append(timed(shuffled_dir, k))
        med = {a: statistics.median(w) for a, w in walls.items()}

        out = {
            "n_events": n_events,
            "n_probes": len(keys),
            "reps": reps,
            "rowgroups_qualifying_sorted": struct["sorted"][0],
            "rowgroups_qualifying_shuffled": struct["shuffled"][0],
            "rowgroups_total_per_probe": struct["sorted"][1] // max(len(keys), 1),
            "sorted_lookup_wall_s": round(med["sorted"], 4),
            "shuffled_lookup_wall_s": round(med["shuffled"], 4),
            "speedup": round(med["shuffled"] / med["sorted"], 2)
            if med["sorted"] else None,
        }
        print(json.dumps(out))
        print()
        print("| layout | qualifying row groups (all probes) | median lookup wall (s) |")
        print("|---|---|---|")
        print(f"| key-sorted (engine) | {struct['sorted'][0]} | {med['sorted']:.4f} |")
        print(f"| shuffled (counterfactual) | {struct['shuffled'][0]} | {med['shuffled']:.4f} |")
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
