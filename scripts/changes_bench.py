#!/usr/bin/env python3
"""Incremental change read (read_changes) vs the no-CDF consumer baseline.

A downstream consumer without a change feed must diff two full table
reads (read(A) full-outer-join read(B)) to find what changed — 2x the
table scanned and a table-wide shuffle join, per sync. read_changes
extracts the same net changes from the range's delta files plus the
touched FROM-snapshot buckets only. This script builds the standard
bench lake shape (clean base across all 64 buckets = snapshot A, then a
change wave confined to 4 buckets by the engine's own bucket
expression = snapshot B) and interleaves timed runs of both arms on the
SAME lake state (host drift hits both equally):

  * arm cdf:  read_changes(A, B) — range deltas + touched buckets;
  * arm diff: full-outer join of read(A) and read(B) with a row-hash
    comparison — what the consumer would otherwise run;

after first asserting (untimed, distributed) that applying the cdf arm's
changes to the A-state reproduces the B-state exactly (count +
order-insensitive whole-row sha256), and that both arms agree on the
changed-key count.

Run: python scripts/changes_bench.py [n_events] [n_keys] [reps] [content_words]
(defaults 8_000_000 / 800_000 / 5 / 8; content_words=8 keeps the full
table scan — the thing the cdf arm avoids — document-shaped).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else max(2_000, n_events // 10)
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    content_words = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_buckets = 64
    subset_max_bucket = 4  # change wave confined to buckets 0..3

    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchutil import with_key_bucket

    from pyspark_cdc import generate
    from pyspark_cdc.schemas import KEY_COLS
    from pyspark_cdc.session import get_spark
    from pyspark_cdc.sink import CHANGE_TYPE_COL, ParquetLake
    from pyspark_cdc.stream import process_batch, replay_batch

    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pyspark_cdc_changesbench_")
    try:
        # ---- base wave folded into a clean base = snapshot A
        log_dir = os.path.join(work, "log_base")
        generate.write_log(
            spark, log_dir, n_events=n_events, n_keys=n_keys,
            n_files=8, include_edge_cases=False,
            content_words=content_words,
        )
        lake_dir = os.path.join(work, "lake")
        lake = ParquetLake(spark, lake_dir, n_buckets=n_buckets, mode="mor",
                           compact_every=10**9, snapshot_retention=10**6)
        replay_batch(spark, log_dir, lake, batch_id=0)
        lake._commit_snapshot(
            lake._compact(lake.current_meta(), full=True))
        a_id = lake.current_meta()["id"]

        # ---- change wave: 3 batches confined to buckets < subset_max_bucket,
        # sliced from the TAIL of the same deterministic stream so every
        # wave event is strictly NEWER than the base (lsn = id + base)
        wave_n = max(50_000, n_events // 120)
        stream = generate.bulk_events_df(
            spark, n_events + 3 * wave_n, n_keys=n_keys,
            content_words=content_words,
        )
        stream_b = with_key_bucket(stream, n_buckets)
        lo = n_events + generate.BULK_LSN_BASE
        for i in range(3):
            wave = stream_b.where(
                (F.col("offset") >= lo + i * wave_n)
                & (F.col("offset") < lo + (i + 1) * wave_n)
                & (F.col("__bench_bucket") < subset_max_bucket)
            ).drop("__bench_bucket")
            process_batch(wave, i + 1, lake)
        b_id = lake.current_meta()["id"]
        meta = lake.current_meta()
        from_meta = lake.snapshot_meta(a_id)

        range_bytes = sum(d["bytes"] for d in meta["deltas"])
        base_bytes = sum(
            lake._tree_bytes(os.path.join(lake_dir, rel))
            for rel in from_meta["buckets"].values())
        touched = lake._delta_touched_buckets(meta)
        touched_bytes = sum(
            lake._tree_bytes(os.path.join(lake_dir, from_meta["buckets"][str(b)]))
            for b in touched if str(b) in from_meta["buckets"])

        def cdf_arm():
            return lake.read_changes(a_id, b_id)

        def diff_arm():
            """The no-CDF consumer: diff two full reads by row hash."""
            ha = lake.read(snapshot_id=a_id).withColumn(
                "__h", F.sha2(F.to_json(F.struct("*")), 256))
            hb = lake.read(snapshot_id=b_id).withColumn(
                "__h", F.sha2(F.to_json(F.struct("*")), 256))
            j = ha.select(*KEY_COLS, F.col("__h").alias("__ha")).join(
                hb.select(*KEY_COLS, F.col("__h").alias("__hb")),
                KEY_COLS, "full_outer")
            return j.filter(
                F.col("__ha").isNull() | F.col("__hb").isNull()
                | (F.col("__ha") != F.col("__hb")))

        def timed(df) -> float:
            t0 = time.monotonic()
            df.agg(F.count("*"),
                   F.sum(F.pmod(F.xxhash64(*KEY_COLS), F.lit(1_000_000)))
                   ).collect()
            return time.monotonic() - t0

        # ---- equality gates (untimed, distributed): applying the cdf
        # changes to the A-state reproduces the B-state
        def fingerprint(df):
            cols = sorted(c for c in df.columns)
            h = df.select(F.sha2(F.to_json(F.struct(*cols)), 256).alias("h"))
            row = h.agg(
                F.count("*").alias("n"),
                F.sha2(F.concat_ws(
                    "", F.sort_array(F.collect_list("h"))), 256).alias("s"),
            ).collect()[0]
            return row["n"], row["s"]

        changes = cdf_arm()
        upserts = changes.filter(
            F.col(CHANGE_TYPE_COL) != "delete").drop(CHANGE_TYPE_COL)
        ckeys = changes.select(*KEY_COLS)
        applied = (
            lake.read(snapshot_id=a_id)
            .join(F.broadcast(ckeys), KEY_COLS, "left_anti")
            .unionByName(upserts, allowMissingColumns=True)
        )
        fp_applied = fingerprint(applied)
        fp_b = fingerprint(lake.read(snapshot_id=b_id))
        assert fp_applied == fp_b, (
            f"applying changes to A-state diverged from B-state: "
            f"{fp_applied} vs {fp_b}")
        n_changes = changes.count()
        n_diff = diff_arm().count()
        assert n_changes >= n_diff, (n_changes, n_diff)

        files_cdf = len(cdf_arm().inputFiles())
        files_diff = len(set(diff_arm().inputFiles()))

        walls = {"cdf": [], "diff": []}
        timed(cdf_arm())  # warm-up
        timed(diff_arm())
        for _ in range(reps):
            walls["cdf"].append(timed(cdf_arm()))
            walls["diff"].append(timed(diff_arm()))
        med = {k: statistics.median(v) for k, v in walls.items()}

        out = {
            "n_events_base": n_events,
            "content_words": content_words,
            "n_buckets": n_buckets,
            "touched_buckets": len(touched),
            "range_delta_bytes": range_bytes,
            "touched_base_bytes": touched_bytes,
            "full_base_bytes": base_bytes,
            "bytes_share_cdf": round(
                (range_bytes + touched_bytes) / (2 * base_bytes), 4),
            "n_changes": n_changes,
            "n_diff_rows": n_diff,
            "files_listed_cdf": files_cdf,
            "files_listed_diff": files_diff,
            "reps_per_arm": reps,
            "cdf_wall_s": round(med["cdf"], 3),
            "diff_wall_s": round(med["diff"], 3),
            "cdf_walls": [round(w, 3) for w in walls["cdf"]],
            "diff_walls": [round(w, 3) for w in walls["diff"]],
            "speedup": round(med["diff"] / med["cdf"], 2) if med["cdf"] else None,
            "apply_equals_b_state": True,
        }
        print(json.dumps(out))
        print()
        print("| arm | files listed | data-dependent bytes | median wall (s) |")
        print("|---|---|---|---|")
        print(f"| read_changes | {files_cdf} | "
              f"{range_bytes + touched_bytes:,} | {med['cdf']:.3f} |")
        print(f"| full-read diff | {files_diff} | "
              f"{2 * base_bytes:,} | {med['diff']:.3f} |")
        return 0
    finally:
        import shutil
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
