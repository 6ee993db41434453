"""Snapshot expiry / orphan GC (`ParquetLake.expire_snapshots`) — the
Iceberg expire_snapshots + remove_orphan_files analog that bounds disk
growth of the long-running tail job (reference: the Go consumer keeps no
history at all — Meilisearch holds only current state — so ANY retained
snapshot is already strictly more than parity; expiry is what keeps that
extra capability affordable at 10^10 events).

The data-loss-class subtlety under test: after a SUBSET major fold, the
new snapshot's bucket map references untouched bucket dirs inside OLDER
s-trees (carry-forward by manifest reference). Expiry must therefore
treat a data dir as live when ANY kept snapshot references ANY bucket
inside it — deleting an old s-tree whose buckets are still carried
forward would corrupt the current table, not just history."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import process_batch

from test_mor import _buckets_of, _mk_rec_helpers, _rows


def _data_dirs(lake):
    root = os.path.join(lake.table_dir, "data")
    return set(os.listdir(root)) if os.path.isdir(root) else set()


def _snap_ids(lake):
    return sorted(
        int(f[len("snap-"):-len(".json")])
        for f in os.listdir(lake._meta_dir)
        if f.startswith("snap-") and f.endswith(".json")
    )


def test_expire_keeps_carried_forward_buckets_and_drops_the_rest(
    spark, tmp_path
):
    _rec, upsert, delete = _mk_rec_helpers()
    n_buckets = 8
    keys = [("org/r", f"src/f{i}.py") for i in range(40)]
    kb = _buckets_of(spark, keys, n_buckets)
    by_bucket = {}
    for k, b in kb.items():
        by_bucket.setdefault(b, []).append(k)
    hot = by_bucket[sorted(by_bucket)[0]]  # keys in ONE bucket

    lake = ParquetLake(
        spark, str(tmp_path / "mor"), n_buckets=n_buckets, mode="mor",
        compact_every=2, major_every=1,
    )

    def feed(bid, recs_):
        process_batch(
            spark.createDataFrame(recs_, schema=KAFKA_SHAPE), bid, lake)

    # batch 0: all keys; batch 1 triggers the first (whole-table) major.
    feed(0, [upsert(r, p, 1 + i) for i, (r, p) in enumerate(keys)])
    feed(1, [upsert(*hot[0], 100)])
    # two more waves confined to the hot bucket -> each major rewrites
    # ONLY that bucket; the other 7 carry forward by manifest reference.
    feed(2, [upsert(*hot[0], 200), delete(*hot[1], 210)])
    feed(3, [upsert(*hot[0], 300)])
    feed(4, [upsert(*hot[2], 400)])
    feed(5, [upsert(*hot[0], 500)])

    meta = lake.current_meta()
    assert meta["deltas"] == []  # fully compacted
    trees = {
        p.split(os.sep)[1] for p in meta["buckets"].values()
    }
    assert len(trees) >= 2, (
        "precondition: the current snapshot must reference buckets in "
        f"more than one s-tree (carry-forward), saw {trees}"
    )

    before_rows = _rows(lake)
    snaps_before = _snap_ids(lake)
    assert len(snaps_before) > 3
    prev_id = meta["id"] - 1
    prev_rows = {
        (r["repo"], r["path"]): r["content"]
        for r in lake.read(snapshot_id=prev_id).collect()
    }

    # an unreferenced leftover dir (e.g. a crashed writer's tree) must go
    orphan = os.path.join(lake.table_dir, "data", "zzz_orphan")
    os.makedirs(orphan)

    stats = lake.expire_snapshots(keep_last=2)
    assert stats["removed_snapshots"] == len(snaps_before) - 2
    assert stats["removed_dirs"] >= 1

    # 1) only the newest two snapshot manifests remain
    assert _snap_ids(lake) == [prev_id, meta["id"]]

    # 2) current state is untouched — including every carried-forward
    #    bucket that lives in an older s-tree
    assert _rows(lake) == before_rows
    dirs = _data_dirs(lake)
    assert trees <= dirs
    assert "zzz_orphan" not in dirs

    # 3) time travel within the kept horizon still works...
    after_prev = {
        (r["repo"], r["path"]): r["content"]
        for r in lake.read(snapshot_id=prev_id).collect()
    }
    assert after_prev == prev_rows

    # ...and an expired snapshot is gone, loudly
    with pytest.raises(Exception):
        lake.snapshot_meta(snaps_before[0])

    # 4) point lookups (one-bucket reads) survive expiry on both a
    #    carried-forward key and a hot-bucket key
    cold_key = by_bucket[sorted(by_bucket)[1]][0]
    got = lake.lookup(*cold_key).collect()
    assert len(got) == 1
    assert got[0]["content"] == before_rows[cold_key]["content"]
    assert lake.lookup(*hot[0]).collect()[0]["content"] == "v500"

    # 5) the lake keeps working after expiry: new batch, new major
    feed(6, [upsert(*hot[1], 600)])
    feed(7, [upsert(*hot[0], 700)])
    final = _rows(lake)
    assert final[hot[1]]["content"] == "v600"
    assert final[hot[0]]["content"] == "v700"
    assert len(final) == len(before_rows) + 1  # hot[1] was deleted, revived
