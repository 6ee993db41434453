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


def _pin_helpers():
    import json

    from pyspark_cdc.schemas import KAFKA_SHAPE
    from pyspark_cdc.stream import process_batch

    def env(op, after=None, before=None, lsn=0):
        p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn}}
        if after is not None:
            p["after"] = after
        if before is not None:
            p["before"] = before
        return json.dumps({"payload": p})

    def upsert(i, v, lsn):
        after = {"repo": "r", "path": f"p{i}", "commit": f"c{v}",
                 "lang": "py", "content": f"v{v}"}
        return {"key": None, "value": env("u", after=after, lsn=lsn),
                "topic": "t", "partition": 0, "offset": lsn}

    def feed(spark, lake, bid, recs):
        process_batch(
            spark.createDataFrame(recs, schema=KAFKA_SHAPE), bid, lake)

    return upsert, feed


def test_pinned_ref_protects_consumer_horizon(spark, tmp_path):
    """A pinned ref (the Iceberg tag analog) keeps the whole manifest
    chain from the pin forward, so a slow incremental consumer survives
    retention that would otherwise expire its range; unpinning releases
    the history on the next expire pass."""
    from pyspark_cdc.sink import ParquetLake

    upsert, feed = _pin_helpers()
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=2, major_every=2,
                       snapshot_retention=3)
    feed(spark, lake, 0, [upsert(1, 1, 1)])
    a = lake.current_meta()["id"]
    lake.pin_snapshot("consumer", a)

    # far past the unpinned horizon, with folds expiring aggressively
    for bid in range(1, 12):
        feed(spark, lake, bid, [upsert(bid % 4 + 1, bid, bid + 1)])
    # the pinned range is still fully readable
    ch = lake.read_changes(a)
    assert ch.count() > 0
    assert lake.refs() == {"consumer": a}

    # re-pin forward: old history becomes expirable, new range survives
    b = lake.current_meta()["id"]
    lake.pin_snapshot("consumer", b)
    feed(spark, lake, 12, [upsert(1, 99, 99)])
    lake.expire_snapshots(keep_last=3)
    assert lake.read_changes(b).count() > 0
    import pytest
    with pytest.raises(ValueError, match="expired"):
        lake.read_changes(a)

    # unpin: nothing beyond keep_last survives the next pass (keep_last=1
    # expires b itself — it sits more than one snapshot behind current)
    lake.unpin_snapshot("consumer")
    assert lake.refs() == {}
    lake.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        lake.read_changes(b)

    # pinning a gone snapshot refuses
    with pytest.raises(ValueError, match="expired|exist"):
        lake.pin_snapshot("late", a)


def test_sync_with_pin_survives_retention(spark, tmp_path):
    """A pinning consumer is never outrun: the same scenario that forces
    --resync for an unpinned sync (test_resync_after_retention_horizon)
    stays incremental when pin=True."""
    from pyspark_cdc.search_sync import SearchIndexSync
    from pyspark_cdc.sink import ParquetLake

    upsert, feed = _pin_helpers()
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=2, major_every=2,
                       snapshot_retention=3)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake, pin=True)
    feed(spark, lake, 0, [upsert(1, 1, 1)])
    sync.sync_once()
    for bid in range(1, 12):
        feed(spark, lake, bid, [upsert(bid % 4 + 1, bid, bid + 1)])
    s = sync.sync_once()  # would raise without the pin
    assert s["status"] == "synced"
    idx = {(r["repo"], r["path"]): r["content"]
           for r in sync.state().collect()}
    lk = {(r["repo"], r["path"]): r["content"]
          for r in lake.read().collect()}
    assert idx == lk
