"""SearchIndexSync — the decoupled downstream consumer of the lake's
change feed (the reference's consumer->Meilisearch push loop,
sync.go:71,84,108, re-expressed as bootstrap + O(changes) incremental
syncs over read_changes). The invariant throughout: after any sequence
of ingests, syncs, crashes, folds, and vacuums, the index state equals
the lake state equals the pure-Python oracle, per-row sha256(content)
included (BASELINE.json's per-row invariant).
"""
from __future__ import annotations

import hashlib
import json

import pytest

from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.search_sync import SearchIndexSync
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import process_batch


def _rec(value, off):
    return {"key": None, "value": value, "topic": "t", "partition": 0,
            "offset": off}


def _env(op, after=None, before=None, lsn=0):
    p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn}}
    if after is not None:
        p["after"] = after
    if before is not None:
        p["before"] = before
    return json.dumps({"payload": p})


def _row(i, v, repo="r"):
    return {"repo": repo, "path": f"p{i}", "commit": f"c{v}", "lang": "py",
            "content": f"v{v}-{i}"}


def _feed(spark, lake, bid, recs):
    process_batch(spark.createDataFrame(recs, schema=KAFKA_SHAPE), bid, lake)


def _upsert(i, v, lsn):
    return _rec(_env("u", after=_row(i, v), lsn=lsn), lsn)


def _delete(i, lsn):
    return _rec(_env("d", before={"repo": "r", "path": f"p{i}"}, lsn=lsn), lsn)


def _sha_state(df):
    return {
        (r["repo"], r["path"]):
            hashlib.sha256((r["content"] or "").encode()).hexdigest()
        for r in df.collect()
    }


def _assert_index_matches_lake(sync, lake):
    idx = _sha_state(sync.state())
    lk = _sha_state(lake.read())
    assert idx == lk
    return idx


def test_bootstrap_then_incremental_syncs(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=3, major_every=2,
                       snapshot_retention=50)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)

    _feed(spark, lake, 0, [_upsert(i, 1, i) for i in range(1, 6)])
    s = sync.sync_once()
    assert s["status"] == "bootstrapped" and s["n_rows"] == 5
    _assert_index_matches_lake(sync, lake)

    # incremental: update, insert, delete across several batches + folds
    _feed(spark, lake, 1, [_upsert(1, 2, 10), _delete(2, 11)])
    _feed(spark, lake, 2, [_upsert(6, 1, 12)])
    _feed(spark, lake, 3, [_upsert(3, 3, 13)])
    s = sync.sync_once()
    assert s["status"] == "synced" and s["n_deletes"] == 1
    _assert_index_matches_lake(sync, lake)

    # no changes -> checkpoint advances with no segment
    s0 = sync.sync_once()
    assert s0["status"] == "up_to_date"
    _feed(spark, lake, 4, [_upsert(1, 2, 10)])  # stale duplicate: no change
    s1 = sync.sync_once()
    assert s1["status"] == "synced" and s1["n_rows"] == 0
    _assert_index_matches_lake(sync, lake)


def test_crash_between_segment_and_checkpoint(spark, tmp_path):
    """At-least-once apply + idempotent PK-replace + read-side fencing =
    exactly-once observable state: the orphan segment of a crashed sync
    is invisible to readers and is overwritten by the re-run."""
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=100, snapshot_retention=50)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    _feed(spark, lake, 0, [_upsert(i, 1, i) for i in range(1, 4)])
    sync.sync_once()
    before = _assert_index_matches_lake(sync, lake)

    _feed(spark, lake, 1, [_upsert(1, 2, 10), _upsert(4, 1, 11)])

    class Boom(Exception):
        pass

    def crash():
        raise Boom()

    sync._pre_checkpoint_hook = crash
    with pytest.raises(Boom):
        sync.sync_once()
    # orphan segment exists but is fenced: state unchanged
    assert len(sync._segments(None)) > len(sync._segments(sync.last_synced()))
    assert _sha_state(sync.state()) == before

    # re-run without the crash: the retry overwrites its own orphan and
    # commits
    sync._pre_checkpoint_hook = None
    s = sync.sync_once()
    assert s["status"] == "synced"
    _assert_index_matches_lake(sync, lake)


def test_orphan_segment_cannot_resurrect_after_lake_advances(spark, tmp_path):
    """The sharper orphan case: the crashed sync's segment targets
    snapshot X, but by the time the sync RETRIES the lake has advanced to
    Y > X — the retry writes seg-Y (a different name, so the overwrite
    never touches seg-X) and checkpoints Y, at which point read-side
    fencing (seq <= checkpoint) no longer hides seg-X. A key inserted in
    the orphan's range and deleted before Y has no row in seg-Y (its net
    transition over (F, Y] is absent->absent), so without the orphan
    SWEEP its stale insert in seg-X would be the key's only — and winning
    — row: a deleted document resurrected, permanently."""
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=100, snapshot_retention=50)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    _feed(spark, lake, 0, [_upsert(1, 1, 1)])
    sync.sync_once()  # checkpoint F

    # range (F, X]: key 9 inserted; the sync crashes before checkpointing
    _feed(spark, lake, 1, [_upsert(9, 1, 10)])

    class Boom(Exception):
        pass

    def crash():
        raise Boom()

    sync._pre_checkpoint_hook = crash
    with pytest.raises(Boom):
        sync.sync_once()
    orphan_count = len(sync._segments(None))

    # the lake advances past X before the retry: key 9 deleted
    _feed(spark, lake, 2, [_delete(9, 20)])

    sync._pre_checkpoint_hook = None
    s = sync.sync_once()
    assert s["status"] == "synced"
    # the retry swept the orphan (it is not fenced by seq <= checkpoint
    # anymore), and key 9 must NOT resurrect
    assert len(sync._segments(None)) < orphan_count
    _assert_index_matches_lake(sync, lake)
    assert ("r", "p9") not in _sha_state(sync.state())


def test_vacuum_preserves_state_and_crash_safety(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=100, snapshot_retention=50)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    _feed(spark, lake, 0, [_upsert(i, 1, i) for i in range(1, 6)])
    sync.sync_once()
    _feed(spark, lake, 1, [_delete(2, 10), _upsert(1, 2, 11)])
    sync.sync_once()
    _feed(spark, lake, 2, [_upsert(7, 1, 12), _delete(3, 13)])
    sync.sync_once()
    before = _sha_state(sync.state())
    assert len(sync._segments(sync.last_synced())) == 3

    v = sync.vacuum()
    assert v["status"] == "vacuumed" and v["merged"] == 3
    assert len(sync._segments(sync.last_synced())) == 1
    assert _sha_state(sync.state()) == before

    # tombstone retention through vacuum: simulate the mid-vacuum crash
    # where one OLD segment survives next to the merged one — a deleted
    # key's stale upsert in the survivor must still lose
    _feed(spark, lake, 3, [_upsert(8, 1, 14)])
    sync.sync_once()
    _feed(spark, lake, 4, [_delete(8, 15)])
    sync.sync_once()
    merged_rows = sync.state().count()
    sync.vacuum()
    # the tombstone must be IN the merged segment: if a mid-vacuum crash
    # leaves an old upsert-bearing segment behind, the key's stale row
    # must still lose the max-by to the retained tombstone
    merged_seg = [p for _, p in sync._segments(sync.last_synced())][0]
    tomb = (
        spark.read.option("mergeSchema", "true").parquet(merged_seg)
        .filter("__seg_deleted").filter("path = 'p8'")
    )
    assert tomb.count() == 1  # delete survives the merge
    assert sync.state().count() == merged_rows
    _assert_index_matches_lake(sync, lake)


def test_route_scoped_state(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=100, snapshot_retention=50)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)

    def rec_t(value, off, topic):
        return {"key": None, "value": value, "topic": topic, "partition": 0,
                "offset": off}

    _feed(spark, lake, 0, [
        rec_t(_env("u", after=_row(1, 1), lsn=1), 1, "app_repos"),
        rec_t(_env("u", after=_row(2, 1), lsn=2), 2, "app_docs"),
    ])
    sync.sync_once()
    all_rows = {r["path"]: r["route"] for r in sync.state().collect()}
    assert len(all_rows) == 2
    one = sync.state(route="app_repos").collect()
    assert len(one) == 1 and one[0]["route"] == "app_repos"


def test_resync_after_retention_horizon(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=2, major_every=2,
                       snapshot_retention=3)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    _feed(spark, lake, 0, [_upsert(1, 1, 1)])
    sync.sync_once()
    # ingest far past the horizon: intermediate snapshots expire
    for bid in range(1, 12):
        _feed(spark, lake, bid, [_upsert(bid % 4 + 1, bid, bid + 1)])
    with pytest.raises(ValueError, match="expired"):
        sync.sync_once()
    s = sync.resync()
    assert s["status"] == "bootstrapped"
    _assert_index_matches_lake(sync, lake)


def test_sync_cli_job_end_to_end(spark, tmp_path):
    """The spark-submit deployment shape, in-process: ingest, cron-style
    --once syncs, final index equals the lake."""
    import jobs.sync_search as job

    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=100, snapshot_retention=50)
    _feed(spark, lake, 0, [_upsert(i, 1, i) for i in range(1, 5)])
    rc = job.main(["--table-dir", str(tmp_path / "lake"),
                   "--index-dir", str(tmp_path / "index"), "--once"])
    assert rc == 0
    _feed(spark, lake, 1, [_delete(1, 10), _upsert(5, 1, 11)])
    rc = job.main(["--table-dir", str(tmp_path / "lake"),
                   "--index-dir", str(tmp_path / "index"), "--once",
                   "--vacuum-every", "1"])
    assert rc == 0
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    _assert_index_matches_lake(sync, lake)


def test_per_tenant_sync(spark, tmp_path):
    """route=X makes the sync a per-tenant consumer: its index holds only
    that tenant's documents, matching the lake's route-scoped read, while
    another tenant's churn never surfaces."""
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=1, major_every=1,
                       snapshot_retention=50)

    def rec_t(value, off, topic):
        return {"key": None, "value": value, "topic": topic, "partition": 0,
                "offset": off}

    def up_t(i, v, lsn, topic):
        return rec_t(_env("u", after=_row(i, v), lsn=lsn), lsn, topic)

    _feed(spark, lake, 0, [up_t(1, 1, 1, "ta"), up_t(2, 1, 2, "tb")])
    lake.compact_every = 100
    sync_a = SearchIndexSync(spark, str(tmp_path / "idx_a"), lake, route="ta")
    s = sync_a.sync_once()
    assert s["status"] == "bootstrapped" and s["n_rows"] == 1

    # tb-only churn: ta's incremental sync ships zero rows
    _feed(spark, lake, 1, [up_t(2, 2, 10, "tb"), up_t(3, 1, 11, "tb")])
    s = sync_a.sync_once()
    assert s["status"] == "synced" and s["n_rows"] == 0
    # ta churn shows up
    _feed(spark, lake, 2, [up_t(1, 2, 12, "ta")])
    s = sync_a.sync_once()
    assert s["n_rows"] == 1

    idx = _sha_state(sync_a.state())
    lk = _sha_state(lake.read(route="ta"))
    assert idx == lk and set(idx) == {("r", "p1")}


def test_sync_after_source_rollback_requires_and_survives_resync(
    spark, tmp_path
):
    """A lake rollback across a consumer's checkpoint makes the
    incremental range undefined (rolled-back row versions in the range's
    delta files would classify as live changes), so the next sync raises
    the loud rollback error and resync() reconverges the index on the
    restored state."""
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=100, snapshot_retention=50)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    _feed(spark, lake, 0, [_upsert(i, 1, i) for i in range(1, 4)])
    good = lake.current_meta()["id"]
    sync.sync_once()

    # the bad batch lands, the consumer syncs it, THEN the lake rolls back
    _feed(spark, lake, 1, [_upsert(1, 666, 10), _upsert(9, 666, 11)])
    sync.sync_once()
    assert ("r", "p9") in _sha_state(sync.state())
    lake.rollback_to(good)
    _feed(spark, lake, 2, [_upsert(2, 2, 12)])

    with pytest.raises(ValueError, match="crosses a rollback"):
        sync.sync_once()
    s = sync.resync()
    assert s["status"] == "bootstrapped"
    _assert_index_matches_lake(sync, lake)
    assert ("r", "p9") not in _sha_state(sync.state())
