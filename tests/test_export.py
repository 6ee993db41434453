"""Change-log export — the lake as a CDC producer (outbox / lake→lake
replication). Invariant: a replica lake fed ONLY the exported envelope
chunks lands on the source lake's state row-for-row, across folds,
schema evolution, deletes, duplicate re-application, and out-of-order
chunk delivery (the exported ordering tokens make replication compose
with LWW exactly like primary ingest)."""
from __future__ import annotations

import json

from pyspark_cdc.export import export_changes_log
from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import process_batch, replay_batch


def _rec(value, off, topic="t"):
    return {"key": None, "value": value, "topic": topic, "partition": 0,
            "offset": off}


def _env(op, after=None, before=None, lsn=0):
    p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn}}
    if after is not None:
        p["after"] = after
    if before is not None:
        p["before"] = before
    return json.dumps({"payload": p})


def _row(i, v, extra=None):
    r = {"repo": "r", "path": f"p{i}", "commit": f"c{v}", "lang": "py",
         "content": f"v{v}-{i}"}
    if extra:
        r.update(extra)
    return r


def _feed(spark, lake, bid, recs):
    process_batch(spark.createDataFrame(recs, schema=KAFKA_SHAPE), bid, lake)


def _upsert(i, v, lsn, extra=None, topic="t"):
    return _rec(_env("u", after=_row(i, v, extra), lsn=lsn), lsn, topic)


def _delete(i, lsn):
    return _rec(_env("d", before={"repo": "r", "path": f"p{i}"}, lsn=lsn), lsn)


def _state(lake):
    return {
        (r["repo"], r["path"]): {k: v for k, v in r.asDict().items()}
        for r in lake.read().collect()
    }


def _norm(states):
    cols = {c for s in states for r in s.values() for c in r}
    return [
        {k: {c: r.get(c) for c in cols} for k, r in s.items()} for s in states
    ]


def test_lake_to_lake_replication(spark, tmp_path):
    src = ParquetLake(spark, str(tmp_path / "src"), n_buckets=4,
                      mode="mor", compact_every=2, major_every=2,
                      snapshot_retention=50)
    rep = ParquetLake(spark, str(tmp_path / "rep"), n_buckets=8, mode="mor",
                      compact_every=100)

    # chunk 1: bootstrap-ish range incl. evolution + a soft-delete-ish mix
    _feed(spark, src, 0, [_upsert(i, 1, i) for i in range(1, 6)])
    _feed(spark, src, 1, [_upsert(1, 2, 10, extra={"branch": "rel/1"}),
                          _delete(2, 11)])
    a = src.current_meta()["id"]
    export_changes_log(src, 0, str(tmp_path / "log1"), to_snapshot_id=a)
    replay_batch(spark, str(tmp_path / "log1"), rep, batch_id=0)

    # chunk 2: update / re-insert / delete across more folds
    _feed(spark, src, 2, [_upsert(2, 9, 20), _delete(3, 21)])
    _feed(spark, src, 3, [_upsert(6, 1, 22, extra={"branch": "rel/2"})])
    b = src.current_meta()["id"]
    export_changes_log(src, a, str(tmp_path / "log2"), to_snapshot_id=b)
    replay_batch(spark, str(tmp_path / "log2"), rep, batch_id=1)

    s, r = _norm([_state(src), _state(rep)])
    assert s == r and s

    # duplicate re-application of chunk 2 is a no-op (LWW idempotency)
    replay_batch(spark, str(tmp_path / "log2"), rep, batch_id=2)
    s2, r2 = _norm([_state(src), _state(rep)])
    assert s2 == r2

    # the replica is itself a CDC producer: its own change feed works
    assert rep.read_changes(0).count() == len(s)


def test_out_of_order_chunk_delivery_converges(spark, tmp_path):
    src = ParquetLake(spark, str(tmp_path / "src"), n_buckets=4,
                      mode="mor", compact_every=100, snapshot_retention=50)
    _feed(spark, src, 0, [_upsert(1, 1, 1), _upsert(2, 1, 2)])
    a = src.current_meta()["id"]
    _feed(spark, src, 1, [_upsert(1, 2, 10), _delete(2, 11)])
    b = src.current_meta()["id"]
    export_changes_log(src, 0, str(tmp_path / "log1"), to_snapshot_id=a)
    export_changes_log(src, a, str(tmp_path / "log2"), to_snapshot_id=b)

    # chunk 2 applied BEFORE chunk 1: the exported ordering tokens make
    # the stale chunk lose LWW per key, exactly like late Kafka replays
    rep = ParquetLake(spark, str(tmp_path / "rep"), n_buckets=2, mode="mor",
                      compact_every=100)
    replay_batch(spark, str(tmp_path / "log2"), rep, batch_id=0)
    replay_batch(spark, str(tmp_path / "log1"), rep, batch_id=1)
    s, r = _norm([_state(src), _state(rep)])
    assert s == r


def test_route_scoped_export_and_empty_range(spark, tmp_path):
    src = ParquetLake(spark, str(tmp_path / "src"), n_buckets=4,
                      mode="mor", compact_every=100, snapshot_retention=50)
    _feed(spark, src, 0, [_upsert(1, 1, 1, topic="ta"),
                          _upsert(2, 1, 2, topic="tb")])
    b = src.current_meta()["id"]
    stats = export_changes_log(src, 0, str(tmp_path / "log_ta"), route="ta")
    assert stats["n_records"] == 1
    rep = ParquetLake(spark, str(tmp_path / "rep"), n_buckets=2, mode="mor",
                      compact_every=100)
    replay_batch(spark, str(tmp_path / "log_ta"), rep, batch_id=0)
    got = _state(rep)
    assert set(got) == {("r", "p1")}
    assert got[("r", "p1")]["route"] == "ta"  # topic round-trips to route

    # empty range still writes a valid, re-ingestable empty log
    stats = export_changes_log(src, b, str(tmp_path / "log_empty"),
                               to_snapshot_id=b)
    assert stats["n_records"] == 0
    replay_batch(spark, str(tmp_path / "log_empty"), rep, batch_id=1)
    assert _state(rep) == got


def src_lake_refs(lake):
    return lake.refs()


def test_export_cli_checkpointed_chunks(spark, tmp_path):
    """The cron deployment: --full bootstrap chunk, then incremental
    chunks since the checkpoint; a replica ingesting the chunk series
    equals the source."""
    import jobs.export_changes as job

    src = ParquetLake(spark, str(tmp_path / "src"), n_buckets=4,
                      mode="mor", compact_every=100, snapshot_retention=50)
    _feed(spark, src, 0, [_upsert(i, 1, i) for i in range(1, 4)])
    out = str(tmp_path / "outbox")

    # incremental before bootstrap fails loudly
    rc = job.main(["--table-dir", str(tmp_path / "src"), "--out-dir", out])
    assert rc == 2
    assert job.main(["--table-dir", str(tmp_path / "src"),
                     "--out-dir", out, "--full", "--pin"]) == 0
    _feed(spark, src, 1, [_upsert(1, 2, 10), _delete(2, 11)])
    assert job.main(["--table-dir", str(tmp_path / "src"),
                     "--out-dir", out, "--pin"]) == 0
    assert src_lake_refs(src) == {"outbox:outbox": src.current_meta()["id"]}
    # up-to-date run produces no new chunk
    assert job.main(["--table-dir", str(tmp_path / "src"),
                     "--out-dir", out]) == 0
    import os
    chunks = sorted(d for d in os.listdir(out) if d.startswith("chunk-"))
    assert len(chunks) == 2

    rep = ParquetLake(spark, str(tmp_path / "rep"), n_buckets=2, mode="mor",
                      compact_every=100)
    for i, c in enumerate(chunks):
        replay_batch(spark, os.path.join(out, c), rep, batch_id=i)
    s, r = _norm([_state(src), _state(rep)])
    assert s == r


def test_replication_of_a_migrating_lake(spark, tmp_path):
    """The exporter must stay per-key on a route_stable_keys=False
    source: a migrated key ships as ONE update carrying the new route —
    never as the per-route arrival+departure pair, whose delete rides
    the same ordering tokens as the upsert and would leave the replica's
    per-key LWW to coin-flip the key into deletion. The replica (also a
    migrating-routes lake) then serves exact tenant reads of its own."""
    src = ParquetLake(spark, str(tmp_path / "src"), n_buckets=4,
                      mode="mor", compact_every=2, major_every=2,
                      snapshot_retention=50, route_stable_keys=False)
    rep = ParquetLake(spark, str(tmp_path / "rep"), n_buckets=8, mode="mor",
                      compact_every=100, route_stable_keys=False)

    _feed(spark, src, 0, [_upsert(1, 1, 1, topic="A"),
                          _upsert(2, 1, 2, topic="B")])
    a = src.current_meta()["id"]
    export_changes_log(src, 0, str(tmp_path / "m1"), to_snapshot_id=a)
    replay_batch(spark, str(tmp_path / "m1"), rep, batch_id=0)

    # k1 migrates A->B; k2 deleted via an envelope routed A (the
    # migration+delete composite)
    _feed(spark, src, 1, [
        _upsert(1, 2, 10, topic="B"),
        _rec(_env("d", before={"repo": "r", "path": "p2"}, lsn=11), 11, "A"),
    ])
    b = src.current_meta()["id"]
    export_changes_log(src, a, str(tmp_path / "m2"), to_snapshot_id=b)
    replay_batch(spark, str(tmp_path / "m2"), rep, batch_id=1)

    src_rows = sorted((r["repo"], r["path"], r["route"], r["content"])
                      for r in src.read().collect())
    rep_rows = sorted((r["repo"], r["path"], r["route"], r["content"])
                      for r in rep.read().collect())
    assert rep_rows == src_rows == [("r", "p1", "B", "v2-1")]

    # the replica's own tenant reads are migration-exact too
    from pyspark.sql import functions as F
    for rt in ("A", "B"):
        got = sorted((r["repo"], r["path"]) for r in
                     rep.read(route=rt).collect())
        want = sorted((r["repo"], r["path"]) for r in
                      rep.read().filter(F.col("route") == rt).collect())
        assert got == want, rt


def test_route_scoped_export_carries_departures(spark, tmp_path):
    """A per-tenant export of a migrating lake must ship the departure
    delete (within one route's feed arrival and departure can never tie
    — they always carry different routes), or the tenant replica serves
    the migrated-away document forever."""
    src = ParquetLake(spark, str(tmp_path / "src"), n_buckets=4,
                      mode="mor", compact_every=None, snapshot_retention=50,
                      route_stable_keys=False)
    rep = ParquetLake(spark, str(tmp_path / "rep"), n_buckets=4, mode="mor",
                      compact_every=100, route_stable_keys=False)

    _feed(spark, src, 0, [_upsert(1, 1, 1, topic="X"),
                          _upsert(2, 1, 2, topic="X")])
    a = src.current_meta()["id"]
    export_changes_log(src, 0, str(tmp_path / "x1"), to_snapshot_id=a,
                       route="X")
    replay_batch(spark, str(tmp_path / "x1"), rep, batch_id=0)
    assert rep.read().count() == 2

    # k1 migrates X -> Y
    _feed(spark, src, 1, [_upsert(1, 2, 10, topic="Y")])
    b = src.current_meta()["id"]
    out = export_changes_log(src, a, str(tmp_path / "x2"), to_snapshot_id=b,
                             route="X")
    assert out["n_records"] == 1  # the departure delete
    replay_batch(spark, str(tmp_path / "x2"), rep, batch_id=1)

    rows = sorted((r["repo"], r["path"]) for r in rep.read().collect())
    assert rows == [("r", "p2")], "migrated-away key must leave the replica"
