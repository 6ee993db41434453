"""Incremental dedup-on-ingest: LSH band signatures are computed once
per WINNING row version — the post-LWW fill (signatures.fill_band_columns)
runs after every resolve in the lake (sink minhash_bands=True), so losing
versions never pay the shingle cost and stored signatures ride later
folds untouched. After ANY number of batches, updates, deletes, revives,
and compactions (both tiers), the STORED signatures must equal a
from-scratch recomputation over the final visible content. That equality
is the whole incremental-dedup contract (the driver row
dedup_lake_signatures re-proves it against an independent DuckDB
oracle)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.signatures import SIG_COLS, with_band_columns
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


def _upsert(repo, path, lsn, content):
    return _rec(_env("c", after={
        "repo": repo, "path": path, "commit": f"c{lsn}", "lang": "py",
        "content": content}, lsn=lsn), lsn)


def _delete(repo, path, lsn):
    return _rec(_env("d", before={"repo": repo, "path": path}, lsn=lsn), lsn)


def _content(i, v):
    # word-y content so shingling is non-trivial; near-dup pairs exist
    # (same i, different version => shared prefix shingles)
    base = f"the quick brown fox jumps over doc {i} lazy dog "
    return base * 3 + f"version {v} tail token"


def test_incremental_signatures_equal_from_scratch(spark, tmp_path):
    lake = ParquetLake(
        spark, str(tmp_path / "lake"), n_buckets=4, mode="mor",
        compact_every=2, major_every=2, minhash_bands=True,
    )

    def feed(bid, recs_):
        process_batch(
            spark.createDataFrame(recs_, schema=KAFKA_SHAPE), bid, lake)

    # 6 batches: creates, updates (signature must follow the WINNING
    # version), a delete, a revive, a dead letter — spanning a MAJOR
    # fold, a MINOR fold, and an un-compacted tail backlog
    feed(0, [_upsert("r", f"p{i}", 10 + i, _content(i, 1)) for i in range(8)])
    feed(1, [_upsert("r", "p0", 100, _content(0, 2)),
             _upsert("r", "p1", 101, _content(1, 2))])          # MAJOR
    feed(2, [_delete("r", "p2", 200),
             _upsert("r", "p3", 201, _content(3, 3))])
    feed(3, [_rec('{"payload": {broken', 300),
             _upsert("r", "p4", 301, _content(4, 3))])          # MINOR
    feed(4, [_upsert("r", "p2", 400, _content(2, 9))])          # revive
    feed(5, [_upsert("r", "p0", 50, _content(0, 0))])           # stale: loses

    stored = lake.read(keep_signatures=True)
    assert set(SIG_COLS) <= set(stored.columns)

    # from-scratch: recompute the bands from the final visible content
    fresh = with_band_columns(
        stored.drop(*SIG_COLS).withColumnRenamed("content", "content")
    )
    s = {tuple(r) for r in stored.select("repo", "path", *SIG_COLS).collect()}
    f = {tuple(r) for r in fresh.select("repo", "path", *SIG_COLS).collect()}
    assert s == f

    # winners carried the RIGHT version's signature: p0's stored sig is
    # the v2 content's (lsn 100 beat the stale lsn-50 replay), not v0/v1
    sigs_for = lambda c: {
        tuple(r) for r in with_band_columns(
            spark.createDataFrame([("r", "p0", c)], ["repo", "path", "content"])
        ).select(*SIG_COLS).collect()
    }
    p0 = {tuple(r) for r in stored.filter("path = 'p0'")
          .select(*SIG_COLS).collect()}
    assert p0 == sigs_for(_content(0, 2))
    assert p0 != sigs_for(_content(0, 0))

    # the band equi-join over STORED signatures finds the same candidate
    # pairs as one over recomputed signatures (the dedup consumer's view)
    def pairs(df):
        stacked = df.selectExpr(
            "repo", "path",
            "stack(4, 0, `__mh_band0`, 1, `__mh_band1`, 2, `__mh_band2`,"
            " 3, `__mh_band3`) AS (bi, bh)")
        a, b = stacked.alias("a"), stacked.alias("b")
        return {
            tuple(r) for r in a.join(
                b, (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.path") < F.col("b.path")))
            .select("a.path", "b.path").distinct().collect()
        }
    assert pairs(stored) == pairs(fresh)

    # default read hides the signature columns entirely
    assert not set(SIG_COLS) & set(lake.read().columns)
    # and the visible business schema is unchanged by the feature
    assert set(lake.read().columns) == {
        "repo", "path", "commit", "lang", "content", "route"}

    # reopening WITHOUT the flag adopts it from the manifest (CREATE-time
    # table property: mixed-writer tables would break incremental==scratch)
    reopened = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                           mode="mor")
    assert reopened.minhash_bands is True
    feed_re = lambda bid, recs_: process_batch(
        spark.createDataFrame(recs_, schema=KAFKA_SHAPE), bid, reopened)
    feed_re(6, [_upsert("r", "p7", 700, _content(7, 5))])
    stored2 = reopened.read(keep_signatures=True)
    fresh2 = with_band_columns(stored2.drop(*SIG_COLS))
    assert (
        {tuple(r) for r in stored2.select("repo", "path", *SIG_COLS).collect()}
        == {tuple(r) for r in fresh2.select("repo", "path", *SIG_COLS).collect()}
    )


def test_signature_columns_are_reserved_from_extras(spark, tmp_path):
    """A source field literally named __mh_band0 must stay in the extras
    map, never get promoted to a real column (it would collide with the
    engine's signature namespace and poison every later merge)."""
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=2,
                       mode="mor", minhash_bands=True, compact_every=1)
    ev = _rec(_env("c", after={
        "repo": "r", "path": "p", "commit": "c", "lang": "py",
        "content": "hello world of tests", "__mh_band0": "EVIL"}, lsn=1), 1)
    process_batch(spark.createDataFrame([ev], schema=KAFKA_SHAPE), 0, lake)
    assert lake.current_meta()["extra_columns"] == []
    row = lake.read(keep_signatures=True).collect()[0]
    assert row["__mh_band0"] != "EVIL"  # the engine's own signature won


def test_fill_band_columns_preserves_stored_and_signs_missing(spark):
    """fill_band_columns unit contract: (a) rows with a stored signature
    keep it BYTE-IDENTICAL (even a deliberately wrong stored value — the
    fill must not recompute it); (b) unsigned rows with content get the
    same signature with_band_columns would compute; (c) null-content rows
    stay null. Regression for the predicate-capture subtlety: the fill
    materializes its need-predicate BEFORE rewriting band0 — an
    expression re-resolving band0 by name would flip to false after the
    first band fills, leaving bands 1-3 unsigned."""
    from pyspark_cdc.signatures import fill_band_columns

    rows = [
        ("signed", "keep me intact", "STORED0", "STORED1", "STORED2", "STORED3"),
        ("unsigned", "the quick brown fox jumps over the lazy dog", None,
         None, None, None),
        ("tombstone", None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, ["repo", "content", *SIG_COLS]
    )
    got = {r["repo"]: r for r in fill_band_columns(df).collect()}

    assert [got["signed"][c] for c in SIG_COLS] == [
        "STORED0", "STORED1", "STORED2", "STORED3"
    ]
    ref = with_band_columns(
        spark.createDataFrame(
            [("unsigned", "the quick brown fox jumps over the lazy dog")],
            ["repo", "content"],
        )
    ).collect()[0]
    filled = [got["unsigned"][c] for c in SIG_COLS]
    assert filled == [ref[c] for c in SIG_COLS]
    assert all(v is not None for v in filled)  # all four bands signed
    assert [got["tombstone"][c] for c in SIG_COLS] == [None] * 4

    # missing signature columns are treated as all-null (fresh table)
    bare = spark.createDataFrame(
        [("x", "alpha beta gamma delta epsilon")], ["repo", "content"]
    )
    got_bare = fill_band_columns(bare).collect()[0]
    ref_bare = with_band_columns(bare).collect()[0]
    assert [got_bare[c] for c in SIG_COLS] == [ref_bare[c] for c in SIG_COLS]
