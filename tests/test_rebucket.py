"""Bucket-count evolution (ParquetLake.rebucket — the Iceberg
partition-spec-evolution + rewrite_data_files analog): the creation-time
bucket count is the one layout decision that goes stale as a lake grows
1000x, so a maintenance op must be able to reset it without recreating
the table. Contract under test:

* the rewrite is LWW-exact (state equals the pure-Python oracle before
  and after, tombstones included) and atomic (one manifest commit flips
  layout + n_buckets together, consuming every outstanding delta);
* it ABORTS on any concurrent commit (its output is hashed under a
  modulus no other writer knows yet) — never corrupts, never blocks;
* a STALE writer (opened before the rebucket) cannot corrupt the new
  layout: its ingest commit raises before the streaming checkpoint
  advances, its fold aborts cleanly;
* lookups take the modulus from the manifest they read, so they stay
  correct after a rebucket and across a time-travel boundary.
"""

from __future__ import annotations

import os

import pytest

from pyspark_cdc.sink import ParquetLake, bucket_expr
from pyspark_cdc.stream import process_batch

from test_occ import (  # reuse the OCC suite's deterministic harness
    _env,
    _mor,
    _one_shot,
    _oracle_state,
    _rec,
    _row,
    _state,
    _upserts,
)


def _delete(spark, i, lsn):
    from pyspark_cdc.schemas import KAFKA_SHAPE

    recs = [_rec(_env("d", before=_row(i, 0), lsn=lsn), lsn)]
    return spark.createDataFrame(recs, schema=KAFKA_SHAPE), recs


def _bucket_of(spark, repo, path, n):
    import pyspark.sql.functions as F

    return int(
        spark.createDataFrame([(repo, path)], ["repo", "path"])
        .select(bucket_expr(n).alias("b"))
        .collect()[0]["b"]
    )


def test_rebucket_preserves_state_and_flips_layout(spark, tmp_path):
    """rebucket 4 -> 16 with an outstanding delta backlog (including a
    tombstone): state equals the oracle before and after, the manifest
    flips n_buckets and consumes every delta, every new bucket dir is
    keyed under the new modulus, and the lake keeps ingesting +
    compacting afterwards. Then rebucket DOWN 16 -> 2 and re-check."""
    lake = _mor(spark, tmp_path / "t")  # n_buckets=4
    all_recs = []
    b0, r0 = _upserts(spark, range(12), 1, 100)
    b1, r1 = _upserts(spark, range(0, 12, 2), 2, 200)
    b2, r2 = _delete(spark, 3, 300)
    for i, (b, r) in enumerate([(b0, r0), (b1, r1), (b2, r2)]):
        process_batch(b, i, lake)
        all_recs += r
    assert len(lake.current_meta()["deltas"]) == 3

    new_meta = lake.rebucket(16)
    assert new_meta is not None
    assert new_meta["n_buckets"] == 16
    assert new_meta["deltas"] == []
    assert lake.n_buckets == 16
    # every bucket key valid under the new modulus, and each bucket dir's
    # rows actually hash there (spot: read one bucket dir raw)
    assert all(0 <= int(b) < 16 for b in new_meta["buckets"])
    assert _state(lake) == _oracle_state(all_recs)
    # the tombstone is retained through the rewrite (no horizon set)
    dead = _state(lake, include_deleted=True)
    assert ("r", "p3") in dead and ("r", "p3") not in _state(lake)

    # a reopened instance adopts the committed count
    again = _mor(spark, tmp_path / "t", n_buckets=4)
    assert again.n_buckets == 16

    # the lake keeps working: ingest two more batches, then a fold
    b3, r3 = _upserts(spark, [3, 20], 9, 400)  # revive p3, insert p20
    process_batch(b3, 3, lake)
    all_recs += r3
    lake.compact_now(tier="major")
    assert _state(lake) == _oracle_state(all_recs)

    # rebucket DOWN: 16 -> 2
    new_meta = lake.rebucket(2)
    assert new_meta is not None and new_meta["n_buckets"] == 2
    assert set(new_meta["buckets"]) <= {"0", "1"}
    assert _state(lake) == _oracle_state(all_recs)

    # no-op path: rebucket to the current count returns without a commit
    snap = lake.current_meta()["id"]
    assert lake.rebucket(2)["id"] == snap


def test_lookup_prunes_under_the_new_modulus(spark, tmp_path):
    """After a rebucket, lookup() must hash the key with the NEW modulus
    (taken from the manifest, not the constructor): the hit resolves and
    the scan lists only the key's new bucket dir."""
    lake = _mor(spark, tmp_path / "t")
    b0, r0 = _upserts(spark, range(20), 1, 100)
    process_batch(b0, 0, lake)
    lake.rebucket(32)

    key = ("r", "p7")
    got = lake.lookup(*key).collect()
    assert len(got) == 1 and got[0]["content"] == "v1"

    bucket = _bucket_of(spark, *key, 32)
    files = lake.lookup(*key).inputFiles()
    assert files, "lookup listed no files"
    meta = lake.current_meta()
    want_dir = os.path.join(str(tmp_path / "t"), meta["buckets"][str(bucket)])
    for f in files:
        assert os.path.normpath(want_dir) in os.path.normpath(f), f

    # a STALE-instance lookup (opened before the rebucket elsewhere)
    # still resolves: the modulus comes from the manifest it reads
    stale = _mor(spark, tmp_path / "t")
    stale.n_buckets = 4  # simulate: adopted before the rebucket
    got = stale.lookup(*key).collect()
    assert len(got) == 1 and got[0]["content"] == "v1"


def test_time_travel_lookup_across_the_rebucket_boundary(spark, tmp_path):
    """lookup(snapshot_id=pre-rebucket) must hash with the OLD snapshot's
    modulus — the historical layout — and still find the key."""
    lake = _mor(spark, tmp_path / "t")
    b0, _ = _upserts(spark, range(10), 1, 100)
    process_batch(b0, 0, lake)
    pre = lake.current_meta()["id"]
    lake.rebucket(16)

    old = lake.snapshot_meta(pre)
    assert old["n_buckets"] == 4
    got = lake.lookup("r", "p2", snapshot_id=pre).collect()
    assert len(got) == 1 and got[0]["content"] == "v1"


def test_rebucket_aborts_on_concurrent_commit(spark, tmp_path):
    """A concurrent ingest commit lands in rebucket's read->commit
    window: the rebucket must ABORT (return None), drop its orphan
    output, and leave the table exactly as the concurrent writer left it
    — old modulus, both batches' data intact."""
    a = _mor(spark, tmp_path / "t")
    b = _mor(spark, tmp_path / "t")
    b0, r0 = _upserts(spark, range(8), 1, 100)
    process_batch(b0, 0, a)

    b1, r1 = _upserts(spark, [2, 9], 2, 200)
    _one_shot(a, lambda: process_batch(b1, 1, b))
    dirs_before = set(os.listdir(os.path.join(str(tmp_path / "t"), "data")))
    assert a.rebucket(16) is None

    meta = a.current_meta()
    assert meta["n_buckets"] == 4
    assert len(meta["deltas"]) == 2  # both ingest batches outstanding
    assert _state(a) == _oracle_state(r0 + r1)
    # the aborted rewrite's dir is gone; the racer's delta dir is kept
    dirs_after = set(os.listdir(os.path.join(str(tmp_path / "t"), "data")))
    assert not {d for d in dirs_after - dirs_before if d.startswith("s")}


def test_stale_ingest_writer_raises_after_rebucket(spark, tmp_path):
    """A writer opened BEFORE the rebucket tries to commit a batch hashed
    with the old modulus: the commit must RAISE (failing the micro-batch
    before its checkpoint advances), not abort — an abort would report
    skipped_duplicate_batch and lose the batch. After reopening (adopting
    the new count) the same batch applies cleanly."""
    a = _mor(spark, tmp_path / "t")
    stale = _mor(spark, tmp_path / "t")
    b0, r0 = _upserts(spark, range(6), 1, 100)
    process_batch(b0, 0, a)
    assert a.rebucket(8) is not None

    b1, r1 = _upserts(spark, [1, 7], 2, 200)
    with pytest.raises(RuntimeError, match="rebucketed"):
        process_batch(b1, 1, stale)
    # nothing committed by the failed attempt
    assert a.current_meta()["deltas"] == []

    reopened = _mor(spark, tmp_path / "t")
    assert reopened.n_buckets == 8
    s = process_batch(b1, 1, reopened)
    assert s["status"] == "committed"
    assert _state(reopened) == _oracle_state(r0 + r1)


def test_rebucket_carries_stored_dedup_signatures(spark, tmp_path):
    """On a minhash_bands=True lake, the rebucket rewrite must carry the
    at-ingest band signatures through to the new layout (fill applies to
    unsigned delta winners; already-stored signatures pass untouched) —
    the incremental-dedup contract survives a layout change."""
    from pyspark_cdc.signatures import SIG_COLS, with_band_columns

    lake = _mor(spark, tmp_path / "t", minhash_bands=True)
    b0, r0 = _upserts(spark, range(10), 1, 100)
    process_batch(b0, 0, lake)
    b1, r1 = _upserts(spark, range(0, 10, 3), 2, 200)
    process_batch(b1, 1, lake)  # raw backlog: winners sign at the fold

    assert lake.rebucket(16) is not None
    stored = lake.read(keep_signatures=True)
    assert set(SIG_COLS) <= set(stored.columns)
    fresh = with_band_columns(stored.drop(*SIG_COLS))
    s = {tuple(r) for r in stored.select("repo", "path", *SIG_COLS).collect()}
    f = {tuple(r) for r in fresh.select("repo", "path", *SIG_COLS).collect()}
    assert s == f
    assert _state(lake) == _oracle_state(r0 + r1)
    # reopen adopts both table properties from the manifest
    again = _mor(spark, tmp_path / "t")
    assert again.n_buckets == 16 and again.minhash_bands


def test_stale_fold_aborts_after_rebucket(spark, tmp_path):
    """A maintenance process opened before the rebucket folds with the
    old modulus: its commit must abort cleanly (table untouched), and a
    reopened maintainer folds fine."""
    a = _mor(spark, tmp_path / "t")
    stale = _mor(spark, tmp_path / "t")
    b0, r0 = _upserts(spark, range(6), 1, 100)
    process_batch(b0, 0, a)
    assert a.rebucket(8) is not None
    b1, r1 = _upserts(spark, [1, 7], 2, 200)
    process_batch(b1, 1, a)  # fresh backlog under the new layout

    before = a.current_meta()
    got = stale.compact_now(tier="major")  # stale n_buckets=4 -> abort
    assert got == before  # unchanged: same snapshot, backlog intact

    reopened = _mor(spark, tmp_path / "t")
    folded = reopened.compact_now(tier="major")
    assert folded["deltas"] == [] and folded["n_buckets"] == 8
    assert _state(reopened) == _oracle_state(r0 + r1)
