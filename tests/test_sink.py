"""ParquetLake MERGE contract: idempotent duplicate batches, cross-batch
LWW guard, tombstone protection against late older upserts, revive across
batches, delete of never-inserted key, additive schema evolution across
batches, bucket-level copy-on-write reuse."""

from __future__ import annotations

import json
import os

from conftest import rows_by_key

from pyspark_cdc.order import lww_aggregate
from pyspark_cdc.parse import parse_envelopes
from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sink import ParquetLake


def _deduped(spark, events):
    recs = [
        {"key": None, "value": v, "topic": "t", "partition": 0, "offset": i}
        for i, v in enumerate(events)
    ]
    raw = spark.createDataFrame(recs, schema=KAFKA_SHAPE)
    return lww_aggregate(parse_envelopes(raw))


def _env(repo, path, lsn, op="u", content=None, extra=None, delete=False):
    after = None
    before = None
    if op == "d":
        before = {"repo": repo, "path": path}
    else:
        after = {"repo": repo, "path": path, "content": content or f"v{lsn}"}
        if extra:
            after.update(extra)
        if delete:
            after["is_delete"] = True
    p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn}, "transaction": {"id": 0}}
    if after is not None:
        p["after"] = after
    if before is not None:
        p["before"] = before
    return json.dumps({"payload": p})


def test_duplicate_batch_id_is_noop(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    b = _deduped(spark, [_env("r", "p", 1, content="one")])
    assert lake.merge(b, 0)["status"] == "committed"
    b2 = _deduped(spark, [_env("r", "p", 2, content="two")])
    # same epoch id replayed (foreachBatch retry) => skipped
    assert lake.merge(b2, 0)["status"] == "skipped_duplicate_batch"
    assert rows_by_key(lake.read())[("r", "p")]["content"] == "one"


def test_cross_batch_lsn_guard(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    lake.merge(_deduped(spark, [_env("r", "p", 10, content="new")]), 0)
    # a later batch replays an OLDER change (at-least-once) => must lose
    lake.merge(_deduped(spark, [_env("r", "p", 5, content="stale")]), 1)
    assert rows_by_key(lake.read())[("r", "p")]["content"] == "new"


def test_tombstone_blocks_late_older_upsert(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    lake.merge(_deduped(spark, [_env("r", "p", 1), _env("r", "p", 9, op="d")]), 0)
    assert rows_by_key(lake.read()) == {}
    lake.merge(_deduped(spark, [_env("r", "p", 5, content="zombie")]), 1)
    assert rows_by_key(lake.read()) == {}, "older upsert must not resurrect a deleted key"


def test_revive_across_batches(spark, tmp_table):
    # document_repository.py:42: upsert after delete re-inserts
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    lake.merge(_deduped(spark, [_env("r", "p", 1), _env("r", "p", 2, delete=True)]), 0)
    assert rows_by_key(lake.read()) == {}
    lake.merge(_deduped(spark, [_env("r", "p", 3, content="revived")]), 1)
    assert rows_by_key(lake.read())[("r", "p")]["content"] == "revived"


def test_delete_never_inserted_is_noop(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    lake.merge(_deduped(spark, [_env("ghost", "p", 1, op="d")]), 0)
    assert rows_by_key(lake.read()) == {}


def test_schema_evolution_across_batches(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    lake.merge(_deduped(spark, [_env("r", "old", 1)]), 0)
    stats = lake.merge(
        _deduped(spark, [_env("r", "new", 2, extra={"branch": "main", "stars": 7})]), 1
    )
    assert set(stats["new_columns"]) == {"branch", "stars"}
    rows = rows_by_key(lake.read())
    # old row reads null in the evolved column; new row carries it
    assert rows[("r", "old")]["branch"] is None
    assert rows[("r", "new")]["branch"] == "main"
    assert rows[("r", "new")]["stars"] == "7"
    assert lake.extra_columns() == ["branch", "stars"]


def test_copy_on_write_reuses_untouched_buckets(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=64)
    lake.merge(_deduped(spark, [_env(f"r{i}", f"p{i}", 1) for i in range(40)]), 0)
    meta0 = lake.current_meta()
    lake.merge(_deduped(spark, [_env("r0", "p0", 2, content="touched")]), 1)
    meta1 = lake.current_meta()
    reused = sum(
        1 for b, p in meta1["buckets"].items() if meta0["buckets"].get(b) == p
    )
    changed = len(meta1["buckets"]) - reused
    assert changed <= 2, "merge must rewrite only touched buckets"
    assert reused >= len(meta0["buckets"]) - 2
    # and the data under reused paths was not rewritten (same files)
    assert rows_by_key(lake.read())[("r0", "p0")]["content"] == "touched"


def test_empty_table_read(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    assert lake.read().count() == 0
    assert set(lake.read().columns) == {"repo", "path", "commit", "lang", "content", "route"}


def test_snapshot_files_are_immutable_history(spark, tmp_table):
    lake = ParquetLake(spark, tmp_table, n_buckets=4)
    lake.merge(_deduped(spark, [_env("r", "p", 1)]), 0)
    lake.merge(_deduped(spark, [_env("r", "p", 2)]), 1)
    metas = [f for f in os.listdir(os.path.join(tmp_table, "_meta")) if f.startswith("snap-")]
    assert len(metas) == 2
    assert lake.applied_batch_ids() == [0, 1]
