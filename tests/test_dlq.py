"""read_dead_letters — the queryable persisted DLQ (the reference
logs-and-drops its poison records, sync.go:54-67; the lake keeps them in
status partitions until compaction retires the backlog)."""
from __future__ import annotations

import json

from pyspark.sql import functions as F

from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import process_batch


def _rec(value, off, topic="t"):
    return {"key": None, "value": value, "topic": topic, "partition": 0,
            "offset": off}


def _up(i, lsn):
    return _rec(json.dumps({"payload": {
        "op": "u", "source": {"lsn": lsn, "ts_ms": lsn},
        "after": {"repo": "r", "path": f"p{i}", "commit": "c", "lang": "py",
                  "content": f"v{i}"}}}), lsn)


def test_dead_letter_queue_reads_and_retires(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=None)
    poison = [
        _rec('{"payload": {broken', 100),                      # malformed
        _rec("", 101),                                         # tombstone
        _rec(json.dumps({"payload": {"op": "x",
             "source": {"lsn": 102},
             "after": {"repo": "a", "path": "b"}}}), 102),     # unknown_op
        _rec(json.dumps({"payload": {"op": "u",
             "source": {"lsn": 103},
             "after": {"path": "only"}}}), 103),               # missing_key
    ]
    process_batch(
        spark.createDataFrame([_up(1, 1), _up(2, 2), *poison],
                              schema=KAFKA_SHAPE), 0, lake)
    process_batch(
        spark.createDataFrame([_up(3, 10), _rec("null", 110)],
                              schema=KAFKA_SHAPE), 1, lake)

    dlq = lake.read_dead_letters()
    by_status = {r["status"]: r["n"] for r in
                 dlq.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    assert by_status == {"malformed": 1, "tombstone": 2,
                         "unknown_op": 1, "missing_key": 1}

    # lineage rides every poison record
    offs = {r["offset"] for r in dlq.select("offset").collect()}
    assert offs == {100, 101, 102, 103, 110}

    # single-status narrowing hits the partition filter, not a data scan
    one = lake.read_dead_letters(status="malformed")
    assert one.count() == 1
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # the ok-partitions are pruned at the DIRECTORY level: the != 'ok'
    # predicate rides every scan's PartitionFilters (inputFiles() lists
    # pre-pruning candidates, so the plan is the right evidence)
    plan_all = dlq._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_all
    assert "NOT (status" in plan_all

    # compaction retires the backlog — the DLQ window is the backlog
    lake.compact_now(tier="major")
    assert lake.read_dead_letters().count() == 0
    # and the table state was never affected by the poison rows
    assert lake.read().count() == 3
