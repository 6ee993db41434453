"""Pipeline drivers: batch replay and checkpointed Structured Streaming.

The streaming job is the Spark re-expression of the reference's consumer
loop (SURVEY.md section 3.1 stage 6): source -> parse -> LWW -> MERGE,
with the offset commit happening AFTER the sink write (the reference's
sink-then-commit contract, sync.go:117-119, maps to Structured Streaming
committing the epoch to the checkpoint after foreachBatch returns).

The source here is a file stream over the Kafka-shaped parquet log; a real
deployment swaps ONE line for format("kafka") — every downstream column is
already Kafka's (key/value/topic/partition/offset).

Exactly-once: checkpointed source offsets give each micro-batch a stable
batch_id; ParquetLake.merge() records applied batch ids and skips
duplicates, so a crash between sink commit and checkpoint commit replays
the epoch as a no-op (SURVEY.md T1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .metrics import MetricsWriter, Stopwatch
from .order import lww
from .parse import parse_envelopes
from .sink import ParquetLake
from .sources import file_batch, file_stream


def process_batch(
    batch_df: DataFrame,
    batch_id,
    lake: ParquetLake,
    metrics: MetricsWriter | None = None,
    lww_method: str = "fused",
) -> dict:
    """parse -> LWW -> MERGE for one micro-batch; lineage written per batch.

    The parsed batch feeds multiple actions (MERGE, lineage metrics), so it
    is persisted for the duration of the batch — the standard foreachBatch
    idiom. Without it, Catalyst collapses the (expensive, per-row JSON)
    parse projection into each consumer, and the LWW aggregate re-evaluates
    it per aggregate expression in interpreted mode — measured 7x slower
    end-to-end.

    lww_method='fused' (default) resolves LWW *inside* the MERGE: the
    MERGE's per-key max_by aggregation over union(target, batch) picks the
    same winner whether or not the batch was pre-deduplicated (max is
    associative), so a separate LWW shuffle of the whole batch is pure
    overhead — map-side partial combine in the merge aggregation already
    reduces each task to one candidate row per key before the ONE shuffle.
    'aggregate'/'window' keep the explicit pre-dedup stage (parity tests,
    plan comparison).
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from .order import CARRY_COLS
    from .schemas import KEY_COLS

    from .metrics import batch_lineage

    parsed = parse_envelopes(batch_df).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # Lineage rides along in the merge's summary job (side_summary) and
        # is written driver-side afterwards — a micro-batch costs exactly
        # TWO Spark jobs: (summary+lineage collect) and (COW agg+write).
        side = batch_lineage(parsed, batch_id) if metrics and metrics.metrics_dir else None
        with Stopwatch() as sw:
            if lww_method == "fused":
                src = parsed.filter(F.col("status") == "ok").select(
                    *KEY_COLS, *CARRY_COLS
                )
                stats = lake.merge(src, batch_id, input_persisted=True, side_summary=side)
            else:
                deduped = lww(parsed, method=lww_method)
                stats = lake.merge(deduped, batch_id, side_summary=side)
        if metrics:
            metrics.write_rows(stats.get("side_rows"), batch_id, wall_ms=sw.wall_ms)
    finally:
        parsed.unpersist()
    return stats


def replay_batch(
    spark: SparkSession,
    log_dir: str,
    lake: ParquetLake,
    metrics_dir: str | None = None,
    batch_id=0,
    lww_method: str = "fused",
) -> dict:
    """One-shot batch replay of a whole event log (bench + tests)."""
    raw = file_batch(spark, log_dir)
    return process_batch(raw, batch_id, lake, MetricsWriter(metrics_dir), lww_method)


def replay_stream(
    spark: SparkSession,
    log_dir: str,
    lake: ParquetLake,
    checkpoint_dir: str,
    metrics_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    lww_method: str = "fused",
):
    """Checkpointed streaming replay; trigger(availableNow) drains the log
    and stops — restart with the same checkpoint_dir to resume."""
    raw = file_stream(spark, log_dir, max_files_per_trigger)

    metrics = MetricsWriter(metrics_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(batch_df, batch_id, lake, metrics, lww_method)

    query = (
        raw.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query
