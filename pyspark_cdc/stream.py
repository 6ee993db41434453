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
from .schemas import KAFKA_SHAPE
from .sink import ParquetLake


def process_batch(
    batch_df: DataFrame,
    batch_id,
    lake: ParquetLake,
    metrics: MetricsWriter | None = None,
    lww_method: str = "aggregate",
) -> dict:
    """parse -> LWW -> MERGE for one micro-batch; lineage written per batch."""
    with Stopwatch() as sw:
        parsed = parse_envelopes(batch_df)
        deduped = lww(parsed, method=lww_method)
        stats = lake.merge(deduped, batch_id)
    if metrics:
        metrics.write(parsed, batch_id, wall_ms=sw.wall_ms)
    return stats


def replay_batch(
    spark: SparkSession,
    log_dir: str,
    lake: ParquetLake,
    metrics_dir: str | None = None,
    batch_id=0,
    lww_method: str = "aggregate",
) -> dict:
    """One-shot batch replay of a whole event log (bench + tests)."""
    raw = spark.read.schema(KAFKA_SHAPE).parquet(log_dir)
    return process_batch(raw, batch_id, lake, MetricsWriter(metrics_dir), lww_method)


def replay_stream(
    spark: SparkSession,
    log_dir: str,
    lake: ParquetLake,
    checkpoint_dir: str,
    metrics_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    lww_method: str = "aggregate",
):
    """Checkpointed streaming replay; trigger(availableNow) drains the log
    and stops — restart with the same checkpoint_dir to resume."""
    reader = spark.readStream.schema(KAFKA_SHAPE)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(log_dir)

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
