"""Stream sources (SURVEY.md S1-S4): Kafka and Kafka-shaped file logs.

Both return a DataFrame with exactly the KAFKA_SHAPE columns
(key, value, topic, partition, offset — all of Kafka's own), so the
entire downstream pipeline (parse -> merge) is source-agnostic: the
sandbox tests/benches run on the parquet file log, a deployment calls
``kafka_stream`` instead and nothing else changes.

Reference parity:
* consumer-group subscription to N comma-separated topics, seed brokers —
  meilisearch-sync-service/main.go:58-64 (kgo.NewClient), config.go:37-38
* micro-batch poll loop — internal/service/sync.go:19-45 maps to
  Structured Streaming's trigger; offset commit AFTER the sink write
  (sync.go:117-119) maps to the checkpoint commit after foreachBatch.

Note on parallelism: a streaming FILE source schedules one task per
file, so per-batch parallelism = maxFilesPerTrigger (size the log's file
count accordingly); the KAFKA source exposes ``minPartitions`` to split
topic-partitions into more tasks than partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import KAFKA_SHAPE


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Kafka Debezium-topic stream in KAFKA_SHAPE (S1/S3).

    Requires the spark-sql-kafka package on the cluster (not present in
    this sandbox — covered by an import-time smoke test only; the
    file-log source exercises the identical downstream columns).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        # failOnDataLoss=true by default: offsets lost to retention/topic
        # deletion are DROPPED EVENTS, which would silently break the
        # exactly-once/final-state-equality contract. Poison pills are a
        # different thing — they arrive as data and are classified into
        # dead-letter counts at parse time (sync.go:44-47), so they never
        # need this switch. Set fail_on_data_loss=False only when a
        # retention gap is an accepted, monitored condition.
        .option("failOnDataLoss", "true" if fail_on_data_loss else "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
    )


def file_stream(
    spark: SparkSession,
    log_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka-shaped parquet log as a stream (the sandbox source; S2)."""
    reader = spark.readStream.schema(KAFKA_SHAPE)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(log_dir)


def file_batch(spark: SparkSession, log_dir: str) -> DataFrame:
    """One-shot batch read of a Kafka-shaped parquet log (replay/bench)."""
    return spark.read.schema(KAFKA_SHAPE).parquet(log_dir)
