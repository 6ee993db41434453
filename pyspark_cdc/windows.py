"""Event-time windowed aggregations over the change stream (SURVEY.md T9
territory: the reference has no windowed/stateful operators, so these are
the Spark-native extension a monitoring/analytics consumer runs on the
same stream — watermarks bound state, late events beyond the watermark
are dropped, exactly the Structured Streaming contract).

change_rate_stream: per (route, tumbling event-time window) change
counts, usable as a live ingest-rate / delete-rate monitor. In streaming
append mode a window emits once the watermark passes its end — the same
query body works identically in batch (see queries/cdc.py
cdc_change_windows for the driver-checkable batch/SQL analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import TS_COL


def change_rate_stream(
    parsed: DataFrame,
    window: str = "1 second",
    watermark: str = "2 seconds",
) -> DataFrame:
    """parsed (streaming or batch) -> per (route, window) change counts.

    Watermark semantics: state for a window is dropped once event time
    passes window_end + watermark; events later than that are discarded
    rather than growing state without bound — the 10^10-event stream
    cannot keep every window open forever.

    Events WITHOUT source.ts_ms (parse coalesces the missing field to 0)
    are excluded EXPLICITLY here rather than implicitly: their epoch
    event-time would silently classify as decades-late data the moment
    the first real timestamp advances the watermark, so the monitor
    would undercount with no signal. The exclusion is visible instead:
    per-batch lineage counts every record, so n_records minus the
    windowed totals exposes the unmonitorable share. The LWW/merge path
    applies such events normally either way — this affects only the
    rate monitor."""
    ev = (
        parsed.filter((F.col("status") == "ok") & (F.col(TS_COL) > 0))
        .withColumn("event_time", F.timestamp_millis(F.col(TS_COL)))
    )
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("route"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.count_if(F.col("effective_op") == "d").alias("n_deletes"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.col("route"),
            F.col("n_changes"),
            F.col("n_deletes"),
        )
    )
