"""CDC semantics expressed over the driver's `events` table so the DuckDB
oracle can check them (the engine's own event-log replay is checked by the
pytest oracle; these re-state the same operators on driver data).

Mapping: event_id = LSN (monotone change sequence), user_id = primary key,
event_type -> Debezium op: signup=c, error=d (delete), click/view/purchase=u.
props is the open-world JSON payload (P4 unwrap analog).

Operators covered (SURVEY.md section 2): J1 LWW, T1 idempotent replay,
P3 op dispatch, section 3.2 soft-delete, P4 payload unwrap, P8 routing,
S10 lineage, P2 tombstone filter, T4 dead letters, J5 ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


_OP = (
    "CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END"
)


def _op_col():
    return (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )


# --- J1: last-writer-wins final state --------------------------------------


def _final_state(df: DataFrame) -> DataFrame:
    row = F.struct(F.col("event_id"), _op_col().alias("op"), F.col("value"))
    return (
        df.groupBy("user_id")
        .agg(F.max_by(row, F.col("event_id")).alias("_w"))
        .select(
            "user_id",
            F.col("_w.event_id").alias("last_event_id"),
            F.col("_w.op").alias("last_op"),
            F.round(F.col("_w.value"), 2).alias("last_value"),
        )
        .filter(F.col("last_op") != "d")
    )


def cdc_lww_final_state(spark, sf_dir):
    return _final_state(_events(spark, sf_dir))


SQL_FINAL_STATE = f"""
WITH ranked AS (
  SELECT user_id, event_id, {_OP} AS op, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id AS last_event_id, op AS last_op,
       round(value, 2) AS last_value
FROM ranked WHERE rn = 1 AND op <> 'd'
"""


# --- T1/T3: duplicate replay is a no-op -------------------------------------


def cdc_idempotent_replay(spark, sf_dir):
    df = _events(spark, sf_dir)
    return _final_state(df.unionByName(df))


SQL_IDEMPOTENT = f"""
WITH doubled AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
), ranked AS (
  SELECT user_id, event_id, {_OP} AS op, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM doubled
)
SELECT user_id, event_id AS last_event_id, op AS last_op,
       round(value, 2) AS last_value
FROM ranked WHERE rn = 1 AND op <> 'd'
"""


# --- P3: op dispatch counts --------------------------------------------------


def cdc_op_dispatch_counts(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(_op_col().alias("op"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_OP_DISPATCH = f"SELECT {_OP} AS op, count(*) AS n_events FROM events GROUP BY 1"


# --- section 3.2: soft-delete semantics (final op decides liveness) ----------


def cdc_soft_delete_summary(spark, sf_dir):
    df = _events(spark, sf_dir)
    row = F.struct(F.col("event_id"), _op_col().alias("op"))
    last = df.groupBy("user_id").agg(F.max_by(row, F.col("event_id")).alias("_w"))
    return (
        last.select(
            F.when(F.col("_w.op") == "d", F.lit("deleted"))
            .otherwise(F.lit("live"))
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_SOFT_DELETE = f"""
WITH ranked AS (
  SELECT user_id, {_OP} AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT CASE WHEN op = 'd' THEN 'deleted' ELSE 'live' END AS status,
       count(*) AS n_users
FROM ranked WHERE rn = 1 GROUP BY 1
"""


# --- P4: open-world payload unwrap (JSON string -> typed field) --------------


def cdc_payload_unwrap(spark, sf_dir):
    df = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return df.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


SQL_PAYLOAD_UNWRAP = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
FROM events GROUP BY event_type
"""


# --- P8/P9: routing-key derivation with null guard ---------------------------


def cdc_routing_keys(spark, sf_dir):
    df = _events(spark, sf_dir)
    route = F.concat_ws("_", F.col("event_type"), (F.col("user_id") % 10).cast("string"))
    return (
        df.withColumn("route", route)
        .filter(F.col("route") != "")
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


SQL_ROUTING = """
SELECT concat_ws('_', event_type, CAST(user_id % 10 AS VARCHAR)) AS route,
       count(*) AS n_events,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id
FROM events
WHERE concat_ws('_', event_type, CAST(user_id % 10 AS VARCHAR)) <> ''
GROUP BY 1
"""


# --- S10: per-partition lineage ranges ---------------------------------------


def cdc_lineage_ranges(spark, sf_dir):
    df = _events(spark, sf_dir)
    return (
        df.withColumn("partition", (F.col("user_id") % 8).cast("int"))
        .groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("event_id").alias("min_offset"),
            F.max("event_id").alias("max_offset"),
            F.countDistinct("user_id").alias("n_keys"),
        )
    )


SQL_LINEAGE = """
SELECT CAST(user_id % 8 AS INTEGER) AS partition,
       count(*) AS n_records,
       min(event_id) AS min_offset,
       max(event_id) AS max_offset,
       count(DISTINCT user_id) AS n_keys
FROM events GROUP BY 1
"""


# --- P2/T4: tombstone + dead-letter classification ---------------------------


def cdc_dead_letter_counts(spark, sf_dir):
    """Dead-letter taxonomy re-stated on the driver's events table. The
    driver data is clean (every row has valid props and a known
    event_type), so the branches classify on deterministic value ranges
    to keep every branch NON-vacuous at the driver's sf; the REAL
    classifier over actual tombstones/malformed/unknown-op records is
    oracle-checked by cdc_engine_dead_letters on the flagship log."""
    df = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    status = (
        F.when(F.col("value") < 1.0, F.lit("tombstone"))
        .when(k % 97 == 0, F.lit("malformed"))
        .when((F.col("event_type") == "error") & (F.col("user_id") % 7 == 0),
              F.lit("unknown_op"))
        .otherwise(F.lit("ok"))
    )
    return df.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


SQL_DEAD_LETTER = """
SELECT CASE
         WHEN value < 1.0 THEN 'tombstone'
         WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 97 = 0 THEN 'malformed'
         WHEN event_type = 'error' AND user_id % 7 = 0 THEN 'unknown_op'
         ELSE 'ok'
       END AS status,
       count(*) AS n
FROM events GROUP BY 1
"""


# --- T9+: event-time tumbling-window aggregation ------------------------------
# Batch/SQL analog of windows.change_rate_stream (same grouping shape) on
# the driver's events table: per (event_type, hour) activity rollup.


def cdc_change_windows(spark, sf_dir):
    df = _events(spark, sf_dir)
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("window_start")
    return (
        df.groupBy(hour, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("event_type") == "error").alias("n_deletes"),
        )
    )


SQL_CHANGE_WINDOWS = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_deletes
FROM events GROUP BY 1, 2
"""


# --- J5: ranking window (top-3 changes per key) -------------------------------


def cdc_top3_changes_per_key(spark, sf_dir):
    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


SQL_TOP3 = """
WITH ranked AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, rn FROM ranked WHERE rn <= 3
"""


QUERIES = {
    "cdc_lww_final_state": (cdc_lww_final_state, SQL_FINAL_STATE),
    "cdc_idempotent_replay": (cdc_idempotent_replay, SQL_IDEMPOTENT),
    "cdc_op_dispatch_counts": (cdc_op_dispatch_counts, SQL_OP_DISPATCH),
    "cdc_soft_delete_summary": (cdc_soft_delete_summary, SQL_SOFT_DELETE),
    "cdc_payload_unwrap": (cdc_payload_unwrap, SQL_PAYLOAD_UNWRAP),
    "cdc_routing_keys": (cdc_routing_keys, SQL_ROUTING),
    "cdc_lineage_ranges": (cdc_lineage_ranges, SQL_LINEAGE),
    "cdc_dead_letter_counts": (cdc_dead_letter_counts, SQL_DEAD_LETTER),
    "cdc_top3_changes_per_key": (cdc_top3_changes_per_key, SQL_TOP3),
    "cdc_change_windows": (cdc_change_windows, SQL_CHANGE_WINDOWS),
}
