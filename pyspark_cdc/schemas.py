"""Schemas: Debezium envelope, Kafka record shape, sink table.

The envelope mirrors the reference's struct
(meilisearch-sync-service/internal/model/model.go:4-13: payload.{before,
after,op}) plus the `source`/`transaction` metadata the reference ignores
but Spark must materialize, because micro-batches destroy Kafka arrival
order (SURVEY.md section 1.1 note): ordering becomes explicit (lsn, tx_id).

The domain table is the BASELINE.json input_hint shape:
(repo, path, commit, lang, content); primary key (repo, path).

`is_delete` is parsed as STRING, not boolean: the reference accepts bool
true / "true" / "1" (sync.go:162-174) and Spark's JSON parser renders any
scalar token as its text when the target field is StringType — one schema
covers all three variants.

`after.payload` is a STRING field: the reference's inner payload may
arrive as string-encoded JSON that must be re-parsed (sync.go:207-217);
see parse.extract_extras for the unwrap.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Domain (sink) columns — BASELINE.json input_hint
# ---------------------------------------------------------------------------

KEY_COLS = ["repo", "path"]
DOMAIN_COLS = ["repo", "path", "commit", "lang", "content"]

SINK_BASE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Internal bookkeeping columns the lake stores alongside domain columns.
LSN_COL = "__lsn"
TX_COL = "__tx_id"
TS_COL = "__ts_ms"
# Kafka arrival order — the reference's implicit ordering — is the FINAL
# tie-break: two events with identical (lsn, tx, ts) resolve by offset,
# exactly as the consumer loop would apply them (caught by the
# hypothesis property suite: an exact-tie delete-then-create pair must
# end with the create).
OFFSET_COL = "__offset"
DELETED_COL = "__deleted"  # tombstone retention => replay-safe LSN guard

INTERNAL_COLS = [LSN_COL, TX_COL, TS_COL, OFFSET_COL, DELETED_COL]

# ---------------------------------------------------------------------------
# Debezium envelope
# ---------------------------------------------------------------------------


def _row_image() -> T.StructType:
    # before/after carry the domain columns; is_delete as string (see module
    # docstring); payload as string for the string-encoded-JSON variant.
    return T.StructType(
        [
            T.StructField("repo", T.StringType(), True),
            T.StructField("path", T.StringType(), True),
            T.StructField("commit", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("is_delete", T.StringType(), True),
            T.StructField("payload", T.StringType(), True),
        ]
    )


ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("before", _row_image(), True),
                    T.StructField("after", _row_image(), True),
                    T.StructField("op", T.StringType(), True),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("lsn", T.LongType(), True),
                                T.StructField("ts_ms", T.LongType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField(
                        "transaction",
                        T.StructType([T.StructField("id", T.LongType(), True)]),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)

# ---------------------------------------------------------------------------
# Kafka-shaped record (FIXTURES.md F2) — what the event log stores on disk.
# A real deployment swaps this for spark.readStream.format("kafka"); the
# columns are exactly Kafka's, so nothing downstream changes.
# ---------------------------------------------------------------------------

KAFKA_SHAPE = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
    ]
)
