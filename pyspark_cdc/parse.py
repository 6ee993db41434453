"""Envelope parsing + normalization: SURVEY.md operators P1-P10.

Input:  Kafka-shaped records (schemas.KAFKA_SHAPE).
Output: one normalized row per record with
    status        'ok' | 'tombstone' | 'malformed' | 'unknown_op' | 'missing_key'
    effective_op  'u' (upsert) | 'd' (delete)           for status='ok'
    repo, path    string-coerced primary key
    commit, lang, content                                domain columns
    extras        map<string,string> of open-world keys (schema evolution)
    __lsn, __tx_id, __ts_ms                              explicit ordering
    topic, partition, offset                             lineage

Everything is native Spark SQL expressions (whole-stage codegen): from_json
for the envelope (P1), trim-filter for tombstones (P2), op dispatch via
CASE (P3), string-encoded inner-payload unwrap via a second from_json (P4,
sync.go:207-217 — Spark's JSON reader renders any non-string token,
including a nested object, as its JSON text when the target field is
StringType, which covers both the string-encoded and the object-valued
inner payload), key coercion via StringType parsing (P5, fmt.Sprint
analog sync.go:227-235), is_delete truthiness (P7, sync.go:162-174).

The open-world extras map (the reference's schemaless-JSONB analog,
schemas evolve additively) is extracted natively with map functions; a
vectorized pandas-UDF implementation of the same unwrap lives in
functions/udfs.py and is cross-checked in tests — the native path won the
benchmark and keeps the hot path inside codegen.

The soft-delete-via-update rule (an op=u event can MEAN delete,
sync.go:69-76 / SURVEY.md section 3.2) is resolved HERE into effective_op,
so ordering and MERGE downstream are op-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import DOMAIN_COLS, ENVELOPE_SCHEMA, LSN_COL, TS_COL, TX_COL

# Keys of `after` that are NOT open-world extras.
_KNOWN_AFTER_KEYS = [*DOMAIN_COLS, "is_delete", "payload"]

_MAP_SS = "map<string,string>"


def _not_known(k: Column) -> Column:
    return ~k.isin(_KNOWN_AFTER_KEYS)


def parse_envelopes(raw: DataFrame) -> DataFrame:
    """P1-P10: Kafka records -> normalized change rows (all statuses kept;
    downstream filters on status, metrics counts every status)."""
    v = F.trim(F.col("value"))
    is_tombstone = F.col("value").isNull() | (v == "") | (v == "null")

    df = raw.withColumn("_env", F.from_json(F.col("value"), ENVELOPE_SCHEMA))
    p = F.col("_env.payload")

    # from_json yields null struct on malformed JSON (PERMISSIVE); an
    # envelope without op is equally unusable (sync.go:129-132).
    is_malformed = ~is_tombstone & (p.isNull() | p.getField("op").isNull())

    after = p.getField("after")
    before = p.getField("before")
    op = p.getField("op")

    # P4: inner payload unwrap — after.payload may be string-encoded JSON
    # (or an object rendered back to JSON text by the StringType reader).
    inner = F.from_json(after.getField("payload"), ENVELOPE_SCHEMA["payload"].dataType["after"].dataType)

    def eff(field: str) -> Column:
        # inner payload fields override flat after fields (sync.go:207-224)
        return F.coalesce(inner.getField(field), after.getField(field))

    # P5: key coercion + delete-key-from-before (sync.go:146-156)
    repo = F.when(op == "d", before.getField("repo")).otherwise(eff("repo"))
    path = F.when(op == "d", before.getField("path")).otherwise(eff("path"))

    # P7: is_delete truthiness
    is_del = F.lower(F.coalesce(eff("is_delete"), F.lit("false"))).isin("true", "1")

    known_op = op.isin("c", "r", "u", "d")
    effective_op = F.when(op == "d", F.lit("d")).otherwise(
        F.when(is_del, F.lit("d")).otherwise(F.lit("u"))
    )

    missing_key = (
        ~is_tombstone
        & ~is_malformed
        & known_op
        & (repo.isNull() | (repo == "") | path.isNull() | (path == ""))
    )

    status = (
        F.when(is_tombstone, F.lit("tombstone"))
        .when(is_malformed, F.lit("malformed"))
        .when(~known_op, F.lit("unknown_op"))
        .when(missing_key, F.lit("missing_key"))
        .otherwise(F.lit("ok"))
    )

    # Open-world extras: every after key (post-unwrap) outside the known
    # set, as map<string,string>. LAST_WIN concat => inner overrides flat.
    after_map = F.from_json(F.get_json_object(F.col("value"), "$.payload.after"), _MAP_SS)
    inner_map = F.from_json(F.element_at(after_map, "payload"), _MAP_SS)
    extras = F.map_filter(
        F.map_concat(
            F.coalesce(after_map, F.create_map().cast(_MAP_SS)),
            F.coalesce(inner_map, F.create_map().cast(_MAP_SS)),
        ),
        lambda k, _: _not_known(k),
    )

    return df.select(
        status.alias("status"),
        F.when(status == "ok", effective_op).alias("effective_op"),
        repo.alias("repo"),
        path.alias("path"),
        eff("commit").alias("commit"),
        eff("lang").alias("lang"),
        eff("content").alias("content"),
        F.when(status == "ok", extras).alias("extras"),
        F.coalesce(p.getField("source").getField("lsn"), F.lit(0)).alias(LSN_COL),
        F.coalesce(p.getField("transaction").getField("id"), F.lit(0)).alias(TX_COL),
        F.coalesce(p.getField("source").getField("ts_ms"), F.lit(0)).alias(TS_COL),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
    )
