"""Envelope parsing + normalization: SURVEY.md operators P1-P10.

Input:  Kafka-shaped records (schemas.KAFKA_SHAPE).
Output: one normalized row per record with
    status        'ok' | 'tombstone' | 'malformed' | 'unknown_op'
                  | 'bad_payload' | 'missing_key' | 'missing_route'
                  (the last only with route_from_fields=True)
    effective_op  'u' (upsert) | 'd' (delete)           for status='ok'
    repo, path    string-coerced primary key
    commit, lang, content                                domain columns
    extras        map<string,string> of open-world keys (schema evolution)
    __lsn, __tx_id, __ts_ms                              explicit ordering
    topic, partition, offset                             lineage

Everything is native Spark SQL expressions (JVM-side, no Python): from_json
for the envelope (P1), trim-filter for tombstones (P2), op dispatch via
CASE (P3), string-encoded inner-payload unwrap via a second from_json (P4,
sync.go:207-217), key coercion via StringType parsing (P5, fmt.Sprint
analog sync.go:227-235), is_delete truthiness (P7, sync.go:162-174).

Parse-cost design (this is the per-row hot path of the whole engine):
the row `value` JSON is scanned exactly ONCE for plain upserts — a single
from_json whose schema types `after` as map<string,string>, so one
Jackson pass yields the envelope scaffolding AND the open-world after
image together. All domain columns ARE strings (input_hint), so the map
gives both the typed fields and the extras; numeric/bool tokens render as
their text = the reference's fmt.Sprint coercion (sync.go:227-231), and a
nested object value renders as its JSON text. The string-encoded inner
payload (P4) adds a second, conditional scan of only the inner text. An
earlier 5-scan version (typed after struct + get_json_object + 2 map
scans) was 2.3x slower end-to-end; the 2-scan intermediate (after as raw
string + separate map scan) was ~35% slower than this.

The soft-delete-via-update rule (an op=u event can MEAN delete,
sync.go:69-76 / SURVEY.md section 3.2) is resolved HERE into effective_op,
so ordering and MERGE downstream are op-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import DOMAIN_COLS, LSN_COL, OFFSET_COL, TS_COL, TX_COL

# Keys of `after` that are NOT open-world extras. `route` is reserved:
# it is the sink's routing-identity column (P8), so a payload field of
# that name is dropped rather than allowed to collide.
_KNOWN_AFTER_KEYS = [*DOMAIN_COLS, "is_delete", "payload", "route"]

_MAP_SS = "map<string,string>"

# Parse-side envelope: `after` typed as map<string,string> INSIDE the
# envelope schema, so one Jackson scan of `value` yields scaffolding AND
# the open-world after image together; `before` typed to just the key
# columns a delete needs (sync.go:146-156).
#
# The `source` / `transaction` blocks carry the standard Debezium v2
# Postgres fields (a real topic's envelopes parse unchanged — see
# tests/test_debezium_corpus.py): `transaction.id` is a STRING in real
# Debezium output (e.g. "571"), so it is parsed as text and cast, with
# `source.txId` (numeric) as the fallback; from_json silently ignores
# the top-level `schema` block a schemas.enable=true connector emits.
PARSE_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField(
                        "before",
                        T.StructType(
                            [
                                T.StructField("repo", T.StringType(), True),
                                T.StructField("path", T.StringType(), True),
                                # field-derived routing (route_from_fields):
                                # a delete's route comes from `before`
                                # (sync.go:146-156, ResolveIndex over the
                                # before map); unused in topic-route mode
                                T.StructField("app_name", T.StringType(), True),
                                T.StructField("collection", T.StringType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField(
                        "after", T.MapType(T.StringType(), T.StringType()), True
                    ),
                    T.StructField("op", T.StringType(), True),
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField("ts_us", T.LongType(), True),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("version", T.StringType(), True),
                                T.StructField("connector", T.StringType(), True),
                                T.StructField("name", T.StringType(), True),
                                T.StructField("ts_ms", T.LongType(), True),
                                T.StructField("ts_us", T.LongType(), True),
                                T.StructField("snapshot", T.StringType(), True),
                                T.StructField("db", T.StringType(), True),
                                T.StructField("sequence", T.StringType(), True),
                                T.StructField("schema", T.StringType(), True),
                                T.StructField("table", T.StringType(), True),
                                T.StructField("txId", T.LongType(), True),
                                T.StructField("lsn", T.LongType(), True),
                                T.StructField("xmin", T.LongType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField(
                        "transaction",
                        T.StructType(
                            [
                                T.StructField("id", T.StringType(), True),
                                T.StructField("total_order", T.LongType(), True),
                                T.StructField(
                                    "data_collection_order", T.LongType(), True
                                ),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)


def _not_known(k: Column) -> Column:
    return ~k.isin(_KNOWN_AFTER_KEYS)


# Column expression trees are IMMUTABLE unresolved expressions — they bind
# to a DataFrame only at analysis time — so the whole parse plan's columns
# are built once per process and reused by every micro-batch. Building
# them is pure py4j round-trips (measured 0.3-1.1 s per batch on the 2M
# micro-batch profile: hundreds of JVM calls for the when-trees), a fixed
# driver-serial cost the hot loop should not re-pay. Cache key: the
# route_from_fields flag (two variants). The cache holds py4j handles into
# the gateway JVM, which outlives SparkSession.stop() within a process.
_PLAN_CACHE: dict[bool, tuple[dict, list]] = {}


def parse_envelopes(raw: DataFrame, route_from_fields: bool = False) -> DataFrame:
    """P1-P10: Kafka records -> normalized change rows (all statuses kept;
    downstream filters on status, metrics counts every status).

    route_from_fields=True is the reference's exact routing semantic
    (ResolveIndex, sync.go:176-196): route = '{app_name}_{collection}'
    derived from the record's FIELDS — the selected doc for upserts (with
    a flat after-image value winning on key presence, the extractDocument
    carry-over sync.go:239-245), the `before` image for deletes — and a
    record whose app_name or collection is null/empty becomes a
    'missing_route' dead letter (the skip at sync.go:54-67). The consumed
    fields are dropped from the doc (sync.go:78-81), so they are not
    extras in this mode. Divergence, documented: a present-but-JSON-null
    field counts as MISSING here, where Go's fmt.Sprint(nil) renders the
    non-empty text '<nil>' — an artifact no real producer emits.

    The default (False) keeps topic-as-route: Debezium is
    one-topic-per-table, so the topic IS the routing identity."""
    key = bool(route_from_fields)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = _build_parse_cols(key)
    stage, select_cols = _PLAN_CACHE[key]
    df = raw
    for name, col in stage.items():
        df = df.withColumn(name, col)
    return df.select(*select_cols)


def _build_parse_cols(route_from_fields: bool) -> tuple[dict, list]:
    """The staged projections + final select list of the parse plan, as
    pure Column trees over the Kafka-shaped input columns. The staging
    (_env/_after/_inner/_docm as named intermediate columns referenced
    multiple times downstream) is load-bearing: each from_json scan stays
    a single evaluation in the physical plan."""
    v = F.trim(F.col("value"))
    is_tombstone = F.col("value").isNull() | (v == "") | (v == "null")

    stage = {"_env": F.from_json(F.col("value"), PARSE_ENVELOPE_SCHEMA)}
    p = F.col("_env.payload")

    # from_json yields null struct on malformed JSON (PERMISSIVE); an
    # envelope without op is equally unusable (sync.go:129-132).
    is_malformed = ~is_tombstone & (p.isNull() | p.getField("op").isNull())

    op = p.getField("op")
    before = p.getField("before")

    # `after` came out of scan 1 as map<string,string> (typed fields AND
    # extras together); scan 2 (conditional, small): the string-encoded
    # inner payload (P4). Map values render any JSON token as its text.
    #
    # Document selection mirrors sync.go:198-224 exactly:
    #   * `payload` key present  -> the inner doc REPLACES the flat after
    #     image (doc = inner; flat fields are NOT merged in). A string
    #     payload that fails to parse as a JSON object is an ERROR and the
    #     record is skipped (sync.go:208-210 -> status='bad_payload'); a
    #     present-but-null payload contributes an empty doc (sync.go:216).
    #   * else a `doc` sub-map   -> doc = after.doc (sync.go:219-220); a
    #     non-object `doc` value falls through to doc = after, where it
    #     remains an opaque extra field (Go type assertion fails).
    #   * else                   -> doc = after (sync.go:221-222).
    # Base carry-over after selection (sync.go:226-245): the key fields
    # (the reference's `id`) fall back to the flat after image, and a flat
    # `is_delete` OVERRIDES the inner one.
    #
    # Known engine-vs-reference divergence (unobservable in the map
    # encoding, documented rather than faked): a payload value that is a
    # non-string JSON scalar/array (e.g. 42, [1,2]) renders identically to
    # the same text inside a string, so the engine classifies both as
    # 'bad_payload' where Go gives the non-string forms an empty doc
    # (sync.go:216-217). Neither shape occurs in real Debezium output.
    stage["_after"] = p.getField("after")
    stage["_inner"] = F.from_json(
        F.element_at(F.col("_after"), "payload"), _MAP_SS
    )
    stage["_docm"] = F.from_json(F.element_at(F.col("_after"), "doc"), _MAP_SS)
    after_map = F.col("_after")
    inner_map = F.col("_inner")
    doc_map = F.col("_docm")

    empty_map = F.create_map().cast(_MAP_SS)
    has_payload = after_map.isNotNull() & F.map_contains_key(after_map, "payload")
    payload_val = F.element_at(after_map, "payload")
    # payload present, non-null, but not a JSON object => reference error
    # path (sync.go:208-210): skip the record as a dead letter.
    bad_payload = (
        op.isin("c", "r", "u")
        & has_payload
        & payload_val.isNotNull()
        & inner_map.isNull()
    )

    # sync.go:204-222 selection; sel is the reference's `doc`.
    sel = (
        F.when(has_payload, F.coalesce(inner_map, empty_map))
        .when(doc_map.isNotNull(), doc_map)
        .otherwise(F.coalesce(after_map, empty_map))
    )

    def from_doc(field: str) -> Column:
        return F.element_at(sel, field)

    # P5: key coercion + delete-key-from-before (sync.go:146-156); upsert
    # keys fall back from doc to the flat after image (sync.go:226-231).
    def key_field(field: str) -> Column:
        return F.when(op == "d", before.getField(field)).otherwise(
            F.coalesce(from_doc(field), F.element_at(after_map, field))
        )

    repo = key_field("repo")
    path = key_field("path")

    # P7: is_delete truthiness; a flat after.is_delete overrides the inner
    # one (sync.go:237-239 copies base's value into doc last). The
    # override is gated on key PRESENCE, not value non-nullness: a flat
    # {"is_delete": null} next to an inner "true" means NOT deleted (the
    # reference copies the nil value last, which is non-truthy), so
    # coalescing over the flat value would wrongly fall through to the
    # inner one. from_json keeps null-valued keys in the map, so
    # map_contains_key sees them.
    flat_has_is_del = after_map.isNotNull() & F.map_contains_key(
        after_map, "is_delete"
    )
    is_del_raw = F.when(
        flat_has_is_del, F.element_at(after_map, "is_delete")
    ).otherwise(from_doc("is_delete"))
    is_del = F.lower(F.coalesce(is_del_raw, F.lit("false"))).isin("true", "1")

    known_op = op.isin("c", "r", "u", "d")
    effective_op = F.when(op == "d", F.lit("d")).otherwise(
        F.when(is_del, F.lit("d")).otherwise(F.lit("u"))
    )

    missing_key = (
        ~is_tombstone
        & ~is_malformed
        & known_op
        & ~bad_payload
        & (repo.isNull() | (repo == "") | path.isNull() | (path == ""))
    )

    status = (
        F.when(is_tombstone, F.lit("tombstone"))
        .when(is_malformed, F.lit("malformed"))
        .when(~known_op, F.lit("unknown_op"))
        .when(bad_payload, F.lit("bad_payload"))
        .when(missing_key, F.lit("missing_key"))
    )

    if route_from_fields:
        # ResolveIndex (sync.go:176-196): route fields come from the
        # selected doc with flat-after-image override on key PRESENCE
        # (extractDocument copies base's value last, sync.go:239-245);
        # a delete's come from `before` (the doc handed to ResolveIndex
        # on the op='d' branch, sync.go:153-156).
        def route_field(field: str) -> Column:
            flat_has = after_map.isNotNull() & F.map_contains_key(after_map, field)
            upsert_val = F.when(flat_has, F.element_at(after_map, field)).otherwise(
                from_doc(field)
            )
            return F.when(op == "d", before.getField(field)).otherwise(upsert_val)

        app_name = route_field("app_name")
        collection = route_field("collection")
        missing_route = (
            app_name.isNull()
            | (app_name == "")
            | collection.isNull()
            | (collection == "")
        )
        status = status.when(missing_route, F.lit("missing_route")).otherwise(
            F.lit("ok")
        )
        # Dead letters keep the topic as their partition identity (the
        # DLQ layout); only ok rows carry the derived route.
        route = F.when(
            status == "ok", F.concat_ws("_", app_name, collection)
        ).otherwise(F.col("topic"))
    else:
        status = status.otherwise(F.lit("ok"))
        # P8 default: each source topic IS the route (one topic per source
        # table in Debezium), materialized as a sink identity column.
        route = F.col("topic")

    # Open-world extras: every key of the SELECTED doc outside the known
    # set (replace semantics — flat extras are dropped when an inner
    # payload/doc was unwrapped, exactly as the reference's doc is the
    # inner map alone, sync.go:204-222). Field-routing consumes its two
    # fields (the reference deletes them from the doc, sync.go:78-81).
    if route_from_fields:
        extras = F.map_filter(
            sel, lambda k, _: _not_known(k) & ~k.isin("app_name", "collection")
        )
    else:
        extras = F.map_filter(sel, lambda k, _: _not_known(k))

    return stage, [
        status.alias("status"),
        F.when(status == "ok", effective_op).alias("effective_op"),
        repo.alias("repo"),
        path.alias("path"),
        from_doc("commit").alias("commit"),
        from_doc("lang").alias("lang"),
        from_doc("content").alias("content"),
        F.when(status == "ok", extras).alias("extras"),
        # P8: routing identity column carried through the MERGE (derived
        # above: topic-as-route by default, ResolveIndex field derivation
        # with route_from_fields=True).
        route.alias("route"),
        F.coalesce(p.getField("source").getField("lsn"), F.lit(0)).alias(LSN_COL),
        # transaction.id is a STRING in real Debezium output ("571");
        # numeric source.txId is the fallback (same transaction).
        # try_cast, not cast: Spark 4 defaults to ANSI mode, where a
        # plain cast of a non-numeric id (e.g. SQL Server's
        # "0000002d:00000758:0003" composite form) would THROW and kill
        # the whole micro-batch — a poison pill escaping T4. try_cast
        # nulls it and falls through to source.txId.
        F.coalesce(
            p.getField("transaction").getField("id").try_cast("long"),
            p.getField("source").getField("txId"),
            F.lit(0),
        ).alias(TX_COL),
        F.coalesce(p.getField("source").getField("ts_ms"), F.lit(0)).alias(TS_COL),
        # Kafka arrival order as the final LWW tie-break (the reference's
        # implicit ordering); duplicated under the internal name so the
        # ordering key travels with the row while `offset` stays lineage.
        F.coalesce(F.col("offset"), F.lit(0)).alias(OFFSET_COL),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
    ]
