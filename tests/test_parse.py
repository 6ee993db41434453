"""Operator-level unit tests for parse.py (SURVEY.md section 5.2 item 2):
tombstones P2, malformed P1, op dispatch P3, string-encoded payload unwrap
P4, key coercion P5, is_delete truthiness P7, missing-key filter P9,
unknown-op skip P3."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pyspark_cdc.generate import edge_case_df
from pyspark_cdc.parse import parse_envelopes
from pyspark_cdc.schemas import KAFKA_SHAPE


def _parse_one(spark, value, offset=0):
    df = spark.createDataFrame(
        [{"key": None, "value": value, "topic": "t", "partition": 0, "offset": offset}],
        schema=KAFKA_SHAPE,
    )
    return parse_envelopes(df).collect()[0]


def _env(op, after=None, before=None, lsn=1, tx=None):
    p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn}}
    if tx is not None:
        p["transaction"] = {"id": tx}
    if after is not None:
        p["after"] = after
    if before is not None:
        p["before"] = before
    return json.dumps({"payload": p})


def test_tombstones(spark):
    for v in (None, "", "   ", "null"):
        assert _parse_one(spark, v)["status"] == "tombstone"


def test_malformed_json(spark):
    for v in ('{"payload": {broken', "[1,2,3]", '{"payload": 7}', '{"nope": 1}'):
        assert _parse_one(spark, v)["status"] == "malformed"


def test_unknown_op_skipped_not_failed(spark):
    r = _parse_one(spark, _env("x", {"repo": "a", "path": "b"}))
    assert r["status"] == "unknown_op"
    assert r["effective_op"] is None


def test_upsert_ops(spark):
    for op in ("c", "r", "u"):
        r = _parse_one(spark, _env(op, {"repo": "a", "path": "b", "content": "x"}))
        assert (r["status"], r["effective_op"]) == ("ok", "u")
        assert r["content"] == "x"


def test_hard_delete_key_from_before(spark):
    r = _parse_one(spark, _env("d", before={"repo": "a", "path": "b"}))
    assert (r["status"], r["effective_op"]) == ("ok", "d")
    assert (r["repo"], r["path"]) == ("a", "b")


def test_soft_delete_truthiness(spark):
    # sync.go:162-174: bool true / "true" / "1" delete; others don't
    for v in (True, "true", "1", "TRUE", "True"):
        r = _parse_one(spark, _env("u", {"repo": "a", "path": "b", "is_delete": v}))
        assert r["effective_op"] == "d", v
    for v in (False, "false", "0", "", "yes", None):
        r = _parse_one(spark, _env("u", {"repo": "a", "path": "b", "is_delete": v}))
        assert r["effective_op"] == "u", v


def test_numeric_key_coerced_to_string(spark):
    # fmt.Sprint analog (sync.go:227-231)
    r = _parse_one(spark, _env("c", {"repo": 123, "path": 456, "content": "x"}))
    assert (r["repo"], r["path"]) == ("123", "456")
    assert r["status"] == "ok"


def test_missing_key_dead_letter(spark):
    r = _parse_one(spark, _env("c", {"content": "orphan"}))
    assert r["status"] == "missing_key"
    r = _parse_one(spark, _env("c", {"repo": "", "path": "b"}))
    assert r["status"] == "missing_key"
    r = _parse_one(spark, _env("d", before={}))
    assert r["status"] == "missing_key"


def test_string_encoded_payload_unwrap(spark):
    # sync.go:207-217: inner payload may be string-encoded JSON
    inner = json.dumps({"commit": "abc", "lang": "go", "content": "inner wins"})
    r = _parse_one(
        spark,
        _env("c", {"repo": "a", "path": "b", "content": "outer", "payload": inner}),
    )
    assert r["status"] == "ok"
    assert (r["commit"], r["lang"], r["content"]) == ("abc", "go", "inner wins")


def test_object_payload_unwrap(spark):
    # payload may also arrive as a map (sync.go:213)
    r = _parse_one(
        spark,
        _env("c", {"repo": "a", "path": "b", "payload": {"commit": "obj", "lang": "ts"}}),
    )
    assert r["status"] == "ok"
    assert (r["commit"], r["lang"]) == ("obj", "ts")


def test_payload_replaces_flat_image(spark):
    # sync.go:204-217: the unwrapped doc REPLACES the flat after image —
    # flat domain fields and flat extras do not leak through
    inner = json.dumps({"commit": "abc", "lang": "go"})
    r = _parse_one(
        spark,
        _env(
            "c",
            {"repo": "a", "path": "b", "content": "flat", "branch": "flat",
             "payload": inner},
        ),
    )
    assert r["status"] == "ok"
    assert r["content"] is None  # not in the inner doc => gone
    assert "branch" not in (r["extras"] or {})


def test_unparseable_payload_is_dead_letter(spark):
    # sync.go:208-210: a string payload that fails to parse as a JSON
    # object errors out => the record is skipped (and counted)
    for p in ("{not json", '"just a scalar"', "[1, 2]"):
        r = _parse_one(
            spark, _env("c", {"repo": "a", "path": "b", "lang": "py", "payload": p})
        )
        assert r["status"] == "bad_payload", p
        assert r["effective_op"] is None


def test_null_payload_empty_doc(spark):
    # present-but-null payload => empty doc (sync.go:216-217 default
    # branch); keys fall back to the flat image, other fields are gone
    r = _parse_one(
        spark, _env("c", {"repo": "a", "path": "b", "lang": "py", "payload": None})
    )
    assert r["status"] == "ok"
    assert (r["repo"], r["path"]) == ("a", "b")
    assert r["lang"] is None


def test_doc_submap_fallback(spark):
    # sync.go:219-220: no payload key + `doc` object => doc IS the document
    r = _parse_one(
        spark,
        _env("c", {"repo": "a", "path": "b", "doc": {"commit": "dc", "lang": "rs"}}),
    )
    assert r["status"] == "ok"
    assert (r["commit"], r["lang"]) == ("dc", "rs")
    # a non-object `doc` value is NOT unwrapped (Go type assertion fails)
    # => doc = after, and the opaque value remains an extra field
    r = _parse_one(spark, _env("c", {"repo": "a", "path": "b", "doc": "opaque"}))
    assert r["status"] == "ok"
    assert r["extras"] == {"doc": "opaque"}


def test_flat_is_delete_overrides_inner(spark):
    # sync.go:237-239: base's is_delete is copied into the doc LAST
    inner_del = json.dumps({"commit": "x", "is_delete": "true"})
    r = _parse_one(
        spark,
        _env("u", {"repo": "a", "path": "b", "is_delete": "0", "payload": inner_del}),
    )
    assert (r["status"], r["effective_op"]) == ("ok", "u")
    # inner-only is_delete still decides when the base has none
    r = _parse_one(
        spark, _env("u", {"repo": "a", "path": "b", "payload": inner_del})
    )
    assert (r["status"], r["effective_op"]) == ("ok", "d")
    # flat is_delete present-but-JSON-NULL also overrides (the reference
    # copies the nil value last, which is non-truthy => upsert): the
    # override is gated on key PRESENCE, not value non-nullness
    r = _parse_one(
        spark,
        _env("u", {"repo": "a", "path": "b", "is_delete": None, "payload": inner_del}),
    )
    assert (r["status"], r["effective_op"]) == ("ok", "u")


def test_extras_capture_unknown_columns(spark):
    r = _parse_one(
        spark,
        _env("c", {"repo": "a", "path": "b", "branch": "release/1", "stars": 7}),
    )
    assert r["extras"] == {"branch": "release/1", "stars": "7"}


def test_extras_come_from_the_selected_doc(spark):
    inner = json.dumps({"branch": "inner"})
    r = _parse_one(
        spark, _env("c", {"repo": "a", "path": "b", "branch": "flat", "payload": inner})
    )
    assert r["extras"] == {"branch": "inner"}  # replace, not merge


def test_ordering_metadata_materialized(spark):
    r = _parse_one(spark, _env("u", {"repo": "a", "path": "b"}, lsn=99, tx=7))
    assert (r["__lsn"], r["__tx_id"], r["__ts_ms"]) == (99, 7, 99)


def test_edge_case_log_statuses(spark):
    parsed = parse_envelopes(edge_case_df(spark))
    counts = {r["status"]: r["n"] for r in parsed.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert counts["tombstone"] == 2
    assert counts["malformed"] == 1
    assert counts["unknown_op"] == 1
    assert counts["bad_payload"] == 1
    assert counts["missing_key"] == 1


# --- route_from_fields: the reference's ResolveIndex routing ----------------


def _parse_fr(spark, value, offset=0):
    df = spark.createDataFrame(
        [{"key": None, "value": value, "topic": "t", "partition": 0,
          "offset": offset}],
        schema=KAFKA_SHAPE,
    )
    return parse_envelopes(df, route_from_fields=True).collect()[0]


def _doc(**extra):
    d = {"repo": "r", "path": "p", "commit": "c", "lang": "py", "content": "v"}
    d.update(extra)
    return d


def test_field_route_from_flat_fields(spark):
    r = _parse_fr(spark, _env("u", _doc(app_name="shop", collection="users")))
    assert r["status"] == "ok" and r["route"] == "shop_users"
    # the consumed fields are NOT extras (the reference deletes them from
    # the doc before indexing, sync.go:78-81)
    assert "app_name" not in (r["extras"] or {})
    assert "collection" not in (r["extras"] or {})


def test_field_route_missing_collection_is_dead_letter(spark):
    r = _parse_fr(spark, _env("u", _doc(app_name="shop")))
    assert r["status"] == "missing_route"
    r = _parse_fr(spark, _env("u", _doc(app_name="", collection="users")))
    assert r["status"] == "missing_route"


def test_field_route_delete_uses_before(spark):
    r = _parse_fr(spark, _env(
        "d", before={"repo": "r", "path": "p", "app_name": "crm",
                     "collection": "pages"}))
    assert r["status"] == "ok" and r["route"] == "crm_pages"
    r = _parse_fr(spark, _env("d", before={"repo": "r", "path": "p"}))
    assert r["status"] == "missing_route"


def test_field_route_flat_overrides_inner(spark):
    inner = json.dumps(_doc(app_name="decoy", collection="decoy"))
    r = _parse_fr(spark, _env("u", {
        "repo": "r", "path": "p", "payload": inner,
        "app_name": "shop", "collection": "users",
    }))
    assert r["status"] == "ok" and r["route"] == "shop_users"


def test_field_route_inner_payload_fields(spark):
    inner = json.dumps(_doc(app_name="wiki", collection="pages"))
    r = _parse_fr(spark, _env("u", {"repo": "r", "path": "p", "payload": inner}))
    assert r["status"] == "ok" and r["route"] == "wiki_pages"


def test_field_route_missing_key_takes_priority(spark):
    # no repo/path anywhere -> missing_key, NOT missing_route
    r = _parse_fr(spark, _env("u", {"app_name": "shop"}))
    assert r["status"] == "missing_key"


def test_field_route_default_mode_unchanged(spark):
    r = _parse_one(spark, _env("u", _doc(app_name="shop", collection="users")))
    assert r["status"] == "ok" and r["route"] == "t"  # topic-as-route
    assert (r["extras"] or {}).get("app_name") == "shop"  # stays an extra
