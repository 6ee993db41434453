"""Pure-Python oracle: replays the reference's sync semantics over an event
log and returns the final table state.

This is the correctness target for the Spark engine (SURVEY.md section 5.2
item 1). It mirrors, in plain dicts, the reference consumer's apply loop:

* tombstone skip            meilisearch-sync-service/internal/service/sync.go:124-127
* JSON unmarshal + skip     sync.go:129-132
* op dispatch c/r/u vs d    sync.go:51,91,114,136-158
* document extraction incl. string-encoded inner payload unwrap
                            sync.go:198-224
* key coercion to string (fmt.Sprint analog)   sync.go:227-235
* is_delete truthiness (true/"true"/"1")       sync.go:162-174
* soft-delete-via-update => physical delete    sync.go:69-76
* delete key from `before`                     sync.go:146-156
* missing key => skip                          sync.go:142-145

Events are applied in (lsn, tx_id, ts_ms, offset) order — the explicit
ordering that replaces Kafka per-partition arrival order (SURVEY.md J1).
Applying *all* events in order and the engine applying only the per-key
last writer produce the same final state because upserts replace whole rows
and deletes remove them.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Any

KNOWN_NON_DOMAIN = {"is_delete", "payload", "route"}


def _coerce_str(v: Any) -> str | None:
    """fmt.Sprint analog for key fields, matching Spark's JSON string
    coercion of scalar tokens (number 123 -> "123", bool true -> "true",
    float 1.0 -> "1.0" — Spark keeps the decimal point on float tokens,
    so an integral float must NOT collapse to its int text; verified on
    PySpark 4.1). Exotic exponent forms (1e22) may still render
    differently (Python '1e+22' vs Java '1.0E22') — no generator or
    corpus shape produces them."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        # matches Spark's compact JSON rendering of nested tokens in a
        # map<string,string> read — which emits raw UTF-8, so non-ASCII
        # must not be \\u-escaped here
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
    return str(v)


_INT64_MIN, _INT64_MAX = -(1 << 63), (1 << 63) - 1
# Spark's UTF8String.toLongExact: optional surrounding whitespace, an
# optional sign, then digits only — "57.5", "1e3", "5_0" are all null.
_LONG_TEXT = re.compile(r"[+-]?[0-9]+")


def _ord_int(v: Any, from_string: bool = False) -> int | None:
    """Numeric coercion of an ordering field, mirroring the engine's
    from_json typing EXACTLY (each rule verified against Spark 4.1).
    from_string=False mirrors a LongType schema field (source.lsn /
    source.ts_ms / source.txId): a JSON string value — even a
    numeric-looking "123" — parses to null there, and so does ANY float
    token (12.5 AND integral 1e3), so both coerce to None here too.
    from_string=True mirrors the transaction.id path (parsed as
    StringType — which renders any scalar token as its text — then
    try_cast('long'), which accepts only integral text): numeric text
    DOES coerce, float tokens/text do not. Either way, values outside
    int64 overflow to null."""
    if v is None or isinstance(v, bool):
        return None
    if isinstance(v, float):
        return None
    if isinstance(v, str):
        if not from_string:
            return None
        if not _LONG_TEXT.fullmatch(v.strip()):
            return None
        n = int(v.strip())
    else:
        try:
            n = int(v)
        except (TypeError, ValueError):
            return None
    return n if _INT64_MIN <= n <= _INT64_MAX else None


def _truthy_delete(v: Any) -> bool:
    """Truthiness through the engine's map<string,string> lens: the
    engine reads is_delete as the RENDERED text, so numeric 1 (tinyint
    soft-delete flag, realistic Debezium output) renders "1" and deletes,
    while 1.0 renders "1.0" and does not."""
    s = _coerce_str(v)
    return s is not None and s.lower() in ("true", "1")


def extract_doc(after: dict, engine_exact: bool = True) -> dict | None:
    """sync.go:198-245. Returns None when the record must be SKIPPED
    (string payload that fails to parse as a JSON object — sync.go:208-210
    returns an error and the consumer loop drops the record).

    Selection (sync.go:204-222): a present `payload` key REPLACES the flat
    after image (string -> must parse to an object, object -> taken as-is,
    any other type -> empty doc); else a `doc` sub-map is unwrapped; else
    the flat after image is the doc. Carry-over (sync.go:226-245): the key
    fields fall back to the flat image, and a flat `is_delete` overrides
    the inner one.

    engine_exact (default): an inline NON-STRING scalar/array payload
    (e.g. {"payload": 42} or {"payload": [1,2]}) is classified a skip,
    matching the Spark engine's 'bad_payload' status — in the engine's
    map<string,string> encoding that shape is indistinguishable from the
    same text inside a string (parse.py documents the divergence). Pass
    engine_exact=False for reference-exact Go behavior (empty doc,
    sync.go:216-217). Neither shape occurs in real Debezium output."""
    if "payload" in after:
        p = after["payload"]
        if isinstance(p, str):
            try:
                parsed = json.loads(p)
            except (ValueError, TypeError):
                return None
            if not isinstance(parsed, dict):
                return None
            doc = dict(parsed)
        elif isinstance(p, dict):
            doc = dict(p)
        elif p is None or not engine_exact:
            # present-but-null payload => empty doc in BOTH modes
            # (sync.go:216; the engine's coalesce(inner, empty_map) agrees)
            doc = {}
        else:
            return None
    elif isinstance(after.get("doc"), dict):
        doc = dict(after["doc"])
    elif isinstance(after.get("doc"), str):
        # The engine sees the map-RENDERED text of `doc` and re-parses it
        # with from_json (parse.py), so a STRING value holding a JSON
        # object unwraps exactly like an object value; any other text
        # falls back to the flat image with `doc` kept as an opaque
        # extra (from_json yields null).
        try:
            parsed = json.loads(after["doc"])
        except (ValueError, TypeError):
            parsed = None
        doc = dict(parsed) if isinstance(parsed, dict) else dict(after)
    else:
        doc = dict(after)

    # id-analog fallback: doc[key] else base[key] (sync.go:226-231)
    for kf in ("repo", "path"):
        if doc.get(kf) is None and after.get(kf) is not None:
            doc[kf] = after[kf]
    # flat is_delete overrides inner (sync.go:237-239)
    if "is_delete" in after:
        doc["is_delete"] = after["is_delete"]
    return doc


def replay(events: list[dict]) -> dict:
    """Replay Kafka-shaped records (dicts with key/value/topic/partition/
    offset). Returns {"state": {(repo,path): row}, "counts": {...}}.
    Row values are stringified the way the Spark engine stores them
    (everything is a string column in the open-world extras model).
    """
    counts = {
        "tombstone": 0,
        "malformed": 0,
        "unknown_op": 0,
        "bad_payload": 0,
        "missing_key": 0,
        "upserts": 0,
        "deletes": 0,
    }
    parsed = []
    for rec in events:
        v = rec.get("value")
        if v is None or v.strip() == "" or v.strip() == "null":
            counts["tombstone"] += 1
            continue
        try:
            env = json.loads(v)
        except (ValueError, TypeError):
            counts["malformed"] += 1
            continue
        payload = env.get("payload") if isinstance(env, dict) else None
        # the engine reads op through the map<string,string> rendering,
        # so a NON-STRING scalar token (op: 5) becomes the text "5" and
        # classifies unknown_op, not malformed; only a missing/null op
        # is malformed
        op_tok = _coerce_str(payload.get("op")) if isinstance(payload, dict) else None
        if not isinstance(payload, dict) or op_tok is None:
            counts["malformed"] += 1
            continue
        payload = dict(payload)
        payload["op"] = op_tok
        src = payload.get("source") or {}
        tx = payload.get("transaction") or {}
        lsn = _ord_int(src.get("lsn")) or 0
        # transaction.id is a string in real Debezium output ("571");
        # numeric source.txId is the fallback — mirrors parse.py
        tx_id = _ord_int(tx.get("id"), from_string=True)
        if tx_id is None:
            tx_id = _ord_int(src.get("txId"))
        parsed.append(
            (
                (lsn, tx_id or 0, _ord_int(src.get("ts_ms")) or 0,
                 rec.get("offset") or 0),
                payload,
                rec.get("topic"),
            )
        )

    parsed.sort(key=lambda t: t[0])

    state: dict[tuple[str, str], dict] = {}
    for ordkey, payload, topic in parsed:
        op = payload["op"]
        if op in ("c", "r", "u"):
            after = payload.get("after")
            if not isinstance(after, dict):
                counts["missing_key"] += 1
                continue
            doc = extract_doc(after)
            if doc is None:  # unparseable inner payload => skip (sync.go:208-210)
                counts["bad_payload"] += 1
                continue
            repo = _coerce_str(doc.get("repo"))
            path = _coerce_str(doc.get("path"))
            if not repo or not path:
                counts["missing_key"] += 1
                continue
            if _truthy_delete(doc.get("is_delete")):
                state.pop((repo, path), None)
                counts["deletes"] += 1
            else:
                row = {
                    k: _coerce_str(v)
                    for k, v in doc.items()
                    if k not in KNOWN_NON_DOMAIN
                }
                row["repo"], row["path"] = repo, path
                # routing identity of the winning event (index-identity
                # analog, sync.go:176-196)
                row["route"] = topic
                state[(repo, path)] = row
                counts["upserts"] += 1
        elif op == "d":
            before = payload.get("before")
            if not isinstance(before, dict):
                counts["missing_key"] += 1
                continue
            repo = _coerce_str(before.get("repo"))
            path = _coerce_str(before.get("path"))
            if not repo or not path:
                counts["missing_key"] += 1
                continue
            state.pop((repo, path), None)
            counts["deletes"] += 1
        else:
            counts["unknown_op"] += 1

    return {"state": state, "counts": counts}


def replay_parquet_log(log_dir: str) -> dict:
    """Replay an on-disk parquet event log (driver-side, test scale only)."""
    import pyarrow.dataset as ds

    table = ds.dataset(log_dir, format="parquet").to_table()
    return replay(table.to_pylist())


def content_sha256(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], str]:
    """Per-row sha256(content) — the BASELINE.json input_hint invariant."""
    return {
        k: hashlib.sha256((row.get("content") or "").encode("utf-8")).hexdigest()
        for k, row in state.items()
    }
