"""A corpus of verbatim Debezium v2 (Postgres/pgoutput) envelopes replayed
through parse -> LWW -> MERGE, de-risking the one source shape the sandbox
cannot exercise live (no Kafka broker): a REAL topic's messages must parse
unchanged.

Shapes covered (per the Debezium 2.5 Postgres connector's documented
output; the reference's own minimal examples are
meilisearch-sync-service/README.md:93-119 and docs/debezium 部署.md:144-151):

* full `source` blocks: version/connector/name/ts_ms/snapshot/db/
  sequence/schema/table/txId/lsn/xmin (+ ts_us on 2.5+)
* `transaction` block with STRING id ("571") + total_order — and
  envelopes without it (provide.transaction.metadata=false), where
  numeric source.txId is the ordering fallback
* schemas.enable=true envelopes carrying the top-level `schema` block
* snapshot reads op=r with source.snapshot "first"/"true"/"last"
* delete with REPLICA IDENTITY DEFAULT (key-only before) and FULL
  (whole-row before), each followed by a Kafka tombstone
* unchanged-TOAST placeholder value (passes through opaquely, exactly as
  the reference would index the placeholder string)
* numeric / boolean / null field values in `after`
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pyspark_cdc import oracle
from pyspark_cdc.parse import parse_envelopes
from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import process_batch

TOPIC = "pg.public.repo_files"

_SCHEMA_BLOCK = """{
  "type": "struct",
  "fields": [
    {"type": "struct", "fields": [
      {"type": "string", "optional": false, "field": "repo"},
      {"type": "string", "optional": false, "field": "path"},
      {"type": "string", "optional": true, "field": "commit"},
      {"type": "string", "optional": true, "field": "lang"},
      {"type": "string", "optional": true, "field": "content"}
    ], "optional": true, "name": "pg.public.repo_files.Value", "field": "before"},
    {"type": "struct", "fields": [
      {"type": "string", "optional": false, "field": "repo"},
      {"type": "string", "optional": false, "field": "path"},
      {"type": "string", "optional": true, "field": "commit"},
      {"type": "string", "optional": true, "field": "lang"},
      {"type": "string", "optional": true, "field": "content"}
    ], "optional": true, "name": "pg.public.repo_files.Value", "field": "after"},
    {"type": "string", "optional": false, "field": "op"},
    {"type": "int64", "optional": true, "field": "ts_ms"}
  ],
  "optional": false,
  "name": "pg.public.repo_files.Envelope"
}"""


def _source(lsn, tx_id, ts_ms, snapshot="false", seq=True):
    s = {
        "version": "2.5.4.Final",
        "connector": "postgresql",
        "name": "pg",
        "ts_ms": ts_ms,
        "ts_us": ts_ms * 1000 + 123,
        "snapshot": snapshot,
        "db": "repodb",
        "sequence": json.dumps([str(lsn - 8), str(lsn)]) if seq else None,
        "schema": "public",
        "table": "repo_files",
        "txId": tx_id,
        "lsn": lsn,
        "xmin": None,
    }
    return s


def _tx(tx_id, order=1):
    return {
        "id": str(tx_id),  # STRING in real Debezium output
        "total_order": order,
        "data_collection_order": order,
    }


def corpus() -> list[dict]:
    """~20 envelopes in Kafka shape; LSNs/txIds are realistic pgoutput
    values."""
    ev = []
    off = [0]

    def add(value, repo=None, path=None):
        key = (
            json.dumps({"repo": repo, "path": path})
            if repo is not None
            else None
        )
        ev.append(
            {"key": key, "value": value, "topic": TOPIC, "partition": 0,
             "offset": off[0]}
        )
        off[0] += 1

    def env(op, after=None, before=None, lsn=0, tx_id=0, ts=0, snapshot="false",
            with_tx=True, with_schema=False, envelope_ts=True):
        payload = {
            "before": before,
            "after": after,
            "source": _source(lsn, tx_id, ts, snapshot=snapshot),
            "op": op,
        }
        if envelope_ts:
            payload["ts_ms"] = ts + 1
            payload["ts_us"] = (ts + 1) * 1000
        if with_tx:
            payload["transaction"] = _tx(tx_id)
        doc = {"payload": payload}
        if with_schema:
            doc["schema"] = json.loads(_SCHEMA_BLOCK)
        return json.dumps(doc)

    row = lambda repo, path, v, **extra: {  # noqa: E731
        "repo": repo, "path": path, "commit": f"{v:040d}", "lang": "py",
        "content": f"content of {repo}/{path} at v{v}", **extra,
    }

    # --- snapshot phase (op=r, snapshot first/true/last, no tx block) ---
    add(env("r", row("acme/api", "src/main.py", 1), lsn=23000000, tx_id=490,
            ts=1721280000000, snapshot="first", with_tx=False),
        "acme/api", "src/main.py")
    add(env("r", row("acme/api", "src/util.py", 2), lsn=23000000, tx_id=490,
            ts=1721280000050, snapshot="true", with_tx=False),
        "acme/api", "src/util.py")
    add(env("r", row("acme/web", "app/index.ts", 3, lang="ts"), lsn=23000000,
            tx_id=490, ts=1721280000100, snapshot="last", with_tx=False),
        "acme/web", "app/index.ts")

    # --- streaming phase ---
    # create with schemas.enable=true (top-level schema block)
    add(env("c", row("acme/api", "src/new.py", 4), lsn=23001200, tx_id=571,
            ts=1721280010000, with_schema=True), "acme/api", "src/new.py")
    # plain update (REPLICA IDENTITY DEFAULT: before=null)
    add(env("u", row("acme/api", "src/main.py", 5), lsn=23002416, tx_id=572,
            ts=1721280020000), "acme/api", "src/main.py")
    # update with REPLICA IDENTITY FULL (whole-row before present)
    add(env("u", row("acme/api", "src/util.py", 6),
            before=row("acme/api", "src/util.py", 2), lsn=23003568, tx_id=573,
            ts=1721280030000), "acme/api", "src/util.py")
    # update without transaction block: source.txId is the ordering
    add(env("u", row("acme/web", "app/index.ts", 7, lang="ts"), lsn=23004744,
            tx_id=574, ts=1721280040000, with_tx=False),
        "acme/web", "app/index.ts")
    # numeric/boolean/null extra columns (open-world payload)
    add(env("c", row("acme/web", "app/feature.ts", 8, lang="ts", stars=42,
                     archived=False, reviewer=None),
            lsn=23005920, tx_id=575, ts=1721280050000),
        "acme/web", "app/feature.ts")
    # unchanged-TOAST placeholder passes through opaquely
    add(env("u", row("acme/api", "src/new.py", 9,
                     content="__debezium_unavailable_value"),
            lsn=23007112, tx_id=576, ts=1721280060000), "acme/api", "src/new.py")
    # delete, REPLICA IDENTITY DEFAULT (key-only before) + Kafka tombstone
    add(env("d", before={"repo": "acme/web", "path": "app/feature.ts"},
            lsn=23008336, tx_id=577, ts=1721280070000),
        "acme/web", "app/feature.ts")
    add("", "acme/web", "app/feature.ts")  # tombstone
    # delete, REPLICA IDENTITY FULL (whole-row before) + tombstone
    add(env("d", before=row("acme/api", "src/util.py", 6), lsn=23009560,
            tx_id=578, ts=1721280080000), "acme/api", "src/util.py")
    add("", "acme/api", "src/util.py")
    # same-lsn ordering: two updates in one tx, transaction order decides
    # via offset (total_order is informational); later offset wins
    add(env("u", row("acme/api", "src/main.py", 10), lsn=23010784, tx_id=579,
            ts=1721280090000), "acme/api", "src/main.py")
    add(env("u", row("acme/api", "src/main.py", 11), lsn=23010784, tx_id=579,
            ts=1721280090000), "acme/api", "src/main.py")
    # out-of-order arrival across partitions: older lsn arrives later
    add(env("u", row("acme/web", "app/index.ts", 12, lang="ts"), lsn=23012008,
            tx_id=580, ts=1721280100000), "acme/web", "app/index.ts")
    add(env("u", row("acme/web", "app/index.ts", 99, lang="ts"), lsn=23003000,
            tx_id=570, ts=1721280005000), "acme/web", "app/index.ts")
    # revive after delete
    add(env("c", row("acme/web", "app/feature.ts", 13, lang="ts"),
            lsn=23013232, tx_id=581, ts=1721280110000),
        "acme/web", "app/feature.ts")
    # heartbeat-style record on an unrelated topic shape: no after/before,
    # op unknown to the dispatcher => dead letter, never a crash
    ev.append({"key": None,
               "value": json.dumps({"payload": {"op": "m",
                                                "ts_ms": 1721280120000}}),
               "topic": TOPIC, "partition": 0, "offset": off[0]})
    off[0] += 1
    return ev


def test_corpus_parses_with_real_source_metadata(spark):
    recs = corpus()
    df = spark.createDataFrame(recs, schema=KAFKA_SHAPE)
    parsed = parse_envelopes(df).collect()
    by_off = {r["offset"]: r for r in parsed}

    # snapshot reads are ok/upserts with ordering from source.lsn
    assert by_off[0]["status"] == "ok"
    assert by_off[0]["effective_op"] == "u"
    assert by_off[0]["__lsn"] == 23000000

    # string transaction.id "571" parses into the ordering column
    assert by_off[3]["__tx_id"] == 571
    # envelope with schemas.enable=true parses identically
    assert by_off[3]["status"] == "ok"
    # no transaction block: source.txId is the fallback
    assert by_off[6]["__tx_id"] == 574
    # numeric/bool/null extras render as their JSON text
    extras = by_off[7]["extras"]
    assert extras["stars"] == "42"
    assert extras["archived"] == "false"
    assert by_off[7]["status"] == "ok"
    # TOAST placeholder is opaque content
    assert by_off[8]["content"] == "__debezium_unavailable_value"
    # deletes take the key from before; tombstones classified
    assert by_off[9]["effective_op"] == "d"
    assert (by_off[9]["repo"], by_off[9]["path"]) == ("acme/web", "app/feature.ts")
    assert by_off[10]["status"] == "tombstone"
    # heartbeat-ish unknown op is a dead letter
    assert by_off[max(by_off)]["status"] == "unknown_op"


def test_corpus_final_state_matches_oracle(spark, tmp_path):
    recs = corpus()
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4, mode="mor")
    process_batch(spark.createDataFrame(recs, schema=KAFKA_SHAPE), 0, lake)
    got = {(r["repo"], r["path"]): r.asDict() for r in lake.read().collect()}
    exp = oracle.replay(recs)["state"]
    assert set(got) == set(exp)
    for k, erow in exp.items():
        for c in ("commit", "lang", "content"):
            assert got[k].get(c) == erow.get(c), (k, c)
    # the same-lsn same-tx pair resolved by Kafka offset (later wins)
    assert exp[("acme/api", "src/main.py")]["content"].endswith("v11")
    # the out-of-order older lsn lost
    assert exp[("acme/web", "app/index.ts")]["content"].endswith("v12")
    # route column materialized from the topic
    assert all(r["route"] == TOPIC for r in got.values())


def test_corpus_extras_promoted_to_columns(spark, tmp_path):
    recs = corpus()
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4, mode="mor")
    process_batch(spark.createDataFrame(recs, schema=KAFKA_SHAPE), 0, lake)
    final = lake.read()
    assert "stars" in final.columns  # open-world numeric field promoted
    row = final.filter(
        (F.col("repo") == "acme/web") & (F.col("path") == "app/feature.ts")
    ).collect()[0]
    # the revive (v13) replaced the whole row, so stars is gone again
    assert row["stars"] is None
