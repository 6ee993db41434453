"""Engine/oracle parity on the exotic envelope shapes a review pass
found diverging — each was a LIVE divergence before the oracle fixes
(the generated logs and the Debezium corpus never produce these
tokens, so the 50/50 gates could not catch them):

* numeric is_delete: 1 renders "1" through the engine's
  map<string,string> lens and DELETES (tinyint soft-delete flag);
  1.0 renders "1.0" and does not;
* float key tokens keep their decimal point ("1.0", not "1");
* a STRING-encoded JSON-object `doc` unwraps exactly like an object
  value (the engine re-parses the rendered text with from_json), and
  unparseable doc text falls back to the flat image with `doc` kept as
  an opaque extra;
* non-ASCII inside nested tokens renders as raw UTF-8, not \\u escapes;
* a non-string scalar op token (op: 5) classifies unknown_op, not
  malformed (the rendering coerces it to "5").
"""
from __future__ import annotations

import json

from pyspark_cdc import oracle
from pyspark_cdc.parse import parse_envelopes
from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import process_batch


def _rec(payload, off):
    return {"key": None, "value": json.dumps({"payload": payload}),
            "topic": "t", "partition": 0, "offset": off}


EXOTIC = [
    # numeric is_delete=1 must DELETE the earlier upsert
    _rec({"op": "u", "source": {"lsn": 1, "ts_ms": 1},
          "after": {"repo": "r1", "path": "p1", "content": "a"}}, 0),
    _rec({"op": "u", "source": {"lsn": 2, "ts_ms": 2},
          "after": {"repo": "r1", "path": "p1", "is_delete": 1}}, 1),
    # is_delete=1.0 renders "1.0" => NOT a delete
    _rec({"op": "u", "source": {"lsn": 3, "ts_ms": 3},
          "after": {"repo": "r2", "path": "p2", "content": "keep",
                    "is_delete": 1.0}}, 2),
    # float key token keeps its decimal point
    _rec({"op": "u", "source": {"lsn": 4, "ts_ms": 4},
          "after": {"repo": 1.0, "path": "p3", "content": "b"}}, 3),
    # string-encoded doc submap unwraps; flat lang loses
    _rec({"op": "u", "source": {"lsn": 5, "ts_ms": 5},
          "after": {"repo": "r4", "path": "p4",
                    "doc": "{\"lang\":\"go\"}", "lang": "py"}}, 4),
    # unparseable doc text: flat image wins, doc stays an opaque extra
    _rec({"op": "u", "source": {"lsn": 6, "ts_ms": 6},
          "after": {"repo": "r5", "path": "p5", "doc": "not json",
                    "lang": "py"}}, 5),
    # non-ASCII nested token renders raw UTF-8
    _rec({"op": "u", "source": {"lsn": 7, "ts_ms": 7},
          "after": {"repo": "r6", "path": "p6",
                    "meta": {"x": "café"}}}, 6),
    # non-string op token -> unknown_op (not malformed)
    _rec({"op": 5, "source": {"lsn": 8, "ts_ms": 8},
          "after": {"repo": "r7", "path": "p7"}}, 7),
    # scalar after -> missing_key on both sides
    _rec({"op": "u", "source": {"lsn": 9, "ts_ms": 9},
          "after": "scalar"}, 8),
    # missing op -> malformed on both sides
    _rec({"source": {"lsn": 10, "ts_ms": 10},
          "after": {"repo": "r8", "path": "p8"}}, 9),
]


def test_exotic_shapes_engine_equals_oracle(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=4,
                       mode="mor", compact_every=None)
    df = spark.createDataFrame(EXOTIC, schema=KAFKA_SHAPE)
    process_batch(df, 0, lake)

    got = {(r["repo"], r["path"]): r.asDict()
           for r in lake.read().collect()}
    want = oracle.replay(EXOTIC)["state"]
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k, erow in got.items():
        orow = want[k]
        cols = (set(orow) | {c for c, v in erow.items() if v is not None})
        for c in cols:
            if c.startswith("__"):
                continue
            assert str(erow.get(c)) == str(orow.get(c)), (k, c, erow.get(c),
                                                          orow.get(c))

    # the shapes actually exercised what they claim:
    assert ("r1", "p1") not in got          # numeric 1 deleted
    assert got[("r2", "p2")]["content"] == "keep"   # 1.0 did not
    assert ("1.0", "p3") in got             # float key keeps ".0"
    assert got[("r4", "p4")]["lang"] == "go"  # string-doc unwrapped
    assert got[("r5", "p5")]["lang"] == "py"  # bad doc text fell back
    assert got[("r6", "p6")]["meta"] == '{"x":"café"}'  # raw UTF-8


def test_exotic_shapes_status_counts_match(spark, tmp_path):
    """The dead-letter CLASSIFICATION agrees too: op: 5 is unknown_op on
    both sides, scalar after is missing_key, missing op is malformed."""
    df = spark.createDataFrame(EXOTIC, schema=KAFKA_SHAPE)
    parsed = parse_envelopes(df)
    eng = {r["status"]: r["n"] for r in
           parsed.groupBy("status").count().withColumnRenamed("count", "n")
           .collect()}
    cnt = oracle.replay(EXOTIC)["counts"]
    assert eng.get("unknown_op", 0) == cnt["unknown_op"] == 1
    assert eng.get("missing_key", 0) == cnt["missing_key"] == 1
    assert eng.get("malformed", 0) == cnt["malformed"] == 1
    assert eng.get("ok", 0) == cnt["upserts"] + cnt["deletes"]
