"""Net-effect change feed (custom stateful operator,
applyInPandasWithState): keyed state must carry ACROSS micro-batches —
duplicates and stale out-of-order replays emit nothing, deletes of
absent keys are net no-ops, revives emit as upserts."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark_cdc.changefeed import change_feed
from pyspark_cdc.parse import parse_envelopes
from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.sources import file_stream


def _env(op, after=None, before=None, lsn=0):
    p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn},
         "transaction": {"id": lsn}}
    if after is not None:
        p["after"] = after
    if before is not None:
        p["before"] = before
    return json.dumps({"payload": p})


def _row(repo, path, v, **extra):
    return {"repo": repo, "path": path, "commit": f"{v:040d}", "lang": "py",
            "content": f"content {repo}/{path} v{v}", **extra}


def _write_batch(log_dir, idx, events, mtime):
    """One parquet file per intended micro-batch; the streaming file
    source orders batches by modification time, pinned via os.utime."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"batch-{idx:03d}.parquet")
    cols = {
        "key": [None] * len(events),
        "value": [e[0] for e in events],
        "topic": ["t"] * len(events),
        "partition": [0] * len(events),
        "offset": [e[1] for e in events],
    }
    schema = pa.schema([
        ("key", pa.string()), ("value", pa.string()), ("topic", pa.string()),
        ("partition", pa.int32()), ("offset", pa.int64()),
    ])
    pq.write_table(
        pa.table({n: pa.array(cols[n], type=schema.field(n).type) for n in cols}),
        path,
    )
    os.utime(path, (mtime, mtime))


def test_change_feed_suppresses_duplicates_and_stale(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    t0 = time.time() - 100

    # batch 0: create k1 v1 (twice - duplicate delivery); create k2 v2;
    #          create+delete k3 inside one batch (net delete of a key the
    #          feed never showed => nothing emits for k3)
    _write_batch(log_dir, 0, [
        (_env("c", _row("r", "k1", 1), lsn=1), 1),
        (_env("c", _row("r", "k1", 1), lsn=1), 1),
        (_env("c", _row("r", "k2", 2), lsn=2), 2),
        (_env("c", _row("r", "k3", 3), lsn=3), 3),
        (_env("d", before={"repo": "r", "path": "k3"}, lsn=4), 4),
    ], t0)
    # batch 1: stale replay of k1 v1 (ordering does not advance => no
    #          emission); real update k2 v5; delete of never-created k4
    #          (net no-op)
    _write_batch(log_dir, 1, [
        (_env("c", _row("r", "k1", 1), lsn=1), 1),
        (_env("u", _row("r", "k2", 5), lsn=5), 5),
        (_env("d", before={"repo": "r", "path": "k4"}, lsn=6), 6),
    ], t0 + 10)
    # batch 2: delete k1; then batch 3: revive k1 (emits as upsert)
    _write_batch(log_dir, 2, [
        (_env("d", before={"repo": "r", "path": "k1"}, lsn=7), 7),
    ], t0 + 20)
    _write_batch(log_dir, 3, [
        (_env("c", _row("r", "k1", 8), lsn=8), 8),
        # and an OLDER stale update for k2, suppressed by cross-batch state
        (_env("u", _row("r", "k2", 4), lsn=4), 4),
    ], t0 + 30)

    feed = change_feed(parse_envelopes(file_stream(spark, log_dir,
                                                   max_files_per_trigger=1)))
    q = (
        feed.writeStream.format("memory").queryName("net_feed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = sorted(
        ((r["repo"], r["path"]), r["change"], r["__lsn"], r["content"])
        for r in spark.sql("SELECT * FROM net_feed").collect()
    )
    assert rows == [
        (("r", "k1"), "delete", 7, None),
        (("r", "k1"), "upsert", 1, "content r/k1 v1"),
        (("r", "k1"), "upsert", 8, "content r/k1 v8"),
        (("r", "k2"), "upsert", 2, "content r/k2 v2"),
        (("r", "k2"), "upsert", 5, "content r/k2 v5"),
    ]
    # k3 (create+delete in one batch), k4 (delete of absent), the k1
    # duplicate, and both stale k1/k2 replays emitted NOTHING — 5 net
    # changes from 11 input events, with state carried across 4 batches


def test_change_feed_state_ttl_expires_and_reemits(spark, tmp_path):
    """state_ttl_ms (ProcessingTimeTimeout tied to the replay horizon):
    a key idle past the TTL has its state dropped on a later batch, so a
    subsequent duplicate RE-EMITS (safe at-least-once on the horizon
    boundary) instead of being suppressed — state loss is re-emission,
    never wrong data.

    Runs with a processing-time trigger and an explicit stop: a
    continuous tail is the TTL's real deployment shape, and availableNow
    + ProcessingTimeTimeout never drains (Spark keeps scheduling
    'no new data but cleaning up state' batches while timers exist)."""
    log_dir = str(tmp_path / "log")
    t0 = time.time() - 100

    # batch 0: k1 and k2 created (both emit)
    _write_batch(log_dir, 0, [
        (_env("c", _row("r", "k1", 1), lsn=1), 1),
        (_env("c", _row("r", "k2", 2), lsn=2), 2),
    ], t0)
    # batch 1: only k2 has data => k1's expired timer fires in a state-
    # cleanup batch after this one and k1's state is REMOVED (a group
    # gets the timed-out call only in a batch where it has no data)
    _write_batch(log_dir, 1, [
        (_env("u", _row("r", "k2", 3), lsn=3), 3),
    ], t0 + 10)
    # batch 2: duplicate of k1 v1 — with NoTimeout this is suppressed
    # (test above); with an expired TTL it re-emits
    _write_batch(log_dir, 2, [
        (_env("c", _row("r", "k1", 1), lsn=1), 1),
    ], t0 + 20)

    feed = change_feed(
        parse_envelopes(file_stream(spark, log_dir, max_files_per_trigger=1)),
        state_ttl_ms=1,  # every inter-batch gap exceeds 1ms
    )
    q = (
        feed.writeStream.format("memory").queryName("ttl_feed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    expected = [
        (("r", "k1"), "upsert", 1),
        (("r", "k1"), "upsert", 1),  # re-emitted after expiry
        (("r", "k2"), "upsert", 2),
        (("r", "k2"), "upsert", 3),
    ]
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = sorted(
                ((r["repo"], r["path"]), r["change"], r["__lsn"])
                for r in spark.sql("SELECT * FROM ttl_feed").collect()
            )
            if rows == expected:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert rows == expected


def test_advance_rearms_ttl_on_duplicate_and_empty():
    """GroupState contract: every invocation with data cancels the key's
    registered timer, so _advance must re-set it on EVERY state-keeping
    return path — including the duplicate/stale early return and the
    empty-slice return — or a key receiving only duplicates keeps its
    state forever and the TTL bound is silently lost (round-4 review)."""
    import pandas as pd

    from pyspark_cdc.changefeed import ORD_COLS, _advance
    from pyspark_cdc.schemas import LSN_COL, OFFSET_COL, TS_COL, TX_COL

    class FakeState:
        hasTimedOut = False

        def __init__(self, value):
            self._v = value
            self.timeout_set = []

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def setTimeoutDuration(self, ms):
            self.timeout_set.append(ms)

    def slice_for(lsn):
        return pd.DataFrame([{
            LSN_COL: lsn, TX_COL: 0, TS_COL: 0, OFFSET_COL: 0,
            "effective_op": "u", "commit": "c", "lang": "py",
            "content": "x",
        }])

    # fresh key: emits and arms the timer
    st = FakeState(None)
    out = list(_advance(("r", "p"), [slice_for(5)], st, ttl_ms=1000))
    assert len(out) == 1 and st.timeout_set == [1000]

    # duplicate (same ordering tuple): emits nothing but MUST re-arm
    st.timeout_set.clear()
    out = list(_advance(("r", "p"), [slice_for(5)], st, ttl_ms=1000))
    assert out == [] and st.timeout_set == [1000]

    # stale replay (lower tuple): same
    st.timeout_set.clear()
    out = list(_advance(("r", "p"), [slice_for(3)], st, ttl_ms=1000))
    assert out == [] and st.timeout_set == [1000]

    # empty slice with live state: re-armed too
    st.timeout_set.clear()
    empty = slice_for(5).iloc[0:0]
    out = list(_advance(("r", "p"), [empty], st, ttl_ms=1000))
    assert out == [] and st.timeout_set == [1000]

    # no TTL configured: never touches the timer
    st2 = FakeState(None)
    list(_advance(("r", "p"), [slice_for(5)], st2, ttl_ms=None))
    list(_advance(("r", "p"), [slice_for(5)], st2, ttl_ms=None))
    assert st2.timeout_set == []


def test_start_change_feed_refuses_ttl_with_available_now(spark, tmp_path):
    """Spark 4.1 caveat guard: state_ttl_ms + trigger(availableNow) makes
    the query schedule cleanup batches forever (never drains). The helper
    must refuse the combination with a clear error instead of hanging —
    and accept the valid shapes."""
    import pytest

    from pyspark_cdc.changefeed import start_change_feed
    from pyspark_cdc.sources import file_stream

    log_dir = str(tmp_path / "log")
    _write_batch(log_dir, 0, [(_env("c", after=_row("r", "p", 1), lsn=1), 1)],
                 mtime=time.time())
    parsed = parse_envelopes(file_stream(spark, log_dir, 1))

    with pytest.raises(ValueError, match="availableNow"):
        start_change_feed(
            parsed, str(tmp_path / "out"), str(tmp_path / "ckpt"),
            state_ttl_ms=60_000, available_now=True,
        )

    # the valid drain-and-stop shape (no TTL) still runs end to end
    q = start_change_feed(
        parsed, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 1 and out.collect()[0]["change"] == "upsert"
