"""Net-effect CDC change feed — a custom STATEFUL streaming operator
(`applyInPandasWithState`, the one place the engine keeps per-key state
ACROSS micro-batches outside the lake itself).

Downstream consumers of a CDC pipeline usually want the *net* change
stream: "tell me when a key's visible state actually moves", not every
at-least-once redelivery or stale out-of-order replay. The lake's LWW
merge absorbs those internally, but a consumer tailing the raw parsed
stream would see them. This operator suppresses them with keyed state:

* per (repo, path) the state store holds the last ADVANCED ordering
  tuple (lsn, tx_id, ts_ms, offset) + deleted flag;
* each micro-batch reduces the key's events to the batch LWW winner
  (micro-batch granularity is the natural unit — intermediate versions
  inside one batch were never visible downstream anyway);
* the winner emits ONLY if its ordering advances the stored state —
  duplicates (same ordering) and stale replays (lower ordering) emit
  nothing;
* reference-semantics niceties: a delete for a key that is absent or
  already deleted emits nothing (DeleteDocument on a missing id is a
  no-op, sync.go:108-113), and a revive after delete emits as an upsert.

State size: O(live keys) x ~40 bytes. `state_ttl_ms` bounds it with a
ProcessingTimeTimeout tied to the source's replay horizon: state idle
longer than the horizon can never be contradicted (nothing older can be
replayed), so it expires exactly like lake tombstones past
tombstone_horizon_lsn. Expiry is SAFE, not lossy — if a duplicate of an
expired key does arrive, the feed re-emits it (at-least-once on the
horizon boundary, never wrong data). Default None = NoTimeout, right for
finite replay logs — and REQUIRED for trigger(availableNow=True) runs:
with ProcessingTimeTimeout, Spark keeps scheduling "no new data but
cleaning up state" batches while any timer is registered, so an
availableNow query never drains (observed on 4.1; use a processing-time
trigger for TTL'd continuous tails).

Vectorization note: this is exactly the case the brief reserves for
`applyInPandasWithState` — per-key stateful logic the built-in operators
cannot express. The per-group pandas work is a handful of column ops on
small batch slices, Arrow-transferred.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# ORD_COLS comes from order.py — ONE definition of the engine-wide
# ordering contract, so the feed's LWW can never drift from the lake's
from .order import ORD_COLS
from .schemas import KEY_COLS, LSN_COL, OFFSET_COL, TS_COL, TX_COL

FEED_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("change", T.StringType()),  # 'upsert' | 'delete'
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField(LSN_COL, T.LongType()),
        T.StructField(TX_COL, T.LongType()),
        T.StructField(TS_COL, T.LongType()),
        T.StructField(OFFSET_COL, T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("off", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)


def _advance(
    key: Tuple[Any, ...], pdfs: Iterable, state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator:
    import pandas as pd

    if state.hasTimedOut:
        # horizon passed with no new data for this key: nothing older can
        # arrive to contradict it, so the state is droppable; if a
        # duplicate DOES arrive later it re-emits (safe re-emission)
        state.remove()
        return

    # Every invocation with data cancels any previously registered timer
    # (GroupState contract: the timeout must be re-set on every call), so
    # EVERY return path below that keeps state must re-arm it — otherwise
    # a key receiving only duplicates would keep its state forever,
    # defeating the TTL bound.
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        if ttl_ms is not None and state.exists:
            state.setTimeoutDuration(ttl_ms)
        return
    # batch LWW winner by the (lsn, tx, ts, offset) tuple
    rows = rows.sort_values(ORD_COLS, kind="mergesort")
    w = rows.iloc[-1]
    ordw = (int(w[LSN_COL]), int(w[TX_COL]), int(w[TS_COL]), int(w[OFFSET_COL]))

    prev = state.get if state.exists else None  # (lsn, tx, ts, off, deleted)
    if prev is not None and ordw <= tuple(prev[:4]):
        # duplicate or stale replay: nothing advances, but the key DID
        # see traffic — its idle clock restarts
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        return
    deleted = w["effective_op"] == "d"
    was_deleted = prev is None or bool(prev[4])
    state.update((*ordw, bool(deleted)))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    if deleted and was_deleted:
        # delete of an absent/already-deleted key: net no-op
        # (sync.go:108-113); state still advances so an even-later stale
        # upsert stays suppressed
        return
    yield pd.DataFrame(
        [
            {
                "repo": key[0],
                "path": key[1],
                "change": "delete" if deleted else "upsert",
                "commit": None if deleted else w["commit"],
                "lang": None if deleted else w["lang"],
                "content": None if deleted else w["content"],
                LSN_COL: ordw[0],
                TX_COL: ordw[1],
                TS_COL: ordw[2],
                OFFSET_COL: ordw[3],
            }
        ]
    )


def change_feed(parsed: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """parsed change stream (streaming DataFrame) -> net-effect feed.
    Append output mode; one row per key per micro-batch at most.

    state_ttl_ms: per-key state expiry tied to the source's replay
    horizon (see module docstring). None = keep state forever."""
    ok = parsed.filter(F.col("status") == "ok").select(
        *KEY_COLS, "effective_op", "commit", "lang", "content", *ORD_COLS
    )
    if state_ttl_ms is None:
        fn, timeout = _advance, GroupStateTimeout.NoTimeout
    else:
        def fn(key, pdfs, state):  # cloudpickle'd closure over the ttl
            return _advance(key, pdfs, state, ttl_ms=state_ttl_ms)

        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return ok.groupBy(*KEY_COLS).applyInPandasWithState(
        fn,
        FEED_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )


def start_change_feed(
    parsed: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_ttl_ms: int | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the net-effect feed as a parquet-sink streaming query.

    Guard (Spark 4.1 caveat, see module docstring): ProcessingTimeTimeout
    keeps scheduling state-cleanup batches while ANY timer is registered,
    so a trigger(availableNow=True) query with state_ttl_ms set never
    drains — it hangs, silently. Refuse the combination loudly instead;
    a TTL'd feed is a continuous tail and must use a processing-time
    trigger (or no trigger)."""
    if state_ttl_ms is not None and available_now:
        raise ValueError(
            "state_ttl_ms cannot be combined with an availableNow trigger: "
            "ProcessingTimeTimeout keeps scheduling state-cleanup batches "
            "while any timer is registered, so the query never drains "
            "(observed on Spark 4.1). Run the TTL'd feed as a continuous "
            "tail (available_now=False, optionally processing_time='30 "
            "seconds'), or drop state_ttl_ms for drain-and-stop replays."
        )
    feed = change_feed(parsed, state_ttl_ms=state_ttl_ms)
    writer = feed.writeStream.format("parquet").option(
        "path", out_dir
    ).option("checkpointLocation", checkpoint_dir).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
