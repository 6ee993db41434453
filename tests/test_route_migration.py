"""Route migration (route_stable_keys=False): keys whose routing value
changes between versions — the mutable-routing-field deployment the
stable-keys contract excludes. The invariants:

* read(route=X) == read().filter(route == X) under arbitrary
  migrations, before AND after compaction (the stable-keys fast path is
  fold-DEPENDENT here: pre-fold the old route's stale version wins the
  tenant-local LWW, post-fold it is gone — the inconsistency the knob
  exists to close);
* read_changes emits a DEPARTURE delete to the old route alongside the
  arrival insert into the new one, so per-route downstream indexes
  converge (without it the old tenant serves the migrated document
  forever);
* departures=False (the key-based-replication shape used by the
  exporter) keeps per-key classification — a departure delete would tie
  with the arrival upsert at the replica's LWW;
* SearchIndexSync resolves per (key, route), so the departure tombstone
  masks the old route's document while the new route's upsert lands
  independently.

The reference's own behavior on a re-routed document is to LEAVE it in
the old Meilisearch index (sync.go AddDocuments routes to the new index,
no cross-index delete ever happens) — the departure feed is strictly
stronger.
"""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pyspark_cdc.schemas import KAFKA_SHAPE
from pyspark_cdc.search_sync import SearchIndexSync
from pyspark_cdc.sink import CHANGE_TYPE_COL, ParquetLake
from pyspark_cdc.stream import process_batch


def _rec(value, off, topic):
    return {"key": None, "value": value, "topic": topic, "partition": 0,
            "offset": off}


def _env(op, after=None, before=None, lsn=0):
    p = {"op": op, "source": {"lsn": lsn, "ts_ms": lsn}}
    if after is not None:
        p["after"] = after
    if before is not None:
        p["before"] = before
    return json.dumps({"payload": p})


def _row(i, v):
    return {"repo": "r", "path": f"p{i}", "commit": f"c{v}", "lang": "py",
            "content": f"v{v}-{i}"}


def _up(i, v, lsn, topic):
    return _rec(_env("u", after=_row(i, v), lsn=lsn), lsn, topic)


def _del(i, lsn, topic):
    return _rec(_env("d", before={"repo": "r", "path": f"p{i}"}, lsn=lsn),
                lsn, topic)


def _feed(spark, lake, bid, recs):
    process_batch(spark.createDataFrame(recs, schema=KAFKA_SHAPE), bid, lake)


def _lake(spark, tmp_path, name="lake", **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("mode", "mor")
    kw.setdefault("compact_every", None)
    kw.setdefault("snapshot_retention", 50)
    kw.setdefault("route_stable_keys", False)
    return ParquetLake(spark, str(tmp_path / name), **kw)


def _state_rows(df):
    return sorted((r["repo"], r["path"], r["route"], r["content"])
                  for r in df.collect())


def _changes(df):
    return sorted((r["repo"], r["path"], r["route"], r[CHANGE_TYPE_COL],
                   r["content"])
                  for r in df.collect())


def test_tenant_read_equals_filtered_global_read_under_migration(
    spark, tmp_path
):
    lake = _lake(spark, tmp_path)
    # k1,k2 live in A; k3 in B — then fold into the base
    _feed(spark, lake, 0,
          [_up(1, 1, 1, "A"), _up(2, 1, 2, "A"), _up(3, 1, 3, "B")])
    lake.compact_now(tier="major")
    # k1 MIGRATES A->B in the outstanding backlog (pre-fold), plus a
    # stale duplicate of its old A version arriving late
    _feed(spark, lake, 1, [_up(1, 2, 10, "B")])
    _feed(spark, lake, 2, [_up(1, 1, 1, "A")])

    for phase in ("backlog", "folded"):
        full = lake.read()
        for route in ("A", "B"):
            assert _state_rows(lake.read(route=route)) == _state_rows(
                full.filter(F.col("route") == route)
            ), (phase, route)
        assert _state_rows(lake.read(route="A")) == [
            ("r", "p2", "A", "v1-2")
        ], phase
        assert set(p for _, p, _, _ in _state_rows(lake.read(route="B"))) \
            == {"p1", "p3"}, phase
        lake.compact_now(tier="major")


def test_stable_keys_fast_path_keeps_its_narrower_contract(spark, tmp_path):
    """Pin the contract boundary: under route_stable_keys=True (the
    default), the tenant read resolves LWW within the tenant's own rows —
    a migrated key remains visible in its OLD route until a fold discards
    the losing version (the reference's own per-index behavior). This is
    exactly why migration support is a declared table contract."""
    lake = _lake(spark, tmp_path, route_stable_keys=True)
    _feed(spark, lake, 0, [_up(1, 1, 1, "A")])
    lake.compact_now(tier="major")
    _feed(spark, lake, 1, [_up(1, 2, 10, "B")])

    # global read is migration-correct either way
    assert _state_rows(lake.read()) == [("r", "p1", "B", "v2-1")]
    # …but the tenant-pruned fast path still shows the stale A version
    assert _state_rows(lake.read(route="A")) == [("r", "p1", "A", "v1-1")]


def test_read_changes_emits_departures_per_route(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    # from-state: k1,k2 in A; k3 in B (folded base)
    _feed(spark, lake, 0,
          [_up(1, 1, 1, "A"), _up(2, 1, 2, "A"), _up(3, 1, 3, "B")])
    lake.compact_now(tier="major")
    frm = lake.current_meta()["id"]

    # k1 migrates A->B; k2 updates in place; k3 is deleted via an
    # envelope routed A (migration+delete composite); k4 is born in A
    _feed(spark, lake, 1, [_up(1, 2, 10, "B"), _up(2, 2, 11, "A"),
                           _del(3, 12, "A"), _up(4, 1, 13, "A")])
    to = lake.current_meta()["id"]

    got = _changes(lake.read_changes(frm, to))
    assert got == sorted([
        ("r", "p1", "B", "insert", "v2-1"),   # arrival into B
        ("r", "p1", "A", "delete", None),     # departure from A
        ("r", "p2", "A", "update", "v2-2"),
        ("r", "p3", "B", "delete", None),     # delete lands where it LIVED
        ("r", "p4", "A", "insert", "v1-4"),
    ])

    # per-tenant scoping is a pure filter of the global feed
    feed_a = _changes(lake.read_changes(frm, to, route="A"))
    assert feed_a == sorted([
        ("r", "p1", "A", "delete", None),
        ("r", "p2", "A", "update", "v2-2"),
        ("r", "p4", "A", "insert", "v1-4"),
    ])
    feed_b = _changes(lake.read_changes(frm, to, route="B"))
    assert feed_b == sorted([
        ("r", "p1", "B", "insert", "v2-1"),
        ("r", "p3", "B", "delete", None),
    ])
    assert sorted(feed_a + feed_b) == got

    # applying the feed per (key, route) to the from-state reproduces the
    # to-state exactly
    applied = {
        (r, p, rt): c
        for (r, p, rt, c) in (
            (x[0], x[1], x[2], x[3])
            for x in _state_rows(lake.read(snapshot_id=frm))
        )
    }
    for r, p, rt, ct, content in got:
        if ct == "delete":
            applied.pop((r, p, rt), None)
        else:
            applied[(r, p, rt)] = content
    want = {(r, p, rt): c for (r, p, rt, c) in _state_rows(lake.read())}
    assert applied == want


def test_departures_false_keeps_per_key_classification(spark, tmp_path):
    """The exporter's shape: one row per changed KEY, route-agnostic —
    a key-based replica's LWW must never see a departure delete tied at
    the arrival's ordering tokens."""
    lake = _lake(spark, tmp_path)
    _feed(spark, lake, 0, [_up(1, 1, 1, "A"), _up(3, 1, 3, "B")])
    lake.compact_now(tier="major")
    frm = lake.current_meta()["id"]
    _feed(spark, lake, 1, [_up(1, 2, 10, "B"), _del(3, 12, "A")])
    to = lake.current_meta()["id"]

    got = _changes(lake.read_changes(frm, to, departures=False))
    assert got == sorted([
        ("r", "p1", "B", "update", "v2-1"),
        ("r", "p3", "A", "delete", None),
    ])


def test_search_sync_converges_per_route_under_migration(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    sync = SearchIndexSync(spark, str(tmp_path / "index"), lake)
    sync_a = SearchIndexSync(spark, str(tmp_path / "index_a"), lake,
                             route="A")

    _feed(spark, lake, 0, [_up(1, 1, 1, "A"), _up(2, 1, 2, "A"),
                           _up(3, 1, 3, "B")])
    lake.compact_now(tier="major")
    sync.sync_once()
    sync_a.sync_once()
    assert {p for _, p, _, _ in _state_rows(sync_a.state())} == {"p1", "p2"}

    # k1 migrates A->B
    _feed(spark, lake, 1, [_up(1, 2, 10, "B")])
    s = sync.sync_once()
    assert s["status"] == "synced"
    sa = sync_a.sync_once()
    assert sa["status"] == "synced" and sa["n_deletes"] == 1

    # global index: per (key, route) equality with the lake
    assert _state_rows(sync.state()) == _state_rows(lake.read())
    # the old route's view dropped k1 in BOTH the global index's A-slice
    # and the dedicated per-tenant index
    assert {p for _, p, _, _ in _state_rows(sync.state(route="A"))} == {"p2"}
    assert {p for _, p, _, _ in _state_rows(sync_a.state())} == {"p2"}
    assert {p for _, p, _, _ in _state_rows(sync.state(route="B"))} \
        == {"p1", "p3"}


def test_no_migration_matches_stable_lake(spark, tmp_path):
    """Sanity: on a route-disjoint key space the migration-exact paths
    return byte-for-byte what the stable-keys fast paths return."""
    recs0 = [_up(1, 1, 1, "A"), _up(2, 1, 2, "B"), _up(3, 1, 3, "A")]
    recs1 = [_up(1, 2, 10, "A"), _del(2, 11, "B"), _up(4, 1, 12, "B")]

    lakes = {}
    for stable in (True, False):
        lk = _lake(spark, tmp_path, name=f"lake_{stable}",
                   route_stable_keys=stable)
        _feed(spark, lk, 0, recs0)
        lk.compact_now(tier="major")
        frm = lk.current_meta()["id"]
        _feed(spark, lk, 1, recs1)
        lakes[stable] = (lk, frm)

    for route in (None, "A", "B"):
        a = _state_rows(lakes[True][0].read(route=route))
        b = _state_rows(lakes[False][0].read(route=route))
        assert a == b, route
        ca = _changes(lakes[True][0].read_changes(lakes[True][1],
                                                  route=route))
        cb = _changes(lakes[False][0].read_changes(lakes[False][1],
                                                   route=route))
        assert ca == cb, route


# ---------------- property: arbitrary migration interleavings ----------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark_cdc import oracle as _oracle  # noqa: E402

_KEYS = [("r", "pa"), ("r", "pb"), ("q", "pa")]
_ROUTES = ["A", "B", "C"]

# one event = (key_idx, route_idx, is_delete, lsn, tx)
_mig_event = st.tuples(
    st.integers(0, len(_KEYS) - 1),
    st.integers(0, len(_ROUTES) - 1),
    st.booleans(),
    st.integers(1, 20),   # small lsn range forces collisions/ties
    st.integers(0, 2),
)
_mig_events = st.lists(_mig_event, min_size=1, max_size=18)


def _mig_record(ev, offset):
    key_idx, route_idx, is_delete, lsn, tx = ev
    repo, path = _KEYS[key_idx]
    topic = _ROUTES[route_idx]
    payload = {"op": "d" if is_delete else "u",
               "source": {"lsn": lsn, "ts_ms": lsn},
               "transaction": {"id": tx}}
    if is_delete:
        payload["before"] = {"repo": repo, "path": path}
    else:
        payload["after"] = {"repo": repo, "path": path, "commit": f"c{lsn}",
                            "lang": "py",
                            "content": f"content {repo}/{path} v{lsn}.{tx}"}
    return {"key": None, "value": json.dumps({"payload": payload}),
            "topic": topic, "partition": 0, "offset": offset}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=_mig_events, data=st.data())
def test_migration_interleavings_match_oracle_and_filtered_reads(
    spark, tmp_path_factory, evs, data
):
    """Arbitrary upsert/delete sequences where every event may carry a
    DIFFERENT route for the same key, split into arbitrary micro-batches
    across inline folds of both tiers: (1) the global read equals the
    pure-Python oracle including the winning route, (2) every tenant
    read equals the filtered global read (the migration-exact
    invariant), and (3) the change feed from an arbitrary intermediate
    snapshot, applied per (key, route), reproduces the final state —
    departures included."""
    recs = [_mig_record(e, off) for off, e in enumerate(evs)]
    n_splits = data.draw(st.integers(0, min(2, len(recs) - 1)),
                         label="n_splits")
    cuts = sorted(
        data.draw(
            st.lists(st.integers(1, max(1, len(recs) - 1)),
                     min_size=n_splits, max_size=n_splits),
            label="cuts",
        )
    )
    batches, prev = [], 0
    for c in [*cuts, len(recs)]:
        if recs[prev:c]:
            batches.append(recs[prev:c])
        prev = c

    tmp = str(tmp_path_factory.mktemp("mig_lake"))
    lake = ParquetLake(spark, tmp, n_buckets=4, mode="mor",
                       compact_every=2, major_every=2,
                       snapshot_retention=100, route_stable_keys=False)
    snap_ids = []
    for i, batch in enumerate(batches):
        _feed(spark, lake, i, batch)
        snap_ids.append(lake.current_meta()["id"])

    # (1) global read == oracle, winning route included
    want = {
        k: (v["route"], v.get("content"))
        for k, v in _oracle.replay(recs)["state"].items()
    }
    got = {(r["repo"], r["path"]): (r["route"], r["content"])
           for r in lake.read().collect()}
    assert got == want

    # (2) tenant read == filtered global read, every route
    full = lake.read()
    for rt in _ROUTES:
        a = _state_rows(lake.read(route=rt))
        b = _state_rows(full.filter(F.col("route") == rt))
        assert a == b, rt

    # (3) feed apply-invariant per (key, route) from a random snapshot
    frm = data.draw(st.sampled_from(snap_ids), label="from_snapshot")
    applied = {(r, p, rt): c
               for (r, p, rt, c) in _state_rows(lake.read(snapshot_id=frm))}
    for r, p, rt, ct, content in _changes(lake.read_changes(frm)):
        if ct == "delete":
            applied.pop((r, p, rt), None)
        else:
            applied[(r, p, rt)] = content
    final = {(r, p, rt): c for (r, p, rt, c) in _state_rows(lake.read())}
    assert applied == final
