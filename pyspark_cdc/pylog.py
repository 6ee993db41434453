"""Pure-Python deterministic flagship event log (no Spark required).

The driver's CORRECTNESS gate runs the Spark query AND the DuckDB oracle
SQL as two independent programs; for the flagship engine replay both must
read the SAME event log. This module materializes that log with pyarrow
alone, so `oracle_sql()` can guarantee its existence without a
SparkSession, and the oracle SQL references it via read_parquet() at a
content-versioned path (bump FLAGSHIP_VERSION when the generated content
changes shape).

The log = generate.edge_case_events() (every FIXTURES.md F3 case) plus a
seeded bulk tail with the same event mix as generate.bulk_events_df
(hard/soft deletes, unknown ops, malformed JSON, tombstones,
string-encoded payloads, snapshot reads, hot-key skew, mid-log additive
schema evolution, two topics) — derived from md5(seed|salt|i) so the
bytes are identical across processes and Python versions.
"""

from __future__ import annotations

import hashlib
import json
import os

from .generate import BULK_LSN_BASE, _after, _env, _rec, edge_case_events, topic_for

FLAGSHIP_VERSION = 2  # v2: edge case 23 (flat null is_delete override)
FLAGSHIP_N_EVENTS = 8_000
FLAGSHIP_N_KEYS = 500
FLAGSHIP_SEED = 11
FLAGSHIP_DIR = f"/tmp/pyspark_cdc_flagship_log_v{FLAGSHIP_VERSION}"

_HOT_REPO = "org0/hot-repo"


def _h(i: int, salt: str) -> int:
    return int(
        hashlib.md5(f"{FLAGSHIP_SEED}|{salt}|{i}".encode()).hexdigest()[:15], 16
    )


def bulk_events_py(
    n_events: int = FLAGSHIP_N_EVENTS,
    n_keys: int = FLAGSHIP_N_KEYS,
    hot_pct: int = 30,
    n_repos: int = 50,
    evolve_after_frac: float = 0.6,
) -> list[dict]:
    """Pure-Python analog of generate.bulk_events_df (same event mix, its
    own seed/values — the two logs need not be byte-identical, only
    semantically shaped alike)."""
    out = []
    evolve_at = int(n_events * evolve_after_frac)
    for i in range(n_events):
        lsn = BULK_LSN_BASE + i
        is_hot = _h(i, "hot") % 100 < hot_pct
        if is_hot:
            key_id = _h(i, "hk") % max(1, n_keys // 20)
            repo = _HOT_REPO
        else:
            key_id = _h(i, "ck") % n_keys
            repo = f"org{key_id % n_repos}/proj"
        path = f"src/pkg{key_id % 37}/file{key_id}{'_hot' if is_hot else ''}.py"

        r = _h(i, "op") % 1000
        md = hashlib.md5(f"{repo}|{path}|{lsn}".encode()).hexdigest()
        commit = (md + md)[:40]
        lang = ["py", "go", "ts", "md", "sql"][key_id % 5]
        content = f"file {path} of {repo} v{lsn} " + md * 8
        branch = f"release/{_h(i, 'br') % 5}" if i >= evolve_at else None

        key = json.dumps({"repo": repo, "path": path})
        if r < 20:  # hard delete
            value = _env("d", before={"repo": repo, "path": path}, lsn=lsn, tx=lsn)
        elif r < 50:  # soft delete via update
            after = _after(repo, path, lsn, is_delete=["true", "1"][_h(i, "dv") % 2])
            if branch:
                after["branch"] = branch
            value = _env("u", after, lsn=lsn, tx=lsn)
        elif r < 53:  # unknown op
            value = _env("x", _after(repo, path, lsn), lsn=lsn, tx=lsn)
        elif r < 56:  # malformed JSON
            value = '{"payload": {broken'
        elif r < 59:  # tombstone
            value = "" if _h(i, "tb") % 2 == 0 else "null"
        elif r < 99:  # string-encoded inner payload (replaces the flat image)
            inner = json.dumps({"commit": commit, "lang": lang, "content": content})
            after = {"repo": repo, "path": path, "payload": inner}
            if branch:
                # flat extra next to a payload — must be DROPPED by the
                # replace semantics (sync.go:204-217)
                after["branch"] = branch
            value = _env("u", after, lsn=lsn, tx=lsn)
        else:  # snapshot read or plain create/update
            op = "r" if r < 149 else ("c" if i % 7 == 0 else "u")
            after = {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
            }
            if branch:
                after["branch"] = branch
            value = _env(op, after, lsn=lsn, tx=lsn)

        rec = _rec(value, key=key, lsn=lsn, partition=_h(i, "pt") % 8)
        rec["topic"] = topic_for(repo)
        out.append(rec)
    return out


def flagship_events() -> list[dict]:
    return edge_case_events() + bulk_events_py()


def _write_event_log(base_dir: str, events: list[dict], n_files: int) -> str:
    """Idempotently materialize an event list as parquet; atomic via
    write-to-temp + rename, so concurrent callers are safe."""
    marker = os.path.join(base_dir, "_COMPLETE")
    if os.path.exists(marker):
        return base_dir

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = f"{base_dir}.tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    schema = pa.schema(
        [
            ("key", pa.string()),
            ("value", pa.string()),
            ("topic", pa.string()),
            ("partition", pa.int32()),
            ("offset", pa.int64()),
        ]
    )
    chunk = (len(events) + n_files - 1) // n_files
    for f in range(n_files):
        part = events[f * chunk : (f + 1) * chunk]
        cols = {
            name: [e[name] for e in part]
            for name in ("key", "value", "topic", "partition", "offset")
        }
        table = pa.table(
            {n: pa.array(cols[n], type=schema.field(n).type) for n in cols},
        )
        pq.write_table(table, os.path.join(tmp, f"part-{f:03d}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as fh:
        fh.write(f"{len(events)}\n")
    try:
        os.rename(tmp, base_dir)
    except OSError:
        # another process won the race; use theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return base_dir


def ensure_flagship_log(base_dir: str = FLAGSHIP_DIR, n_files: int = 4) -> str:
    return _write_event_log(base_dir, flagship_events(), n_files)


# --- field-derived routing log (route_from_fields mode) ----------------------
#
# The reference resolves a per-record index {app_name}_{collection} from
# document FIELDS (ResolveIndex, sync.go:176-196) and skips records where
# either is empty (sync.go:54-67). This log exercises every derivation
# path: flat fields, inner-payload fields, the flat-over-inner override
# (decoy inner values that MUST lose), delete routes from `before`, and
# missing/empty fields -> 'missing_route' dead letters.

FIELDROUTE_VERSION = 2
FIELDROUTE_N_EVENTS = 3_000
FIELDROUTE_N_KEYS = 400
FIELDROUTE_DIR = f"/tmp/pyspark_cdc_fieldroute_log_v{FIELDROUTE_VERSION}"
FIELDROUTE_LSN_BASE = 10_000

_APPS = ["shop", "wiki", "crm"]
_COLLECTIONS = ["products", "pages", "users"]


def fieldroute_events(
    n_events: int = FIELDROUTE_N_EVENTS, n_keys: int = FIELDROUTE_N_KEYS
) -> list[dict]:
    out = []
    for i in range(n_events):
        lsn = FIELDROUTE_LSN_BASE + i
        key_id = _h(i, "fr-key") % n_keys
        repo = f"org{key_id % 20}/proj"
        path = f"src/f{key_id}.py"
        # route fields are mostly a function of the KEY (one source table
        # -> one index)… except for a small deterministic set of keys
        # whose `collection` value CHANGES halfway through the log — the
        # mutable-routing-field migration the route_stable_keys=False
        # contract exists for. The field-route lake is built with that
        # contract, so the driver-checkable row exercises migration-exact
        # winner-route semantics against the oracle's global ranking.
        app = _APPS[key_id % len(_APPS)]
        coll_idx = (key_id // len(_APPS)) % len(_COLLECTIONS)
        if key_id % 31 == 7 and i >= n_events // 2:
            coll_idx = (coll_idx + 1) % len(_COLLECTIONS)
        coll = _COLLECTIONS[coll_idx]
        md = hashlib.md5(f"{repo}|{path}|{lsn}".encode()).hexdigest()
        doc = {
            "repo": repo,
            "path": path,
            "commit": (md + md)[:40],
            "lang": ["py", "go", "ts"][key_id % 3],
            "content": f"file {path} of {repo} v{lsn} " + md,
        }

        r = _h(i, "fr-op") % 1000
        if r < 20:  # hard delete, route from `before`
            value = _env(
                "d",
                before={"repo": repo, "path": path, "app_name": app,
                        "collection": coll},
                lsn=lsn, tx=lsn,
            )
        elif r < 35:  # hard delete WITHOUT route fields -> missing_route
            value = _env("d", before={"repo": repo, "path": path}, lsn=lsn, tx=lsn)
        elif r < 65:  # soft delete with flat route fields
            after = dict(doc, is_delete="true", app_name=app, collection=coll)
            value = _env("u", after, lsn=lsn, tx=lsn)
        elif r < 80:  # collection missing -> missing_route
            value = _env("u", dict(doc, app_name=app), lsn=lsn, tx=lsn)
        elif r < 95:  # empty-string app_name -> missing_route
            value = _env(
                "u", dict(doc, app_name="", collection=coll), lsn=lsn, tx=lsn
            )
        elif r < 115:  # inner payload carries the route fields
            inner = json.dumps(dict(doc, app_name=app, collection=coll))
            value = _env(
                "u", {"repo": repo, "path": path, "payload": inner},
                lsn=lsn, tx=lsn,
            )
        elif r < 135:  # flat-over-inner override: decoy inner values LOSE
            inner = json.dumps(
                dict(doc, app_name="decoy", collection="decoy")
            )
            value = _env(
                "u",
                {"repo": repo, "path": path, "payload": inner,
                 "app_name": app, "collection": coll},
                lsn=lsn, tx=lsn,
            )
        elif r < 142:  # malformed JSON
            value = '{"payload": {broken'
        elif r < 149:  # tombstone
            value = "" if _h(i, "fr-tb") % 2 == 0 else "null"
        elif r < 156:  # unknown op
            value = _env("x", dict(doc, app_name=app, collection=coll),
                         lsn=lsn, tx=lsn)
        else:  # plain upsert with flat route fields
            op = "r" if r < 200 else ("c" if i % 7 == 0 else "u")
            value = _env(op, dict(doc, app_name=app, collection=coll),
                         lsn=lsn, tx=lsn)

        rec = _rec(value, key=json.dumps({"repo": repo, "path": path}),
                   lsn=lsn, partition=_h(i, "fr-pt") % 8)
        rec["topic"] = topic_for(repo)
        out.append(rec)
    return out


def ensure_fieldroute_log(base_dir: str = FIELDROUTE_DIR, n_files: int = 4) -> str:
    return _write_event_log(base_dir, fieldroute_events(), n_files)
