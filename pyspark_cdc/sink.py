"""Exactly-once MERGE sink: a bucketed parquet lake with an Iceberg-style
snapshot manifest and two merge strategies (COW and merge-on-read).

Why not Iceberg itself: the sandbox has no Iceberg runtime jar (SURVEY.md
section 7.3 risk #1), so this module implements the same contract —
`MERGE INTO sink ON (repo,path) WHEN MATCHED [AND op='d'] DELETE/UPDATE
WHEN NOT MATCHED INSERT` (SURVEY.md S5/S6/J2/J3) — on plain parquet:

* The table is hash-bucketed on the merge key: bucket =
  pmod(xxhash64(repo, path), n_buckets). A COW MERGE reads and rewrites
  ONLY the buckets its batch touches (copy-on-write at bucket
  granularity, like Iceberg COW with bucket partition transform);
  untouched buckets are carried forward by manifest reference. At 100 TB
  you'd raise n_buckets so a bucket is a few GB — batch cost scales with
  batch key spread, not table size.
* mode='mor' (merge-on-read, the streaming default): a batch appends its
  rows as DELTA files — no table read, no sort, O(batch) per micro-batch
  (a 100 TB table cannot be rewritten per micro-batch). LWW resolves at
  read (small backlogs via a broadcast key-set join against the base —
  zero table-wide shuffle; large ones via the global aggregate) and at
  TIERED compaction: every `compact_every` batches a MINOR fold merges
  the deltas among themselves (O(recent data), no base read), and every
  `major_every`-th compaction folds into the base — the Iceberg v2 /
  Hudi / Paimon MoR + LSM-tiering design.
* Each commit writes an immutable snapshot manifest (bucket -> data dir,
  applied batch ids, column list) and atomically swaps the `current`
  pointer (os.replace). A crash mid-merge leaves the old snapshot
  current; the streaming retry of the same epoch is detected via the
  applied-batch-id log and becomes a no-op => idempotent foreachBatch,
  exactly-once final state (SURVEY.md T1).
* Deletes are retained as tombstone rows (__deleted=true, with their
  lsn), so a late-replayed OLDER upsert for a deleted key loses the LWW
  merge against the tombstone — strictly safer than the reference, which
  accepts cross-partition reorder loss (SURVEY.md T3).
* Additive schema evolution: extras-map keys observed in a batch become
  real string columns; old files read as null via parquet mergeSchema
  (north rule: new envelope columns auto-propagate to the sink schema).

The MERGE itself is the same map-side-combining hash aggregate as the LWW
stage: union(target-bucket rows, batch rows) -> max_by per key. Catalyst
sees one shuffle on the merge key; AQE coalesces/splits partitions.

Reference parity: upsert = Meilisearch AddDocuments PK-replace
(sync.go:84), delete = DeleteDocument (sync.go:71,108-113), delete of a
missing key is a no-op, revive-after-delete re-inserts
(document_repository.py:42).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .order import ORD_COLS, packed_ord
from .schemas import (DELETED_COL, DOMAIN_COLS, INTERNAL_COLS, KEY_COLS,
                      LSN_COL, OFFSET_COL, TS_COL, TX_COL)
from .signatures import SIG_COLS, fill_band_columns

BUCKET_COL = "__bucket"
# Routing identity (SURVEY.md P8/Q11): the per-record index identity of
# the reference ({app_name}_{collection}, sync.go:176-196) materialized
# as a sink PARTITION column; functionally determined by the key's repo
# (one route per source table/topic), so carrying it as a value through
# the key-wise MERGE is equivalent to keying by it. The physical layout
# is bucket/route (base) and status-only (parsed deltas; route stays a
# data column there and manifests record each delta's route list), so a
# tenant-scoped read prunes whole route directories — the analog of the
# reference's per-tenant Meilisearch index (handler.go:34-44): a
# `WHERE route = X` query must not scan other tenants' data. Route is
# expected to be LOW-cardinality (one per source table/topic/tenant
# collection); key-hash bucketing inside each route keeps file sizes
# uniform at 100 TB.
ROUTE_COL = "route"
INTERNAL = INTERNAL_COLS
# Extras keys that may NEVER be promoted to real columns: they collide
# with the lake's own column namespace. parse already keeps DOMAIN_COLS
# and `route` out of extras, but the sink defends itself regardless —
# a source field literally named "__deleted" (the Debezium
# ExtractNewRecordState SMT convention) or "__lsn" must not shadow the
# engine's internal columns: promoting it would make every subsequent
# merge/read raise AMBIGUOUS_REFERENCE, bricking the table until the
# manifest is hand-edited. Such keys stay in the extras map (parsed
# deltas keep the raw map) but are not materialized.
RESERVED_COLS = frozenset(
    [*INTERNAL_COLS, BUCKET_COL, ROUTE_COL, *DOMAIN_COLS, *SIG_COLS]
)
# out-of-order applied-batch-id window kept above the watermark
RECENT_BATCH_WINDOW = 1024
# snapshots kept by expire_snapshots (time-travel horizon)
SNAPSHOT_RETENTION = 8
# change-type column emitted by read_changes (Delta Lake CDF's
# _change_type naming, net-effect variant)
CHANGE_TYPE_COL = "_change_type"

# ---- optimistic concurrency (decoupled maintenance vs ingest) ----
# The commit lock is held ONLY for the O(ms) manifest check+write+swap,
# never across a Spark job, so concurrent writers (the streaming ingest
# job and a separate compaction/maintenance process — the Iceberg
# operational model) serialize at metadata speed while their data jobs
# overlap freely. Conflicts are resolved by REBASE (re-expressing the
# commit's intent on the freshest snapshot) or, for folds whose inputs
# were concurrently consumed, by aborting the fold (its output dir is
# dropped; correctness is untouched because the table never referenced
# it).
COMMIT_LOCK_TIMEOUT_SEC = 30.0
# a holder that died between acquire and release leaves the lock file
# behind; commits are O(ms), so a lock this old is presumed dead
COMMIT_LOCK_STALE_SEC = 30.0
OCC_MAX_RETRIES = 5


class CommitConflict(Exception):
    """The table advanced past the snapshot this manifest was built on
    (another writer committed first). Carries the fresh current manifest
    so the caller can rebase without re-reading under the lock."""

    def __init__(self, fresh_meta: dict, attempted: dict):
        self.fresh_meta = fresh_meta
        super().__init__(
            f"snapshot {attempted.get('id')} was built on parent "
            f"{attempted.get('parent')} but the current snapshot is "
            f"{fresh_meta.get('id')}"
        )

# dead-letter taxonomy (status partition values of a parsed delta)
DLQ_STATUSES = ("ok", "tombstone", "malformed", "unknown_op",
                "bad_payload", "missing_key", "missing_route")

_MERGE_OBS_AGGS: dict[int, list] = {}


def _merge_obs_aggs(n_buckets: int) -> list:
    """Observation aggregates riding the merge_parsed write — record count,
    per-status counts, observed open-world keys (schema evolution),
    merge-relevant routes for manifest-level tenant pruning, and the set
    of key-hash BUCKETS the batch's ok rows land in (so a later MAJOR
    compaction folds ONLY those buckets — the manifest knows the touched
    set without any delta re-scan). Built ONCE per (process, n_buckets):
    Column trees are immutable unresolved expressions, and rebuilding
    them each micro-batch is pure py4j overhead inside the
    sustained-rate wall."""
    if n_buckets not in _MERGE_OBS_AGGS:
        _MERGE_OBS_AGGS[n_buckets] = [
            F.count(F.lit(1)).alias("n_records"),
            F.collect_set(F.map_keys("extras")).alias("extras_keysets"),
            F.collect_set(
                F.when(F.col("status") == "ok", F.col(ROUTE_COL))
            ).alias("ok_routes"),
            F.collect_set(
                F.when(F.col("status") == "ok", bucket_expr(n_buckets))
            ).alias("ok_buckets"),
            *[
                F.count_if(F.col("status") == s).alias(f"n_{s}")
                for s in DLQ_STATUSES
            ],
        ]
    return _MERGE_OBS_AGGS[n_buckets]


def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64(*KEY_COLS), F.lit(n_buckets))


def resolve_lww(df: DataFrame) -> DataFrame:
    """Per-key last-writer-wins over any mix of row versions: max_by of the
    full row by the packed (lsn, tx_id, ts_ms, offset) ordering scalar
    (order.packed_ord) — Kafka arrival order is the final tie-break,
    exactly as the reference's sequential consumer loop would apply an
    exact-tie pair. Used by the COW merge aggregation and by the MoR read
    path — max is associative, so resolving at write time, at compaction,
    or at read time yields the identical winner."""
    non_key = [c for c in df.columns if c not in KEY_COLS]
    row = F.struct(*[F.col(c) for c in non_key])
    return (
        df.groupBy(*KEY_COLS)
        .agg(F.max_by(row, packed_ord(ORD_COLS)).alias("_w"))
        .select(*KEY_COLS, "_w.*")
    )


def resolve_lww_clustered(df: DataFrame, n_buckets: int) -> DataFrame:
    """resolve_lww fused with the compaction write's layout: ONE exchange
    for the whole fold. Hash-repartition the raw rows on the bucket column
    (a pure function of the key columns) into n_buckets partitions; the
    groupBy(bucket, *keys) that follows is satisfied by that partitioning
    (HashPartitioning(bucket) clusters every key), so Catalyst plans a
    single complete-mode aggregation in the same stage as the
    partitionBy(bucket, route) write that follows — no second exchange of
    the winner rows, and no wasted partial-aggregation pass (max_by of a
    row struct is a SortAggregate, so a partial pass sorts all raw rows
    for almost no combining when keys are spread across input splits;
    measured on a 40M-row fold it was ~45% of the fold's CPU).

    Winner-identical to resolve_lww: bucket = f(keys), so the groups are
    the same; route stays in the payload struct, so a key that migrates
    routes keeps only its winning row. Requires `df` to already carry
    BUCKET_COL. Measured (10x4M-event delta backlog, 6.6M keys): fold wall
    58.8s -> 39.4s at 4 executors, 119.5s -> 94.4s at 1 (bit-identical
    output), and fold 1->4 scaling 2.03x -> 2.40x."""
    non_key = [c for c in df.columns if c not in KEY_COLS and c != BUCKET_COL]
    row = F.struct(*[F.col(c) for c in non_key])
    return (
        df.repartition(n_buckets, F.col(BUCKET_COL))
        .groupBy(F.col(BUCKET_COL), *KEY_COLS)
        .agg(F.max_by(row, packed_ord(ORD_COLS)).alias("_w"))
        .select(BUCKET_COL, *KEY_COLS, "_w.*")
    )


class ParquetLake:
    """Single-writer lake table. Metadata ops are driver-side file ops on a
    shared filesystem (local here; a real deployment swaps this layer for
    an Iceberg/metastore catalog — the data plane is unchanged).

    Two merge strategies (same manifest, same exactly-once contract):

    * mode='cow' (copy-on-write): each batch unions with its touched base
      buckets, resolves LWW, and rewrites those buckets. Read = plain scan.
      Batch cost is O(touched table data) — right for low-rate tables and
      for compaction.
    * mode='mor' (merge-on-read, the streaming default): each batch writes
      ONLY its own rows as bucket-partitioned delta files — no table read,
      no sort; cost is O(batch) regardless of table size (a 100 TB table
      cannot be rewritten per micro-batch). LWW resolves at read time
      (resolve_lww over base+deltas) and at compaction, which runs the COW
      path over everything once every `compact_every` batches to bound
      read amplification. Iceberg v2 / Hudi / Paimon MoR is this design.
    """

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        n_buckets: int = 32,
        mode: str = "cow",
        compact_every: int | None = 10,
        tombstone_horizon_lsn: int | None = None,
        broadcast_delta_bytes: int = 32 * 1024 * 1024,
        major_every: int = 4,
        full_major: bool = False,
        minhash_bands: bool = False,
        orphan_grace_sec: float = 0.0,
        snapshot_retention: int = SNAPSHOT_RETENTION,
        route_stable_keys: bool = True,
    ):
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown lake mode: {mode}")
        self.spark = spark
        self.table_dir = table_dir
        self.n_buckets = n_buckets
        self.mode = mode
        # compact_every=None disables INLINE compaction entirely — the
        # decoupled deployment mode where a separate maintenance process
        # calls compact_now() while the ingest job only appends deltas
        # (commit conflicts between the two resolve by rebase, see
        # _commit_with_rebase).
        self.compact_every = compact_every
        # Tiered compaction (LSM-style): when the delta count reaches
        # compact_every, a MINOR compaction folds the deltas into ONE
        # flat delta — O(recent data), NO base read — and only every
        # `major_every`-th compaction (or when no base exists yet) runs
        # the MAJOR fold into the base. At 100 TB this is the difference
        # between rewriting the table every compact_every batches and
        # every compact_every*major_every batches, while the read path
        # sees at most compact_every-1 raw deltas plus one merged one.
        self.major_every = major_every
        # full_major=True forces every MAJOR fold to rewrite the whole
        # base (the pre-subset behavior) — kept for the subset≡full
        # equivalence tests and as an operational escape hatch.
        self.full_major = full_major
        # minhash_bands=True materializes the incremental-dedup LSH band
        # signature columns (signatures.SIG_COLS) on every row version
        # that WINS a fold or read (fill_band_columns after each LWW
        # resolve) — losing versions never pay the shingle cost, and a
        # winner is signed exactly once, its signature then carried
        # through later folds like any payload column. A CREATE-time
        # table property like n_buckets: mixed-writer tables (some rows
        # signed, some not) would break incremental==scratch, so
        # reopening adopts the manifest's value.
        self.minhash_bands = minhash_bands
        # MoR read strategy switch: when the outstanding deltas are at most
        # this many parquet bytes, read() resolves them with a BROADCAST
        # key-set join against the base (scan-only, no table-wide shuffle);
        # bigger backlogs fall back to the global LWW aggregate. See read().
        self.broadcast_delta_bytes = broadcast_delta_bytes
        # Tombstone retention (SCALING.md section 7): a delete tombstone
        # only needs to outlive the SOURCE's replay horizon (Kafka
        # retention) — an older upsert can never be replayed after its
        # offset has been retained out. Compaction drops tombstones with
        # lsn < this horizon; None = retain forever (the safe default).
        self.tombstone_horizon_lsn = tombstone_horizon_lsn
        # Orphan-removal grace period (the Iceberg remove_orphan_files
        # `older_than` analog): with CONCURRENT writers, a data dir can be
        # fully written but not yet referenced by any manifest (the
        # writer is between its Spark job and its metadata commit), and
        # expire_snapshots must not delete it. 0.0 (the single-writer
        # default) keeps the historical eager behavior; decoupled
        # deployments set it comfortably above the longest write job.
        self.orphan_grace_sec = orphan_grace_sec
        # Snapshots kept by the automatic expire_snapshots after each
        # fold — the time-travel horizon AND the incremental-read (CDF)
        # horizon: read_changes(A, B) needs every intermediate snapshot
        # manifest, so a downstream sync must run at least once per
        # `snapshot_retention` commits (the Iceberg/Delta CDF retention
        # contract). Raise it for slow consumers; manifests are O(KB).
        self.snapshot_retention = snapshot_retention
        # Contract switch for ROUTE-SCOPED reads and feeds. True (the
        # default, and the reference's deployment shape — one topic per
        # Postgres table, sync.go:58-64, so a primary key can never move
        # between routes): tenant reads prune deltas and range entries by
        # the manifest route lists and filter rows per-route BEFORE LWW,
        # which is exact precisely because no key ever changes route.
        # False: keys MAY migrate routes (field-derived routing where the
        # routing column is mutable); tenant reads then resolve LWW over
        # ALL routes of the delta-touched buckets and filter WINNERS by
        # route (read(route=X) == read().filter(route==X) under arbitrary
        # migrations), and read_changes additionally emits a DEPARTURE
        # delete to the old route when a key's winning route changes —
        # without it a per-tenant downstream index would serve the
        # migrated document forever. The exactness costs the tenant
        # pruning on the delta/backlog side (any route's new version can
        # evict a tenant's key), which is why it is a declared table
        # contract and not always-on.
        self.route_stable_keys = route_stable_keys
        # test-only injection point: called before every optimistic
        # commit attempt (see _commit_with_rebase) so tests can land a
        # concurrent commit in the read->commit window deterministically
        self._pre_commit_hook = None
        self._meta_dir = os.path.join(table_dir, "_meta")
        os.makedirs(self._meta_dir, exist_ok=True)
        # n_buckets is a CREATE-time table property: the base layout was
        # hashed with it, so reopening an existing lake adopts the
        # manifest's value. Honoring a different constructor value would
        # silently mis-route keys (touched-bucket lookups against dirs
        # hashed under the old modulus -> stale duplicates survive).
        existing = self.current_meta()
        if existing is not None and existing.get("n_buckets"):
            self.n_buckets = existing["n_buckets"]
        if existing is not None and "minhash_bands" in existing:
            self.minhash_bands = existing["minhash_bands"]

    # ---------------- metadata ----------------

    def _current_path(self) -> str:
        return os.path.join(self._meta_dir, "current")

    def current_meta(self) -> dict | None:
        cp = self._current_path()
        snap_id = 0
        if os.path.exists(cp):
            with open(cp) as f:
                snap_id = int(f.read().strip())
        # Forward-scan self-heal: snapshot files are created with O_EXCL
        # and strictly increasing ids BEFORE the pointer swap, so if
        # snap-(K+1) exists the pointer is stale — either a writer crashed
        # between the exclusive snap create and the swap, or two pointer
        # swaps raced and the older one landed last. Adopting the newest
        # contiguous snapshot is safe: a snapshot file is only ever
        # written after its parent check passed, and its data files are
        # fully written and fsynced before the commit is attempted (the
        # crashed writer's retry finds the batch already applied — the
        # idempotent-replay path). One os.path.exists per read in the
        # common case.
        healed = snap_id
        while os.path.exists(
            os.path.join(self._meta_dir, f"snap-{healed + 1}.json")
        ):
            healed += 1
        if healed == 0:
            return None
        with open(os.path.join(self._meta_dir, f"snap-{healed}.json")) as f:
            return json.load(f)

    def snapshot_meta(self, snapshot_id: int) -> dict:
        """Manifest of a historical snapshot (within the expire_snapshots
        retention window) — the time-travel entry point."""
        with open(os.path.join(self._meta_dir, f"snap-{snapshot_id}.json")) as f:
            return json.load(f)

    # ---------------- pinned refs (retention protection) ----------------

    def _refs_path(self) -> str:
        return os.path.join(self._meta_dir, "refs.json")

    def refs(self) -> dict[str, int]:
        """name -> pinned snapshot id (Iceberg tag analog)."""
        try:
            with open(self._refs_path()) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _write_refs(self, refs: dict[str, int]) -> None:
        tmp = os.path.join(self._meta_dir, f".refs.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(refs, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._refs_path())

    def pin_snapshot(self, name: str, snapshot_id: int | None = None) -> int:
        """Pin a snapshot against expiry under a named ref (current if
        unspecified). expire_snapshots keeps EVERY snapshot >= the oldest
        pin — the manifest chain an incremental consumer checkpointed
        there still needs (read_changes walks it). Re-pinning a name
        moves it; a consumer that re-pins after every sync rides the
        retention window forward with zero history held beyond its own
        lag. O(ms) metadata write under the commit lock (refs are shared
        mutable state between processes, unlike immutable manifests)."""
        with self._commit_lock():
            if snapshot_id is None:
                meta = self.current_meta()
                if meta is None:
                    raise ValueError("empty lake: nothing to pin")
                snapshot_id = int(meta["id"])
            if not os.path.exists(
                os.path.join(self._meta_dir, f"snap-{snapshot_id}.json")
            ):
                raise ValueError(
                    f"snapshot {snapshot_id} does not exist or was already "
                    "expired; cannot pin"
                )
            refs = self.refs()
            refs[name] = int(snapshot_id)
            self._write_refs(refs)
        return int(snapshot_id)

    def unpin_snapshot(self, name: str) -> bool:
        """Remove a named pin; returns whether it existed. History it
        protected becomes expirable on the next maintenance pass."""
        with self._commit_lock():
            refs = self.refs()
            existed = name in refs
            if existed:
                del refs[name]
                self._write_refs(refs)
        return existed

    def _lock_path(self) -> str:
        return os.path.join(self._meta_dir, "commit.lock")

    def _lock_acquire(self) -> str:
        """Acquire the commit lock; returns the owner token. O_CREAT|O_EXCL
        is atomic on POSIX filesystems; the file holds a unique token so
        release and stale-breaking are OWNERSHIP-CHECKED — a resumed
        writer whose lock was broken while it was stalled can no longer
        unlink the new holder's lock (the lost-batch race a blind
        finally-unlink allowed)."""
        lock_path = self._lock_path()
        token = f"{os.getpid()}:{uuid.uuid4().hex}"
        deadline = time.monotonic() + COMMIT_LOCK_TIMEOUT_SEC
        while True:
            try:
                fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                return token
            except FileExistsError:
                try:
                    st = os.stat(lock_path)
                    with open(lock_path) as f:
                        holder = f.read()
                except OSError:
                    continue  # holder released between EXCL and stat
                age = time.time() - st.st_mtime
                if age > COMMIT_LOCK_STALE_SEC:
                    self._lock_break(holder)
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock {lock_path} held for {age:.1f}s; "
                        "another writer is stuck mid-commit"
                    )
                time.sleep(0.01)

    def _lock_break(self, stale_token: str) -> None:
        """Break a presumed-dead holder's lock, guarding against the
        holder having RELEASED (and another writer acquired) between our
        stat and the break: rename the lock aside (atomic — two breakers
        race on the rename, one wins), verify the sidecar still holds the
        token we judged stale, and if it does not, try to restore it via
        os.link (fails harmlessly if a new lock already exists). The
        unlink-by-path this replaces could silently break a FRESH lock."""
        lock_path = self._lock_path()
        side = f"{lock_path}.breaking.{uuid.uuid4().hex}"
        try:
            os.rename(lock_path, side)
        except OSError:
            return  # someone else broke or released it first
        try:
            with open(side) as f:
                got = f.read()
            if got != stale_token:
                # we displaced a lock that changed hands after our stat —
                # put it back if the slot is still empty
                try:
                    os.link(side, lock_path)
                except OSError:
                    pass
        finally:
            try:
                os.unlink(side)
            except OSError:
                pass

    def _lock_release(self, token: str) -> None:
        """Release only OUR lock: a holder that stalled past
        COMMIT_LOCK_STALE_SEC and was broken must not unlink the next
        writer's lock. (The read-then-unlink window is microseconds and
        only reachable after a >30s stall was already broken — the
        O_EXCL-created snapshot files below backstop even that.)"""
        lock_path = self._lock_path()
        try:
            with open(lock_path) as f:
                if f.read() != token:
                    return
            os.unlink(lock_path)
        except OSError:
            pass

    @contextmanager
    def _commit_lock(self):
        """Cross-process mutual exclusion for the metadata commit. Held
        only for the manifest check+write+swap (milliseconds, data-size
        independent), NEVER across a Spark job, so writer throughput is
        unaffected. Ownership-checked acquire/release/stale-break above;
        the exclusive snapshot-file create in _commit_snapshot_unlocked
        turns any residual double-admission into a loud CommitConflict
        instead of a silently lost commit."""
        token = self._lock_acquire()
        try:
            yield
        finally:
            self._lock_release(token)

    def _commit_snapshot(self, meta: dict) -> None:
        """Commit one manifest with optimistic concurrency control: under
        the commit lock, the table must still be at meta['parent'] —
        another writer having advanced it raises CommitConflict carrying
        the fresh manifest (callers rebase via _commit_with_rebase).
        Re-committing the CURRENT snapshot byte-identically is a no-op
        (idempotent), so retries and wrap-the-return-value callers are
        safe."""
        with self._commit_lock():
            current = self.current_meta()
            current_id = current["id"] if current is not None else 0
            if current_id != (meta.get("parent") or 0):
                if current_id == meta["id"] and current == meta:
                    return  # idempotent re-commit of the current snapshot
                raise CommitConflict(current if current is not None else
                                     self._empty_meta(), meta)
            self._commit_snapshot_unlocked(meta)

    def _commit_with_rebase(self, meta0: dict, build) -> dict | None:
        """Optimistic-concurrency commit loop (the Iceberg commit model):
        `build(snapshot) -> manifest|None` re-expresses ONE commit's
        intent on top of an arbitrary current snapshot — append these
        delta entries, or swap these folded buckets for these consumed
        deltas — returning None when the intent no longer applies (the
        batch was already applied by a concurrent writer; the fold's
        input deltas were already consumed by a concurrent compaction).
        The loop commits build(meta0); on CommitConflict it rebuilds on
        the conflict's fresh manifest and retries. Returns the committed
        manifest, or None when the commit aborted (caller drops any
        now-orphaned output dir; expire_snapshots' grace period protects
        other writers' in-flight dirs)."""
        attempt = build(meta0)
        if attempt is None:
            return None
        for _ in range(OCC_MAX_RETRIES + 1):
            hook = self._pre_commit_hook
            if hook is not None:
                hook()
            try:
                self._commit_snapshot(attempt)
                return attempt
            except CommitConflict as c:
                attempt = build(c.fresh_meta)
                if attempt is None:
                    return None
        raise RuntimeError(
            f"commit of snapshot built on {meta0.get('id')} did not "
            f"converge after {OCC_MAX_RETRIES + 1} attempts — a writer "
            "storm is outrunning the rebase loop"
        )

    def _commit_snapshot_unlocked(self, meta: dict) -> None:
        # fsync before the pointer swap: os.replace is atomic against
        # process crashes, but without durably flushed file contents a
        # power loss after the swap could leave `current` pointing at an
        # empty/truncated snap file — the exact failure the atomic-swap
        # design claims to prevent. O(ms) per commit, data-size
        # independent.
        snap_file = os.path.join(self._meta_dir, f"snap-{meta['id']}.json")
        payload = json.dumps(meta)
        try:
            # O_EXCL: snapshot files are immutable and ids single-assign.
            # If two writers ever reach this point for the same id (a
            # stale-broken lock whose holder resumed — see _commit_lock),
            # the loser fails LOUDLY here and rebases, instead of both
            # writers last-wins-overwriting snap file + pointer and one
            # committed batch silently vanishing.
            fd = os.open(snap_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
        except FileExistsError:
            with open(snap_file) as f:
                existing = f.read()
            if existing != payload:
                raise CommitConflict(
                    self.current_meta() or self._empty_meta(), meta
                )
            # identical content: our own crash-retry after writing the
            # snap but before the pointer swap — fall through to the swap
        tmp = os.path.join(self._meta_dir, f".current.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(meta["id"]))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._current_path())  # atomic pointer swap
        dfd = os.open(self._meta_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)  # persist the rename itself
        finally:
            os.close(dfd)

    def _empty_meta(self) -> dict:
        return {
            "id": 0,
            "parent": None,
            "n_buckets": self.n_buckets,
            "minhash_bands": self.minhash_bands,
            "extra_columns": [],
            "buckets": {},
            "deltas": [],
            # Bounded applied-batch tracking: a long-running CDC tail job
            # commits unbounded batches, so the manifest stores a
            # high-watermark (every id <= wm is applied) plus the
            # out-of-order ids above it — O(window), not O(n_batches).
            "batch_wm": -1,
            "recent_batch_ids": [],
        }

    def _new_data_rel(self, prefix: str, meta: dict) -> str:
        """Unique data-dir name per WRITE ATTEMPT (snapshot id + random
        token). Concurrent writers that read the same snapshot must never
        target the same path: with id-only names, writer B's
        mode=overwrite job would clobber writer A's fully-written but
        not-yet-committed dir, and the OCC rebase would then commit two
        manifest entries aliasing one (half-overwritten) dir. The id
        prefix is kept for human debuggability only — nothing parses it.
        A crashed attempt now leaves a uniquely-named orphan instead of
        being overwritten by the epoch retry; expire_snapshots removes
        unreferenced dirs (subject to orphan_grace_sec)."""
        return os.path.join(
            "data", f"{prefix}{meta['id'] + 1}-{uuid.uuid4().hex[:8]}"
        )

    def _check_writer_modulus(self, m: dict) -> None:
        """Commit-time guard for bucket-count evolution: everything this
        writer wrote (bucket dirs, touched-bucket lists) was hashed with
        self.n_buckets, so committing it onto a snapshot that was
        REBUCKETED underneath (rebucket()) would silently corrupt the
        bucket maps — and a manifest rebuilt from self's fields would
        even revert the table's n_buckets. Raising (instead of the OCC
        abort) is deliberate for INGEST writers: an abort is reported as
        skipped_duplicate_batch, which would advance the streaming
        checkpoint past a batch that was never applied. The raise fails
        the micro-batch before the checkpoint commits; the operator
        reopens the lake (adopting the new count) and the same epoch
        replays idempotently."""
        mn = m.get("n_buckets") or self.n_buckets
        if mn != self.n_buckets:
            raise RuntimeError(
                f"table at {self.table_dir} was rebucketed underneath this "
                f"writer ({self.n_buckets} -> {mn} buckets): reopen the "
                "lake (ParquetLake adopts the manifest's bucket count at "
                "construction) and retry the batch"
            )

    @staticmethod
    def _batch_applied(meta: dict, batch_id) -> bool:
        if "batch_ids" in meta:  # pre-watermark manifest
            return batch_id in meta["batch_ids"]
        return (
            isinstance(batch_id, int) and batch_id <= meta["batch_wm"]
        ) or batch_id in meta["recent_batch_ids"]

    @staticmethod
    def _with_batch(meta: dict, batch_id) -> dict:
        """New (wm, recent) after applying batch_id. If the recent window
        ever overflows RECENT_BATCH_WINDOW, the NUMERICALLY lowest ids are
        dropped — safe direction: a dropped id re-applies as a duplicate
        delta, which the LWW merge is content-idempotent against (max is
        duplicate-insensitive), whereas the other direction would skip
        data."""
        if "batch_ids" in meta:  # migrate pre-watermark manifest
            wm, recent = -1, set(meta["batch_ids"])
        else:
            wm, recent = meta["batch_wm"], set(meta["recent_batch_ids"])
        recent.add(batch_id)
        while (wm + 1) in recent:
            wm += 1
            recent.discard(wm)
        recent = {b for b in recent if not (isinstance(b, int) and b <= wm)}
        if len(recent) > RECENT_BATCH_WINDOW:
            # numeric-aware ordering: int ids compare by value (str sorting
            # would drop '999' in favor of '1000'); non-int ids sort after
            # ints so they are preferentially retained (rare, can't advance
            # the watermark anyway).
            keep = sorted(
                recent,
                key=lambda b: (isinstance(b, int) is False, b if isinstance(b, int) else str(b)),
            )[-RECENT_BATCH_WINDOW:]
            recent = set(keep)
        out = {k: v for k, v in meta.items() if k != "batch_ids"}
        out["batch_wm"] = wm
        out["recent_batch_ids"] = sorted(recent, key=str)
        return out

    def extra_columns(self) -> list[str]:
        meta = self.current_meta()
        return list(meta["extra_columns"]) if meta else []

    def applied_batch_ids(self) -> list:
        """Reconstructed applied-id list: [0..wm] + out-of-order window.
        (Exact for the streaming case of monotone integer batch ids.)
        O(n_batches) by construction — callers that only need the COUNT
        must use applied_batch_count(), which stays O(window)."""
        meta = self.current_meta()
        if not meta:
            return []
        if "batch_ids" in meta:
            return list(meta["batch_ids"])
        return list(range(meta["batch_wm"] + 1)) + list(meta["recent_batch_ids"])

    def applied_batch_count(self) -> int:
        """Number of applied batches in O(window) — after 10^7 streamed
        batches applied_batch_ids() would build a 10M-element list just to
        be len()'d; the watermark already knows the answer."""
        meta = self.current_meta()
        if not meta:
            return 0
        if "batch_ids" in meta:
            return len(meta["batch_ids"])
        return meta["batch_wm"] + 1 + len(meta["recent_batch_ids"])

    # ---------------- data plane ----------------

    def _row_schema(self, extra_cols: list[str]) -> T.StructType:
        fields = [T.StructField(c, T.StringType(), True) for c in DOMAIN_COLS]
        fields += [T.StructField(ROUTE_COL, T.StringType(), True)]
        fields += [T.StructField(c, T.StringType(), True) for c in extra_cols]
        if self.minhash_bands:
            fields += [T.StructField(c, T.StringType(), True) for c in SIG_COLS]
        fields += [
            T.StructField(LSN_COL, T.LongType(), True),
            T.StructField(TX_COL, T.LongType(), True),
            T.StructField(TS_COL, T.LongType(), True),
            T.StructField(OFFSET_COL, T.LongType(), True),
            T.StructField(DELETED_COL, T.BooleanType(), True),
            T.StructField(BUCKET_COL, T.LongType(), True),
        ]
        return T.StructType(fields)

    def _read_buckets(self, meta: dict, buckets: list[int], extra_cols: list[str]) -> DataFrame:
        """Base rows of the given buckets. Each bucket dir is a partitioned
        root with route=R subdirs — partition discovery recovers `route`
        as a column (and a route predicate on the result prunes at the
        directory level)."""
        paths = [
            os.path.join(self.table_dir, meta["buckets"][str(b)])
            for b in buckets
            if str(b) in meta["buckets"]
        ]
        df = self._read_bucket_tree(paths)
        if df is None:
            return self.spark.createDataFrame([], self._row_schema(extra_cols))
        df = self._route_as_string(df)
        for c in [ROUTE_COL, *extra_cols]:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        return df.withColumn(BUCKET_COL, bucket_expr(self.n_buckets))

    def _read_bucket_tree(self, paths: list[str]):
        """Bucket dirs (possibly spanning several snapshots) -> one
        DataFrame. Bucket dirs are `__bucket=B` roots holding `route=R`
        subdirs; partition discovery needs each snapshot's data dir as
        basePath to recover (__bucket, route) without tripping
        CONFLICTING_DIRECTORY_STRUCTURES, and dirs from different
        snapshots are separate trees, so group by parent and union."""
        if not paths:
            return None
        groups: dict[str, list[str]] = {}
        for p in paths:
            groups.setdefault(os.path.dirname(p), []).append(p)
        parts = [
            self.spark.read.option("mergeSchema", "true")
            .option("basePath", parent)
            .parquet(*sorted(ps))
            for parent, ps in sorted(groups.items())
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return df

    @staticmethod
    def _route_as_string(df: DataFrame) -> DataFrame:
        """Partition-column type inference could read a numeric-looking
        tenant (route=123) back as int; the lake contract is string.
        Callers apply this AFTER any route filter so partition pruning
        sees the raw column."""
        if ROUTE_COL in df.columns:
            return df.withColumn(ROUTE_COL, F.col(ROUTE_COL).cast("string"))
        return df

    @staticmethod
    def _obs_get(obs, out_dir: str, **defaults) -> dict:
        """Metrics of an Observation riding a dynamic-partition write.
        Spark quirk (4.1): a partitionBy write that commits ZERO rows
        reports a schema-less metrics row, and Observation.get's toPyRow
        conversion throws java.lang.AssertionError. Zero rows written
        means every count is 0 and every collect_set empty, so return
        `defaults` — after confirming via ONE os.listdir (exception path
        only, not a walk) that the written dir really has no partition
        dirs. Any other failure, or a non-empty dir, re-raises."""
        try:
            return obs.get
        except Exception as e:
            if "toPyRow" not in str(e):
                raise
            try:
                entries = os.listdir(out_dir)
            except OSError:
                entries = []
            if any("=" in d for d in entries):
                raise  # rows WERE written; the failure is something else
            return defaults

    def merge(
        self,
        changes: DataFrame,
        batch_id,
        input_persisted: bool = False,
        side_summary: DataFrame | None = None,
    ) -> dict:
        """Idempotent MERGE of one batch of change rows (columns KEY_COLS +
        order.CARRY_COLS). The batch may contain MULTIPLE rows per key —
        the merge aggregation's per-key max_by over union(target, batch)
        resolves last-writer-wins inline (max is associative), so callers
        need not pre-deduplicate. Returns commit stats.

        input_persisted=True: the caller already holds `changes` (or its
        lineage) resident; skip the internal persist. The merge runs two
        actions over the batch (bucket/extras summary collect + the COW
        rewrite), so unpersisted input would pay its compute twice.

        side_summary: optional small aggregate DataFrame (e.g. per-partition
        lineage) to ride along in the merge's summary job — one Spark job
        instead of two; its rows come back in stats["side_rows"]. Streaming
        uses this so a micro-batch costs exactly TWO jobs (summary+lineage
        collect, then the COW write).
        """
        from pyspark import StorageLevel

        meta = self.current_meta() or self._empty_meta()
        if self._batch_applied(meta, batch_id):
            return {"status": "skipped_duplicate_batch", "batch_id": batch_id}

        src = changes.withColumn(BUCKET_COL, bucket_expr(self.n_buckets))
        if input_persisted:
            return self._merge_impl(src, batch_id, meta, side_summary)
        src = src.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._merge_impl(src, batch_id, meta, side_summary)
        finally:
            src.unpersist()

    def _merge_impl(
        self, src: DataFrame, batch_id, meta: dict, side_summary: DataFrame | None = None
    ) -> dict:
        t0 = time.monotonic()
        # One scalable pass: touched buckets + observed open-world keys
        # (explode multiplies by ~#extras per row; hash-agg partial-combines
        # down to <= n_buckets * n_keys rows before the collect). An optional
        # caller aggregate (lineage) is unioned in so it shares the job.
        summary_df = (
            src.select(
                BUCKET_COL, F.col(ROUTE_COL),
                F.explode_outer(F.map_keys("extras")).alias("_k"),
            )
            .groupBy(BUCKET_COL, ROUTE_COL, "_k")
            .agg(F.count(F.lit(1)).alias("_n"))
            .withColumn("_side", F.lit("merge"))
        )
        if side_summary is not None:
            summary_df = summary_df.unionByName(
                side_summary.withColumn("_side", F.lit("side")),
                allowMissingColumns=True,
            )
        rows = summary_df.collect()
        summary = [r for r in rows if r["_side"] == "merge"]
        side_rows = [r for r in rows if r["_side"] == "side"]
        t_summary = time.monotonic() - t0
        touched = sorted({r[BUCKET_COL] for r in summary})
        batch_pairs = {(r[BUCKET_COL], r[ROUTE_COL]) for r in summary}
        observed_keys = sorted(
            {r["_k"] for r in summary if r["_k"] is not None}
            - RESERVED_COLS
        )
        if not touched:
            committed = self._commit_with_rebase(
                meta, lambda m: None if self._batch_applied(m, batch_id)
                else dict(self._with_batch(m, batch_id),
                          id=m["id"] + 1, parent=m["id"]))
            status = ("empty_batch" if committed is not None
                      else "skipped_duplicate_batch")
            return {"status": status, "batch_id": batch_id,
                    "side_rows": side_rows}

        # Additive schema evolution: union of stored and observed columns.
        extra_cols = list(meta["extra_columns"])
        for k in observed_keys:
            if k not in extra_cols:
                extra_cols.append(k)

        src_flat = src.select(
            *KEY_COLS,
            *[F.col(c) for c in DOMAIN_COLS if c not in KEY_COLS],
            F.col(ROUTE_COL),
            *[F.element_at(F.col("extras"), k).alias(k) for k in extra_cols],
            F.col(LSN_COL),
            F.col(TX_COL),
            F.col(TS_COL),
            F.col(OFFSET_COL),
            (F.col("effective_op") == "d").alias(DELETED_COL),
            F.col(BUCKET_COL),
        )
        # Deleted rows keep the key + lsn only (tombstone): null out payload
        # so a tombstone never leaks stale content.
        payload_cols = [c for c in DOMAIN_COLS if c not in KEY_COLS] + extra_cols
        for c in payload_cols:
            src_flat = src_flat.withColumn(
                c, F.when(F.col(DELETED_COL), F.lit(None).cast("string")).otherwise(F.col(c))
            )
        # minhash_bands: signatures are NOT computed here — the post-LWW
        # fill (fill_band_columns, applied after every resolve) signs only
        # the rows that win, so losing versions never pay the shingle cost.

        stats = {
            "status": "committed",
            "batch_id": batch_id,
            "touched_buckets": len(touched),
            "new_columns": [k for k in observed_keys if k not in meta["extra_columns"]],
            "summary_sec": round(t_summary, 3),
            "side_rows": side_rows,
        }
        if self.mode == "mor":
            new_meta = self._merge_mor(
                src_flat, touched, batch_pairs, extra_cols, meta, batch_id, stats
            )
        else:
            new_meta = self._merge_cow(
                src_flat, touched, batch_pairs, extra_cols, meta, batch_id, stats
            )
        stats["snapshot"] = new_meta["id"]
        return stats

    def _merge_cow(
        self, src_flat: DataFrame, touched, batch_pairs, extra_cols,
        # batch_pairs is CONSUMED only by the MoR path (write-layout
        # repartition); it rides here for the shared dispatch signature
        meta: dict, batch_id, stats: dict,
    ) -> dict:
        """Union touched base buckets with the batch, resolve LWW, rewrite
        those buckets."""
        for _ in range(3):
            if not meta.get("deltas"):
                break
            # COW over a table with pending MoR deltas: fold them into the
            # base first so the bucket rewrite below sees every version.
            # _compact may abort under a concurrent-writer conflict and
            # return the fresh manifest (possibly with NEW deltas) — retry
            # the fold on that; COW correctness requires a delta-free base.
            meta = self._compact(meta, full=self.full_major)
        if meta.get("deltas"):
            raise RuntimeError(
                "COW merge could not clear the delta backlog: concurrent "
                "writers keep advancing the table (COW mode expects a "
                "single writer; use mode='mor' for concurrent ingest)"
            )

        tgt = self._read_buckets(meta, touched, extra_cols)
        tgt = tgt.unionByName(src_flat, allowMissingColumns=True)
        # Single-exchange merge (resolve_lww_clustered): hash straight to
        # ~one partition per touched bucket; the LWW aggregation and the
        # dynamic-partition write below share that stage, so each leaf dir
        # is written by exactly the task that owns its bucket (no second
        # exchange, no AQE-coalesced fat writers fanning out to all
        # leaves, and no partial-agg pass — base rows are one-per-key, so
        # map-side combining never reduces anything here).
        merged = resolve_lww_clustered(tgt, max(len(touched), 1))
        if self.minhash_bands:
            # post-LWW signing: only unsigned winners (new versions that
            # beat their base row) pay the shingle cost — same stage as
            # the write, no extra exchange
            merged = fill_band_columns(merged)

        data_rel = self._new_data_rel("s", meta)
        out_dir = os.path.join(self.table_dir, data_rel)

        # The rewritten buckets and their route lists ride the rewrite's
        # own job (Observation): the distinct (bucket, route) pair set is
        # O(touched x routes) — tiny — where the previous post-write
        # os.listdir + per-bucket walk was O(rewritten files) on the
        # driver.
        from pyspark.sql import Observation

        obs = Observation(f"merge_cow_{batch_id}")
        merged = merged.observe(
            obs,
            F.collect_set(
                F.struct(
                    F.col(BUCKET_COL).cast("string").alias("b"),
                    F.col(ROUTE_COL).alias("r"),
                )
            ).alias("pairs"),
        )

        t0 = time.monotonic()
        merged.write.partitionBy(BUCKET_COL, ROUTE_COL).mode("overwrite").parquet(out_dir)
        stats["write_sec"] = round(time.monotonic() - t0, 3)
        pairs = self._obs_get(obs, out_dir, pairs=[])["pairs"] or []

        written = {int(p["b"]) for p in pairs}
        routes_by_bucket: dict[str, set] = {}
        for p in pairs:
            if p["r"] is not None:
                routes_by_bucket.setdefault(p["b"], set()).add(p["r"])

        def build(m: dict) -> dict | None:
            if self._batch_applied(m, batch_id):
                return None  # a concurrent writer applied this batch
            self._check_writer_modulus(m)
            # The rewrite read meta's touched buckets and assumed a
            # delta-free table; a concurrent commit that repointed any of
            # them (or appended deltas) invalidates the output. Only
            # metadata-neutral concurrent commits (empty batches) can be
            # rebased over — COW is the single-writer batch mode.
            if [d["path"] if isinstance(d, dict) else d
                    for d in m.get("deltas", [])] != \
               [d["path"] if isinstance(d, dict) else d
                    for d in meta.get("deltas", [])] or any(
                    m["buckets"].get(str(b)) != meta["buckets"].get(str(b))
                    for b in touched):
                raise RuntimeError(
                    "COW merge conflicts with a concurrent data commit "
                    "(COW mode expects a single writer; use mode='mor' "
                    "for concurrent ingest + decoupled compaction)"
                )
            new_buckets = dict(m["buckets"])
            bucket_routes = dict(m.get("bucket_routes", {}))
            for b in touched:
                if b in written:
                    new_buckets[str(b)] = os.path.join(
                        data_rel, f"{BUCKET_COL}={b}"
                    )
                    bucket_routes[str(b)] = sorted(
                        routes_by_bucket.get(str(b), set())
                    )
                else:
                    new_buckets.pop(str(b), None)
                    bucket_routes.pop(str(b), None)
            cols = list(m["extra_columns"])
            cols += [c for c in extra_cols if c not in cols]
            return {
                "id": m["id"] + 1,
                "parent": m["id"],
                "n_buckets": self.n_buckets,
                "minhash_bands": self.minhash_bands,
                "extra_columns": cols,
                "buckets": new_buckets,
                "bucket_routes": bucket_routes,
                "deltas": m.get("deltas", []),
                **{k: v for k, v in self._with_batch(m, batch_id).items()
                   if k in ("batch_wm", "recent_batch_ids")},
            }

        new_meta = self._commit_with_rebase(meta, build)
        if new_meta is None:  # duplicate batch won the race: drop our write
            shutil.rmtree(out_dir, ignore_errors=True)
            stats["status"] = "skipped_duplicate_batch"
            return self.current_meta()
        # COW is the one commit path that never reaches a compaction, so
        # it must run its own retention: every merge rewrites bucket dirs
        # and commits a snapshot, and without this a long-running COW
        # table accumulates manifests AND superseded bucket generations
        # without bound (the expire docstring's "bounds disk growth of
        # the long-running tail job" was only true for MoR).
        self.expire_snapshots(keep_last=self.snapshot_retention)
        return new_meta

    def _merge_mor(
        self, src_flat: DataFrame, touched, batch_pairs, extra_cols,
        meta: dict, batch_id, stats: dict,
    ) -> dict:
        """Append the batch as bucket-partitioned delta files — O(batch),
        no table read, no sort. LWW resolves at read/compaction; compaction
        (the COW aggregation over base + all deltas) runs every
        `compact_every` batches to bound read amplification."""
        from pyspark.sql import Observation

        data_rel = self._new_data_rel("d", meta)
        out_dir = os.path.join(self.table_dir, data_rel)

        # Route list for manifest-level tenant pruning rides the delta
        # write itself (no post-write directory walk).
        obs = Observation(f"merge_mor_{batch_id}")
        src_flat = src_flat.observe(
            obs, F.collect_set(F.col(ROUTE_COL)).alias("routes")
        )

        t0 = time.monotonic()
        # one task per (bucket, route) leaf the batch actually touches
        src_flat.repartition(
            max(len(batch_pairs), 1), F.col(BUCKET_COL), F.col(ROUTE_COL)
        ).write.partitionBy(BUCKET_COL, ROUTE_COL).mode("overwrite").parquet(out_dir)
        stats["write_sec"] = round(time.monotonic() - t0, 3)

        delta_entry = {
            "path": data_rel, "format": "flat",
            "routes": sorted(
                self._obs_get(obs, out_dir, routes=[])["routes"] or []
            ),
            "buckets": sorted(int(b) for b in touched),
            "bytes": self._tree_bytes(out_dir),
        }

        def build(m: dict) -> dict | None:
            if self._batch_applied(m, batch_id):
                return None  # a concurrent writer applied this batch
            self._check_writer_modulus(m)
            cols = list(m["extra_columns"])
            cols += [c for c in extra_cols if c not in cols]
            return {
                "id": m["id"] + 1,
                "parent": m["id"],
                "n_buckets": self.n_buckets,
                "minhash_bands": self.minhash_bands,
                "extra_columns": cols,
                "buckets": dict(m["buckets"]),
                "bucket_routes": dict(m.get("bucket_routes", {})),
                "minor_count": m.get("minor_count", 0),
                "deltas": m.get("deltas", []) + [delta_entry],
                **{k: v for k, v in self._with_batch(m, batch_id).items()
                   if k in ("batch_wm", "recent_batch_ids")},
            }

        # batch durable before compaction; a delta append rebases over ANY
        # concurrent commit (compaction folds consume only deltas already
        # in the manifest they read, never this not-yet-committed one)
        new_meta = self._commit_with_rebase(meta, build)
        if new_meta is None:
            shutil.rmtree(out_dir, ignore_errors=True)
            stats["status"] = "skipped_duplicate_batch"
            return self.current_meta()

        if (self.compact_every is not None
                and self._raw_delta_count(new_meta) >= self.compact_every):
            t0 = time.monotonic()
            new_meta = self._maybe_compact(new_meta)
            stats["compact_sec"] = round(time.monotonic() - t0, 3)
        return new_meta

    def merge_parsed(self, parsed: DataFrame, batch_id) -> dict:
        """ONE-JOB, ZERO-SHUFFLE merge-on-read ingest of a full parsed
        micro-batch (the streaming hot path): the parsed rows — ALL
        statuses — stream from the source tasks directly into
        status-partitioned delta files, with extras still a map column.
        Everything the commit needs (record counts per status, observed
        open-world keys) is collected DURING that same write via the
        Observation API, so a micro-batch costs exactly one Spark job
        with no exchange at all. (The previous design shuffled the batch
        onto the bucket before writing — but nothing ever consumes deltas
        per bucket: read and compaction scan them whole, and only the
        compacted BASE needs bucket separation for COW rewrites. Dropping
        that shuffle measured 2.2x on a 2M-event batch; the earlier
        summary-collect job, which re-paid the entire JSON parse, was
        another 2x. File count per delta = O(source tasks x statuses),
        bounded by compact_every.)

        Dead letters become a persisted dead-letter queue for free: the
        status=tombstone/malformed/unknown_op/bad_payload/missing_key
        partitions hold the poison records (with topic/partition/offset
        lineage) until compaction retires the delta — retention-bounded,
        like a DLQ topic. Flattening extras into real columns, bucket
        assignment, and LWW tombstone-nulling move to read/compaction
        time, where the manifest already knows every observed column.

        Requires mode='mor'. Idempotent per batch_id like merge()."""
        from pyspark.sql import Observation

        if self.mode != "mor":
            raise ValueError("merge_parsed requires mode='mor'")
        t_enter = time.monotonic()
        meta = self.current_meta() or self._empty_meta()
        if self._batch_applied(meta, batch_id):
            return {"status": "skipped_duplicate_batch", "batch_id": batch_id}

        obs = Observation(f"merge_parsed_{batch_id}")
        src = parsed.observe(obs, *_merge_obs_aggs(self.n_buckets))

        data_rel = self._new_data_rel("d", meta)
        out_dir = os.path.join(self.table_dir, data_rel)
        t0 = time.monotonic()
        # status-ONLY partitioning: the dead-letter statuses stay cheap to
        # scan, route stays a DATA column. Route dirs here (round 3's
        # status/route layout) multiplied the leaf-dir/file fan-out per
        # delta by the routes touched and cost the flagship ingest ~16%;
        # tenant pruning does not need them — the manifest's per-delta
        # route list (from the Observation above) skips whole deltas, and
        # only the long-lived BASE keeps route partition dirs for
        # PartitionFilters. Delta backlogs are small by construction
        # (compact_every bounds them), so a tenant read scanning a pruned
        # delta's ok-files is O(backlog), not O(table).
        # per-batch overhead breakdown (driver-side serial costs around the
        # one write job) — lag diagnostics; all fields are milliseconds
        timings = {"setup_ms": round((time.monotonic() - t_enter) * 1000, 1)}
        src.write.partitionBy("status").mode("overwrite").parquet(out_dir)
        t_after_write = time.monotonic()
        got = self._obs_get(
            obs, out_dir,
            n_records=0, extras_keysets=[], ok_routes=[], ok_buckets=[],
            **{f"n_{s}": 0 for s in DLQ_STATUSES},
        )
        timings["obs_ms"] = round((time.monotonic() - t_after_write) * 1000, 1)
        stats = {
            "status": "committed",
            "batch_id": batch_id,
            "write_sec": round(t_after_write - t0, 3),
            "timings": timings,
            "n_records": got["n_records"],
            **{k: got[k] for k in got if k.startswith("n_") and k != "n_records"},
        }

        if got["n_records"] == 0:
            shutil.rmtree(out_dir, ignore_errors=True)
            new_meta = self._commit_with_rebase(
                meta, lambda m: None if self._batch_applied(m, batch_id)
                else dict(self._with_batch(m, batch_id),
                          id=m["id"] + 1, parent=m["id"]))
            if new_meta is None:
                stats["status"] = "skipped_duplicate_batch"
                return stats
            stats["status"] = "empty_batch"
            stats["snapshot"] = new_meta["id"]
            return stats

        observed_keys = sorted(
            {k for ks in got["extras_keysets"] for k in ks} - RESERVED_COLS
        )
        extra_cols = list(meta["extra_columns"])
        new_cols = [k for k in observed_keys if k not in extra_cols]
        extra_cols += new_cols
        stats["new_columns"] = new_cols

        t_meta = time.monotonic()
        delta_entry = {
            "path": data_rel, "format": "parsed",
            "routes": sorted(got["ok_routes"] or []),
            # touched key-hash buckets recorded at commit so a MAJOR
            # fold reads only these base buckets (subset major)
            "buckets": sorted(int(b) for b in got["ok_buckets"] or []),
            # ok-partition bytes recorded at commit (one filesystem
            # summary call over the just-written files) so read()'s
            # broadcast-vs-aggregate switch never re-walks the tree
            # and never counts dead-letter bytes
            "bytes": self._tree_bytes(os.path.join(out_dir, "status=ok")),
        }

        def build(m: dict) -> dict | None:
            if self._batch_applied(m, batch_id):
                return None  # a concurrent writer applied this batch
            self._check_writer_modulus(m)
            cols = list(m["extra_columns"])
            cols += [c for c in extra_cols if c not in cols]
            return {
                "id": m["id"] + 1,
                "parent": m["id"],
                "n_buckets": self.n_buckets,
                "minhash_bands": self.minhash_bands,
                "extra_columns": cols,
                "buckets": dict(m["buckets"]),
                "bucket_routes": dict(m.get("bucket_routes", {})),
                "minor_count": m.get("minor_count", 0),
                "deltas": m.get("deltas", []) + [delta_entry],
                **{k: v for k, v in self._with_batch(m, batch_id).items()
                   if k in ("batch_wm", "recent_batch_ids")},
            }

        # batch durable before compaction; a delta append rebases over ANY
        # concurrent commit — a decoupled compaction's fold can only have
        # consumed deltas that were in the manifest it read, never this one
        new_meta = self._commit_with_rebase(meta, build)
        if new_meta is None:
            shutil.rmtree(out_dir, ignore_errors=True)
            stats["status"] = "skipped_duplicate_batch"
            return stats
        timings["commit_ms"] = round((time.monotonic() - t_meta) * 1000, 1)
        stats["delta_dir"] = out_dir

        if (self.compact_every is not None
                and self._raw_delta_count(new_meta) >= self.compact_every):
            t0 = time.monotonic()
            new_meta = self._maybe_compact(new_meta)
            stats["compact_sec"] = round(time.monotonic() - t0, 3)
        stats["snapshot"] = new_meta["id"]
        return stats

    def _flatten_parsed_delta(
        self, dp: str, extra_cols: list[str], route: str | None = None
    ) -> DataFrame:
        """Parsed-format delta -> flat row shape (the base schema): keep
        ok rows, turn effective_op into the tombstone flag, flatten extras
        via the manifest's column list (complete — every delta recorded
        its observed keys at commit), and null the payload of deleted rows
        exactly like the flat write path. A route predicate here is a DATA
        filter over an already manifest-pruned, compact_every-bounded
        backlog (the status partition dirs still prune dead letters);
        only the BASE carries route partition dirs."""
        df = self.spark.read.parquet(dp).filter(F.col("status") == "ok")
        if route is not None:
            df = df.filter(F.col(ROUTE_COL) == route)
        df = self._route_as_string(df)
        deleted = F.col("effective_op") == "d"

        def payload(c, name: str):
            col = F.col(c) if isinstance(c, str) else c
            return F.when(deleted, F.lit(None).cast("string")).otherwise(col).alias(name)

        out = df.select(
            *KEY_COLS,
            *[payload(c, c) for c in DOMAIN_COLS if c not in KEY_COLS],
            F.col(ROUTE_COL),
            *[payload(F.element_at(F.col("extras"), k), k) for k in extra_cols],
            F.col(LSN_COL),
            F.col(TX_COL),
            F.col(TS_COL),
            F.col(OFFSET_COL),
            deleted.alias(DELETED_COL),
        )
        # minhash_bands: flattened versions stay UNSIGNED (null sig
        # columns via _normalize_rows) — the post-LWW fill_band_columns
        # signs only the versions that WIN a fold/read, so a raw backlog's
        # losing versions never pay the shingle cost
        return out

    @staticmethod
    def _raw_delta_count(meta: dict) -> int:
        """Deltas appended since the last compaction of any kind — the
        product of a MINOR fold (merged=True) does not re-trigger
        compaction by itself."""
        return sum(
            1 for d in meta.get("deltas", [])
            if not (isinstance(d, dict) and d.get("merged"))
        )

    def _maybe_compact(self, meta: dict) -> dict:
        """Tiered compaction policy: MAJOR (fold into the base) when no
        base exists yet or when `major_every` compactions have passed
        since the last major; MINOR (merge the deltas among themselves)
        otherwise."""
        is_major = (
            not meta.get("buckets")
            or meta.get("minor_count", 0) >= self.major_every - 1
        )
        if is_major:
            return self._compact(meta, full=self.full_major)
        return self._compact_minor(meta)

    def _compact_minor(self, meta: dict) -> dict:
        """MINOR compaction: fold every outstanding delta into ONE flat
        (bucket, route)-partitioned delta — resolve_lww over the delta
        rows alone, O(recent data), the base is never read. Tombstones
        are always RETAINED here: a delta tombstone may still have to
        delete a base row, so only the MAJOR fold (which applies it to
        the base) may expire it past the horizon. LWW associativity makes
        the pre-merge exact: max over (base ∪ merged-deltas) equals max
        over (base ∪ raw deltas)."""
        from pyspark.sql import Observation

        extra_cols = list(meta["extra_columns"])
        _, delta = self._read_split(meta, extra_cols)
        # single-exchange fold: the repartition(bucket) inside
        # resolve_lww_clustered already clusters the write's (bucket,
        # route) leaves — one task per bucket writes its few route dirs
        # exchange sized by the backlog's TOUCHED buckets (manifest
        # union), not the table's modulus: at 10^5 buckets a small
        # backlog would otherwise plan ~10^5 shuffle partitions and
        # write tasks, ~all empty — the partition COUNT is independent
        # of the bucket VALUES, so any count is winner-exact
        touched_minor = self._delta_touched_buckets(meta)
        n_parts = (
            max(len(touched_minor), 1) if touched_minor is not None
            else self.n_buckets
        )
        merged = resolve_lww_clustered(
            delta.withColumn(BUCKET_COL, bucket_expr(self.n_buckets)),
            n_parts,
        )
        if self.minhash_bands:
            # sign this fold's winners once; a previous minor fold's
            # winners arrive already signed and are skipped per row
            merged = fill_band_columns(merged)

        # Row count + route list + bucket list ride the fold's own write
        # job (Observation, same pattern as merge_parsed) — no post-write
        # directory walk; the bucket list keeps the merged delta eligible
        # for a later SUBSET major fold.
        obs = Observation(f"compact_minor_{meta['id'] + 1}")
        merged = merged.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.collect_set(F.col(ROUTE_COL)).alias("routes"),
            F.collect_set(F.col(BUCKET_COL)).alias("buckets"),
        )

        data_rel = self._new_data_rel("m", meta)
        out_dir = os.path.join(self.table_dir, data_rel)
        merged.write.partitionBy(BUCKET_COL, ROUTE_COL).mode("overwrite").parquet(out_dir)
        got = self._obs_get(obs, out_dir, n_rows=0, routes=[], buckets=[])

        # A backlog whose rows are ALL dead letters folds to ZERO ok rows:
        # the write leaves only _SUCCESS (no partition dirs), and
        # registering that directory as a flat delta would break every
        # subsequent read (spark.read.parquet on a file-less dir cannot
        # infer a schema). LWW associativity makes dropping the fold exact:
        # max over (base ∪ ∅) == max over base, and dead-letter rows never
        # participate in the merge anyway (any minor fold discards them).
        wrote_rows = got["n_rows"] > 0
        folded = (
            [{"path": data_rel, "format": "flat", "merged": True,
              "routes": sorted(got["routes"] or []),
              "buckets": sorted(int(b) for b in got["buckets"] or []),
              "bytes": self._tree_bytes(out_dir)}]
            if wrote_rows
            else []
        )
        if not wrote_rows:
            shutil.rmtree(out_dir, ignore_errors=True)

        # Optimistic commit: the fold consumed exactly meta's delta set.
        # Rebase over concurrent INGEST commits by keeping their newer
        # deltas outstanding (LWW is order-insensitive, so list position
        # doesn't matter); abort if a concurrent COMPACTION already
        # consumed any input (our fold is then stale duplicate work —
        # dropping it is exact because the table never referenced it).
        consumed = {d["path"] if isinstance(d, dict) else d
                    for d in meta.get("deltas", [])}

        def build(m: dict) -> dict | None:
            if (m.get("n_buckets") or self.n_buckets) != self.n_buckets:
                return None  # rebucketed underneath: this fold's output
                # (bucket lists, dirs) is hashed with the OLD modulus —
                # abort; the rebucket already folded the whole backlog
            m_paths = {d["path"] if isinstance(d, dict) else d
                       for d in m.get("deltas", [])}
            if not consumed <= m_paths:
                return None
            out = {
                **{k: v for k, v in m.items()},
                "id": m["id"] + 1,
                "parent": m["id"],
                "deltas": folded + [
                    d for d in m.get("deltas", [])
                    if (d["path"] if isinstance(d, dict) else d)
                    not in consumed
                ],
                "minor_count": m.get("minor_count", 0) + 1,
            }
            # a fold is NOT a rollback: carrying the parent's rollback
            # markers forward (the blanket spread above) would make
            # read_changes spuriously reject ranges STARTING AT the
            # rollback commit — the exact recovery path rollback_to
            # documents as working
            out.pop("rollback", None)
            out.pop("rolled_back_to", None)
            return out

        new_meta = self._commit_with_rebase(meta, build)
        if new_meta is None:
            shutil.rmtree(out_dir, ignore_errors=True)
            return self.current_meta()
        self.expire_snapshots(keep_last=self.snapshot_retention)
        return new_meta

    @staticmethod
    def _delta_touched_buckets(
        meta: dict, route: str | None = None
    ) -> list[int] | None:
        """Union of the manifest's per-delta touched-bucket lists — the
        base buckets a MAJOR fold must read. None when any delta entry
        predates bucket tracking (legacy manifest): the safe fallback is
        a full-table major, exactly the pre-subset behavior.

        route=X keeps only deltas whose manifest route list contains X
        (the same pruning _read_split applies to the delta scan), so a
        tenant-scoped subset read joins only the buckets touched by the
        TENANT'S own backlog — a bucket churned exclusively by other
        tenants streams through the tenant's read join-free. Route-pruned
        deltas are skipped BEFORE the legacy check: a delta whose rows
        never enter the merge cannot need a fallback on their account."""
        out: set[int] = set()
        for d in meta.get("deltas", []):
            if not ParquetLake._delta_matches_route(d, route):
                continue
            if not isinstance(d, dict) or "buckets" not in d:
                return None
            out.update(int(b) for b in d["buckets"])
        return sorted(out)

    def _compact(self, meta: dict, full: bool = False) -> dict:
        """MAJOR compaction: fold the outstanding deltas into the base and
        drop the delta list. SUBSET major (the default): only the base
        buckets the deltas actually touch — recorded per delta at commit
        time, no re-scan — are read and rewritten; untouched buckets are
        carried forward by manifest reference, exactly as _merge_cow
        already carries untouched buckets. LWW associativity makes the
        subset fold exact: an untouched bucket has NO delta versions, so
        max over (that bucket ∪ ∅) is the bucket unchanged. This makes
        the recurring major cost O(touched base + backlog), not O(table)
        — at 100 TB the difference between a runnable compaction cadence
        and a full-table rewrite every compact_every*major_every batches.

        Tombstones are RETAINED in the base by default (they guard
        late-replayed older upserts); with `tombstone_horizon_lsn` set,
        tombstones older than the source's replay horizon are expired
        here. Under subset majors expiry is ON-TOUCH: only rewritten
        buckets shed their expired tombstones — safe, because retention
        is purely an optimization (an expired tombstone is never WRONG to
        keep, it just occupies space until its bucket is next touched).

        full=True (and any legacy manifest whose deltas predate bucket
        tracking) folds every bucket — the pre-subset behavior, kept for
        equivalence testing and as the migration fallback."""
        from pyspark.sql import Observation

        extra_cols = list(meta["extra_columns"])
        touched = None if full else self._delta_touched_buckets(meta)
        base, delta = self._read_split(meta, extra_cols, buckets=touched)
        if base is None and delta is None:
            fold_in = self.spark.createDataFrame(
                [], self._row_schema(extra_cols)
            ).drop(BUCKET_COL)
        elif base is None:
            fold_in = delta
        elif delta is None:
            fold_in = base
        else:
            fold_in = base.unionByName(delta, allowMissingColumns=True)
        # single-exchange fold (see resolve_lww_clustered): aggregation,
        # horizon filter, Observation, and the partitioned write below all
        # run in one post-shuffle stage; a subset fold sizes the exchange
        # by the touched-bucket count, not the table's
        n_parts = self.n_buckets if touched is None else max(len(touched), 1)
        merged = resolve_lww_clustered(
            fold_in.withColumn(BUCKET_COL, bucket_expr(self.n_buckets)),
            n_parts,
        )
        if self.tombstone_horizon_lsn is not None:
            merged = merged.filter(
                ~(
                    F.coalesce(F.col(DELETED_COL), F.lit(False))
                    & (F.col(LSN_COL) < F.lit(self.tombstone_horizon_lsn))
                )
            )
        if self.minhash_bands:
            # post-LWW signing: base winners keep their stored signature,
            # raw-delta winners are signed here, once — O(winners), in
            # the same post-shuffle stage as the write
            merged = fill_band_columns(merged)

        # The written bucket set and per-bucket route lists ride the
        # rewrite's own job (Observation): the distinct (bucket, route)
        # pair set is O(n_buckets x routes) — tiny — where a directory
        # walk over the new base would be O(table files) on the driver.
        obs = Observation(f"compact_major_{meta['id'] + 1}")
        merged = merged.observe(
            obs,
            F.collect_set(
                F.struct(
                    F.col(BUCKET_COL).cast("string").alias("b"),
                    F.col(ROUTE_COL).alias("r"),
                )
            ).alias("pairs"),
        )

        data_rel = self._new_data_rel("s", meta)
        out_dir = os.path.join(self.table_dir, data_rel)
        merged.write.partitionBy(BUCKET_COL, ROUTE_COL).mode("overwrite").parquet(out_dir)
        pairs = self._obs_get(obs, out_dir, pairs=[])["pairs"] or []
        if not pairs:
            # zero rows written (e.g. every touched row was an expired
            # tombstone): drop the file-less dir rather than referencing it
            shutil.rmtree(out_dir, ignore_errors=True)

        routes_by_bucket: dict[str, set] = {}
        for p in pairs:
            if p["r"] is not None:
                routes_by_bucket.setdefault(p["b"], set()).add(p["r"])
        written = {int(p["b"]) for p in pairs}

        # Optimistic commit (the Iceberg RewriteFiles model): the fold is
        # a pure function of (the base buckets it read, the delta set it
        # consumed). Rebase over concurrent INGEST commits — their new
        # deltas stay outstanding, strictly newer than anything folded,
        # so LWW over (folded base ∪ new deltas) is exact. Abort when a
        # concurrent compaction consumed any input delta or repointed any
        # base bucket the fold read: the output is then built on stale
        # inputs and is simply dropped (never referenced, so exact).
        consumed = {d["path"] if isinstance(d, dict) else d
                    for d in meta.get("deltas", [])}
        read_buckets = (list(meta["buckets"]) if touched is None
                        else [str(b) for b in touched])

        def build(m: dict) -> dict | None:
            if (m.get("n_buckets") or self.n_buckets) != self.n_buckets:
                return None  # rebucketed underneath: the fold's buckets
                # are hashed with the OLD modulus — abort (exact: the
                # rebucket consumed every delta this fold read)
            m_paths = {d["path"] if isinstance(d, dict) else d
                       for d in m.get("deltas", [])}
            if not consumed <= m_paths:
                return None
            if any(m["buckets"].get(b) != meta["buckets"].get(b)
                   for b in read_buckets):
                return None
            if touched is None and set(m["buckets"]) != set(meta["buckets"]):
                return None  # full fold must have read the whole base
            if touched is None:
                # full fold: the new base is exactly what the fold wrote
                new_buckets = {
                    str(b): os.path.join(data_rel, f"{BUCKET_COL}={b}")
                    for b in sorted(written)
                }
                bucket_routes = {
                    b: sorted(routes_by_bucket.get(b, set()))
                    for b in new_buckets
                }
            else:
                # subset fold: untouched buckets carry forward by
                # reference; touched buckets repoint to the fresh fold
                # output (or drop out entirely when the fold left them
                # empty)
                new_buckets = dict(m["buckets"])
                bucket_routes = dict(m.get("bucket_routes", {}))
                for b in sorted(set(touched) | written):
                    if b in written:
                        new_buckets[str(b)] = os.path.join(
                            data_rel, f"{BUCKET_COL}={b}"
                        )
                        bucket_routes[str(b)] = sorted(
                            routes_by_bucket.get(str(b), set())
                        )
                    else:
                        new_buckets.pop(str(b), None)
                        bucket_routes.pop(str(b), None)
            return {
                "id": m["id"] + 1,
                "parent": m["id"],
                "n_buckets": self.n_buckets,
                "minhash_bands": self.minhash_bands,
                "extra_columns": list(m["extra_columns"]),
                "buckets": new_buckets,
                "bucket_routes": bucket_routes,
                "deltas": [
                    d for d in m.get("deltas", [])
                    if (d["path"] if isinstance(d, dict) else d)
                    not in consumed
                ],
                **{k: v for k, v in m.items()
                   if k in ("batch_wm", "recent_batch_ids", "batch_ids")},
            }

        new_meta = self._commit_with_rebase(meta, build)
        if new_meta is None:
            shutil.rmtree(out_dir, ignore_errors=True)
            return self.current_meta()
        # compaction doubles commit frequency vs plain appends, so it also
        # pays for the cleanup: expire old snapshots + orphaned data dirs
        self.expire_snapshots(keep_last=self.snapshot_retention)
        return new_meta

    def read_dead_letters(self, status: str | None = None) -> DataFrame:
        """The OUTSTANDING dead-letter queue: every poison record
        (tombstone / malformed / unknown_op / bad_payload / missing_key /
        missing_route) still held by the raw delta backlog, with its
        topic/partition/offset lineage — the operator's "what failed and
        why" read the persisted status partitions exist for (the
        reference logs-and-drops, sync.go:54-67; here the records
        themselves are queryable). status='malformed' narrows to one
        taxonomy value.

        Cost at scale: the status partition dirs put the filter in
        PartitionFilters, so the big status=ok partitions are never
        listed or opened; cost is O(dead-letter bytes in the backlog).

        Retention contract (same as a DLQ topic's): compaction CONSUMES
        the deltas that hold these rows — the merged/folded outputs carry
        only ok rows — so the queue covers the current backlog window
        (bounded by compact_every). Archive before folding if longer
        retention is needed."""
        meta = self.current_meta() or {}
        parts = []
        for d in meta.get("deltas", []):
            entry = d if isinstance(d, dict) else {"path": d, "format": "flat"}
            if entry.get("format") != "parsed":
                continue  # folded deltas hold only ok rows
            dp = os.path.join(self.table_dir, entry["path"])
            df = (
                self.spark.read.option("mergeSchema", "true")
                .option("basePath", dp).parquet(dp)
                .filter(F.col("status") != "ok")
            )
            parts.append(df)
        if not parts:
            return self.spark.createDataFrame(
                [], "status string, topic string, partition int, offset long"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        if status is not None:
            out = out.filter(F.col("status") == status)
        return out

    def rollback_to(self, snapshot_id: int) -> dict | None:
        """Roll the table back to a retained snapshot (the Iceberg
        rollback_to_snapshot analog — bad-batch recovery): commits a NEW
        snapshot whose table content equals the target's manifest, so
        history only moves FORWARD — data dirs are immutable and carried
        by reference (O(ms) metadata, no data rewrite), the bad commits
        stay inspectable via time travel until retention expires them,
        and the batch bookkeeping (watermark + recent ids) reverts with
        the manifest, so re-ingesting corrected versions of the
        rolled-back batches applies normally instead of being dropped as
        duplicates.

        Refuses to race: if ANY other commit lands between reading the
        current snapshot and the rollback commit, returns None and leaves
        the table untouched — silently rebasing a rollback over a
        concurrent ingest commit would drop that commit's data, which is
        never what the operator meant. Retry in a quiet window.

        The committed manifest carries `rollback: true`: an incremental
        change read whose range CROSSES a rollback raises (rolled-back
        row versions would otherwise classify as live changes — the same
        append-only restriction Iceberg's incremental read has);
        consumers recover with a resync. Ranges starting AT or after the
        rollback commit are append-only again and work normally."""
        target = self.snapshot_meta(snapshot_id)  # raises if expired
        cur = self.current_meta()
        if cur is None:
            raise ValueError("empty lake: nothing to roll back")
        if cur["id"] == snapshot_id:
            return cur  # already there

        def build(m: dict) -> dict | None:
            if m["id"] != cur["id"]:
                return None  # concurrent commit: refuse (see docstring)
            new = dict(target)
            new["id"] = m["id"] + 1
            new["parent"] = m["id"]
            new["rollback"] = True
            new["rolled_back_to"] = int(snapshot_id)
            return new

        return self._commit_with_rebase(cur, build)

    def expire_snapshots(self, keep_last: int = SNAPSHOT_RETENTION) -> dict:
        """Retention maintenance (Iceberg expire_snapshots + delete-orphans
        analog): keep the newest `keep_last` snapshot manifests, delete the
        older snap-*.json files, and remove data/* dirs referenced by NO
        kept snapshot. Bounds disk growth of the long-running tail job.
        Concurrent-writer deployments set orphan_grace_sec above their
        longest write job so another writer's fully-written but
        not-yet-committed dir is never swept (see the age check below);
        a carried-forward dir is always safe because the parent snapshot
        that references it is always in the kept set. Readers holding an
        expired snapshot are the remaining single-process assumption (a
        shared catalog would add a reader lease).

        PINNED refs (pin_snapshot — the Iceberg tag/branch-ref retention
        analog) extend the kept set: every snapshot >= the OLDEST pinned
        id survives, not just the pinned ids themselves, because an
        incremental consumer checkpointed at a pin needs the whole
        manifest CHAIN from there to current (read_changes walks it). A
        live downstream consumer that re-pins its checkpoint after every
        sync can therefore never be outrun by retention; an abandoned
        pin holds history until unpin_snapshot removes it."""
        # The keep-set computation, the pin read, and the snap-file
        # deletion run under the COMMIT LOCK: pin_snapshot verifies the
        # snap file exists and writes refs under the same lock, so a pin
        # that reports success can never be outrun by a concurrent expire
        # reading refs a moment earlier (the race would force the pinned
        # consumer into a full resync — the exact outcome pins exist to
        # prevent). Metadata-only, O(ms); the data-dir sweep below runs
        # OUTSIDE the lock (rmtree of large trees must not stall writers).
        with self._commit_lock():
            meta = self.current_meta()
            if meta is None:
                return {"removed_snapshots": 0, "removed_dirs": 0}
            snaps = sorted(
                (
                    int(f[len("snap-"):-len(".json")])
                    for f in os.listdir(self._meta_dir)
                    if f.startswith("snap-") and f.endswith(".json")
                ),
            )
            keep = {s for s in snaps if s > meta["id"] - keep_last}
            keep |= {meta["id"]}
            pins = self.refs()
            if pins:
                floor = min(pins.values())
                keep |= {s for s in snaps if s >= floor}

            removed_snaps = 0
            for s in snaps:
                if s not in keep:
                    try:
                        os.remove(
                            os.path.join(self._meta_dir, f"snap-{s}.json")
                        )
                        removed_snaps += 1
                    except OSError:
                        pass

        # Referenced set for the dir sweep: read from the snap files that
        # exist NOW (post-deletion, post-lock) — this also picks up any
        # snapshot committed while we held or released the lock, so a
        # freshly committed dir is never treated as orphaned even with
        # orphan_grace_sec=0.
        referenced: set[str] = set()
        for f_name in os.listdir(self._meta_dir):
            if not (f_name.startswith("snap-") and f_name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self._meta_dir, f_name)) as f:
                    m = json.load(f)
            except OSError:
                continue
            for p in m.get("buckets", {}).values():
                referenced.add(p.split(os.sep + BUCKET_COL + "=", 1)[0])
            for d in m.get("deltas", []):
                referenced.add(d["path"] if isinstance(d, dict) else d)

        removed_dirs = 0
        data_root = os.path.join(self.table_dir, "data")
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                rel = os.path.join("data", d)
                if rel in referenced:
                    continue
                # Concurrent-writer safety (Iceberg remove_orphan_files
                # `older_than` analog): an unreferenced dir younger than
                # the grace period may be another writer's fully-written
                # but not-yet-committed output — deleting it would lose
                # its commit. The single-writer default (grace 0) keeps
                # eager cleanup.
                if self.orphan_grace_sec > 0:
                    try:
                        age = time.time() - os.stat(
                            os.path.join(data_root, d)).st_mtime
                    except OSError:
                        continue  # vanished: another expire got it
                    if age < self.orphan_grace_sec:
                        continue
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                removed_dirs += 1
        return {"removed_snapshots": removed_snaps, "removed_dirs": removed_dirs}

    def compact_now(self, tier: str = "auto", full: bool = False) -> dict:
        """Decoupled-maintenance compaction entry point: fold the current
        outstanding backlog from a SEPARATE process while the ingest job
        keeps appending (construct the lake with compact_every=None there,
        and give both writers an orphan_grace_sec above the longest write
        job). Commit conflicts with concurrent ingest commits rebase
        automatically — their deltas stay outstanding for the next run —
        and a conflict with another compaction aborts this fold cleanly
        (the loser's output dir is dropped, the table is untouched).

        tier='auto' follows the tiered policy (minor folds, every
        major_every-th one major), 'minor'/'major' force a tier; full=True
        forces a full-table (non-subset) major. Returns the resulting
        current manifest (unchanged when there was nothing to fold or the
        fold aborted)."""
        meta = self.current_meta()
        if meta is None or not meta.get("deltas"):
            return meta if meta is not None else self._empty_meta()
        if tier == "minor":
            return self._compact_minor(meta)
        if tier == "major" or full:
            return self._compact(meta, full=full or self.full_major)
        return self._maybe_compact(meta)

    def rebucket(self, new_n_buckets: int) -> dict | None:
        """Bucket-count evolution (the Iceberg partition-spec-evolution +
        rewrite_data_files analog): rewrite the WHOLE table — base plus
        outstanding deltas, LWW-resolved — into a fresh base hashed with
        the NEW bucket modulus, flipping the manifest's n_buckets in the
        same atomic commit. A creation-time bucket count is the one
        layout decision that goes stale as a lake grows 1000x: at 10^10
        events, 64 buckets means ~1.5 TB per bucket — every COW rewrite,
        subset fold, and point lookup degrades with it. rebucket() is the
        planned full-table maintenance op (run rarely, from the
        decoupled maintenance process) that resets that decision without
        recreating the table.

        Concurrency: the rewrite's output is hashed under a modulus NO
        concurrent writer knows yet, so unlike a compaction it cannot
        rebase — it ABORTS on ANY concurrent commit (returns None, the
        never-referenced output dir is dropped; retry when the table is
        quiescent). The reverse race is guarded at every writer's commit:
        an ingest commit raises (fail the micro-batch BEFORE its
        checkpoint commits — _check_writer_modulus) and a concurrent
        fold aborts, so a stale writer can never corrupt the new layout.
        Readers are safe by construction — read() follows manifest paths,
        and lookup()/lookup_many() take the modulus from the manifest
        they read (including time travel ACROSS a rebucket boundary).

        Tombstone-horizon expiry applies everywhere (it is a full
        rewrite — every bucket is 'touched'). Returns the committed
        manifest, or None if a concurrent commit aborted the rebucket."""
        from pyspark.sql import Observation

        if new_n_buckets < 1:
            raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
        meta = self.current_meta()
        if meta is None:
            meta = self._empty_meta()
        if (meta.get("n_buckets") or self.n_buckets) == new_n_buckets:
            self.n_buckets = new_n_buckets
            return meta  # already at the requested count: no-op

        extra_cols = list(meta["extra_columns"])
        base, delta = self._read_split(meta, extra_cols)
        if base is None and delta is None:
            fold_in = self.spark.createDataFrame(
                [], self._row_schema(extra_cols)
            ).drop(BUCKET_COL)
        elif base is None:
            fold_in = delta
        elif delta is None:
            fold_in = base
        else:
            fold_in = base.unionByName(delta, allowMissingColumns=True)
        # same single-exchange fold as a full major, but clustered on the
        # NEW modulus: one shuffle re-homes every row to its new bucket
        merged = resolve_lww_clustered(
            fold_in.withColumn(BUCKET_COL, bucket_expr(new_n_buckets)),
            new_n_buckets,
        )
        if self.tombstone_horizon_lsn is not None:
            merged = merged.filter(
                ~(
                    F.coalesce(F.col(DELETED_COL), F.lit(False))
                    & (F.col(LSN_COL) < F.lit(self.tombstone_horizon_lsn))
                )
            )
        if self.minhash_bands:
            merged = fill_band_columns(merged)

        obs = Observation(f"rebucket_{meta['id'] + 1}")
        merged = merged.observe(
            obs,
            F.collect_set(
                F.struct(
                    F.col(BUCKET_COL).cast("string").alias("b"),
                    F.col(ROUTE_COL).alias("r"),
                )
            ).alias("pairs"),
        )
        data_rel = self._new_data_rel("s", meta)
        out_dir = os.path.join(self.table_dir, data_rel)
        merged.write.partitionBy(BUCKET_COL, ROUTE_COL).mode("overwrite").parquet(out_dir)
        pairs = self._obs_get(obs, out_dir, pairs=[])["pairs"] or []
        if not pairs:
            shutil.rmtree(out_dir, ignore_errors=True)

        routes_by_bucket: dict[str, set] = {}
        for p in pairs:
            if p["r"] is not None:
                routes_by_bucket.setdefault(p["b"], set()).add(p["r"])
        written = {int(p["b"]) for p in pairs}

        def build(m: dict) -> dict | None:
            if m["id"] != meta["id"]:
                return None  # any concurrent commit invalidates the rewrite
            return {
                "id": m["id"] + 1,
                "parent": m["id"],
                "n_buckets": new_n_buckets,
                "minhash_bands": self.minhash_bands,
                "extra_columns": list(m["extra_columns"]),
                "buckets": {
                    str(b): os.path.join(data_rel, f"{BUCKET_COL}={b}")
                    for b in sorted(written)
                },
                "bucket_routes": {
                    str(b): sorted(routes_by_bucket.get(str(b), set()))
                    for b in sorted(written)
                },
                "deltas": [],
                **{k: v for k, v in m.items()
                   if k in ("batch_wm", "recent_batch_ids", "batch_ids")},
            }

        new_meta = self._commit_with_rebase(meta, build)
        if new_meta is None:
            shutil.rmtree(out_dir, ignore_errors=True)
            return None
        self.n_buckets = new_n_buckets
        self.expire_snapshots(keep_last=self.snapshot_retention)
        return new_meta

    def _normalize_rows(self, df: DataFrame, extra_cols: list[str]) -> DataFrame:
        """Full row schema: bucket dropped, every route/extra (and, when
        the table carries them, signature) column present."""
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        sig = SIG_COLS if self.minhash_bands else []
        for c in [ROUTE_COL, *extra_cols, *sig]:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        return df

    def _read_base(
        self, meta: dict, extra_cols: list[str], route: str | None = None,
        bucket_set: set[int] | None = None, exclude: bool = False,
    ):
        """Base rows as one normalized DataFrame, or None when no bucket
        survives pruning. Pruning happens at the PATH level — a pruned
        bucket's files are never listed or opened: route=X keeps only
        buckets whose manifest route list contains X (the Q11 tenant
        read), and bucket_set keeps only those key-hash buckets
        (exclude=False — the subset-major fold's input) or everything BUT
        them (exclude=True — the untouched side of the subset MoR read,
        which streams through with no join at all)."""
        bucket_routes = meta.get("bucket_routes", {})

        def bucket_has_route(b: str) -> bool:
            if route is None:
                return True
            routes = bucket_routes.get(b)
            return routes is None or route in routes  # None: pre-route manifest

        def bucket_selected(b: str) -> bool:
            if bucket_set is None:
                return True  # no filter: exclude-nothing == keep-everything
            return (int(b) in bucket_set) != exclude

        base_paths = [
            os.path.join(self.table_dir, p)
            for b, p in meta["buckets"].items()
            if bucket_has_route(b) and bucket_selected(b)
        ]
        base = self._read_bucket_tree(base_paths)
        if base is not None:
            if route is not None:
                if ROUTE_COL not in base.columns:
                    # a pre-route base has no per-tenant layout: silently
                    # returning every tenant's rows would break the
                    # isolation contract, so refuse loudly
                    raise ValueError(
                        "route-scoped read on a base written without route "
                        "partitioning; run a compaction on the current "
                        "engine first"
                    )
                base = base.filter(F.col(ROUTE_COL) == route)
            base = self._normalize_rows(self._route_as_string(base), extra_cols)
        return base

    def _read_split(
        self, meta: dict, extra_cols: list[str], route: str | None = None,
        buckets: list[int] | None = None,
    ):
        """(base, delta) DataFrames, either possibly None, both normalized
        to the full row schema. Base rows are UNIQUE per key (every base
        writer — COW merge and compaction — is a resolve_lww output);
        deltas hold multi-version rows. Base bucket paths are bucket dirs
        (route-partitioned roots) while delta paths are their own
        partitioned ROOTS, so they are read separately (mixing both in one
        load trips partition discovery).

        route=X is the tenant-pruned path (Q11): buckets and deltas whose
        manifest route list excludes X are skipped entirely (manifest
        pruning), and the route predicate on the rest lands in the scan's
        PartitionFilters (directory pruning) — other tenants' files are
        never opened.

        buckets=[...] restricts the BASE side to those key-hash buckets
        (the subset-major fold's read: only buckets the deltas touch);
        the delta side is never bucket-filtered here — a subset fold
        consumes every outstanding delta whole."""
        bucket_set = None if buckets is None else {int(b) for b in buckets}

        def delta_has_route(d: dict) -> bool:
            return self._delta_matches_route(d, route)

        deltas = [
            d if isinstance(d, dict) else {"path": d, "format": "flat"}
            for d in meta.get("deltas", [])
        ]
        base = self._read_base(meta, extra_cols, route=route, bucket_set=bucket_set)

        # each delta is its own partitioned root — read separately (several
        # partitioned roots in one load trip partition discovery)
        delta_parts = []
        for d in deltas:
            if not delta_has_route(d):
                continue
            dp = os.path.join(self.table_dir, d["path"])
            if d["format"] == "parsed":
                delta_parts.append(
                    self._flatten_parsed_delta(dp, extra_cols, route=route)
                )
            else:
                flat = (
                    self.spark.read.option("mergeSchema", "true")
                    .parquet(dp)
                    .drop(BUCKET_COL)
                )
                if route is not None and ROUTE_COL in flat.columns:
                    flat = flat.filter(F.col(ROUTE_COL) == route)
                delta_parts.append(self._route_as_string(flat))
        delta = None
        if delta_parts:
            delta = delta_parts[0]
            for p in delta_parts[1:]:
                delta = delta.unionByName(p, allowMissingColumns=True)
            delta = self._normalize_rows(delta, extra_cols)
        return base, delta

    def _read_all(
        self, meta: dict, extra_cols: list[str], route: str | None = None
    ) -> DataFrame:
        """All row versions (base + deltas) as one DataFrame."""
        base, delta = self._read_split(meta, extra_cols, route=route)
        if base is None and delta is None:
            return self.spark.createDataFrame(
                [], self._row_schema(extra_cols)
            ).drop(BUCKET_COL)
        if base is None:
            return delta
        if delta is None:
            return base
        return base.unionByName(delta, allowMissingColumns=True)

    def _tree_bytes(self, path: str) -> int:
        """Total file bytes under a path via the Hadoop FileSystem's
        getContentSummary — ONE filesystem call whose recursion runs
        inside the storage layer (a NameNode op on HDFS, a LIST on object
        stores), replacing the driver-side os.walk that was the last
        Python directory traversal in any commit path. Bounded to the
        files the calling commit just wrote. Returns 0 for a missing path
        (the zero-row-write case)."""
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(
            self.spark._jsc.hadoopConfiguration()
        )
        if not fs.exists(jpath):
            return 0
        return int(fs.getContentSummary(jpath).getLength())

    def _delta_bytes(self, meta: dict, route: str | None = None) -> int:
        """Merge-relevant bytes of the outstanding deltas — only those a
        route-scoped read actually keeps (manifest route pruning), so a
        tenant read's broadcast-vs-aggregate switch is sized by the
        tenant's own backlog, not the whole table's. Commits record each
        delta's byte count in its manifest entry (ok-partition only for
        parsed deltas — dead letters never merge), so the steady-state
        read sums a handful of manifest integers; a walk happens only for
        legacy entries without the field."""
        total = 0
        for d in meta.get("deltas", []):
            if not self._delta_matches_route(d, route):
                continue
            if isinstance(d, dict) and "bytes" in d:
                total += d["bytes"]
                continue
            p = os.path.join(self.table_dir, d["path"] if isinstance(d, dict) else d)
            total += self._tree_bytes(p)
        return total

    @staticmethod
    def _delta_matches_route(d, route: str | None) -> bool:
        """Manifest-level delta pruning for route-scoped reads; an entry
        without a route list (pre-route manifest) matches every route."""
        if route is None:
            return True
        routes = d.get("routes") if isinstance(d, dict) else None
        return routes is None or route in routes

    def _read_mor_subset(
        self, meta: dict, extra_cols: list[str], route: str | None,
        touched: list[int], migration_exact: bool = False,
    ):
        """Steady-state MoR read with the base SPLIT by the manifest's
        touched-bucket lists: the bucket of a key is a pure function of the
        key (bucket_expr), every delta commit records the buckets its ok
        rows hash into, and every base writer lays rows out by the same
        expression — so a delta key can only collide with base rows inside
        a TOUCHED bucket. Untouched buckets therefore stream straight
        through with NO join at all (not even the broadcast hash probe),
        and only the touched buckets pay _merge_read_broadcast's two
        scan-side passes (anti + semi). At a steady state where deltas
        touch a small fraction f of the buckets, the base scan work drops
        from 2x the table to (1+f)x — the read-path twin of the subset
        MAJOR fold, driven by the same manifest bucket lists. Exactness is
        the same argument as the subset major: an untouched bucket has no
        delta versions, so LWW over (bucket ∪ ∅) is the bucket unchanged.

        migration_exact=True is the tenant read under
        route_stable_keys=False: the join branch reads the touched
        buckets across ALL routes so any route's newer version can evict
        the tenant's key, and its resolved winners are filtered on route
        AFTERWARDS; the pass-through branch stays tenant-pruned either
        way (an untouched bucket's base rows are global winners — their
        stored route IS their winning route).

        Returns (df, unsigned_possible) — the second element feeds read()'s
        signature fill (only delta-sourced winners can be unsigned)."""
        join_route = None if migration_exact else route
        base_t, delta = self._read_split(
            meta, extra_cols, route=join_route, buckets=touched
        )
        base_u = self._read_base(
            meta, extra_cols, route=route,
            bucket_set={int(b) for b in touched}, exclude=True,
        )
        if delta is None:
            # every delta was route-pruned away: this tenant's state is a
            # plain (pruned) base scan
            resolved = base_t
        elif base_t is None:
            resolved = resolve_lww(delta)
        else:
            resolved = self._merge_read_broadcast(base_t, delta)
        if migration_exact and resolved is not None and route is not None:
            resolved = resolved.filter(F.col(ROUTE_COL) == route)
        parts = [p for p in (resolved, base_u) if p is not None]
        if not parts:
            return (
                self.spark.createDataFrame(
                    [], self._row_schema(extra_cols)
                ).drop(BUCKET_COL),
                False,
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return df, delta is not None

    def _merge_read_broadcast(self, base: DataFrame, delta: DataFrame) -> DataFrame:
        """MoR read WITHOUT a table-wide shuffle, for the steady state
        where the outstanding deltas are small relative to the base: base
        rows not touched by any delta key stream straight through a
        BROADCAST anti-join (scan-only, no exchange on the base), and the
        LWW aggregate runs over just the overlapping base rows + delta
        rows. Exact because every base writer is a resolve_lww output
        (one row per key), so resolving a key needs only that key's base
        row and its delta rows. Costs a second broadcast-join scan of the
        base (the semi side) — two shuffle-free scans beat one full-table
        shuffle at any scale where the base dominates.

        INVARIANT: merge keys are non-null on BOTH sides — parse
        dead-letters missing-key records ('missing_key' status) before any
        merge, and every base/delta writer consumes only status='ok' rows.
        This matters because left_anti/left_semi never match NULL keys: a
        null-key base row would survive AND its delta version would win,
        duplicating the key, where the groupBy of the aggregate path (and
        of resolve_lww itself) treats nulls as one group. The guard below
        makes the strategies interchangeable even if a future writer
        violates the invariant: delta rows with any null key fold into the
        winners aggregate against nothing (exactly what the global
        aggregate would do with no null-key base rows to meet them)."""
        null_key = None
        for k in KEY_COLS:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        dk = delta.filter(~null_key).select(*KEY_COLS).distinct()
        survivors = base.join(F.broadcast(dk), KEY_COLS, "left_anti")
        overlap = base.join(F.broadcast(dk), KEY_COLS, "left_semi")
        winners = resolve_lww(overlap.unionByName(delta, allowMissingColumns=True))
        return survivors.unionByName(winners, allowMissingColumns=True)

    # ---------------- read path ----------------

    def read(
        self,
        include_deleted: bool = False,
        include_internal: bool = False,
        snapshot_id: int | None = None,
        route: str | None = None,
        keep_signatures: bool = False,
    ) -> DataFrame:
        """Final table state; snapshot_id time-travels to any snapshot the
        retention window still holds (Iceberg VERSION AS OF analog —
        snapshots are immutable and data files are only removed by
        expire_snapshots once no retained snapshot references them).

        route=X is the tenant-scoped read (Q11, the reference's per-tenant
        index). Under route_stable_keys=True (default): only that route's
        partition directories are listed and scanned — manifest-level
        bucket/delta pruning plus PartitionFilters on the route dirs, and
        LWW is resolved within the tenant's rows alone, exact because the
        table contract says no key ever changes route. Under
        route_stable_keys=False (mutable routing field): LWW is resolved
        across ALL routes of the delta-touched buckets and the WINNERS
        are filtered on route, so read(route=X) equals
        read().filter(route == X) under arbitrary migrations — untouched
        buckets still pass through tenant-pruned (their base rows are
        global winners, so their stored route is their winning route)."""
        meta = (
            self.snapshot_meta(snapshot_id)
            if snapshot_id is not None
            else self.current_meta()
        )
        extra_cols = list(meta["extra_columns"]) if meta else []
        unsigned_possible = False
        if not meta or (not meta["buckets"] and not meta.get("deltas")):
            df = self.spark.createDataFrame([], self._row_schema(extra_cols)).drop(BUCKET_COL)
        else:
            # merge-on-read: several versions of a key may coexist across
            # base + deltas until compaction. Strategy by delta size,
            # decided from the MANIFEST alone (delta bytes + touched-bucket
            # lists) before any scan is constructed: small backlog (the
            # steady state between compactions) => broadcast key-set join
            # against ONLY the delta-touched buckets, untouched buckets
            # stream through join-free (_read_mor_subset; legacy manifests
            # without bucket lists fall back to the whole-base broadcast
            # join); large backlog (or no base) => the global LWW
            # aggregate.
            # migration-exact tenant reads size and prune the delta side
            # WITHOUT the route (any route's newer version can evict this
            # tenant's key) and filter winners on route afterwards
            migration_exact = route is not None and not self.route_stable_keys
            prune_route = None if migration_exact else route
            touched = (
                self._delta_touched_buckets(meta, route=prune_route)
                if meta.get("deltas") and meta["buckets"]
                else None
            )
            if (
                touched is not None
                and self._delta_bytes(meta, route=prune_route)
                <= self.broadcast_delta_bytes
            ):
                df, unsigned_possible = self._read_mor_subset(
                    meta, extra_cols, route, touched,
                    migration_exact=migration_exact,
                )
            else:
                base, delta = self._read_split(
                    meta, extra_cols, route=prune_route
                )
                # only delta-sourced winners can be unsigned: every base
                # writer runs the post-LWW fill, so a base-only read
                # carries a complete signature column set by construction
                unsigned_possible = delta is not None
                if base is None and delta is None:
                    df = self.spark.createDataFrame(
                        [], self._row_schema(extra_cols)
                    ).drop(BUCKET_COL)
                elif delta is None:
                    df = base  # compacted table: plain pruned scan, no agg
                elif base is None:
                    df = resolve_lww(delta)
                elif (
                    self._delta_bytes(meta, route=prune_route)
                    <= self.broadcast_delta_bytes
                ):
                    df = self._merge_read_broadcast(base, delta)
                else:
                    df = resolve_lww(
                        base.unionByName(delta, allowMissingColumns=True)
                    )
                if migration_exact:
                    df = df.filter(F.col(ROUTE_COL) == route)
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        if self.minhash_bands and keep_signatures and unsigned_possible:
            # winners resolved from a still-raw delta backlog arrive
            # unsigned; sign exactly those rows (stored base signatures
            # pass through untouched). Skipped entirely when the caller
            # drops the columns anyway, and on compacted base-only reads
            # (nothing to sign — the fill's plan cost is not free).
            df = fill_band_columns(df)
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        if not include_internal:
            df = df.drop(*INTERNAL)
        if not keep_signatures:
            df = df.drop(*SIG_COLS)  # no-op on unsigned tables
        return df

    def key_bucket(self, repo: str, path: str) -> int:
        """The key-hash bucket of a primary key — the engine's own
        bucket_expr evaluated over literals by Catalyst's constant
        folding (a LocalRelation plan: no tasks, no scan)."""
        return self.key_buckets([(repo, path)])[(repo, path)]

    def key_buckets(
        self, keys: list[tuple[str, str]], n_buckets: int | None = None
    ) -> dict[tuple[str, str], int]:
        """key -> key-hash bucket for a batch of primary keys, computed
        in ONE LocalRelation job with the engine's own bucket function
        (bucket_expr over a local key list: no scan; the collect is
        bounded by the request size, not the table). n_buckets overrides
        the instance's modulus — lookups pass the modulus of the MANIFEST
        they read, so they stay correct when another process rebucket()ed
        the table, and when time-traveling across a rebucket boundary."""
        if not keys:
            return {}
        rows = (
            self.spark.createDataFrame(keys, ["repo", "path"])
            .select("repo", "path",
                    bucket_expr(n_buckets or self.n_buckets).alias("b"))
            .collect()
        )
        return {(r["repo"], r["path"]): int(r["b"]) for r in rows}

    def lookup(
        self,
        repo: str,
        path: str,
        include_deleted: bool = False,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Primary-key point lookup — the reference proxy's get-document
        analog (GET /indexes/{i}/documents/{id}; Meilisearch resolves it
        on the PK) — returning 0 or 1 rows, at O(one bucket + key-pruned
        backlog) cost instead of read().filter(key)'s O(table):

        * the key's bucket is a pure function of the key (bucket_expr),
          so ONLY that base bucket directory is listed and scanned —
          at 10^5 buckets that is ~1/100,000th of the table, before the
          key predicate even reaches the parquet footers (it lands in
          PushedFilters, skipping row groups within the bucket);
        * outstanding deltas are manifest-pruned by their touched-bucket
          lists: a delta whose backlog cannot contain the key's bucket is
          never read (legacy entries without bucket lists stay in);
        * LWW resolves over the surviving handful of rows — max over the
          key's base row and its delta versions, the same associativity
          argument as every other read path.

        Exact vs read(): a key's versions live ONLY in its bucket (every
        base writer lays rows out by bucket_expr) and in deltas whose
        bucket list contains it, so the pruned union holds every version
        the full read would see for this key."""
        return self.lookup_many(
            [(repo, path)],
            include_deleted=include_deleted,
            snapshot_id=snapshot_id,
        )

    # above this many keys the per-key OR predicate stops being a good
    # idea (expression-tree size, no footer-stat benefit once the key set
    # spans most row groups) and a broadcast semi-join takes over
    LOOKUP_PREDICATE_MAX = 64

    def lookup_many(
        self,
        keys: list[tuple[str, str]],
        include_deleted: bool = False,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Batched primary-key lookup — the multi-get analog of lookup()
        (Meilisearch's POST /indexes/{i}/documents/fetch with an ids
        filter) — returning at most one current row per requested key at
        O(union of key buckets + bucket-pruned backlog) cost.

        Same pruning as lookup(), vectorized over the key set: the
        buckets of all keys are computed in ONE LocalRelation job with
        the engine's own bucket_expr; only those base bucket dirs are
        listed; deltas whose manifest bucket list cannot intersect the
        key buckets are skipped. Within the surviving scan, key matching
        is an OR-of-conjunctions predicate (lands in PushedFilters —
        row-group skipping) up to LOOKUP_PREDICATE_MAX keys, and a
        broadcast left-semi join above it (the key list broadcasts; the
        scan side never shuffles), so a 10^6-key batch lookup is still
        one pass over only the touched buckets."""
        keys = list(dict.fromkeys((r, p) for r, p in keys))
        meta = (
            self.snapshot_meta(snapshot_id)
            if snapshot_id is not None
            else self.current_meta()
        )
        extra_cols = list(meta["extra_columns"]) if meta else []
        empty = (
            self.spark.createDataFrame([], self._row_schema(extra_cols))
            .drop(BUCKET_COL, *INTERNAL, *SIG_COLS)
        )
        if (
            not keys
            or not meta
            or (not meta["buckets"] and not meta.get("deltas"))
        ):
            return empty
        wset = set(
            self.key_buckets(keys, n_buckets=meta.get("n_buckets")).values()
        )
        wanted = sorted(wset)
        sub = dict(meta)
        sub["deltas"] = [
            d
            for d in meta.get("deltas", [])
            if not isinstance(d, dict)
            or "buckets" not in d
            or not wset.isdisjoint(int(x) for x in d["buckets"])
        ]
        base, delta = self._read_split(sub, extra_cols, buckets=wanted)

        if len(keys) <= self.LOOKUP_PREDICATE_MAX:
            pred = None
            for r, p in keys:
                one = (F.col("repo") == r) & (F.col("path") == p)
                pred = one if pred is None else (pred | one)

            def match(df: DataFrame) -> DataFrame:
                return df.filter(pred)

        else:
            keys_df = F.broadcast(
                self.spark.createDataFrame(keys, ["repo", "path"])
            )

            def match(df: DataFrame) -> DataFrame:
                return df.join(keys_df, ["repo", "path"], "left_semi")

        parts = [match(p) for p in (base, delta) if p is not None]
        if not parts:
            return empty
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        if delta is not None:
            # several versions of a key may coexist until compaction;
            # base-only lookups are already unique per key (base writers
            # are resolve_lww outputs)
            df = resolve_lww(df)
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        return df.drop(*INTERNAL, *SIG_COLS)

    # ---------------- incremental change extraction (CDF) ----------------

    def _snapshot_chain(self, from_id: int, to_id: int) -> list[dict]:
        """Manifests of every snapshot in (from_id, to_id], oldest first —
        the walk behind read_changes. Linear history (every commit's
        parent is the snapshot it rebased onto), so the parent pointers
        are the chain. Raises when an intermediate manifest was expired:
        the incremental read needs every commit in the range, exactly the
        Iceberg/Delta CDF retention contract."""
        if from_id > to_id:
            raise ValueError(
                f"from_snapshot_id {from_id} is newer than to_snapshot_id "
                f"{to_id}"
            )
        chain: list[dict] = []
        cur = to_id
        while cur != from_id:
            if cur is None or cur < from_id:
                raise ValueError(
                    f"snapshot {from_id} is not an ancestor of {to_id}"
                )
            try:
                m = self.snapshot_meta(cur)
            except FileNotFoundError:
                raise ValueError(
                    f"snapshot {cur} in the range ({from_id}, {to_id}] has "
                    "been expired by expire_snapshots: incremental reads "
                    "need every intermediate snapshot — sync at least once "
                    f"per snapshot_retention (= {self.snapshot_retention}) "
                    "commits, or raise the retention"
                ) from None
            if m.get("rollback"):
                # Rolled-back row versions inside the range would
                # classify as live changes (the range's delta files still
                # hold them, but the state they produced was undone) —
                # the same append-only restriction Iceberg's incremental
                # read has. The consumer's recovery is a resync.
                raise ValueError(
                    f"snapshot range ({from_id}, {to_id}] crosses a "
                    f"rollback at snapshot {cur} (rolled back to "
                    f"{m.get('rolled_back_to')}): incremental changes "
                    "are undefined across a rollback — resync from a "
                    "fresh bootstrap, or read changes from the rollback "
                    "commit onward"
                )
            chain.append(m)
            cur = m.get("parent")
        chain.reverse()
        return chain

    @staticmethod
    def _range_data_entries(chain: list[dict], from_meta: dict | None) -> list[dict]:
        """The delta entries APPENDED BY DATA COMMITS within the chain.
        Per-commit manifest diff: a data commit adds exactly one delta
        entry and removes none; a fold (minor/major) or rebucket removes
        entries (its added merged entry only REORGANIZES rows already
        counted — collecting it would double-count, and worse, a minor
        fold can merge deltas that predate the range start); an
        empty-batch commit changes nothing. The union of the returned
        entries' files therefore holds exactly the row versions written
        in the range, each once."""
        prev = {
            d["path"] if isinstance(d, dict) else d
            for d in (from_meta or {}).get("deltas", [])
        }
        entries: list[dict] = []
        for m in chain:
            deltas = [
                d if isinstance(d, dict) else {"path": d, "format": "flat"}
                for d in m.get("deltas", [])
            ]
            cur = {d["path"] for d in deltas}
            removed = prev - cur
            if not removed:
                entries.extend(
                    d for d in deltas
                    if d["path"] not in prev and not d.get("merged")
                )
            prev = cur
        return entries

    def read_changes(
        self,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
        include_internal: bool = False,
        route: str | None = None,
        departures: bool | None = None,
    ) -> DataFrame:
        """Net row-level changes between two snapshots — the Delta Lake
        CDF / Iceberg incremental-read analog, and the lake's downstream
        feed: the reference pushes every change to Meilisearch as it
        happens (sync.go:84 AddDocuments / sync.go:108 DeleteDocument);
        with the lake in the middle, a downstream sync consumes
        `read_changes(last_synced, current)` instead of re-reading the
        table — O(changes in range), not O(table).

        Returns one row per key whose winning version CHANGED in the
        range, in the read() column shape plus `_change_type`
        ('insert' | 'update' | 'delete'); for deletes the payload columns
        are null (the tombstone shape — the key identifies the document
        to remove, Meilisearch DeleteDocument style). Applying the rows
        to the from-snapshot state (PK-replace upserts + deletes)
        reproduces the to-snapshot state exactly — the invariant the
        tests assert.

        Semantics are VERSION-based, matching LWW: a change is emitted
        iff the key's winning (lsn, tx, ts, offset) at `to` is strictly
        newer than at `from` and the transition is visible (a delete of a
        key absent at `from`, or an in-range insert+delete, emits
        nothing; a re-upsert with identical content but a newer version
        IS an update — downstream PK-replace is idempotent, and deciding
        otherwise would cost a full-width column comparison).

        Under route_stable_keys=False (mutable routing field), the feed
        additionally treats the downstream as a set of PER-ROUTE indexes:
        a key whose winning route changed emits an 'insert' into the new
        route AND a 'delete' with the OLD route (the departure row — null
        payload, the key identifies the document), so a per-tenant
        consumer never serves a migrated document forever. Apply the rows
        per (key, route) in that mode. `departures=False` opts a
        migrating lake's feed back into route-AGNOSTIC per-key
        classification — the right shape for a KEY-based downstream
        (lake-to-lake replication via export: a departure delete would
        carry the same ordering tokens as the arrival upsert and tie at
        the replica's LWW); use it only with route=None.

        Cost: O(range delta bytes) for the new versions (the per-commit
        manifest diff collects exactly the delta files appended in the
        range — folds/rebuckets in the range only reorganize rows and
        contribute nothing) + O(changed-bucket subset of the FROM
        snapshot) to classify against prior state, pruned by the same
        manifest bucket lists as every other subset read. Small ranges
        broadcast; large ranges fall back to a shuffle join.

        Requires mode='mor' (data commits must appear in the delta log;
        a COW data commit rewrites buckets in place and leaves no
        per-commit row trail — Iceberg's incremental read has the same
        append/delta-only restriction)."""
        if self.mode != "mor":
            raise ValueError(
                "read_changes requires mode='mor': COW data commits "
                "rewrite buckets in place and leave no per-commit delta "
                "trail to extract changes from"
            )
        cur = self.current_meta()
        if to_snapshot_id is None:
            if cur is None:
                raise ValueError("empty lake: nothing to read changes from")
            to_snapshot_id = cur["id"]

        to_meta = (
            cur if cur is not None and cur["id"] == to_snapshot_id
            else self.snapshot_meta(to_snapshot_id)
            if to_snapshot_id != 0 else None
        )
        extra_cols = list(to_meta["extra_columns"]) if to_meta else []
        sig = SIG_COLS if self.minhash_bands else []
        out_internal = list(INTERNAL) if include_internal else []
        empty = (
            self.spark.createDataFrame([], self._row_schema(extra_cols))
            .drop(BUCKET_COL, *sig,
                  *[c for c in INTERNAL if c not in out_internal])
            .withColumn(CHANGE_TYPE_COL, F.lit(None).cast("string"))
        )
        if from_snapshot_id == to_snapshot_id:
            return empty

        chain = self._snapshot_chain(from_snapshot_id, to_snapshot_id)
        try:
            from_meta = (
                self.snapshot_meta(from_snapshot_id)
                if from_snapshot_id != 0 else None
            )
        except FileNotFoundError:
            raise ValueError(
                f"from snapshot {from_snapshot_id} has been expired by "
                "expire_snapshots — sync within the retention window"
            ) from None
        entries = self._range_data_entries(chain, from_meta)
        if not entries:
            return empty

        # route=X scopes the feed to one tenant (a per-tenant downstream
        # consumer, the reference's one-index-per-collection shape).
        # Under route_stable_keys=True: range deltas whose manifest route
        # list excludes X are skipped whole, the rest filter on the route
        # data column, and the prior read prunes the same way — exact
        # because the table contract says a key's versions all share one
        # route. Under route_stable_keys=False: NO route pruning (a
        # migration away from X is signalled by a version routed
        # elsewhere), the classification below is route-aware, DEPARTURE
        # deletes are emitted to the old route, and the tenant filter
        # lands on the OUTPUT rows.
        prune_route = route if self.route_stable_keys else None
        if prune_route is not None:
            entries = [
                d for d in entries
                if self._delta_matches_route(d, prune_route)
            ]
            if not entries:
                return empty

        # -- winning version per key changed in the range: O(range bytes)
        parts = []
        for d in entries:
            dp = os.path.join(self.table_dir, d["path"])
            if d.get("format") == "parsed":
                parts.append(
                    self._flatten_parsed_delta(
                        dp, extra_cols, route=prune_route
                    )
                )
            else:
                flat = (
                    self.spark.read.option("mergeSchema", "true")
                    .parquet(dp)
                )
                if prune_route is not None and ROUTE_COL in flat.columns:
                    flat = flat.filter(F.col(ROUTE_COL) == prune_route)
                parts.append(self._route_as_string(flat))
        versions = parts[0]
        for p in parts[1:]:
            versions = versions.unionByName(p, allowMissingColumns=True)
        versions = self._normalize_rows(versions, extra_cols)
        winners = resolve_lww(versions).withColumn("__w_ord", packed_ord())

        w_del = F.coalesce(F.col(DELETED_COL), F.lit(False))
        # migration-exact tenant scope: filter OUTPUT rows on route (the
        # inputs were deliberately not pruned); no departures can exist
        # on the insert-only paths below (no prior state to depart from)
        out_route = None if self.route_stable_keys else route

        def finish(out: DataFrame) -> DataFrame:
            if out_route is not None:
                out = out.filter(F.col(ROUTE_COL) == out_route)
            return out.drop(
                BUCKET_COL, "__w_ord", "__p_ord", "__p_deleted", "__p_route",
                *sig, *[c for c in INTERNAL if c not in out_internal],
            )

        if from_meta is None:
            # since the beginning: every surviving winner is an insert
            return finish(
                winners.filter(~w_del)
                .withColumn(CHANGE_TYPE_COL, F.lit("insert"))
            )

        # -- prior state of the changed keys, read from ONLY the buckets
        # the range touched (under the FROM snapshot's modulus). When no
        # fold/rebucket in the range changed the modulus and every entry
        # carries a bucket list, the union of the manifest lists IS the
        # touched set (zero extra jobs); otherwise recompute the buckets
        # of the changed keys with the engine's own bucket expression —
        # one tiny job over the O(changes) winners, collecting <= n_A ints.
        n_a = from_meta.get("n_buckets") or self.n_buckets
        same_modulus = all(
            (m.get("n_buckets") or self.n_buckets) == n_a for m in chain
        )
        if same_modulus and all("buckets" in d for d in entries):
            wset = {int(b) for d in entries for b in d["buckets"]}
        else:
            wset = {
                int(r["b"])
                for r in winners.select(
                    bucket_expr(n_a).alias("b")
                ).distinct().collect()
            }
        sub = dict(from_meta)
        sub["deltas"] = [
            d for d in from_meta.get("deltas", [])
            if not isinstance(d, dict)
            or "buckets" not in d
            or not wset.isdisjoint(int(b) for b in d["buckets"])
        ]
        base, delta = self._read_split(
            sub, extra_cols, route=prune_route, buckets=sorted(wset)
        )
        if base is None and delta is None:
            prior = None
        elif delta is None:
            prior = base  # base rows are unique per key already
        elif base is None:
            prior = resolve_lww(delta)
        else:
            prior = resolve_lww(
                base.unionByName(delta, allowMissingColumns=True)
            )

        if prior is None:
            return finish(
                winners.filter(~w_del)
                .withColumn(CHANGE_TYPE_COL, F.lit("insert"))
            )

        prior_sel = prior.select(
            *KEY_COLS,
            F.coalesce(F.col(DELETED_COL), F.lit(False)).alias("__p_deleted"),
            packed_ord().alias("__p_ord"),
            F.col(ROUTE_COL).alias("__p_route"),
        )
        # classification join: prior is O(touched buckets), winners are
        # O(changes). Semi-prune prior down to the changed keys first;
        # small ranges (manifest byte counts, the read() switch) broadcast
        # both sides of the probe — the base-side scan never shuffles.
        small = (
            sum(int(d.get("bytes", self.broadcast_delta_bytes + 1))
                for d in entries)
            <= self.broadcast_delta_bytes
        )
        wkeys = winners.select(*KEY_COLS)
        if small:
            wkeys = F.broadcast(wkeys)
        prior_small = prior_sel.join(wkeys, KEY_COLS, "left_semi")
        if small:
            prior_small = F.broadcast(prior_small)
        joined = winners.join(prior_small, KEY_COLS, "left")

        newer = F.col("__p_ord").isNull() | (F.col("__w_ord") > F.col("__p_ord"))
        existed = F.coalesce(~F.col("__p_deleted"), F.lit(False))
        use_departures = (
            (not self.route_stable_keys) if departures is None
            else departures
        )
        if not use_departures:
            ct = (
                F.when(w_del & existed, F.lit("delete"))
                .when(~w_del & existed, F.lit("update"))
                .when(~w_del & ~existed, F.lit("insert"))
                .otherwise(F.lit(None).cast("string"))
            )
            return finish(
                joined.filter(newer)
                .withColumn(CHANGE_TYPE_COL, ct)
                .filter(F.col(CHANGE_TYPE_COL).isNotNull())
            )

        # Route-aware classification for mutable routing fields. The
        # downstream is a SET of per-route indexes (the reference's one
        # Meilisearch index per collection), so a key whose winning route
        # changed must emit TWO rows: an insert into the new route (it
        # never lived there) and a DEPARTURE delete to the old route
        # (without it the old tenant's index serves the migrated document
        # forever). A delete whose envelope carries a different route
        # than the key's prior home emits only the departure — the
        # winner's own route never held the document. Both rows are
        # emitted in ONE pass via explode-of-structs: a union of two
        # filtered branches would duplicate the whole range-scan +
        # classification-join subtree in the physical plan (Catalyst does
        # not share subplans across union branches), doubling the feed's
        # I/O for migrating lakes.
        same_route = F.col("__p_route").eqNullSafe(F.col(ROUTE_COL))
        existed_here = existed & same_route
        ct = (
            F.when(w_del & existed_here, F.lit("delete"))
            .when(~w_del & existed_here, F.lit("update"))
            .when(~w_del & ~existed_here, F.lit("insert"))
            .otherwise(F.lit(None).cast("string"))
        )
        helper = {"__w_ord", "__p_ord", "__p_deleted", "__p_route"}
        ord_internal = [c for c in INTERNAL if c != DELETED_COL]
        keep_as_is = set(KEY_COLS) | set(ord_internal) | {BUCKET_COL}
        types = {f.name: f.dataType for f in joined.schema.fields}
        out_cols = [c for c in joined.columns if c not in helper]

        def row_struct(departure: bool):
            fields = []
            for c in out_cols:
                if not departure or c in keep_as_is:
                    fields.append(F.col(c).alias(c))
                elif c == ROUTE_COL:
                    fields.append(F.col("__p_route").alias(c))
                elif c == DELETED_COL:
                    fields.append(F.lit(True).alias(c))
                else:
                    # payload columns: the tombstone shape (null payload,
                    # key identifies the document to remove)
                    fields.append(F.lit(None).cast(types[c]).alias(c))
            fields.append(
                (F.lit("delete") if departure else ct)
                .alias(CHANGE_TYPE_COL)
            )
            return F.struct(*fields)

        normal_row = F.when(ct.isNotNull(), row_struct(False))
        departure_row = F.when(existed & ~same_route, row_struct(True))
        out = (
            joined.filter(newer)
            .select(F.explode(F.array(normal_row, departure_row)).alias("_r"))
            .filter(F.col("_r").isNotNull())
            .select("_r.*")
        )
        return finish(out)

    def destroy(self) -> None:
        shutil.rmtree(self.table_dir, ignore_errors=True)
