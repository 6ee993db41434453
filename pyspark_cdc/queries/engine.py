"""Driver-checkable queries over the FLAGSHIP engine replay itself.

These close the round-1 gap where the actual parse -> LWW -> MERGE engine
had no independent oracle: both sides read the same pure-Python parquet
log (pylog.ensure_flagship_log), the Spark side runs the real engine, and
the DuckDB side replays the reference semantics (sync.go:123-248) in SQL:
tombstone/malformed filtering, document selection with payload-replace +
doc-fallback + bad-payload skip, key fallback, is_delete truthiness with
flat-over-inner override, explicit (lsn, tx, ts, offset) last-writer-wins
ranking, and delete suppression.

DuckDB JSON semantics used (probed, v1.0.0):
* json_type(j, '$.k') is SQL NULL when the key is ABSENT and 'NULL' when
  present-with-null — exactly the presence test the engine's
  map_contains_key performs;
* json_extract_string renders numbers/bools as their text and objects as
  compact JSON — identical to Spark's map<string,string> read of the
  same document, so values compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..flagship import flagship_replay
from ..pylog import FLAGSHIP_DIR, ensure_flagship_log

_RAW = f"read_parquet('{FLAGSHIP_DIR}/*.parquet')"

# --- shared SQL fragments (mirroring parse.py / oracle.py) -------------------

_IS_TOMBSTONE = "(value IS NULL OR trim(value) = '' OR trim(value) = 'null')"
# DuckDB evaluates vectorized expressions on EVERY row (no boolean
# short-circuit), and json_extract* raises on invalid JSON — so all
# extraction goes through TRY_CAST(value AS JSON), which is total.
_J = "TRY_CAST(value AS JSON)"
_OP = f"json_extract_string({_J}, '$.payload.op')"
_IS_MALFORMED = f"({_J} IS NULL OR {_OP} IS NULL)"
_AFTER = f"json_extract({_J}, '$.payload.after')"
_BEFORE = f"json_extract({_J}, '$.payload.before')"

# payload key present on the after image (absent => SQL NULL type)
_PTYPE = f"json_type({_AFTER}, '$.payload')"
_PARSED_PAYLOAD = f"TRY_CAST(json_extract_string({_AFTER}, '$.payload') AS JSON)"
# present, non-null payload that does not parse to a JSON object => the
# reference errors and skips the record (sync.go:208-210)
_BAD_PAYLOAD = (
    f"({_OP} IN ('c','r','u') AND {_PTYPE} IS NOT NULL AND {_PTYPE} <> 'NULL'"
    f" AND NOT ({_PARSED_PAYLOAD} IS NOT NULL"
    f"          AND json_type({_PARSED_PAYLOAD}) = 'OBJECT'))"
)

# document selection (sync.go:198-222): payload replaces the flat image;
# else a doc sub-map unwraps; else the flat image is the doc
_DOC = f"""CASE
      WHEN {_PTYPE} IS NOT NULL THEN
        CASE WHEN {_PTYPE} = 'NULL' THEN '{{}}'::JSON
             ELSE {_PARSED_PAYLOAD} END
      WHEN json_type({_AFTER}, '$.doc') = 'OBJECT' THEN json_extract({_AFTER}, '$.doc')
      ELSE {_AFTER}
    END"""


def _base_ctes(raw: str = _RAW) -> str:
    """The shared replay prefix: raw -> env -> rows_all -> keyed (every
    surviving row version with its LWW ordering tuple)."""
    return f"""
WITH raw AS (
  SELECT * FROM {raw}
), env AS (
  SELECT topic, "offset",
         {_OP} AS op,
         COALESCE(TRY_CAST(json_extract({_J}, '$.payload.source.lsn') AS BIGINT), 0) AS lsn,
         COALESCE(TRY_CAST(json_extract_string({_J}, '$.payload.transaction.id') AS BIGINT),
                  TRY_CAST(json_extract({_J}, '$.payload.source.txId') AS BIGINT), 0) AS tx,
         COALESCE(TRY_CAST(json_extract({_J}, '$.payload.source.ts_ms') AS BIGINT), 0) AS ts,
         {_AFTER} AS after,
         {_BEFORE} AS before,
         {_DOC} AS doc
  FROM raw
  WHERE NOT {_IS_TOMBSTONE}
    AND NOT {_IS_MALFORMED}
    AND {_OP} IN ('c','r','u','d')
    AND NOT {_BAD_PAYLOAD}
), rows_all AS (
  SELECT
    CASE WHEN op = 'd' THEN json_extract_string(before, '$.repo')
         ELSE COALESCE(json_extract_string(doc, '$.repo'),
                       json_extract_string(after, '$.repo')) END AS repo,
    CASE WHEN op = 'd' THEN json_extract_string(before, '$.path')
         ELSE COALESCE(json_extract_string(doc, '$.path'),
                       json_extract_string(after, '$.path')) END AS path,
    json_extract_string(doc, '$.commit') AS commit,
    json_extract_string(doc, '$.lang') AS lang,
    json_extract_string(doc, '$.content') AS content,
    json_extract_string(doc, '$.branch') AS branch,
    topic AS route,
    op, lsn, tx, ts, "offset",
    -- flat is_delete overrides the inner one on key PRESENCE (a flat JSON
    -- null is non-truthy and must NOT fall through to the inner value):
    -- json_type(j,'$.k') is SQL NULL only when the key is absent
    (op = 'd'
     OR lower(COALESCE(
          CASE WHEN json_type(after, '$.is_delete') IS NOT NULL
               THEN COALESCE(json_extract_string(after, '$.is_delete'), 'false')
               ELSE json_extract_string(doc, '$.is_delete') END,
          'false')) IN ('true', '1')) AS is_del
  FROM env
), keyed AS (
  SELECT * FROM rows_all
  WHERE repo IS NOT NULL AND repo <> '' AND path IS NOT NULL AND path <> ''
)"""


def _replay_sql(final_select: str) -> str:
    return f"""{_base_ctes()}, ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY repo, path
      ORDER BY lsn DESC, tx DESC, ts DESC, "offset" DESC) AS rn
  FROM keyed
), final AS (
  SELECT repo, path, commit, lang, content, route, branch,
         sha256(content) AS content_sha256
  FROM ranked WHERE rn = 1 AND NOT is_del
)
{final_select}
"""


# --- cdc_engine_replay: the flagship itself ---------------------------------


def cdc_engine_replay(spark, sf_dir):
    """Final state rows PLUS the per-route aggregate evidence that used
    to be its own row (cdc_engine_routes, P8), folded in as window
    columns to free a registry slot for cdc_engine_changes under the
    driver's 50-row cap — the q3b/text_token_count fold precedent: every
    row carries its route's final-state row count and branched count, so
    the routing-identity grouping stays fully oracled."""
    from pyspark.sql import Window

    w = Window.partitionBy("route")
    return (
        flagship_replay(spark)
        .withColumn("route_rows", F.count(F.lit(1)).over(w))
        .withColumn("route_branched", F.count("branch").over(w))
    )


SQL_ENGINE_REPLAY = _replay_sql(
    "SELECT *, count(*) OVER (PARTITION BY route) AS route_rows, "
    "count(branch) OVER (PARTITION BY route) AS route_branched FROM final"
)


# --- cdc_engine_changes: incremental change extraction (CDF) ----------------

# The flagship log replayed in two batches split at FLAGSHIP_CDF_SPLIT;
# the Spark side runs ParquetLake.read_changes(A, B) (range delta files +
# touched FROM-buckets only), the oracle replays BOTH prefixes in SQL and
# classifies the net transition per key with the same version-based rule:
# emit iff the range winner's (lsn, tx, ts, offset) strictly beats the
# prior winner's (tuple comparison), delete only if the key existed
# non-deleted at A, payload columns NULL on deletes (the tombstone shape).


def cdc_engine_changes(spark, sf_dir):
    from ..flagship import flagship_cdf

    lake, a_id, b_id = flagship_cdf(spark)
    ch = lake.read_changes(a_id, b_id)
    return ch.select(
        "repo", "path", "commit", "lang", "content", "route", "branch",
        "_change_type",
    ).withColumn("content_sha256", F.sha2(F.col("content"), 256))


def _changes_sql() -> str:
    from ..flagship import FLAGSHIP_CDF_SPLIT as T

    rank = ("row_number() OVER (PARTITION BY repo, path ORDER BY "
            'lsn DESC, tx DESC, ts DESC, "offset" DESC) AS rn')
    return f"""{_base_ctes()}, prior AS (
  SELECT * FROM (
    SELECT *, {rank} FROM keyed WHERE "offset" < {T}
  ) WHERE rn = 1
), w AS (
  SELECT * FROM (
    SELECT *, {rank} FROM keyed WHERE "offset" >= {T}
  ) WHERE rn = 1
), cls AS (
  SELECT w.repo, w.path, w.commit, w.lang, w.content, w.branch, w.route,
         w.is_del,
         (p.lsn IS NULL OR (w.lsn, w.tx, w.ts, w."offset")
                            > (p.lsn, p.tx, p.ts, p."offset")) AS newer,
         COALESCE(NOT p.is_del, FALSE) AS existed
  FROM w LEFT JOIN prior p ON w.repo = p.repo AND w.path = p.path
)
SELECT repo, path,
       CASE WHEN is_del THEN NULL ELSE commit END AS commit,
       CASE WHEN is_del THEN NULL ELSE lang END AS lang,
       CASE WHEN is_del THEN NULL ELSE content END AS content,
       route,
       CASE WHEN is_del THEN NULL ELSE branch END AS branch,
       CASE WHEN is_del THEN 'delete'
            WHEN existed THEN 'update'
            ELSE 'insert' END AS _change_type,
       CASE WHEN is_del THEN NULL
            ELSE sha256(content) END AS content_sha256
FROM cls
WHERE newer AND NOT (is_del AND NOT existed)
"""


# --- cdc_engine_tenant_state: the route-PRUNED read path (Q11) --------------

# One tenant's topic (generate.TOPICS[0]); the Spark side goes through
# ParquetLake.read(route=...) — manifest bucket/delta pruning + route
# PartitionFilters on the scan (the analog of querying one per-tenant
# Meilisearch index, handler.go:34-44) — while the oracle replays
# everything and filters. Equality proves pruning loses no rows and leaks
# no other tenant's rows.
_TENANT_ROUTE = "cdc.public.repo_files"


def cdc_engine_tenant_state(spark, sf_dir):
    from ..flagship import flagship_lake

    out = flagship_lake(spark).read(route=_TENANT_ROUTE)
    return out.withColumn("content_sha256", F.sha2(F.col("content"), 256))


SQL_ENGINE_TENANT = _replay_sql(
    f"SELECT * FROM final WHERE route = '{_TENANT_ROUTE}'"
)


# --- cdc_engine_schema_evolution: promoted open-world column (north rule) ---


def cdc_engine_schema_evolution(spark, sf_dir):
    """Final-state rows of the `branch` column, which exists ONLY because
    mid-log envelopes started carrying it (extras -> promoted lake column;
    the driver-checkable evidence for additive schema evolution beyond
    pytest)."""
    return (
        flagship_replay(spark)
        .filter(F.col("branch").isNotNull())
        .select("repo", "path", "route", "branch")
    )


SQL_ENGINE_EVOLUTION = _replay_sql(
    "SELECT repo, path, route, branch FROM final WHERE branch IS NOT NULL"
)


# --- cdc_engine_dead_letters: the parse classifier, non-vacuous (T4) --------


def cdc_engine_dead_letters(spark, sf_dir):
    from ..parse import parse_envelopes
    from ..sources import file_batch

    log_dir = ensure_flagship_log()
    parsed = parse_envelopes(file_batch(spark, log_dir))
    return parsed.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


# The missing-key test needs the resolved keys, so the classifier SQL
# reuses the same doc-selection fragments as the replay.
SQL_ENGINE_DEAD_LETTERS = f"""
WITH raw AS (
  SELECT * FROM {_RAW}
), cls AS (
  SELECT CASE
    WHEN {_IS_TOMBSTONE} THEN 'tombstone'
    WHEN {_IS_MALFORMED} THEN 'malformed'
    WHEN {_OP} NOT IN ('c','r','u','d') THEN 'unknown_op'
    WHEN {_BAD_PAYLOAD} THEN 'bad_payload'
    WHEN (CASE WHEN {_OP} = 'd' THEN json_extract_string({_BEFORE}, '$.repo')
               ELSE COALESCE(json_extract_string({_DOC}, '$.repo'),
                             json_extract_string({_AFTER}, '$.repo')) END) IS NULL
      OR (CASE WHEN {_OP} = 'd' THEN json_extract_string({_BEFORE}, '$.repo')
               ELSE COALESCE(json_extract_string({_DOC}, '$.repo'),
                             json_extract_string({_AFTER}, '$.repo')) END) = ''
      OR (CASE WHEN {_OP} = 'd' THEN json_extract_string({_BEFORE}, '$.path')
               ELSE COALESCE(json_extract_string({_DOC}, '$.path'),
                             json_extract_string({_AFTER}, '$.path')) END) IS NULL
      OR (CASE WHEN {_OP} = 'd' THEN json_extract_string({_BEFORE}, '$.path')
               ELSE COALESCE(json_extract_string({_DOC}, '$.path'),
                             json_extract_string({_AFTER}, '$.path')) END) = ''
      THEN 'missing_key'
    ELSE 'ok' END AS status
  FROM raw
)
SELECT status, count(*) AS n FROM cls GROUP BY status
"""


# --- cdc_engine_field_routes: ResolveIndex field-derived routing (P8) -------
#
# The reference derives the route from document FIELDS
# ({app_name}_{collection}, ResolveIndex sync.go:176-196) — flat
# after-image values win on key presence (extractDocument carry-over,
# sync.go:239-245), a delete's fields come from `before`
# (sync.go:153-156), and either field null/empty makes the record a
# skipped dead letter (sync.go:54-67) = status 'missing_route'. The Spark
# side replays the dedicated field-route log through the FULL engine with
# route_from_fields=True; output = parse-status distribution UNION final
# lake state per derived route.

_FRAW = "read_parquet('{dir}/*.parquet')"

# Routes probed through the tenant-scoped (migration-exact) read path in
# cdc_engine_field_routes: shop keys whose collection flips users ->
# products mid-log make these the migration SOURCE and DESTINATION.
FIELDROUTE_TENANTS = ("shop_users", "shop_products")

_F_APP = f"""CASE WHEN {_OP} = 'd' THEN json_extract_string({_BEFORE}, '$.app_name')
         WHEN json_type({_AFTER}, '$.app_name') IS NOT NULL
              THEN json_extract_string({_AFTER}, '$.app_name')
         ELSE json_extract_string({_DOC}, '$.app_name') END"""
_F_COLL = f"""CASE WHEN {_OP} = 'd' THEN json_extract_string({_BEFORE}, '$.collection')
         WHEN json_type({_AFTER}, '$.collection') IS NOT NULL
              THEN json_extract_string({_AFTER}, '$.collection')
         ELSE json_extract_string({_DOC}, '$.collection') END"""

_F_KEY = """CASE WHEN {op} = 'd' THEN json_extract_string({before}, '$.{k}')
         ELSE COALESCE(json_extract_string({doc}, '$.{k}'),
                       json_extract_string({after}, '$.{k}')) END"""


def _fkey(k: str) -> str:
    return _F_KEY.format(op=_OP, before=_BEFORE, doc=_DOC, after=_AFTER, k=k)


def cdc_engine_field_routes(spark, sf_dir):
    from ..flagship import fieldroute_lake
    from ..parse import parse_envelopes
    from ..pylog import ensure_fieldroute_log
    from ..sources import file_batch

    log_dir = ensure_fieldroute_log()
    parsed = parse_envelopes(file_batch(spark, log_dir), route_from_fields=True)
    statuses = (
        parsed.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("status").alias("kind"), F.col("status").alias("name"), "n")
    )
    lake = fieldroute_lake(spark)
    finals = (
        lake.read()
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("route").alias("kind"), F.col("route").alias("name"), "n")
    )
    # Tenant-scoped reads through the MIGRATION-EXACT path (the log
    # contains keys whose collection field changes mid-stream and the
    # lake declares route_stable_keys=False): each count must equal the
    # oracle's global-ranking winners for that route — i.e.
    # read(route=X) == read().filter(route == X) under migration, as a
    # driver-checkable fact, for the migration source and destination
    # routes.
    tenants = [
        lake.read(route=rt)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("tenant").alias("kind"), F.lit(rt).alias("name"), "n")
        for rt in FIELDROUTE_TENANTS
    ]
    out = statuses.unionByName(finals)
    for t in tenants:
        out = out.unionByName(t)
    return out


def _fieldroute_sql() -> str:
    from ..pylog import FIELDROUTE_DIR

    raw = _FRAW.format(dir=FIELDROUTE_DIR)
    return f"""
WITH raw AS (
  SELECT * FROM {raw}
), cls AS (
  SELECT *,
    CASE
      WHEN {_IS_TOMBSTONE} THEN 'tombstone'
      WHEN {_IS_MALFORMED} THEN 'malformed'
      WHEN {_OP} NOT IN ('c','r','u','d') THEN 'unknown_op'
      WHEN {_BAD_PAYLOAD} THEN 'bad_payload'
      WHEN ({_fkey('repo')}) IS NULL OR ({_fkey('repo')}) = ''
        OR ({_fkey('path')}) IS NULL OR ({_fkey('path')}) = '' THEN 'missing_key'
      WHEN ({_F_APP}) IS NULL OR ({_F_APP}) = ''
        OR ({_F_COLL}) IS NULL OR ({_F_COLL}) = '' THEN 'missing_route'
      ELSE 'ok' END AS status
  FROM raw
), statuses AS (
  SELECT 'status' AS kind, status AS name, count(*) AS n FROM cls GROUP BY status
), keyed AS (
  SELECT
    {_fkey('repo')} AS repo,
    {_fkey('path')} AS path,
    ({_F_APP}) || '_' || ({_F_COLL}) AS route,
    COALESCE(TRY_CAST(json_extract({_J}, '$.payload.source.lsn') AS BIGINT), 0) AS lsn,
    COALESCE(TRY_CAST(json_extract_string({_J}, '$.payload.transaction.id') AS BIGINT),
             TRY_CAST(json_extract({_J}, '$.payload.source.txId') AS BIGINT), 0) AS tx,
    COALESCE(TRY_CAST(json_extract({_J}, '$.payload.source.ts_ms') AS BIGINT), 0) AS ts,
    "offset",
    ({_OP} = 'd'
     OR lower(COALESCE(
          CASE WHEN json_type({_AFTER}, '$.is_delete') IS NOT NULL
               THEN COALESCE(json_extract_string({_AFTER}, '$.is_delete'), 'false')
               ELSE json_extract_string({_DOC}, '$.is_delete') END,
          'false')) IN ('true', '1')) AS is_del
  FROM cls WHERE status = 'ok'
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY repo, path
      ORDER BY lsn DESC, tx DESC, ts DESC, "offset" DESC) AS rn
  FROM keyed
), routes AS (
  SELECT 'route' AS kind, route AS name, count(*) AS n
  FROM ranked WHERE rn = 1 AND NOT is_del GROUP BY route
), tenant AS (
  -- the migration-exact tenant-read counts: rank per KEY across ALL
  -- routes (a later version under another collection evicts the key),
  -- then count winners per probed route — exactly what
  -- lake.read(route=X) returns under route_stable_keys=False
  SELECT 'tenant' AS kind, route AS name, count(*) AS n
  FROM ranked WHERE rn = 1 AND NOT is_del
    AND route IN ({", ".join(f"'{t}'" for t in FIELDROUTE_TENANTS)})
  GROUP BY route
)
SELECT * FROM statuses UNION ALL SELECT * FROM routes
UNION ALL SELECT * FROM tenant
"""


def _oracle_ready(sql: str) -> str:
    """Materialize the log before handing the SQL to the driver's DuckDB.
    Best-effort at import time: a failure here must degrade to this
    module's three oracles erroring, never to the whole registry import
    failing (the Spark query functions re-ensure the log themselves)."""
    try:
        ensure_flagship_log()
    except OSError:
        pass
    return sql


def _fieldroute_oracle() -> str:
    from ..pylog import ensure_fieldroute_log

    try:
        ensure_fieldroute_log()
    except OSError:
        pass
    return _fieldroute_sql()


QUERIES = {
    "cdc_engine_replay": (cdc_engine_replay, _oracle_ready(SQL_ENGINE_REPLAY)),
    "cdc_engine_changes": (
        cdc_engine_changes,
        _oracle_ready(_changes_sql()),
    ),
    "cdc_engine_tenant_state": (
        cdc_engine_tenant_state,
        _oracle_ready(SQL_ENGINE_TENANT),
    ),
    "cdc_engine_schema_evolution": (
        cdc_engine_schema_evolution,
        _oracle_ready(SQL_ENGINE_EVOLUTION),
    ),
    "cdc_engine_dead_letters": (
        cdc_engine_dead_letters,
        _oracle_ready(SQL_ENGINE_DEAD_LETTERS),
    ),
    "cdc_engine_field_routes": (
        cdc_engine_field_routes,
        _fieldroute_oracle(),
    ),
}
