"""Driver-checkable query registry.

Each module contributes ``QUERIES: dict[name -> (spark_fn, oracle_sql|None)]``
where spark_fn(spark, sf_dir) returns a DataFrame and oracle_sql is the
equivalent ANSI SQL DuckDB runs over the same parquet tables (views
pre-registered by the driver). oracle_sql=None => non-SQL-expressible op,
driver records a rows-only check.

Conventions that make the value-hash compare deterministic:
* every computed column is aliased IDENTICALLY in Spark and SQL;
* money/averages go through DECIMAL(18,2)/round before casting to double
  (eliminates float summation-order noise);
* no raw timestamp columns in outputs (TZ rendering differs across
  engines) — epoch millis or dates as strings instead;
* every LIMIT is preceded by a total ordering (unique tiebreak column).
"""

from __future__ import annotations

from . import cdc, dedup, engine, multimodal, similarity, state, text


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# EXACTLY 50 entries, deliberately: the driver's CORRECTNESS run records
# at most 50 rows (round 3 registered 51 and the 51st — the last in
# insertion order, mm_frame_sample — was silently dropped from
# CORRECTNESS_r03.json despite being green in r02 and locally). Order
# puts the engine rows first; q3b/array-contains is folded into
# q3_set_membership, token counting + language ID into
# text_quality_score (the Q8-into-Q7 precedent), and the per-route
# aggregate (ex cdc_engine_routes) into cdc_engine_replay as window
# columns, so every operator keeps oracle evidence; the freed slots
# carry dedup_lake_signatures (incremental dedup-on-ingest) and
# cdc_engine_changes (the round-5 incremental change read / CDF).
REGISTRY: dict = {}
for mod in (cdc, engine, multimodal, text, state, dedup, similarity):
    REGISTRY.update(mod.QUERIES)


def spark_queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sqls():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
