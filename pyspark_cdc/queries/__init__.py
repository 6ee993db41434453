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


REGISTRY: dict = {}
for mod in (cdc, engine, state, dedup, similarity, text, multimodal):
    REGISTRY.update(mod.QUERIES)


def spark_queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sqls():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
