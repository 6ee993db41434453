"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship — replays the deterministic flagship Debezium
event log (pyspark_cdc.pylog, every FIXTURES.md F3 edge case + a seeded
bulk tail) through the full CDC engine (parse -> LWW -> bucketed MoR
MERGE) and returns the final lake table LAZILY — no driver-side collect;
the lake stays distributed and the driver materializes what it needs.

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md section 2 plus the training-data operator suite
(dedup/similarity/text/multimodal). The flagship engine replay itself is
oracle-checked: the DuckDB SQL replays the reference semantics over the
same pure-Python parquet log (pyspark_cdc/queries/engine.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_session_conf(spark: SparkSession) -> None:
    # parse.py's extras merge needs LAST_WIN; harmless if already set
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay to final table state; driver checks
    rows>0 + stable schema. queries()['cdc_engine_replay'] returns the
    same rows plus two per-route window aggregate columns (the folded
    ex-cdc_engine_routes evidence)."""
    from pyspark_cdc.flagship import flagship_replay

    _ensure_session_conf(spark)
    return flagship_replay(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyspark_cdc.queries import spark_queries

    wrapped: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in spark_queries().items():
        def _mk(f):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ensure_session_conf(spark)
                return f(spark, sf_dir)
            return run
        wrapped[name] = _mk(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    from pyspark_cdc.queries import oracle_sqls

    return oracle_sqls()
