"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship — replays a deterministic synthetic Debezium event
log through the full CDC engine (parse -> LWW -> bucketed MERGE) and
returns the final lake table.

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md section 2 plus the training-data operator suite
(dedup/similarity/text/multimodal); oracles are ANSI SQL for DuckDB over
the driver's pre-registered views. Engine-replay entries that aren't
SQL-expressible (stateful streaming MERGE) are rows-only.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_session_conf(spark: SparkSession) -> None:
    # parse.py's extras merge needs LAST_WIN; harmless if already set
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")


def _engine_replay(spark: SparkSession, n_events: int) -> DataFrame:
    from pyspark.sql import functions as F

    from pyspark_cdc import generate
    from pyspark_cdc.sink import ParquetLake
    from pyspark_cdc.stream import replay_batch

    _ensure_session_conf(spark)
    tmp = tempfile.mkdtemp(prefix="pyspark_cdc_entry_")
    log_dir = os.path.join(tmp, "log")
    generate.write_log(spark, log_dir, n_events=n_events, n_files=4, n_keys=300, seed=42)
    # MoR is the production merge strategy; entry() therefore exercises
    # delta-append + read-time LWW under the driver's correctness gate.
    lake = ParquetLake(spark, os.path.join(tmp, "lake"), n_buckets=16, mode="mor")
    replay_batch(spark, log_dir, lake)
    out = lake.read().orderBy("repo", "path")
    # materialize before the temp dir can be cleaned
    rows = out.collect()
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay (all 16 FIXTURES.md F3 edge cases + bulk
    events) to final table state; driver checks rows>0 + stable schema."""
    return _engine_replay(spark, n_events=2_000)


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

    # rows-only: the actual streaming-MERGE engine (non-SQL-expressible)
    def engine_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine_replay(spark, n_events=2_000)

    wrapped["cdc_engine_replay"] = engine_replay
    return wrapped


def oracle_sql() -> dict[str, str]:
    from pyspark_cdc.queries import oracle_sqls

    return oracle_sqls()
