"""Flagship engine replay over the pure-Python flagship log, shared by
__spark_entry__.entry() and the driver-checkable cdc_engine_* queries.

The lake is built ONCE per process into a kept tempdir and every caller
gets the lazy lake.read() DataFrame — no driver-side collect of the
final table (at real scale that collect is a driver OOM; the lake result
must stay distributed)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pylog import ensure_flagship_log

_CACHE: dict = {"lake_dir": None}


def flagship_lake(spark: SparkSession):
    from .sink import ParquetLake
    from .stream import replay_batch

    log_dir = ensure_flagship_log()
    if _CACHE["lake_dir"] is None:
        lake_root = tempfile.mkdtemp(prefix="pyspark_cdc_flagship_lake_")
        lake = ParquetLake(
            spark, os.path.join(lake_root, "lake"), n_buckets=16, mode="mor"
        )
        replay_batch(spark, log_dir, lake)
        _CACHE["lake_dir"] = lake_root
        return lake
    from .sink import ParquetLake as PL

    return PL(
        spark, os.path.join(_CACHE["lake_dir"], "lake"), n_buckets=16, mode="mor"
    )


def fieldroute_lake(spark: SparkSession):
    """Lake built from the field-route log with route_from_fields=True —
    the reference's exact ResolveIndex routing (sync.go:176-196) driving
    the engine's route-partitioned layout end to end."""
    from .pylog import ensure_fieldroute_log
    from .sink import ParquetLake
    from .stream import replay_batch

    log_dir = ensure_fieldroute_log()
    if _CACHE.get("fieldroute_dir") is None:
        lake_root = tempfile.mkdtemp(prefix="pyspark_cdc_fieldroute_lake_")
        lake = ParquetLake(
            spark, os.path.join(lake_root, "lake"), n_buckets=8, mode="mor"
        )
        replay_batch(spark, log_dir, lake, route_from_fields=True)
        _CACHE["fieldroute_dir"] = lake_root
        return lake
    from .sink import ParquetLake as PL

    return PL(
        spark, os.path.join(_CACHE["fieldroute_dir"], "lake"), n_buckets=8,
        mode="mor",
    )


def flagship_replay(spark: SparkSession) -> DataFrame:
    """Final table state after replaying the flagship log through
    parse -> LWW -> bucketed MoR MERGE, with the per-row content sha256
    invariant column (BASELINE.json input_hint)."""
    out = flagship_lake(spark).read()
    return out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
