"""Shared helpers for the bench scripts.

The confinement filters ("this change wave touches only buckets < k")
must use the ENGINE's own key->bucket mapping, or the published
touched-bucket numbers silently change meaning if the engine's hash
ever changes (seed, function, column order). bucket_of_key rebinds
sink.bucket_expr — the single source of truth — onto the repo/path
fields extracted from the raw Kafka key JSON, instead of each script
hand-rolling pmod(xxhash64(...)) copies.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_key_bucket(
    df: DataFrame, n_buckets: int, col_name: str = "__bench_bucket"
) -> DataFrame:
    """Raw Kafka-shaped df -> df + a column holding the ENGINE's bucket
    of each record's key (sink.bucket_expr over the extracted repo/path).
    The temporary key columns are dropped again; callers filter on
    col_name and drop it before feeding process_batch."""
    from pyspark_cdc.sink import bucket_expr

    key_t = F.from_json(F.col("key"), "repo string, path string")
    return (
        df.withColumn("repo", key_t["repo"])
        .withColumn("path", key_t["path"])
        .withColumn(col_name, bucket_expr(n_buckets))
        .drop("repo", "path")
    )
