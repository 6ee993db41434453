"""Scale/skew smoke (SURVEY.md section 5.2 item 5): one hot repo owns >=50%
of events; the job completes and matches the oracle. Also checks schema
evolution mid-log at this scale."""

from __future__ import annotations

from pyspark_cdc import generate, oracle
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import replay_batch


def test_hot_repo_half_of_events(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    generate.write_log(
        spark, log_dir, n_events=4_000, n_files=4, n_keys=500,
        hot_pct=55, include_edge_cases=False, seed=11,
    )
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=16)
    replay_batch(spark, log_dir, lake)

    exp = oracle.replay_parquet_log(log_dir)["state"]
    got = {(r["repo"], r["path"]): r.asDict() for r in lake.read().collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k].get("content") == exp[k].get("content"), k
        assert got[k].get("branch") == exp[k].get("branch"), k

    hot = [k for k in exp if k[0] == "org0/hot-repo"]
    assert hot, "hot repo must survive into the final state"
