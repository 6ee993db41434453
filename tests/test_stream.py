"""Structured Streaming semantics (SURVEY.md section 5.2 item 3):
streaming replay equals batch replay equals oracle; resume-from-checkpoint
mid-stream equals single-run; duplicate epoch replay is a no-op."""

from __future__ import annotations

from pyspark_cdc import generate, oracle
from pyspark_cdc.sink import ParquetLake
from pyspark_cdc.stream import replay_stream


def _final(lake):
    return {(r["repo"], r["path"]): r.asDict() for r in lake.read().collect()}


def _write_log(spark, tmp_path, n=1_200):
    log_dir = str(tmp_path / "log")
    generate.write_log(spark, log_dir, n_events=n, n_files=6, n_keys=200, seed=7)
    return log_dir


def test_streaming_replay_matches_oracle(spark, tmp_path):
    log_dir = _write_log(spark, tmp_path)
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=8)
    q = replay_stream(
        spark, log_dir, lake, checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_dir=str(tmp_path / "metrics"), max_files_per_trigger=2,
    )
    q.awaitTermination()

    exp = oracle.replay_parquet_log(log_dir)["state"]
    got = _final(lake)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k]["content"] == exp[k].get("content"), k

    # multiple micro-batches actually ran and were individually committed
    assert len(lake.applied_batch_ids()) >= 3

    # lineage metrics exist per (batch, topic, partition) with offset ranges
    m = spark.read.parquet(str(tmp_path / "metrics" / "lineage"))
    assert m.count() >= 3
    cols = set(m.columns)
    assert {"batch_id", "topic", "partition", "n_ok", "n_malformed",
            "min_offset", "max_offset", "min_lsn", "max_lsn"} <= cols


def test_kill_and_resume_from_checkpoint(spark, tmp_path):
    """T6: stop after the first micro-batch, restart with the same
    checkpoint; final state must equal an uninterrupted run (oracle)."""
    log_dir = _write_log(spark, tmp_path)
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    q = replay_stream(spark, log_dir, lake, checkpoint_dir=ckpt, max_files_per_trigger=1)
    # stop as soon as at least one batch committed
    while not lake.applied_batch_ids():
        q.awaitTermination(0.2)
    q.stop()
    q.awaitTermination()
    n_before = len(lake.applied_batch_ids())

    q2 = replay_stream(spark, log_dir, lake, checkpoint_dir=ckpt, max_files_per_trigger=1)
    q2.awaitTermination()

    exp = oracle.replay_parquet_log(log_dir)["state"]
    got = _final(lake)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k]["content"] == exp[k].get("content"), k
    assert len(lake.applied_batch_ids()) > n_before


def test_restarted_query_does_not_reapply_epochs(spark, tmp_path):
    """A fully-drained query restarted on the same checkpoint commits
    nothing new (idempotent epochs)."""
    log_dir = _write_log(spark, tmp_path, n=400)
    lake = ParquetLake(spark, str(tmp_path / "lake"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    replay_stream(spark, log_dir, lake, checkpoint_dir=ckpt).awaitTermination()
    snap = lake.current_meta()["id"]
    state = _final(lake)

    replay_stream(spark, log_dir, lake, checkpoint_dir=ckpt).awaitTermination()
    assert _final(lake) == state
    assert lake.current_meta()["id"] == snap


def test_async_lineage_matches_sync(spark, tmp_path):
    """MetricsWriter(async_lineage=True) moves the per-batch lineage job
    off the hot loop (it overlaps the next batch's ingest); after flush()
    the lineage table must be IDENTICAL to a synchronous run over the
    same log, and flush() must surface background failures."""
    import pytest

    from pyspark_cdc.metrics import MetricsWriter

    log_dir = _write_log(spark, tmp_path)

    lake_s = ParquetLake(spark, str(tmp_path / "lake_s"), n_buckets=8)
    replay_stream(
        spark, log_dir, lake_s, checkpoint_dir=str(tmp_path / "ckpt_s"),
        metrics_dir=str(tmp_path / "m_s"), max_files_per_trigger=2,
    ).awaitTermination()

    lake_a = ParquetLake(spark, str(tmp_path / "lake_a"), n_buckets=8)
    mw = MetricsWriter(str(tmp_path / "m_a"), async_lineage=True)
    replay_stream(
        spark, log_dir, lake_a, checkpoint_dir=str(tmp_path / "ckpt_a"),
        metrics_dir=mw, max_files_per_trigger=2,
    ).awaitTermination()
    mw.flush()

    def rows(d):
        df = spark.read.parquet(str(tmp_path / d / "lineage"))
        cols = sorted(c for c in df.columns if c != "batch_wall_ms")
        return sorted(map(tuple, df.select(*cols).collect()))

    sync_rows, async_rows = rows("m_s"), rows("m_a")
    assert sync_rows and sync_rows == async_rows

    boom = MetricsWriter(str(tmp_path / "m_boom"), async_lineage=True)

    def _fail():
        raise RuntimeError("lineage boom")

    boom.submit(_fail)
    with pytest.raises(RuntimeError, match="lineage boom"):
        boom.flush()
    boom.flush()  # drained: second flush is a no-op

    # the pruned-failure case: a failed background task followed by MORE
    # submits must still surface at flush — submit()'s done-future prune
    # previously discarded the failed future without observing it, so
    # the job reported success while a batch's lineage rows were lost
    boom2 = MetricsWriter(str(tmp_path / "m_boom2"), async_lineage=True)
    boom2.submit(_fail)
    import time as _time

    for _ in range(100):  # let the background task complete (fail)
        if all(f.done() for f in boom2._pending):
            break
        _time.sleep(0.05)
    boom2.submit(lambda: None)  # prunes the failed future
    with pytest.raises(RuntimeError, match="lineage boom"):
        boom2.flush()
    boom2.flush()  # error cleared after being raised once


def test_replay_job_kafka_arg_validation(spark, tmp_path):
    """jobs/replay.py --source kafka demands --brokers/--topics before
    touching any cluster (argparse-level guard)."""
    import pytest

    sys_path_guard = str(tmp_path)  # noqa: F841 (fixture keeps tmp alive)
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "replay_job", os.path.join(os.path.dirname(__file__), "..", "jobs", "replay.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(SystemExit):
        mod.main(["--log-dir", "/tmp/x", "--table-dir", str(tmp_path / "t"),
                  "--mode", "stream", "--checkpoint", str(tmp_path / "c"),
                  "--source", "kafka"])


def test_windowed_change_rate_with_watermark(spark, tmp_path):
    """T9+: the watermarked tumbling-window aggregation runs as a REAL
    Structured Streaming query (append mode, availableNow). The log
    arrives in event-time order across three micro-batches (file mtimes
    force discovery order), so: every window emitted by the stream equals
    the batch computation, windows beyond the final watermark stay
    unemitted (append semantics), and state for passed windows was
    evicted rather than kept forever."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from pyspark_cdc import generate
    from pyspark_cdc.parse import parse_envelopes
    from pyspark_cdc.sources import file_batch, file_stream
    from pyspark_cdc.windows import change_rate_stream

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    # one log, split into three event-time-ordered slices (lsn == ts_ms):
    # slice i covers [1000+i*1000, 1000+(i+1)*1000) ms
    full = generate.bulk_events_df(
        spark, n_events=3_000, n_keys=300, seed=7, n_partitions=1
    )
    # force discovery order = slice order (FileStreamSource sorts by mtime)
    base = _time.time() - 600
    seen: set[str] = set()
    for i in range(3):
        lo, hi = 1_000 + i * 1_000, 1_000 + (i + 1) * 1_000
        (full.filter((F.col("offset") >= lo) & (F.col("offset") < hi))
             .coalesce(1).write.mode("append").parquet(log_dir))
        new = {f for f in os.listdir(log_dir) if f.endswith(".parquet")} - seen
        assert len(new) == 1
        os.utime(os.path.join(log_dir, new.pop()), (base + i * 30, base + i * 30))
        seen = {f for f in os.listdir(log_dir) if f.endswith(".parquet")}

    kw = dict(window="500 milliseconds", watermark="200 milliseconds")
    agg_stream = change_rate_stream(
        parse_envelopes(file_stream(spark, log_dir, max_files_per_trigger=1)), **kw
    )
    q = (
        agg_stream.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["window_start_ms"], r["route"]): (r["n_changes"], r["n_deletes"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }

    batch = {
        (r["window_start_ms"], r["route"]): (r["n_changes"], r["n_deletes"])
        for r in change_rate_stream(
            parse_envelopes(file_batch(spark, log_dir)), **kw
        ).collect()
    }

    assert streamed, "no window emitted -- watermark never advanced"
    for k, v in streamed.items():
        assert batch[k] == v, k
    # append mode: only watermark-passed windows emit, so streamed < batch
    assert set(streamed) < set(batch)


def test_replay_job_probe_stamps(spark, tmp_path, capsys):
    """--probe-stamps brackets the replay with one in-JVM calibration rep
    on each side: both stamps appear in the output JSON as positive
    Mrows/s floats, and neither key leaks into a run without the flag."""
    import importlib.util
    import json as _json
    import os

    spec = importlib.util.spec_from_file_location(
        "replay_job_stamps",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "replay.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    log_dir = _write_log(spark, tmp_path)
    base = ["--log-dir", log_dir, "--mode", "batch", "--fresh"]

    mod.main(base + ["--table-dir", str(tmp_path / "t1"), "--probe-stamps"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("jvm_probe_pre_mrows", "jvm_probe_post_mrows"):
        assert isinstance(out[key], float) and out[key] > 0, (key, out.get(key))

    mod.main(base + ["--table-dir", str(tmp_path / "t2")])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "jvm_probe_pre_mrows" not in out and "jvm_probe_post_mrows" not in out


def test_continuous_file_tail_picks_up_new_files(spark, tmp_path):
    """replay_stream(available_now=False) — the jobs/replay.py
    --continuous deployment — keeps the query ALIVE and ingests log
    files that land after start. The flag was previously ignored for the
    file source (replay_stream hardcoded availableNow), so a production
    tail silently drained-and-exited instead of tailing."""
    import time as _time

    log_dir = _write_log(spark, tmp_path)
    lake = ParquetLake(spark, str(tmp_path / "lake_cont"), n_buckets=8,
                       mode="mor", compact_every=None)
    q = replay_stream(
        spark, log_dir, lake, checkpoint_dir=str(tmp_path / "ckpt_cont"),
        max_files_per_trigger=4, available_now=False,
    )
    try:
        deadline = _time.monotonic() + 90
        n1 = 0
        while _time.monotonic() < deadline:
            meta = lake.current_meta()
            if meta is not None and lake.read().count() > 0:
                n1 = lake.read().count()
                break
            _time.sleep(0.5)
        assert n1 > 0, "initial log never drained"
        assert q.isActive, "continuous tail stopped after draining"

        # a NEW log file lands after start: the tail must ingest it
        # hot_pct=100 + a fresh hot repo => every late event targets keys
        # that cannot exist yet, so the live-row count must strictly grow
        extra = generate.bulk_events_df(
            spark, 300, n_keys=50, seed=99, hot_pct=100,
            hot_repo="late/only-repo",
        )
        extra.coalesce(1).write.mode("append").parquet(log_dir)
        while _time.monotonic() < deadline:
            if lake.read().count() > n1:
                break
            _time.sleep(0.5)
        assert lake.read().count() > n1, "late file never ingested"
        assert q.isActive
    finally:
        q.stop()
