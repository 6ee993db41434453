"""Driver-contract parity: for every queries() entry with an oracle_sql(),
run the Spark query and the DuckDB SQL over the same sf0.001 parquet and
compare row count, column names, and order-insensitive values — mimicking
the driver's CORRECTNESS gate before it runs."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "timestamp"):  # datetime
        return f"{v.timestamp():.3f}"
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(ORACLES[name])
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (len(spark_rows), len(duck_rows))
    got = _rowset(spark_cols, spark_rows)
    want = _rowset(duck_cols, duck_rows)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, mismatches[:5]


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"repo", "path", "commit", "lang", "content", "content_sha256"} <= set(df.columns)


def test_flagship_engine_replay_has_an_oracle(spark):
    # round-1 gap closed: the flagship parse->LWW->MERGE replay itself is
    # DuckDB-oracled (engine.py), so NO query is rows-only anymore
    assert "cdc_engine_replay" in ORACLES
    assert set(QUERIES) == set(ORACLES)


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
    assert len(ORACLES) >= 50


def test_flagship_log_is_deterministic(tmp_path):
    """The Spark query and the DuckDB oracle read the flagship log as two
    independent programs — the pure-Python generator must produce
    byte-identical parquet wherever/whenever it runs."""
    import hashlib

    from pyspark_cdc import pylog

    def digest(d):
        h = hashlib.sha256()
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    a = pylog.ensure_flagship_log(str(tmp_path / "a"))
    b = pylog.ensure_flagship_log(str(tmp_path / "b"))
    assert digest(a) == digest(b)
    # and matches the shared copy the oracle SQL points at
    assert digest(pylog.ensure_flagship_log()) == digest(a)
