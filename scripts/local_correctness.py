"""Local replica of the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry AND its oracle_sql() through DuckDB at a
given sf dir, compare row count / schema (column-name set) / value hash
(columns sorted by name, rows sorted), and write a JSON report.

Usage: python scripts/local_correctness.py [sf_dir] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_df(pdf) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "\x01".join(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_LOCAL.json"

    import duckdb

    import __spark_entry__ as entry
    from pyspark_cdc.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    sqls = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    report: dict = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        row = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
            sql = sqls.get(name)
            if sql is None:
                # rows-only entry (the driver's weaker check for
                # non-SQL-expressible ops): ran + returned a frame is the
                # whole contract, so count it green rather than leaving
                # schema/hash False and permanently failing the gate
                row["err"] = "no-oracle (rows-only)"
                row["rows_match"] = row["spark_rows"] >= 0
                row["schema_match"] = row["hash_match"] = row["rows_match"]
            else:
                odf = con.execute(sql).df()
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                row["hash_match"] = (
                    row["schema_match"] and _hash_df(sdf) == _hash_df(odf)
                )
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        row["wall_sec"] = round(time.monotonic() - t0, 3)
        report[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({row['spark_rows']} rows, {row['wall_sec']}s)"
              + (f" err={row['err']}" if row["err"] else ""),
              flush=True)

    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    n_ok = sum(
        1 for r in report.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(f"\n{n_ok}/{len(report)} green -> {out}")
    return 0 if n_ok == len(report) else 1


if __name__ == "__main__":
    sys.exit(main())
