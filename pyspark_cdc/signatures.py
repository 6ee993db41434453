"""Incremental MinHash-LSH dedup signatures, computed AT INGEST.

A training-data pipeline dedups the LAKE as it fills, not a static
snapshot: recomputing shingle->minhash->band over the whole table per
dedup run is O(table) every time. Instead the 4 LSH band hashes (the
same 8-minhash/4-band construction as queries/dedup.py, which carries
the bit-exact DuckDB oracle for the hashing) are materialized as row
COLUMNS when a row version is flattened into the lake — pure native
expressions (split/transform/array_min/md5: JVM codegen, zero shuffle,
zero Python), so each version's signature is computed exactly once, at
the batch/compaction that ingests it, and then rides the LWW merge like
any other payload column. Dedup over the lake's final state becomes a
band equi-join on STORED columns: O(final rows) with no text re-scan —
and after N more batches, only the new/changed rows ever paid the
shingling cost. Incremental == from-scratch by construction: a
signature is a pure function of the row's content, and LWW picks the
winning row WITH its signature (tests/test_incdedup.py proves both).

Scale note: at 100 TB the signature columns add ~132 bytes/row (4 md5
hex strings) — trivial next to content — and move the dedup pipeline's
only expensive stage (shingle explode + 8 hashes) from every-dedup-run
to once-per-ingested-version, amortized inside the ingest fold where
the row is already in cache.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same shape as queries/dedup.py (N_MINHASH=8, N_BANDS=4): 64-bit
# minhash = first 15 hex digits of md5(shingle|k) as BIGINT; band b =
# md5(mh_{2b} || '_' || mh_{2b+1}).
N_MINHASH = 8
N_BANDS = 4

SIG_COLS = [f"__mh_band{b}" for b in range(N_BANDS)]


def _shingles(words: Column) -> Column:
    """3-word shingles from a pre-split token array (1-based element_at
    == DuckDB list[i]; identical to queries/dedup._SHINGLES_FROM_W)."""
    n = F.size(words)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i),
            F.element_at(words, F.least(i + 1, n)),
            F.element_at(words, F.least(i + 2, n)),
        ),
    )


def _minhash(shingles: Column, k: int) -> Column:
    return F.array_min(
        F.transform(
            shingles,
            lambda s: F.conv(
                F.substring(F.md5(F.concat(s, F.lit(f"|{k}"))), 1, 15), 16, 10
            ).cast("long"),
        )
    )


def with_band_columns(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append the N_BANDS signature columns (SIG_COLS) derived from
    `content_col`. NULL content (tombstones, content-less rows) gets NULL
    signatures — a null band never equi-joins, so such rows simply never
    pair. The token split and shingle array materialize once per row via
    temp columns (the per-shingle hash is the real cost; 8 hashes share
    one shingle array)."""
    df = df.withColumn("__sig_w", F.split(F.col(content_col), " "))
    df = df.withColumn("__sig_sh", _shingles(F.col("__sig_w")))
    mh = [_minhash(F.col("__sig_sh"), k) for k in range(N_MINHASH)]
    for b in range(N_BANDS):
        df = df.withColumn(
            SIG_COLS[b],
            F.when(
                F.col(content_col).isNull(), F.lit(None).cast("string")
            ).otherwise(F.md5(F.concat_ws("_", mh[2 * b], mh[2 * b + 1]))),
        )
    return df.drop("__sig_w", "__sig_sh")


def fill_band_columns(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Sign only the rows that NEED it: the post-LWW signing step.

    A fold/read winner that came from a signed base (or a signed merged
    delta) keeps its stored signature untouched; a winner that arrived
    from a raw delta (null band0 + non-null content) is signed HERE, once,
    AFTER its losing sibling versions were discarded by the aggregate. At
    ~V versions per key this is a ~V-fold cut over signing every version
    pre-aggregate, with the identical result — a signature is a pure
    function of the row's content, and only the winning row's content
    survives. The per-row CASE gates the split/shingle temp columns too,
    so already-signed rows pay ~nothing. Missing signature columns (first
    fold of a fresh table) are treated as all-null.

    Invariant relied on: content IS NOT NULL implies band0 null <=> the
    row is unsigned (both writers set all four bands together, and only
    for non-null content)."""
    for c in SIG_COLS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    # materialize the predicate FIRST: the per-band withColumns below
    # rewrite band0, so an expression re-resolving band0 by name would
    # flip to false after the first band is filled
    df = df.withColumn(
        "__sig_need",
        F.col(SIG_COLS[0]).isNull() & F.col(content_col).isNotNull(),
    )
    need = F.col("__sig_need")
    df = df.withColumn("__sig_w", F.when(need, F.split(F.col(content_col), " ")))
    df = df.withColumn("__sig_sh", F.when(need, _shingles(F.col("__sig_w"))))
    mh = [_minhash(F.col("__sig_sh"), k) for k in range(N_MINHASH)]
    for b in range(N_BANDS):
        df = df.withColumn(
            SIG_COLS[b],
            F.when(
                need, F.md5(F.concat_ws("_", mh[2 * b], mh[2 * b + 1]))
            ).otherwise(F.col(SIG_COLS[b])),
        )
    return df.drop("__sig_need", "__sig_w", "__sig_sh")


# --- DuckDB oracle fragments (mirror queries/dedup.py's portable hashing) ---


def shingles_sql(col: str) -> str:
    return (
        f"list_transform(range(1, greatest(len(string_split({col}, ' ')) - 2, 1) + 1),"
        f" i -> concat_ws(' ', string_split({col}, ' ')[i],"
        f" string_split({col}, ' ')[least(i + 1, len(string_split({col}, ' ')))],"
        f" string_split({col}, ' ')[least(i + 2, len(string_split({col}, ' ')))]))"
    )


def minhash_sql(shingles: str, k: int) -> str:
    return (
        f"list_min(list_transform({shingles},"
        f" s -> CAST('0x' || substr(md5(s || '|{k}'), 1, 15) AS BIGINT)))"
    )


def band_sql(mh_even: str, mh_odd: str) -> str:
    return f"md5(concat_ws('_', {mh_even}, {mh_odd}))"
