"""Deduplication operators for a training-data pipeline over `documents`:
exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard. Engine-portable hashing: md5 (and
64-bit integers carved from md5 hex prefixes) computes identically in
Spark and DuckDB, so every stage has a bit-exact DuckDB oracle.

Scale notes (100 TB): the shingle explode is a flatMap (no shuffle) —
but it multiplies rows ~500x, so the input is spread across the
parallelism FIRST (_docs_spread): a small upstream file count must not
serialize the expensive explode+hash stage (measured 8x on local[32],
where the single-file test input otherwise pins the whole minhash
pipeline to one task). Minhashes are LONGS (md5-prefix-to-int), giving
the agg primitive mutable buffers => HashAggregate instead of
SortAggregate, and the per-doc token split runs ONCE per row (presplit)
instead of once per shingle expression. The LSH band join is an
equi-join on (band_idx, band_hash) — the whole point of LSH is that this
join replaces the quadratic all-pairs comparison. The n-gram Jaccard
operator drops stop-shingles (document frequency > DF_CAP) before the
pair join, which bounds the join fan-out on pathological corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

N_MINHASH = 8  # 4 bands x 2 rows
N_BANDS = 4
DF_CAP = 50  # n-gram jaccard: drop shingles present in > DF_CAP docs


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_spread(spark, sf_dir):
    """documents spread over the full parallelism before a row-exploding
    stage. The repartition is CONDITIONAL on the scan actually having too
    few splits (the single-file sandbox input would otherwise pin the
    whole shingle+hash pipeline to one task — measured 8x on local[32]):
    an explicit-N repartition is NOT elided by AQE, so at production
    scale, where the scan already has thousands of splits, adding it
    unconditionally would force a pointless full shuffle of the corpus
    before shingling."""
    n = spark.sparkContext.defaultParallelism
    df = _docs(spark, sf_dir)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, "doc_id")


# 3-word shingles from a PRE-SPLIT token array column `w` (1-based
# element_at == DuckDB list[i]). HASH-SPEC CONTRACT: the shingle text and
# the md5-prefix minhash below must stay bit-identical to
# signatures.py's array-column construction (the at-ingest lake
# signatures) — the dedup_lake_signatures oracle row and
# tests/test_incdedup.py pin incremental == from-scratch, so a drift in
# either copy fails those gates. The two shapes differ only in plumbing
# (explode pipeline here for the documents-table operators vs pure
# column expressions there for the row-level fill).
_SHINGLES_FROM_W = (
    "transform(sequence(1, greatest(size(w) - 2, 1)),"
    " i -> concat_ws(' ', element_at(w, i),"
    " element_at(w, least(i + 1, size(w))),"
    " element_at(w, least(i + 2, size(w)))))"
)


def _shingles(spark, sf_dir):
    return (
        _docs_spread(spark, sf_dir)
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_FROM_W)).alias("shingle"))
    )


# --- exact dedup ---------------------------------------------------------------


def dedup_exact(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


SQL_EXACT = """
SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


# --- shared: 3-word shingles (1-based element_at == DuckDB list[i]) -------------

_SHINGLES_SQL = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),"
    " i -> concat_ws(' ', string_split(text, ' ')[i],"
    " string_split(text, ' ')[least(i + 1, len(string_split(text, ' ')))],"
    " string_split(text, ' ')[least(i + 2, len(string_split(text, ' ')))]))"
)


# --- MinHash + LSH ---------------------------------------------------------------


def _minhash_long(k: int):
    """64-bit minhash: the first 15 hex digits (60 bits) of
    md5(shingle|k) as a BIGINT — primitive agg buffer => HashAggregate;
    DuckDB computes the identical value via CAST('0x'||substr(...) AS
    BIGINT)."""
    h = F.md5(F.concat(F.col("shingle"), F.lit(f"|{k}")))
    return F.min(F.conv(F.substring(h, 1, 15), 16, 10).cast("long")).alias(f"mh{k}")


def dedup_minhash_lsh(spark, sf_dir):
    """doc -> 8 long minhashes (min md5-prefix over shingles per seed)
    -> 4 LSH bands -> candidate pairs sharing any band. min() is
    duplicate-insensitive, so no distinct-shingle pass is needed."""
    sh = _shingles(spark, sf_dir)
    mh = sh.groupBy("doc_id").agg(*[_minhash_long(k) for k in range(N_MINHASH)])
    bands = mh.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws("_", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
            ).alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    stacked = bands.selectExpr(
        "doc_id",
        "stack({n}, {args}) AS (band_idx, band_hash)".format(
            n=N_BANDS,
            args=", ".join(f"{b}, band{b}" for b in range(N_BANDS)),
        ),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _sql_minhash_bands() -> str:
    mh_cols = ",\n         ".join(
        f"min(CAST('0x' || substr(md5(shingle || '|{k}'), 1, 15) AS BIGINT)) AS mh{k}"
        for k in range(N_MINHASH)
    )
    band_cols = ",\n         ".join(
        f"md5(concat_ws('_', mh{2 * b}, mh{2 * b + 1})) AS band{b}"
        for b in range(N_BANDS)
    )
    unions = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, band{b} AS band_hash FROM bands"
        for b in range(N_BANDS)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle FROM documents
), mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id,
         {band_cols}
  FROM mh
), stacked AS (
{unions}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM stacked a JOIN stacked b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
"""


# --- SimHash ---------------------------------------------------------------------


def dedup_simhash(spark, sf_dir):
    """16-bit SimHash: bit b is the sign of sum(+1/-1) over tokens, where
    a token votes +1 iff hex digit b of md5(token) has its top bit set
    (digit >= '8'); frequency-weighted (tokens not deduped), standard
    SimHash. Output: fingerprint per doc + collision-cluster stats."""
    # one fingerprint implementation (_simhash_per_doc) for BOTH the
    # exact-collision operator and the Hamming neighbor search — two
    # hand-synced copies of the bit rule could silently drift
    return _simhash_per_doc(spark, sf_dir).groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id")
    )


def _sql_simhash() -> str:
    bit_exprs = ",\n         ".join(
        "CASE WHEN sum(CASE WHEN substring(md5(t), {p}, 1) >= '8' THEN 1 ELSE -1 END) > 0"
        " THEN '1' ELSE '0' END AS bit{b}".format(p=b + 1, b=b)
        for b in range(16)
    )
    concat = " || ".join(f"bit{b}" for b in range(16))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), per_doc AS (
  SELECT doc_id,
         {bit_exprs}
  FROM tok GROUP BY doc_id
)
SELECT {concat} AS simhash, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM per_doc GROUP BY 1
"""


# --- SimHash Hamming-distance neighbor search --------------------------------------

HAMMING_K = 3  # max bit distance for a near-dup pair
SIMHASH_BANDS = 4  # 4 bands x 4 bits; hamming<=3 => >=1 band identical (pigeonhole)


def _simhash_per_doc(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    h = F.md5(F.col("t"))
    bits = [
        F.sum(
            F.when(F.substring(h, b + 1, 1) >= "8", F.lit(1)).otherwise(F.lit(-1))
        )
        for b in range(16)
    ]
    return tok.groupBy("doc_id").agg(
        F.concat(
            *[F.when(bit > 0, F.lit("1")).otherwise(F.lit("0")) for bit in bits]
        ).alias("simhash")
    )


def dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-dup NEIGHBOR search (not just exact collisions): the
    16-bit fingerprint splits into 4 bands of 4 bits; by pigeonhole any
    pair within Hamming distance <= 3 shares at least one identical band,
    so candidates come from a per-band equi-join — no all-pairs scan —
    and the exact bit distance filters the candidates. Output: pairs with
    their distance (distance 0 = the exact-collision clusters the plain
    simhash operator reports).

    Scale sizing: per-band bucket population is ~N / 2^band_bits, so the
    band width must grow with the corpus — at web scale use a 64-bit
    fingerprint with 4 x 16-bit bands (buckets ~N/65536; same k<=3
    pigeonhole guarantee). The 16-bit/4-bit shape here matches the
    engine-portable md5-hex-digit construction and the driver corpus;
    the plan shape (band equi-join + exact distance filter) is identical
    at any width."""
    per_doc = _simhash_per_doc(spark, sf_dir)
    stacked = per_doc.select(
        "doc_id",
        "simhash",
        *[
            F.substring("simhash", b * 4 + 1, 4).alias(f"band{b}")
            for b in range(SIMHASH_BANDS)
        ],
    ).selectExpr(
        "doc_id",
        "simhash",
        "stack({n}, {args}) AS (band_idx, band_val)".format(
            n=SIMHASH_BANDS,
            args=", ".join(f"{b}, band{b}" for b in range(SIMHASH_BANDS)),
        ),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    hamming = sum(
        (
            F.substring(F.col("a_sim"), i + 1, 1)
            != F.substring(F.col("b_sim"), i + 1, 1)
        ).cast("int")
        for i in range(16)
    )
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("a_sim"),
            F.col("b.simhash").alias("b_sim"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= HAMMING_K)


def _sql_simhash_hamming() -> str:
    bit_exprs = ",\n         ".join(
        "CASE WHEN sum(CASE WHEN substring(md5(t), {p}, 1) >= '8' THEN 1 ELSE -1 END) > 0"
        " THEN '1' ELSE '0' END AS bit{b}".format(p=b + 1, b=b)
        for b in range(16)
    )
    concat = " || ".join(f"bit{b}" for b in range(16))
    unions = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {b} AS band_idx,"
        f" substring(simhash, {b * 4 + 1}, 4) AS band_val FROM per_doc"
        for b in range(SIMHASH_BANDS)
    )
    hamming = " + ".join(
        f"CASE WHEN substring(a_sim, {i + 1}, 1) <> substring(b_sim, {i + 1}, 1)"
        " THEN 1 ELSE 0 END"
        for i in range(16)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), perbit AS (
  SELECT doc_id,
         {bit_exprs}
  FROM tok GROUP BY doc_id
), per_doc AS (
  SELECT doc_id, {concat} AS simhash FROM perbit
), stacked AS (
{unions}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS a_sim, b.simhash AS b_sim
  FROM stacked a JOIN stacked b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, ({hamming}) AS hamming
FROM cand WHERE ({hamming}) <= {HAMMING_K}
"""


# --- n-gram Jaccard ----------------------------------------------------------------


def dedup_ngram_jaccard(spark, sf_dir):
    """Distinct-shingle Jaccard over candidate pairs that share a
    non-stop shingle; stop-shingles (df > DF_CAP) are dropped before the
    pair join to bound fan-out. Intersection AND union are computed over
    the SAME filtered universe — sizing the union from unfiltered sets
    while intersecting filtered ones (the previous shape) double-counts
    shared stop-shingles in the denominator, deflating the score until
    even IDENTICAL documents can fall below the threshold once common
    phrases dominate them."""
    sh = _shingles(spark, sf_dir).distinct()
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sh_f = sh.join(df_counts.filter(F.col("df") <= DF_CAP), "shingle")
    sizes = sh_f.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    a = sh_f.alias("a")
    b = sh_f.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.5)


def _sql_ngram_jaccard() -> str:
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle FROM documents
  )
), dfc AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
), sh_f AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle) WHERE df <= {DF_CAP}
), sizes AS (
  -- sized over the SAME filtered universe as the intersection (see the
  -- Spark docstring: an unfiltered union deflates the score)
  SELECT doc_id, count(*) AS sz FROM sh_f GROUP BY 1
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh_f a JOIN sh_f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 4) >= 0.5
"""


# --- incremental dedup over the CDC lake (signatures computed at ingest) ---------


def dedup_lake_signatures(spark, sf_dir):
    """Incremental dedup over the flagship CDC lake's FINAL STATE: the
    LSH band signatures were computed once per ingested row version
    (signatures.with_band_columns riding the MoR flatten/fold) and stored
    as lake columns; this query only STACKS the stored columns into
    (key, band_idx, band_hash) — NO shingling, no text re-scan, O(final
    rows). The DuckDB oracle independently replays the log to final
    state and recomputes the bands from content, so a hash match proves
    the incremental (at-ingest) signatures equal a from-scratch
    computation — the core incremental-dedup claim, driver-checked.
    Candidate near-dup pairs are then a plain equi-join on
    (band_idx, band_hash), exactly dedup_minhash_lsh's join shape."""
    from ..flagship import flagship_lake

    df = flagship_lake(spark).read(keep_signatures=True)
    return df.selectExpr(
        "repo", "path",
        "stack(4, 0, `__mh_band0`, 1, `__mh_band1`, 2, `__mh_band2`,"
        " 3, `__mh_band3`) AS (band_idx, band_hash)",
    )


def _sql_lake_signatures() -> str:
    from ..signatures import N_BANDS, N_MINHASH, band_sql, minhash_sql, shingles_sql
    from .engine import _oracle_ready, _replay_sql

    mh_exprs = ",\n         ".join(
        f"{minhash_sql('sh', k)} AS mh{k}" for k in range(N_MINHASH)
    )
    band_exprs = ",\n         ".join(
        "CASE WHEN content IS NULL THEN NULL ELSE "
        f"{band_sql(f'mh{2 * b}', f'mh{2 * b + 1}')} END AS band{b}"
        for b in range(N_BANDS)
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT repo, path, {b} AS band_idx, band{b} AS band_hash FROM bands"
        for b in range(N_BANDS)
    )
    # extends _replay_sql's WITH chain past the `final` CTE
    return _oracle_ready(_replay_sql(f""", sh AS (
  SELECT repo, path, content, {shingles_sql('content')} AS sh FROM final
), mh AS (
  SELECT repo, path, content,
         {mh_exprs}
  FROM sh
), bands AS (
  SELECT repo, path,
         {band_exprs}
  FROM mh
)
{unions}"""))


# --- connected components over the near-dup pair graph ---------------------------


def dedup_components(spark, sf_dir):
    """Dedup GROUP resolution — the step after LSH pair generation: every
    document labeled with its connected component's minimum doc_id (the
    canonical keeper; singletons keep their own id) over the
    dedup_minhash_lsh pair graph.

    Spark-first iterative algorithm: min-label propagation. Each round is
    one distributed shuffle (neighbor labels joined in, min per node);
    the driver loop only CHECKS convergence (changed-label count == 0) —
    the classic Pregel/GraphX shape expressed in DataFrames. Rounds
    needed = graph diameter, which for near-dup clusters (dense,
    clique-ish — band collisions are transitive-ish) is small; a
    pathological chain-shaped graph would call for the large-star/
    small-star variant, same plumbing. Labels persist per round and the
    previous round unpersists — O(V) memory, O(E) work per round at any
    scale. The DuckDB oracle computes the same components via a recursive
    reachability CTE."""
    from pyspark import StorageLevel

    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .withColumn("label", F.col("doc_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        while True:
            neigh = edges.join(
                labels, edges["v"] == labels["doc_id"]
            ).select(F.col("u").alias("doc_id"), F.col("label"))
            new_labels = (
                labels.unionByName(neigh)
                .groupBy("doc_id")
                .agg(F.min("label").alias("label"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("doc_id", F.col("label").alias("component_id"))
    finally:
        edges.unpersist()


def _sql_components() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  {_sql_minhash_bands()}
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
), walk(u, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON e.v = w.u
)
SELECT u AS doc_id, min(label) AS component_id FROM walk GROUP BY u
"""


QUERIES = {
    "dedup_exact": (dedup_exact, SQL_EXACT),
    "dedup_lake_signatures": (dedup_lake_signatures, _sql_lake_signatures()),
    "dedup_minhash_lsh": (dedup_minhash_lsh, _sql_minhash_bands()),
    "dedup_components": (dedup_components, _sql_components()),
    "dedup_simhash": (dedup_simhash, _sql_simhash()),
    "dedup_simhash_hamming": (dedup_simhash_hamming, _sql_simhash_hamming()),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, _sql_ngram_jaccard()),
}
