"""Similarity search over the `embeddings` table (array<float>, 64-dim):
brute-force cosine top-k as the correctness baseline, and an LSH-bucketed
(sign-of-dimension hyperplane) variant as the scale path.

Numeric parity with the DuckDB oracle: both engines cast the float vectors
to double and accumulate the dot product in index order (Spark
zip_with+aggregate is sequential; DuckDB list_dot_product likewise), so
the cosines are bit-identical. Outputs avoid raw floats where possible
(pair ids + ranks); cosines are rounded to 4 decimals.

Scale path (100 TB of vectors): brute force is O(Q*N) — fine for a small
query set via broadcast (the N side streams, no shuffle); the LSH variant
prunes N to one bucket per query. A real deployment adds IVF centroids;
the bucketing/plumbing here is the same."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOP_K = 10
N_QUERIES = 5  # vec_id 0..4 are the query set


def _emb(spark, sf_dir) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_bruteforce_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # broadcast the small query side; the big side streams without shuffle
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "cos")
    )


SQL_BRUTEFORCE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.q_vec::DOUBLE[], e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.q_vec::DOUBLE[], q.q_vec::DOUBLE[]))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
               4) AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {TOP_K}
"""


# Multi-table, multi-probe LSH (round-2 single-probe recall was 0.14):
# LSH_TABLES independent sign-hyperplane tables of LSH_K bits each (table
# t hashes dims [t*K+1 .. t*K+K]); each query probes its own bucket plus
# every Hamming-1 neighbor in EVERY table (radius-1 multi-probe), and the
# candidate set is the OR over tables. Still a pure equi-join on
# (table, bucket) — never all-pairs. Tuned on the sf0.01 corpus:
# (6 tables x 6 bits, radius 1) = recall 0.88 of brute-force top-10 while
# scoring ~49% of the corpus. This corpus is near-ISOTROPIC (true top-10
# cosine 0.24-0.40 vs ~0 for random pairs => per-hyperplane collision
# 0.58 vs 0.50), the adversarial case for any sublinear ANN — on real
# clustered embeddings the same plumbing prunes far harder; the tuning
# rule is the standard 1-(1-p^k)^{L*(k+1)} recall model.
LSH_TABLES = 6
LSH_K = 6


def _band_str(vec, start: int, k: int):
    """Sign bits of dims [start+1 .. start+k] as a '0'/'1' string
    (deterministic, engine-portable)."""
    bits = [
        F.when(
            F.element_at(vec, start + i + 1).cast("double") >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for i in range(k)
    ]
    return F.concat(*bits)


def _flip_bit(bucket, i: int, k: int):
    """bucket with character i (0-based) inverted."""
    ch = F.substring(bucket, i + 1, 1)
    inv = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
    return F.concat(F.substring(bucket, 1, i), inv, F.substring(bucket, i + 2, k - i - 1))


def ann_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    vec = F.col("embedding")
    # corpus side: one (table, bucket) row per table — posexplode keeps it
    # a single scan; the join key is (tbl, bucket)
    corpus = emb.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[_band_str(vec, t * LSH_K, LSH_K) for t in range(LSH_TABLES)])
        ).alias("tbl", "bucket"),
    )
    # query side (tiny, broadcast): own bucket + all Hamming-1 probes per table
    probe_entries = []
    for t in range(LSH_TABLES):
        b = _band_str(F.col("q_vec"), t * LSH_K, LSH_K)
        probe_entries.append(F.struct(F.lit(t).alias("tbl"), b.alias("probe")))
        for i in range(LSH_K):
            probe_entries.append(
                F.struct(F.lit(t).alias("tbl"), _flip_bit(b, i, LSH_K).alias("probe"))
            )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    probes = q.select(
        "q_id", "q_vec", F.explode(F.array(*probe_entries)).alias("p")
    ).select("q_id", "q_vec", F.col("p.tbl").alias("p_tbl"), F.col("p.probe").alias("probe"))

    cand = (
        corpus.join(
            F.broadcast(probes),
            (F.col("tbl") == F.col("p_tbl"))
            & (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        # a pair can collide in several tables — score it once
        .dropDuplicates(["q_id", "vec_id"])
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "cos")
    )


def _sql_band(col: str, start: int, k: int) -> str:
    bits = " || ".join(
        f"CASE WHEN {col}[{start + i + 1}]::DOUBLE >= 0 THEN '1' ELSE '0' END"
        for i in range(k)
    )
    return f"({bits})"


def _sql_flip(band_col: str, i: int, k: int) -> str:
    return (
        f"substr({band_col}, 1, {i}) || "
        f"(CASE WHEN substr({band_col}, {i + 1}, 1) = '1' THEN '0' ELSE '1' END)"
        + (f" || substr({band_col}, {i + 2}, {k - i - 1})" if i < k - 1 else "")
    )


def _sql_lsh() -> str:
    band_cols = ",\n         ".join(
        f"{_sql_band('embedding', t * LSH_K, LSH_K)} AS band{t}"
        for t in range(LSH_TABLES)
    )
    corpus = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, band{t} AS bucket FROM b"
        for t in range(LSH_TABLES)
    )
    probe_selects = []
    for t in range(LSH_TABLES):
        probe_selects.append(
            f"SELECT vec_id AS q_id, embedding AS q_vec, {t} AS tbl, band{t} AS probe "
            f"FROM b WHERE vec_id < {N_QUERIES}"
        )
        for i in range(LSH_K):
            probe_selects.append(
                f"SELECT vec_id AS q_id, embedding AS q_vec, {t} AS tbl, "
                f"{_sql_flip(f'band{t}', i, LSH_K)} AS probe "
                f"FROM b WHERE vec_id < {N_QUERIES}"
            )
    probes = " UNION ALL ".join(probe_selects)
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         {band_cols}
  FROM embeddings
), corpus AS (
  {corpus}
), probes AS (
  {probes}
), cand AS (
  SELECT DISTINCT p.q_id, c.vec_id, p.q_vec, c.embedding
  FROM corpus c JOIN probes p
    ON c.tbl = p.tbl AND c.bucket = p.probe AND c.vec_id <> p.q_id
), scored AS (
  SELECT q_id, vec_id AS neighbor_id,
         round(list_dot_product(q_vec::DOUBLE[], embedding::DOUBLE[])
               / (sqrt(list_dot_product(q_vec::DOUBLE[], q_vec::DOUBLE[]))
                  * sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),
               4) AS cos
  FROM cand
), ranked AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {TOP_K}
"""


SQL_LSH = _sql_lsh()


N_CENTROIDS = 8  # IVF coarse quantizer size (deterministic seed vectors)
# Multi-probe (round 3; single-probe recall was 0.24): each query probes
# its N_PROBE nearest centroids' posting lists — the standard IVF nprobe
# knob. Measured on sf0.01: nprobe 3/4/5 => recall 0.44/0.54/0.78 of
# brute-force top-10. The corpus is near-isotropic (no cluster structure
# for the quantizer to exploit — see the LSH note above), which is why
# the multi-TABLE LSH reaches higher recall per candidate scanned here;
# on real clustered embeddings IVF's posting lists align with the data
# and nprobe stays small. pytest gates recall >= 0.7 at nprobe=5.
N_PROBE = 5


def _seed_centroids(emb: DataFrame) -> DataFrame:
    """The deterministic coarse quantizer: centroids = the vectors with
    vec_id in [N_QUERIES, N_QUERIES+N_CENTROIDS). Seeded (not trained) so
    the DuckDB oracle can reproduce them bit-exactly."""
    return emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CENTROIDS)
    ).select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))


def kmeans_refine_centroids(spark, sf_dir, iters: int = 3) -> DataFrame:
    """Spherical k-means (Lloyd) refinement of the seeded IVF centroids,
    entirely in DataFrame ops. Each iteration: (1) broadcast the k
    centroids and assign every corpus vector to its nearest by cosine
    (one narrow pass, no shuffle on the corpus side beyond the window's
    per-vec_id rank — k rows per vector); (2) posexplode the assigned
    vectors to (cluster, pos, val) and sum/count per (cluster, pos) —
    map-side partial aggregation reduces the shuffle to
    O(k x dim x partitions); (3) collect the k x dim sums (tiny) to the
    driver, take the mean, L2-normalize (spherical variant: centroids
    live on the unit sphere, so cosine assignment == dot assignment),
    and keep the previous centroid for any empty cluster.

    At 100 TB you train on a bounded sample (k-means converges on a
    sample; the full-corpus pass is only needed for the final posting
    lists) — the per-iteration cost here is already linear with a k x dim
    driver footprint. Deterministic up to floating-point summation order
    (partial sums combine in partition order), which is why the refined
    quantizer is gated by a recall test rather than a bit-exact SQL
    oracle: the oracle row keeps the seeded quantizer, same plan shape."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    prev = {
        int(r["c_id"]): [float(x) for x in r["c_vec"]]
        for r in _seed_centroids(_emb(spark, sf_dir)).collect()
    }
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(prev.items())],
            "c_id int, c_vec array<double>",
        )
        scored = emb.join(F.broadcast(cent_df)).select(
            "vec_id",
            "embedding",
            "c_id",
            _cosine(F.col("embedding"), F.col("c_vec")).alias("c_cos"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("c_cos").desc(), F.col("c_id").asc()
        )
        best = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("c_id", "embedding")
        )
        parts = (
            best.select("c_id", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("c_id", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        sums: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in parts:
            sums.setdefault(r["c_id"], {})[r["pos"]] = r["s"]
            counts[r["c_id"]] = r["n"]
        nxt = {}
        for cid, vec in prev.items():
            if cid not in counts:  # empty cluster: keep the old centroid
                nxt[cid] = vec
                continue
            mean = [sums[cid][p] / counts[cid] for p in range(len(vec))]
            norm = sum(x * x for x in mean) ** 0.5
            nxt[cid] = [x / norm for x in mean] if norm > 0 else vec
        prev = nxt
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(prev.items())],
        "c_id int, c_vec array<double>",
    )


def ann_ivf_topk(spark, sf_dir, kmeans_iters: int = 0):
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    posting lists by nearest centroid; each query probes its N_PROBE
    nearest centroids' lists (multi-probe), then exact cosine top-k ranks
    the candidates. At 100 TB the assignment is one broadcast pass
    (centroids are tiny) and the probe is an equi-join on centroid id —
    no all-pairs scan. Default quantizer = deterministic seed vectors
    (keeps the DuckDB oracle bit-exact); kmeans_iters > 0 swaps in the
    Lloyd-refined quantizer (`kmeans_refine_centroids`) — identical plan
    shape, recall gated by tests/test_ann.py instead of the SQL oracle
    (distributed float summation isn't bit-deterministic)."""
    emb = _emb(spark, sf_dir)
    cent = (
        kmeans_refine_centroids(spark, sf_dir, iters=kmeans_iters)
        if kmeans_iters
        else _seed_centroids(emb)
    )

    def assign(df, vec_col, out, n_keep=1):
        # nearest centroid(s) by cosine; ties break on centroid id
        scored = df.join(F.broadcast(cent)).select(
            *df.columns,
            F.col("c_id"),
            _cosine(F.col(vec_col), F.col("c_vec")).alias("c_cos"),
        )
        w = Window.partitionBy(*df.columns[:1]).orderBy(
            F.col("c_cos").desc(), F.col("c_id").asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_keep)
            .select(*df.columns, F.col("c_id").alias(out))
        )

    corpus = assign(
        emb.select("vec_id", "embedding"), "embedding", "list_id"
    )
    q = assign(
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")),
        "q_vec",
        "q_list",
        n_keep=N_PROBE,
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("list_id") == F.col("q_list")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "neighbor_id", "rank", "cos")
    )


_SQL_COS = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    " * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)

SQL_IVF = f"""
WITH cent AS (
  SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CENTROIDS}
), corpus AS (
  SELECT vec_id, embedding, list_id FROM (
    SELECT e.vec_id, e.embedding, c.c_id AS list_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.c_vec')} DESC, c.c_id ASC) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
), q AS (
  SELECT q_id, q_vec, q_list FROM (
    SELECT e.vec_id AS q_id, e.embedding AS q_vec, c.c_id AS q_list,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.c_vec')} DESC, c.c_id ASC) AS rn
    FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
), scored AS (
  SELECT q.q_id, corpus.vec_id AS neighbor_id,
         round({_SQL_COS.format(a='q.q_vec', b='corpus.embedding')}, 4) AS cos
  FROM corpus JOIN q ON corpus.list_id = q.q_list AND corpus.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {TOP_K}
"""


NEARDUP_THRESHOLD = 0.35
NEARDUP_BAND_BITS = 6
NEARDUP_BANDS = 2  # band b = sign bits of dims [b*6+1 .. b*6+6]


def _band(vec, b: int):
    bits = [
        F.when(
            F.element_at(vec, b * NEARDUP_BAND_BITS + i + 1).cast("double") >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for i in range(NEARDUP_BAND_BITS)
    ]
    return F.concat(*bits)


def emb_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH:
    candidates share at least ONE of two 6-bit sign bands (equi-join per
    band, union, distinct), then the exact cosine filter runs on the
    candidates only. No all-pairs comparison anywhere — the per-band
    equi-join is the scalable LSH shape; recall comes from OR-ing bands
    (a 0.35-cosine pair survives a single band with ~6% probability each,
    and genuinely near-duplicate vectors with cosine near 1 collide in
    every band). Pair ids only in the output."""
    emb = _emb(spark, sf_dir)
    sides = []
    for b in range(NEARDUP_BANDS):
        s = emb.select(
            "vec_id",
            F.lit(b).alias("band_idx"),
            _band(F.col("embedding"), b).alias("band"),
            F.col("embedding"),
        )
        sides.append(s)
    stacked = sides[0]
    for s in sides[1:]:
        stacked = stacked.unionByName(s)
    a = stacked.alias("a")
    b = stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.embedding").alias("va"),
            F.col("b.embedding").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.filter(
        _cosine(F.col("va"), F.col("vb")) >= NEARDUP_THRESHOLD
    ).select("id_a", "id_b")


def _sql_sign_band(col: str, b: int) -> str:
    # named distinctly from the quantile-band _sql_band(col, start, k)
    # above: an identical name silently shadowed it after module
    # evaluation (flake8 F811), making _sql_lsh() a latent TypeError
    # for any post-import caller
    bits = " || ".join(
        f"CASE WHEN {col}[{b * NEARDUP_BAND_BITS + i + 1}]::DOUBLE >= 0 THEN '1' ELSE '0' END"
        for i in range(NEARDUP_BAND_BITS)
    )
    return f"({bits})"


SQL_NEARDUP = f"""
WITH stacked AS (
  {" UNION ALL ".join(
      f"SELECT vec_id, {b} AS band_idx, {_sql_sign_band('embedding', b)} AS band, embedding FROM embeddings"
      for b in range(NEARDUP_BANDS)
  )}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS va, b.embedding AS vb
  FROM stacked a JOIN stacked b
    ON a.band_idx = b.band_idx AND a.band = b.band AND a.vec_id < b.vec_id
)
SELECT id_a, id_b FROM cand
WHERE list_dot_product(va::DOUBLE[], vb::DOUBLE[])
      / (sqrt(list_dot_product(va::DOUBLE[], va::DOUBLE[]))
         * sqrt(list_dot_product(vb::DOUBLE[], vb::DOUBLE[]))) >= {NEARDUP_THRESHOLD}
"""


QUERIES = {
    "ann_bruteforce_topk": (ann_bruteforce_topk, SQL_BRUTEFORCE),
    "ann_lsh_topk": (ann_lsh_topk, SQL_LSH),
    "ann_ivf_topk": (ann_ivf_topk, SQL_IVF),
    "emb_neardup_pairs": (emb_neardup_pairs, SQL_NEARDUP),
}
