"""Final-state read-path query surface (SURVEY.md section 2.5 Q1-Q14):
the queries the reference's serving side supports (filter / set membership
/ range / and-or / sort / paginate / project / point lookup / JSON
expression lookup), as plain DataFrame ops over the driver tables, each
with a DuckDB oracle. Q10/Q11 (highlighting, tenancy transport) are
explicit non-goals (SURVEY.md section 7.4)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Q1: full-text keyword search (content contains)
def q1_fulltext_search(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("text").contains("merge")).select("doc_id", "source", "n_chars")


SQL_Q1 = "SELECT doc_id, source, n_chars FROM documents WHERE text LIKE '%merge%'"


# Q2: equality filter
def q2_equality_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("source") == "src0").select("doc_id", "n_chars")


SQL_Q2 = "SELECT doc_id, n_chars FROM documents WHERE source = 'src0'"


# Q3: set membership over a scalar and over an array field
def q3_set_membership(spark, sf_dir):
    """Set membership, BOTH shapes in one driver row: scalar IN over a
    value set (lineitem) and array_contains over an array column
    (documents) — Meilisearch's `IN` filter and array-field filter."""
    li = _t(spark, sf_dir, "lineitem")
    scalar = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.lit("flag_"), F.col("l_returnflag")).alias("pred"), "n"
        )
    )
    docs = _t(spark, sf_dir, "documents")
    arr = docs.filter(
        F.array_contains(F.split(F.col("text"), " "), "vector")
    ).agg(
        F.lit("array_vector").alias("pred"), F.count(F.lit(1)).alias("n")
    )
    return scalar.unionByName(arr)


SQL_Q3 = """
SELECT 'flag_' || l_returnflag AS pred, count(*) AS n FROM lineitem
WHERE l_returnflag IN ('A', 'R') GROUP BY 1
UNION ALL
SELECT 'array_vector' AS pred, count(*) AS n FROM documents
WHERE list_contains(string_split(text, ' '), 'vector')
"""


# Q4: range filter
def q4_range_filter(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_totalprice").between(1000.0, 5000.0)).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


SQL_Q4 = """
SELECT count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_totalprice BETWEEN 1000.0 AND 5000.0
"""


# Q5: conjunctive multi-filter
def q5_conjunctive(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= 10.0)
            & (F.col("user_id") < 50)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


SQL_Q5 = """
SELECT user_id, count(*) AS n_purchases FROM events
WHERE event_type = 'purchase' AND value >= 10.0 AND user_id < 50
GROUP BY user_id
"""


# Q6: disjunctive filter
def q6_disjunctive(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").contains("vector") | F.col("text").contains("stream")
    ).select("doc_id", "source")


SQL_Q6 = """
SELECT doc_id, source FROM documents
WHERE text LIKE '%vector%' OR text LIKE '%stream%'
"""


# Q7+Q8: multi-key sort with offset/limit pagination (page 2 of 20, total
# ordering via unique tiebreak). Scale shape: page offset+limit rows via
# orderBy().limit() — Catalyst compiles that to TakeOrderedAndProject
# (per-partition partial top-K, no global sort, no single-task window) —
# then rank WITHIN the 40-row page, which is driver-trivial at any scale.
def q7_sort_paginate(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    page = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(40)
        .select("o_orderkey", "o_totalprice")
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        page.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 20)
        .select("rn", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


SQL_Q7 = """
WITH ranked AS (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT rn, o_orderkey, round(o_totalprice, 2) AS price
FROM ranked WHERE rn > 20 AND rn <= 40
"""


# Q9: column projection (pruned scan)
def q9_projection(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") <= 100).select("p_partkey", "p_brand", "p_size")


SQL_Q9 = "SELECT p_partkey, p_brand, p_size FROM part WHERE p_partkey <= 100"


# Q10: the search-proxy niceties previously declared non-goals, now
# covered: highlight snippets (Meilisearch _formatted analog,
# api.ts:24-28), fuzzy/typo-tolerant matching (Meili typo tolerance), and
# field-weighted ranking (searchableAttributes order). All expressed with
# engine-portable string functions so DuckDB oracles them bit-for-bit.


def q10_highlight_snippets(spark, sf_dir):
    """Highlight: wrap every 'vector' occurrence in <em> tags and return
    a fixed-width snippet starting at the first hit."""
    docs = _t(spark, sf_dir, "documents")
    hit = F.locate("vector", F.col("text"))
    snippet = F.substring(
        F.regexp_replace(F.col("text"), "vector", "<em>vector</em>"),
        1, 120,
    )
    return (
        docs.filter(hit > 0)
        .select("doc_id", hit.alias("first_hit"), snippet.alias("snippet"))
    )


SQL_Q10_HIGHLIGHT = """
SELECT doc_id,
       position('vector' IN text) AS first_hit,
       substring(regexp_replace(text, 'vector', '<em>vector</em>', 'g'), 1, 120) AS snippet
FROM documents WHERE position('vector' IN text) > 0
"""


def q10_fuzzy_search(spark, sf_dir):
    """Typo tolerance: docs containing a token within edit distance 1 of
    the (misspelled) query term 'vektor'."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    return (
        tok.filter(F.levenshtein(F.col("t"), F.lit("vektor")) <= 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fuzzy_hits"))
    )


SQL_Q10_FUZZY = """
SELECT doc_id, count(*) AS n_fuzzy_hits FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
) WHERE levenshtein(t, 'vektor') <= 1
GROUP BY doc_id
"""


def q10_field_weighted_rank(spark, sf_dir):
    """Field weights: source-field hits count 3x text-field hits; top 20
    by score with doc_id tiebreak (total ordering before the limit)."""
    docs = _t(spark, sf_dir, "documents")
    text_hits = F.size(F.split(F.col("text"), "stream")) - 1
    src_hit = F.when(F.col("source").contains("1"), F.lit(1)).otherwise(F.lit(0))
    score = (F.lit(3) * src_hit + text_hits).alias("score")
    return (
        docs.select("doc_id", score)
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


SQL_Q10_WEIGHTED = """
SELECT doc_id,
       3 * (CASE WHEN source LIKE '%1%' THEN 1 ELSE 0 END)
         + (len(string_split(text, 'stream')) - 1) AS score
FROM documents
WHERE 3 * (CASE WHEN source LIKE '%1%' THEN 1 ELSE 0 END)
      + (len(string_split(text, 'stream')) - 1) > 0
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q10_proximity_rank(spark, sf_dir):
    """Proximity ranking (Meilisearch rule #3, 搜索接口.md:86-127): docs
    where the two query terms appear CLOSER together rank higher. The
    minimal token distance between any 'vector' and any 'stream'
    occurrence is computed purely with array expressions (no join, no
    explode — one pass per row): positions of each term, then the min of
    all pairwise |a-b|. Top 20 by closeness with doc_id tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")

    def positions(term: str):
        return F.filter(
            F.transform(w, lambda x, i: F.when(x == term, i + 1)),
            lambda x: x.isNotNull(),
        )

    p1, p2 = positions("vector"), positions("stream")
    min_dist = F.array_min(
        F.flatten(F.transform(p1, lambda a: F.transform(p2, lambda b: F.abs(a - b))))
    )
    return (
        docs.select("doc_id", min_dist.alias("min_dist"))
        .filter(F.col("min_dist").isNotNull())
        .orderBy(F.col("min_dist").asc(), F.col("doc_id").asc())
        .limit(20)
    )


SQL_Q10_PROXIMITY = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), p AS (
  SELECT doc_id,
         list_filter(range(1, len(w) + 1), i -> w[i] = 'vector') AS p1,
         list_filter(range(1, len(w) + 1), i -> w[i] = 'stream') AS p2
  FROM d
)
SELECT doc_id,
       list_min(flatten(list_transform(p1,
                a -> list_transform(p2, b -> abs(a - b))))) AS min_dist
FROM p
WHERE len(p1) > 0 AND len(p2) > 0
ORDER BY min_dist ASC, doc_id ASC LIMIT 20
"""


def q10_exactness_rank(spark, sf_dir):
    """Words + exactness ranking (Meilisearch rules #1 and #5,
    Meilisearch 真实场景.md:499-549): score = 2 per matched query term,
    +1 when the exact phrase matches — so any doc with both terms beats
    any doc with one, and exact-phrase docs win ties. Top 20 with doc_id
    tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_terms = (
        F.when(t.contains("vector"), 1).otherwise(0)
        + F.when(t.contains("stream"), 1).otherwise(0)
    )
    exact = F.when(t.contains("vector stream"), 1).otherwise(0)
    score = (n_terms * 2 + exact).alias("score")
    return (
        docs.select("doc_id", score)
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


SQL_Q10_EXACTNESS = """
SELECT doc_id,
       2 * ((CASE WHEN text LIKE '%vector%' THEN 1 ELSE 0 END)
            + (CASE WHEN text LIKE '%stream%' THEN 1 ELSE 0 END))
       + (CASE WHEN text LIKE '%vector stream%' THEN 1 ELSE 0 END) AS score
FROM documents
WHERE (CASE WHEN text LIKE '%vector%' THEN 1 ELSE 0 END)
      + (CASE WHEN text LIKE '%stream%' THEN 1 ELSE 0 END) > 0
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


# Q12: list-latest (filter + order by recency + limit)
def q12_list_latest(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .orderBy(F.col("event_id").desc())
        .limit(20)
        .select("event_id", "user_id")
    )


SQL_Q12 = """
SELECT event_id, user_id FROM events
WHERE event_type = 'click' ORDER BY event_id DESC LIMIT 20
"""


# Q13: point lookup by primary key
def q13_point_lookup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") == 42).select("doc_id", "lang", "source", "n_chars")


SQL_Q13 = "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42"


# Q14: JSON expression lookup (the GIN-index analog)
def q14_json_lookup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.filter(k.between(30, 60))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_Q14 = """
SELECT event_type, count(*) AS n FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 30 AND 60
GROUP BY event_type
"""


# Top-K per group (serving-side ranking pattern)
def q_topk_per_group(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


SQL_TOPK = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, rn FROM ranked WHERE rn <= 3
"""


# TPC-H Q1 shape: the aggregation headliner (decimal-exact sums)
def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# Broadcast-join rollup (dimension join the sink's consumers run)
def q_join_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


SQL_JOIN_ROLLUP = """
SELECT n_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {
    "q1_fulltext_search": (q1_fulltext_search, SQL_Q1),
    "q2_equality_filter": (q2_equality_filter, SQL_Q2),
    "q3_set_membership": (q3_set_membership, SQL_Q3),
    "q4_range_filter": (q4_range_filter, SQL_Q4),
    "q5_conjunctive": (q5_conjunctive, SQL_Q5),
    "q6_disjunctive": (q6_disjunctive, SQL_Q6),
    "q7_sort_paginate": (q7_sort_paginate, SQL_Q7),
    "q9_projection": (q9_projection, SQL_Q9),
    "q10_highlight_snippets": (q10_highlight_snippets, SQL_Q10_HIGHLIGHT),
    "q10_fuzzy_search": (q10_fuzzy_search, SQL_Q10_FUZZY),
    "q10_field_weighted_rank": (q10_field_weighted_rank, SQL_Q10_WEIGHTED),
    "q10_proximity_rank": (q10_proximity_rank, SQL_Q10_PROXIMITY),
    "q10_exactness_rank": (q10_exactness_rank, SQL_Q10_EXACTNESS),
    "q12_list_latest": (q12_list_latest, SQL_Q12),
    "q13_point_lookup": (q13_point_lookup, SQL_Q13),
    "q14_json_lookup": (q14_json_lookup, SQL_Q14),
    "q_topk_per_group": (q_topk_per_group, SQL_TOPK),
    "q_tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "q_join_rollup": (q_join_rollup, SQL_JOIN_ROLLUP),
}
