"""Text-analysis operators for a training-data pipeline over `documents`:
token counting (whitespace + BPE-ish regex), quality scoring (stopword /
punctuation / length ratios), n-gram-heuristic language ID, and document
fingerprinting. All native Spark SQL expressions; every formula is
mirrored exactly in the DuckDB oracle (1-based element_at matches DuckDB
list indexing; md5 is identical across engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOP_SQL = "('" + "','".join(STOPWORDS) + "')"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks():
    return F.split(F.col("text"), " ")


# --- token counting + quality scoring + language ID (one driver row) --------


def text_quality_score(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex), quality scoring
    (stopword ratio, avg token length, char length) AND the
    stopword-heuristic language ID in one row — all three operators
    share the tokenization and a row per document (the q3b/token-count
    fold precedent; every metric keeps its oracle evidence)."""
    toks = _toks()
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = F.round(n_stop.cast("double") / n_tok, 4)
    avg_tok_len = F.round(
        (F.length("text") - (n_tok - 1)).cast("double") / n_tok, 4
    )
    bpe = F.expr(r"size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
    lang_pred = F.when(
        n_stop.cast("double") / n_tok > 0.02, F.lit("en")
    ).otherwise(F.lit("und"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        avg_tok_len.alias("avg_token_len"),
        lang_pred.alias("lang_pred"),
        F.col("lang").alias("lang_true"),
    )


SQL_QUALITY = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
       length(text) AS n_chars,
       len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS n_stopwords,
       round(CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS stop_ratio,
       round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS avg_token_len,
       CASE WHEN CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')) > 0.02
            THEN 'en' ELSE 'und' END AS lang_pred,
       lang AS lang_true
FROM documents
"""


# --- document fingerprinting ---------------------------------------------------


def text_fingerprint(spark, sf_dir):
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


SQL_FINGERPRINT = """
SELECT md5(lower(trim(text))) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS canonical_id
FROM documents GROUP BY 1
"""


QUERIES = {
    "text_quality_score": (text_quality_score, SQL_QUALITY),
    "text_fingerprint": (text_fingerprint, SQL_FINGERPRINT),
}
