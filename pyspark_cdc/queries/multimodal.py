"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
mapInPandas. The container has no image/audio libraries, so the DECODE
step is a deterministic fake (clearly marked); everything Spark-side —
binary encoding, schema, batch iteration, row-expanding frame sampling,
partitioning — is real and oracle-checked (the fakes are pure functions
of (doc_id, byte length), so DuckDB can mirror them)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

FRAME_MOD = 4  # fake video length: 1 + doc_id % FRAME_MOD frames


def _docs_bin(spark, sf_dir):
    """documents.text encoded as an opaque binary payload column — the
    stand-in for image/audio bytes."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        "lang",
    )


def _fake_decode(doc_id: pd.Series, n_bytes: pd.Series) -> pd.DataFrame:
    """STUB for the real decoder. A real deployment replaces this body
    with e.g. PIL.Image.open(io.BytesIO(b)) — the UDF signature, Arrow
    batching and output schema stay identical. Deterministic fake:
    dimensions derived from (doc_id, n_bytes)."""
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "n_bytes": n_bytes,
            "width": 64 + (doc_id % 512),
            "height": 64 + (n_bytes % 512),
            "format": "fake/rgb8",
        }
    )


def mm_decode_metadata(spark, sf_dir):
    """Binary payload -> typed metadata via mapInPandas (Arrow batches)."""
    df = _docs_bin(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield _fake_decode(pdf["doc_id"], n_bytes)

    return df.mapInPandas(
        decode, schema="doc_id long, n_bytes long, width long, height long, format string"
    )


SQL_DECODE = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       64 + (doc_id % 512) AS width,
       64 + (octet_length(encode(text)) % 512) AS height,
       'fake/rgb8' AS format
FROM documents
"""


def mm_frame_sample(spark, sf_dir):
    """Row-expanding frame sampling (video -> frames) in mapInPandas:
    each payload yields 1 + doc_id % {FRAME_MOD} frame rows with a
    deterministic per-frame fingerprint offset."""
    df = _docs_bin(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reps = (pdf["doc_id"] % FRAME_MOD + 1).astype("int64")
            idx = pdf.index.repeat(reps)
            out = pdf.loc[idx, ["doc_id"]].reset_index(drop=True)
            out["frame_idx"] = [i for r in reps for i in range(r)]
            out["frame_bytes"] = pdf.loc[idx, "payload"].map(len).reset_index(drop=True)
            yield out[["doc_id", "frame_idx", "frame_bytes"]]

    return df.mapInPandas(sample, schema="doc_id long, frame_idx long, frame_bytes long")


SQL_FRAME_SAMPLE = f"""
SELECT doc_id, unnest(range(0, doc_id % {FRAME_MOD} + 1)) AS frame_idx,
       octet_length(encode(text)) AS frame_bytes
FROM documents
"""


QUERIES = {
    "mm_decode_metadata": (mm_decode_metadata, SQL_DECODE),
    "mm_frame_sample": (mm_frame_sample, SQL_FRAME_SAMPLE),
}
