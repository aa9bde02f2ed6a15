"""Sequence packing: lay documents out into fixed-length training
examples (the GPT-style pre-training data step).

Pre-training consumes a token STREAM cut into fixed ``seq_len``
chunks; documents are concatenated (with one separator token each) and
may span chunk boundaries. At 100 TB a single global stream would be
one giant sequential dependency, so the layout is computed per
BUCKET: docs are grouped into deterministic buckets, each bucket forms
its own independent stream, and every bucket packs in parallel — the
standard sharded-packing compromise (chunk boundaries differ from a
single global stream only at bucket edges).

Shape: one shuffle on the bucket key; an in-partition ordered window
computes each doc's exclusive cumulative offset; chunk coordinates are
integer divisions of that offset. Deterministic on any partitioning
(bucket + doc order is a total order) and exactly reproducible in SQL.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import token_count

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def pack_sequences(
    docs: "DataFrame",
    seq_len: int = 2048,
    bucket_size: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_tokens: int = 1,
) -> "DataFrame":
    """Per-doc packing coordinates: (doc_id, bucket, n_tokens,
    offset, first_chunk, last_chunk).

    bucket = doc_id div bucket_size; within a bucket docs concatenate
    in doc_id order, each contributing token_count + ``sep_tokens``
    stream positions; ``offset`` is the doc's first stream position,
    and first/last_chunk are the ``seq_len``-sized training examples
    it touches (inclusive — a doc longer than seq_len spans several).
    Docs with zero tokens are dropped (they would occupy separator-only
    slots and their chunk span is degenerate).
    """
    if seq_len <= 0 or bucket_size <= 0:
        raise ValueError("seq_len and bucket_size must be positive")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (token_count(F.col(text_col)) + F.lit(sep_tokens)).alias("ntok"),
        F.expr(f"{id_col} div {bucket_size}").alias("bucket"),
    ).where(F.col("ntok") > sep_tokens)
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_off = base.withColumn(
        "offset", F.coalesce(F.sum("ntok").over(w), F.lit(0)).cast("long")
    )
    return with_off.select(
        "doc_id",
        "bucket",
        F.col("ntok").cast("long").alias("n_tokens"),
        "offset",
        F.expr(f"offset div {seq_len}").alias("first_chunk"),
        F.expr(f"(offset + ntok - 1) div {seq_len}").alias("last_chunk"),
    )
