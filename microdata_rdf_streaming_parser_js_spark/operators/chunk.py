"""Sliding-window chunking with overlap: cut each document into
fixed-size overlapping token windows (the RAG-indexing / long-context
training-prep step; complements operators/pack.py, which packs WHOLE
docs into a token stream, and operators/dedup.py cdc_chunks, which
cuts on content-defined BYTE boundaries).

Each doc of n tokens yields windows starting at 0, stride, 2*stride,
... while start <= n-1; a window covers tokens
[start, start + min(window, n - start)).  The trailing partial window
is kept (standard RAG chunking), and overlap = window - stride tokens
of context are shared between neighbours.

Scale shape: chunk generation is a scan-side explode of an integer
``sequence`` — zero shuffles, zero Python, embarrassingly parallel at
any corpus size (pinned in tests/test_plans.py).  The chunk-level
duplicate scan (``chunk_dup_stats``) is the chunk-granularity twin of
exact_dedup (operators/dedup.py), catching shared boilerplate that
whole-doc digests miss; its distinct-doc count deliberately takes
Spark's two-exchange distinct rewrite (partial counts keyed on
(digest, doc) map-side first) rather than a single-shuffle
collect_set, which would buffer every doc id of a viral chunk in one
aggregation state.  Both are exactly reproducible in SQL: tokenization is
the registry-wide whitespace normalization and the digest is md5, so
the DuckDB oracle recomputes chunks bit-identically.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def chunk_windows(
    docs: "DataFrame",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> "DataFrame":
    """Explode ``docs`` into overlapping token windows.

    Returns (id_col, chunk_idx, start_tok, n_toks, chunk_hash) with
    chunk_idx = start_tok // stride.  NULL text is treated as the
    empty string; splitting "" yields one empty token on both engines,
    so every doc emits at least one chunk (deterministic, no
    empty-sequence edge).
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    toks = F.split(
        F.regexp_replace(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
        ),
        " ",
    )
    n = F.size(toks)
    out = (
        docs.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"))
        .select(
            id_col,
            "_toks",
            "_n",
            F.explode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
            ).alias("start_tok"),
        )
        .select(
            id_col,
            (F.col("start_tok") / stride).cast("int").alias("chunk_idx"),
            F.col("start_tok").cast("int").alias("start_tok"),
            F.least(F.lit(window), F.col("_n") - F.col("start_tok"))
            .cast("int")
            .alias("n_toks"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("_toks"),
                        F.col("start_tok") + 1,
                        F.least(F.lit(window), F.col("_n") - F.col("start_tok")),
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )
    return out


def chunk_dup_stats(chunks: "DataFrame", *, id_col: str = "doc_id") -> "DataFrame":
    """Chunk-granularity duplicate scan over ``chunk_windows`` output:
    groupBy on the chunk digest keeping only digests seen more than
    once.  Returns (chunk_hash, n_occurrences, n_docs, first_doc);
    the distinct-doc count plans as the two-exchange distinct rewrite
    (see module docstring)."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .where(F.col("n_occurrences") > 1)
    )
