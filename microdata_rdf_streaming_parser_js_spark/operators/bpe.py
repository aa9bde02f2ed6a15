"""BPE tokenizer training, step one: weighted adjacent-pair counts.

Byte-pair-encoding training (Sennrich et al. 2016) is an iterative
merge loop, but at corpus scale virtually all the cost is the FIRST
statistic: count every adjacent symbol pair across the corpus,
weighted by word frequency. That statistic is what this operator
computes, in the natural distributed shape:

  tokens -> groupBy(word) count          (shuffle 1, map-side combine,
                                          collapses the corpus to its
                                          vocabulary — the 100 TB ->
                                          ~10M-row reduction happens
                                          here, FIRST)
  vocab  -> explode char bigrams         (scan-side transform/sequence,
                                          no Python)
         -> groupBy(pair) sum(word_cnt)  (shuffle 2, map-side combine)
         -> top-N                        (TakeOrderedAndProject, no
                                          full sort)

Subsequent merge iterations re-run the same shape over the (tiny)
vocabulary table only — the corpus is never re-scanned, which is why
pair counting over the vocab, not the raw text, is the scalable
formulation.

Everything is integer counts over exact string ops, so the DuckDB
oracle (list_transform/range/substr) reproduces it exactly; ties at
the top-N boundary break on the pair string ascending in both engines.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def bpe_pair_counts(
    docs: "DataFrame",
    text_col: str = "text",
    top_n: int = 50,
) -> "DataFrame":
    """(pair, cnt): the ``top_n`` most frequent adjacent character
    pairs across the corpus, weighted by word occurrence count — the
    argmax of round one of BPE training. Deterministic total order:
    cnt desc, pair asc."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from ..functions.text import _tokens

    toks = docs.select(
        F.explode(_tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("wc"))
        .where(F.length("w") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)-1), i -> substring(w, i, 2))")
        ).alias("pair"),
        F.col("wc"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )
