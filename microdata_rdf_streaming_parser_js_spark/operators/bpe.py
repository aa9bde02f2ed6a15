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


def _apply_merge(tok: "F.Column", a: str, b: str):  # type: ignore[name-defined]
    """Merge every adjacent (a, b) token pair in a space-separated
    token string, leftmost-non-overlapping (the BPE greedy rule).

    Token separators are doubled first so neighboring occurrences
    never share a boundary space ('a b a b' merges BOTH pairs), then
    collapsed back. Identical literal-replace semantics in DuckDB:
      trim(regexp_replace(replace(' ' || replace(tok,' ','  ') || ' ',
           ' a  b ', ' ab '), ' +', ' ', 'g'))
    """
    padded = F.concat(
        F.lit(" "), F.regexp_replace(tok, " ", "  "), F.lit(" ")
    )
    merged = F.replace(
        padded, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
    )
    return F.trim(F.regexp_replace(merged, " +", " "))


def bpe_train(
    docs: "DataFrame",
    text_col: str = "text",
    n_merges: int = 3,
) -> "DataFrame":
    """(round, pair, cnt): the first ``n_merges`` BPE merge decisions
    (Sennrich et al. 2016) — the actual iterative tokenizer-training
    loop, not just round one's statistic.

    Scale shape: the corpus collapses to its VOCABULARY first (one
    shuffle; the 100 TB -> ~10M-row reduction), then every merge round
    runs entirely on the vocabulary table: adjacent-pair explode ->
    weighted count (map-side combined shuffle) -> argmax via a
    single-row TakeOrderedAndProject collect (the k-means-centroid
    class of driver collect: one decision row per round, never data)
    -> literal-replace merge applied scan-side. The vocabulary is
    localCheckpointed once so rounds don't recompute the corpus scan.

    Determinism: counts are exact integers; the argmax tie-breaks
    (cnt desc, pair asc) — a total order both engines replay. The
    vocabulary is restricted to ^[a-z]+$ words (post-_NORM) so
    char-splitting semantics can't diverge on multibyte code points.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    from ..functions.text import _tokens

    words = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    vocab = words.select(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("tok"),
        "freq",
    ).localCheckpoint()
    merges = []
    for r in range(1, n_merges + 1):
        arr = F.split(F.col("tok"), " ")
        pairs = vocab.where(F.size(arr) > 1).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(tok, ' ')) - 1), "
                    "i -> concat(element_at(split(tok, ' '), i), ' ', "
                    "element_at(split(tok, ' '), i + 1)))"
                )
            ).alias("pair"),
            "freq",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0].pair, top[0].cnt
        merges.append((r, pair, cnt))
        a, b = pair.split(" ")
        vocab = vocab.select(
            _apply_merge(F.col("tok"), a, b).alias("tok"), "freq"
        ).localCheckpoint()
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "round long, pair string, cnt long"
    )


def bpe_encode(
    docs: "DataFrame",
    merges: list[tuple[str, str]],
    text_col: str = "text",
    top_n: int = 50,
) -> "DataFrame":
    """(token, cnt): corpus token frequencies after applying a trained
    BPE merge list IN ORDER — the encode step that pairs with
    :func:`bpe_train` (train on one corpus, tokenize any other).

    Same scale shape as training: the corpus collapses to its
    vocabulary first, every merge is a scan-side literal replace over
    the vocab table, and the final token histogram is one map-side-
    combined shuffle + TakeOrderedAndProject. Deterministic total
    order (cnt desc, token asc) at the top-N cut.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from ..functions.text import _tokens

    words = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    tok = F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 "))
    for a, b in merges:
        tok = _apply_merge(tok, a, b)
    return (
        words.select(F.explode(F.split(tok, " ")).alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_n)
    )
