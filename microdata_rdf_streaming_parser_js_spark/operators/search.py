"""Lexical full-text ranking over a ``documents(doc_id, text)`` table:
BM25 top-k with integer-exact (micro-unit) arithmetic.

Training-data pipelines use BM25-style lexical scoring for targeted
quality filtering and retrieval-based decontamination (find the corpus
documents closest to a benchmark prompt). The implementation is the
classic inverted-index shape expressed declaratively:

  tokens -> explode -> filter to query terms -> tf per (doc, term)
         -> df per term -> idf join -> per-term floored contribution
         -> per-doc integer sum -> distributed top-k

Determinism contract (cross-engine, fold-order-free): every per-term
contribution is floored to a long BEFORE the per-doc sum, and all
divisions are integer ``div`` (DuckDB ``//``). The idf is the
rational surrogate ``((N - df + 1) * scale) div (df + 1)`` —
monotone in the classic ``ln((N - df + 0.5)/(df + 0.5))`` (both are
decreasing in df), but exactly representable on both engines, unlike
``ln`` whose last-ulp behavior is libm-specific. ``idf_cap_u`` bounds
the product ``idf_u * tfnorm_u`` away from int64 overflow at crawl
scale (N ~ 1e9, singleton terms).

Scale shape: two corpus passes (one for term frequencies, one for the
N / total-token corpus stats — at crawl scale the stats pass is a
once-per-corpus aggregate you amortize across queries); the tf explode
is filtered to the query's terms scan-side (predicate on the exploded
value — tiny surviving fraction), tf/df are map-side-combined groupBys
on (doc, term) / term, corpus stats reach the plan as a broadcast
1-row frame, and the final top-k is Spark's TakeOrderedAndProject
(per-partition heap + driver merge of k rows) — no global sort
materialization. No Python UDFs anywhere.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

from pyspark.sql import functions as F

from ..functions.text import token_count
from .dedup import tokens

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def bm25_topk(
    docs: "DataFrame",
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 20,
    scale: int = 1_000_000,
    k1_u: int = 1_200_000,
    b_u: int = 750_000,
    idf_cap_u: int = 1_000_000_000_000,
) -> "DataFrame":
    """(doc_id, score_u) — top ``topk`` documents for ``query_terms``
    by integer BM25 (micro-units), ties broken by ascending doc id.

    score_u(d) = sum over matched terms t of
      (min(idf_u(t), idf_cap_u) * tfnorm_u(t, d)) div scale
    idf_u(t)    = ((N - df + 1) * scale) div (df + 1)
    tfnorm_u    = (tf * (k1_u + scale) * scale) div denom_u
    denom_u     = tf * scale + c1 + (c2 * dl) div avgdl
    with c2 = (k1_u * b_u) div scale, c1 = k1_u - c2 (plan-time
    constants), dl = whitespace token count, avgdl =
    greatest(1, total_tokens div N) (floored corpus average; clamped
    to 1 so a mostly-empty corpus cannot divide by zero).
    """
    scored = bm25_contribs(
        docs,
        query_terms,
        id_col=id_col,
        text_col=text_col,
        scale=scale,
        k1_u=k1_u,
        b_u=b_u,
        idf_cap_u=idf_cap_u,
    ).groupBy("doc_id").agg(F.sum("contrib_u").alias("score_u"))
    return scored.orderBy(F.col("score_u").desc(), F.col("doc_id")).limit(topk)


def bm25_contribs(
    docs: "DataFrame",
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    k1_u: int = 1_200_000,
    b_u: int = 750_000,
    idf_cap_u: int = 1_000_000_000_000,
) -> "DataFrame":
    """(doc_id, t, contrib_u) — the per-(document, matched-term)
    integer BM25 contribution table :func:`bm25_topk` sums per doc.
    Exposed separately because the SERVING-side optimizations need the
    per-term granularity: term max-score upper bounds (MaxScore/WAND
    pruning), impact-ordered posting lists, and per-term score
    explanations all read this table, not the final sums."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    c2 = (k1_u * b_u) // scale
    c1 = k1_u - c2

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
        token_count(F.col(text_col)).alias("dl"),
    )
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    ).localCheckpoint(eager=False)

    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("t"))
        .where(F.col("t").isin(*terms))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count("*").alias("df"))

    return (
        tf.join(F.broadcast(df), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "t",
            F.expr(
                f"(least(((n_docs - df + 1) * {scale}) div (df + 1), "
                f"       {idf_cap_u})"
                f" * ((tf * {k1_u + scale} * {scale}) div "
                f"     (tf * {scale} + {c1} + ({c2} * dl) div "
                f"      greatest(1, total_dl div n_docs)))"
                f") div {scale}"
            ).alias("contrib_u"),
        )
    )


def tfidf_top_terms(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 3,
    scale: int = 1_000_000,
    min_df: int = 1,
) -> "DataFrame":
    """(doc_id, term, score_u, rank): each document's ``topk`` most
    distinctive terms by an integer tf-idf surrogate — the keyword
    summary used for doc-level routing, clustering labels, and index
    pruning.

    ``score_u = tf * (n_docs * scale div df)`` — a rational inverse-df
    idf (same device as the BM25 idf surrogate: monotone in the real
    idf, exactly reproducible in integer arithmetic on both engines;
    log-free because IEEE ln is not a cross-engine contract).
    Tie-break (score_u DESC, term ASC) makes the rank-``topk`` cut
    deterministic.

    Shuffles: (doc, term) tf aggregation, term df aggregation, the
    df join back on term, and the per-doc rank window — all map-side
    combinable or key-partitioned; the 1-row corpus count broadcasts.
    """
    from pyspark.sql import Window

    from .dedup import shingles

    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), 1)).alias("term"),
    ).where(F.col("term") != "")
    # tf feeds both the df derivation and the scoring join — pin the
    # (doc, term) aggregate once; storage is O(index), same order as
    # its own shuffle spill
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.expr(f"tf * ((n_docs * {scale}) div df)").alias("score_u"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_u").desc(), F.col("term").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= topk)


def rrf_fuse(
    rankings: "Sequence[DataFrame]",
    k_const: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> "DataFrame":
    """(id, rrf_u, n_lists): reciprocal-rank fusion (Cormack, Clarke &
    Buettcher 2009) of several ranked lists — the standard hybrid-
    retrieval combiner (lexical BM25 + embedding cosine, the two
    retrievers this engine already builds) and the fusion step of a
    RAG/data-curation retrieval stack. Each list contributes
    floor(1e6 / (k_const + rank)) per item; absent items contribute
    nothing. Integer micro-units, so the distributed fold order and
    the DuckDB replay agree exactly; ``n_lists`` exposes how many
    retrievers surfaced the item (the usual tie-break/diagnostic).

    Shape: a union of the (already tiny: top-k each) ranked lists and
    ONE map-side-combined groupBy — fusion cost is O(k x lists)
    regardless of corpus size, because ranking happened upstream.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k_const < 1:
        raise ValueError(f"k_const must be >= 1, got {k_const}")
    u = None
    for r in rankings:
        part = r.select(
            F.col(id_col).alias("id"),
            F.expr(
                f"1000000 div ({int(k_const)} + {rank_col})"
            ).cast("long").alias("_c"),
        )
        u = part if u is None else u.unionByName(part)
    return u.groupBy("id").agg(
        F.sum("_c").cast("long").alias("rrf_u"),
        F.count("*").cast("int").alias("n_lists"),
    )


def bm25_topk_df_terms(
    docs: "DataFrame",
    terms_df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 20,
    scale: int = 1_000_000,
    k1_u: int = 1_200_000,
    b_u: int = 750_000,
    idf_cap_u: int = 1_000_000_000_000,
) -> "DataFrame":
    """:func:`bm25_topk` with a DATA-DERIVED query-term frame (single
    column ``t``) instead of plan-time literals — the second round of
    pseudo-relevance feedback, where the expanded term set comes from
    the corpus itself. ``terms_df`` is broadcast (feedback expansions
    are a handful of rows by construction); everything else is the
    identical integer BM25 algebra."""
    c2 = (k1_u * b_u) // scale
    c1 = k1_u - c2
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
        token_count(F.col(text_col)).alias("dl"),
    )
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    ).localCheckpoint(eager=False)
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("t"))
        .join(F.broadcast(terms_df.select("t").distinct()), "t")
        .groupBy("doc_id", "dl", "t")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"(least(((n_docs - df + 1) * {scale}) div (df + 1), "
                f"       {idf_cap_u})"
                f" * ((tf * {k1_u + scale} * {scale}) div "
                f"     (tf * {scale} + {c1} + ({c2} * dl) div "
                f"      greatest(1, total_dl div n_docs)))"
                f") div {scale}"
            ).alias("contrib_u"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib_u").alias("score_u"))
    )
    return scored.orderBy(F.col("score_u").desc(), F.col("doc_id")).limit(topk)


def proximity_topk(
    docs: "DataFrame",
    term_a: str,
    term_b: str,
    window: int = 5,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """(doc_id, n_pairs, rank): sloppy-phrase / proximity retrieval —
    documents where ``term_a`` and ``term_b`` co-occur within
    ``window`` token positions, ranked by the number of such position
    pairs (Lucene's PhraseQuery-with-slop semantics over a positional
    posting list; the relevance signal BM25's bag-of-words misses).

    Scale shape: positions come from one ``posexplode`` scan whose
    term filter pushes to the scan (the posting list is two slim
    (doc, pos) streams, never the corpus); the position predicate
    ``|i - j| <= window`` is NOT a theta range join — each left
    posting probes the three position buckets (``pos div (window+1)``
    ± 1) that can contain a match, making it a keyed EQUI-join with a
    residual filter, the standard banding trick for bounded-distance
    joins. Ranking is orderBy+limit (TakeOrderedAndProject — no
    global sort) with row_number only over the k survivors.
    """
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if term_a == term_b:
        raise ValueError("term_a and term_b must differ")
    bs = window + 1
    pos = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("p", "tok"),
    )
    pa = pos.where(F.col("tok") == term_a).select(
        F.col(id_col), F.col("p").alias("i")
    )
    pb = pos.where(F.col("tok") == term_b).select(
        F.col(id_col),
        F.col("p").alias("j"),
        (F.col("p") / bs).cast("long").alias("jb"),
    )
    pa_exp = pa.select(
        F.col(id_col),
        "i",
        F.explode(
            F.array(
                (F.col("i") / bs).cast("long") - 1,
                (F.col("i") / bs).cast("long"),
                (F.col("i") / bs).cast("long") + 1,
            )
        ).alias("cb"),
    )
    pairs = pa_exp.join(
        pb, (pa_exp[id_col] == pb[id_col]) & (F.col("cb") == F.col("jb"))
    ).where(F.abs(F.col("i") - F.col("j")) <= window)
    counts = pairs.groupBy(pa_exp[id_col].alias(id_col)).agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.col("n_pairs").desc(), F.col(id_col)).limit(k)
    win = Window.orderBy(F.col("n_pairs").desc(), F.col(id_col))
    return top.select(
        id_col, "n_pairs", F.row_number().over(win).cast("long").alias("rank")
    )
