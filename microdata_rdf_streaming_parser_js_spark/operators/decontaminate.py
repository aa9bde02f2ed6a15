"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

The standard guard against test-set leakage in LLM training data
(GPT-3 / The Pile style): any training document sharing >= N
word-k-grams with an eval document is flagged. The distributed shape
is two inverted indexes joined on the shingle:

  docs  -> distinct k-shingles -> (doc_id, shingle)
  evals -> distinct k-shingles -> (eval_doc_id, shingle)
  equi-join on shingle -> groupBy (doc, eval) count -> min_overlap

Scale notes (100 TB corpus, benchmark-sized eval set): the eval index
is tiny (benchmarks are MBs, not TBs) and broadcast by default, so the
corpus side never shuffles — the scan explodes shingles and probes the
broadcast hash table in place. Contamination k-grams are long (8-13
words) and therefore rare, but ``max_shingle_df`` can additionally
drop boilerplate shingles FROM THE EVAL INDEX (df computed over the
eval set) to bound the per-shingle fan-out; flagging is conservative
either way because a contaminated pair shares many rare shingles too.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from .dedup import shingles

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def ngram_contamination(
    docs: "DataFrame",
    eval_docs: "DataFrame",
    k: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
    max_shingle_df: int | None = None,
) -> "DataFrame":
    """(doc_id, eval_doc_id, n_shared): training docs sharing at least
    ``min_overlap`` distinct word-``k``-grams with an eval doc.

    ``eval_docs`` needs columns (eval_id_col, text_col). With
    ``broadcast_eval`` the eval inverted index is broadcast (the
    corpus side stays shuffle-free); disable it if the eval set is
    genuinely large and let AQE pick the join. ``max_shingle_df``
    drops shingles appearing in more than that many EVAL docs.
    """
    inv_d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("shingle"),
    )
    inv_e = eval_docs.select(
        F.col(eval_id_col).alias("eval_doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("shingle"),
    )
    if max_shingle_df is not None:
        hot = (
            inv_e.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        inv_e = inv_e.join(F.broadcast(hot), "shingle", "left_anti")
    if broadcast_eval:
        inv_e = F.broadcast(inv_e)
    return (
        inv_d.join(inv_e, "shingle")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )


def semantic_contamination(
    corpus: "DataFrame",
    eval_vecs: "DataFrame",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 24,
    n_bands: int = 4,
    id_col: str = "vec_id",
    eval_id_col: str = "eval_vec_id",
    vec_col: str = "embedding",
    broadcast_eval: bool = True,
) -> "DataFrame":
    """(vec_id, eval_vec_id, cos_sim): corpus vectors within cosine
    ``threshold`` of an eval vector — the paraphrase-level eval leakage
    the n-gram leg (:func:`ngram_contamination`) cannot see, since a
    reworded eval answer shares embeddings but no long word-k-grams.

    Same 100 TB contract as the n-gram leg: the eval side is
    benchmark-sized, so its LSH band index is BROADCAST and the corpus
    is one scan — the sign-bit signature is a plan-time literal
    projection (functions/lattice.py) inside whole-stage codegen, band
    probe hits go straight to the exact-cosine verify, and the corpus
    never shuffles (the only shuffle is the pair-dedup over the
    candidate set, bounded by eval_size x band collisions, not by the
    corpus). Candidates missed by every band are below-threshold with
    overwhelming probability at cos >= 0.95 (P[bit differs] = angle/pi
    ~ 0.035 per plane), and both engines compute identical bands, so
    the result stays deterministic either way.
    """
    from .similarity import cosine, lsh_buckets

    c_b = lsh_buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        dim,
        n_planes,
        n_bands,
    )
    e_b = lsh_buckets(
        eval_vecs.select(
            F.col(eval_id_col).alias("eval_vec_id"), F.col(vec_col).alias("e_vec")
        ),
        "e_vec",
        dim,
        n_planes,
        n_bands,
    )
    if broadcast_eval:
        e_b = F.broadcast(e_b)
    cand = (
        c_b.join(e_b, ["band_id", "band_key"])
        .select("vec_id", "eval_vec_id", "c_vec", "e_vec")
        .dropDuplicates(["vec_id", "eval_vec_id"])
    )
    return (
        cand.withColumn(
            "cos_sim",
            F.round(
                cosine(
                    F.col("c_vec").cast("array<double>"),
                    F.col("e_vec").cast("array<double>"),
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_id", "eval_vec_id", "cos_sim")
    )


def memorization_scan(
    train_docs: "DataFrame",
    valid_docs: "DataFrame",
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> "DataFrame":
    """(id, n_ngrams, n_seen, mem_rate_u): per-VALID-document verbatim
    memorization exposure — the fraction of its distinct word-k-grams
    that occur anywhere in the TRAIN split (Carlini et al. 2022's
    k-gram overlap proxy; the per-doc twin of
    :func:`ngram_contamination`, which flags pairs instead). A valid
    doc with mem_rate_u near 1e6 is effectively IN the training set
    even if no single train doc matched it whole — exactly the
    leakage a pairwise scan under-reports.

    Shape: the train k-gram set is ONE distinct over the exploded
    scan (map-side combined); the valid inverted index is tiny by
    construction (held-out split) and probes it with a semi-join
    keyed on the shingle. At 100 TB the exact train-set semi-join is
    the truth side — serve the same scan with a Bloom filter over the
    train digests (operators/layout bloom build/prune) and accept the
    documented false-positive rate.
    """
    tr = (
        train_docs.select(
            F.explode(
                F.array_distinct(shingles(F.col(text_col), k))
            ).alias("shingle")
        )
        .distinct()
    )
    va = valid_docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), k))
        ).alias("shingle"),
    )
    tot = va.groupBy("id").agg(F.count("*").alias("n_ngrams"))
    seen = (
        va.join(tr, "shingle", "semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_seen"))
    )
    ids = valid_docs.select(F.col(id_col).alias("id"))
    return (
        ids.join(tot, "id", "left")
        .join(seen, "id", "left")
        .select(
            "id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_seen", F.lit(0)).cast("long").alias("n_seen"),
            F.when(
                F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
                F.expr(f"(coalesce(n_seen, 0) * {scale}) div n_ngrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("mem_rate_u"),
        )
    )
