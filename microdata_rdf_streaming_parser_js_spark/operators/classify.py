"""Hashed linear document classifier (the fastText shape).

fastText-style quality/topic classifiers over web corpora (Joulin et
al. 2016; the CCNet / GPT-3 "quality filter" is exactly this) score a
document as a linear function of hashed bag-of-words features. Here:

  bucket(token) = first 8 md5 hex digits mod n_buckets
  score_u(doc)  = (sum of w[bucket(t)] over tokens) * scale div n_toks
  label         = score_u >= threshold_u

with ``w`` a deterministic md5-derived integer weight table
(functions/lattice.linear_weights) embedded as a plan-time literal
array — the inference-time shape is identical with trained weights.

Scale shape: tokenize + bucket + weight lookup are all scan-side
codegen (explode -> element_at on a literal array), then ONE
groupBy(doc) with map-side partial sums. No join (the weight table
rides in the plan, the 100 TB corpus never shuffles against it), no
UDF, integer-exact end to end.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..functions.lattice import linear_weights
from ..functions.text import _tokens

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def linear_classify(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    threshold_u: int = 1_000_000_000,
    scale: int = 1_000_000,
    seed: str = "linear-lr-v1",
) -> "DataFrame":
    """(id, score_u, label): mean hashed-bucket weight per document in
    micro-units and the thresholded binary label. Empty documents
    score 0."""
    w = linear_weights(n_buckets, seed)
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("t"),
    ).filter(F.col("t") != "")
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    scored = (
        toks.select("id", F.element_at(warr, (bucket + 1).cast("int")).alias("w"))
        .groupBy("id")
        .agg(F.sum("w").alias("sw"), F.count("*").alias("n"))
        .select(
            "id",
            F.expr(f"(sw * {scale}) div n").alias("score_u"),
        )
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("score_u", F.lit(0)).cast("long").alias("score_u"),
        F.when(F.coalesce("score_u", F.lit(0)) >= threshold_u, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("label"),
    )
