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

Scale shape: the whole inference is scan-side codegen — tokenize,
bucket, weight lookup (element_at on a literal array), and the
per-document sum as an array ``aggregate`` INSIDE the row. Zero
shuffles, zero joins (the weight table rides in the plan, the 100 TB
corpus never moves), no UDF, integer-exact end to end.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..functions.lattice import linear_weights
from ..functions.text import _tokens

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame


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
    score 0.

    ZERO shuffles: the per-document sum runs as an array ``aggregate``
    over the token array inside the row — no explode, no groupBy, no
    join. Each corpus row is read, scored, and labeled in place."""
    w = linear_weights(n_buckets, seed)
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])

    def _w(t: "Column") -> "Column":
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % n_buckets
        )
        return F.element_at(warr, (bucket + 1).cast("int"))

    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    sw = F.aggregate(
        F.transform(toks, _w), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        docs.select(
            F.col(id_col).alias("id"),
            sw.alias("_sw"),
            F.size(toks).cast("long").alias("_n"),
        )
        .select(
            "id",
            F.when(F.col("_n") > 0, F.expr(f"(_sw * {scale}) div _n"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("score_u"),
        )
        .select(
            "id",
            "score_u",
            F.when(F.col("score_u") >= threshold_u, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("label"),
        )
    )
