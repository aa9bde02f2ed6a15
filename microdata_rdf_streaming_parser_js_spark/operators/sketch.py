"""Count-min sketch: fixed-size frequency estimation over unbounded
key domains (Cormode & Muthukrishnan 2005).

A 100 TB corpus has too many distinct tokens/URLs to count exactly in
memory-bounded state; the CMS bounds the table at depth x width
counters with one-sided error (estimate >= true count, overshoot
< eps * total with probability 1 - delta). The hash family here is
md5(key || '#row') — deterministic and engine-portable, so the DuckDB
oracle rebuilds the identical sketch and the comparison is exact, not
approximate.

Scale shape: building is explode(depth rows per occurrence) ->
groupBy (row, bucket) — one map-side-combined shuffle into at most
depth*width result rows, the definition of a mergeable sketch
(per-partition partial sums ARE partial sketches). Probing joins the
(tiny) sketch to the probe keys' scan-side bucket expressions and
takes the per-key min across rows.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame


def _bucket(key: "Column", row: int, width: int) -> "Column":
    """Row-``row`` bucket of ``key``: first 8 md5 hex nibbles of
    ``key#row`` mod width (16^8 fits a long exactly)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"#{row}")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    )


def count_min_build(
    items: "DataFrame",
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> "DataFrame":
    """(row, bucket, cnt) sketch counters over every row of ``items``
    (one occurrence per input row; pre-aggregate upstream to weight).
    At most ``depth * width`` output rows regardless of input size."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    key = F.col(key_col)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("row"),
                    _bucket(key, j, width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
    ).alias("rb")
    return (
        items.select(rows)
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: "DataFrame",
    probes: "DataFrame",
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> "DataFrame":
    """(key, est): CMS point estimate for each probe key — the min
    over rows of the key's bucket counters (an absent counter is 0).
    ``depth``/``width`` must match the build call. The sketch side is
    broadcast (<= depth*width rows); probes are never shuffled."""
    key = F.col(key_col)
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("row"),
                    _bucket(key, j, width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
    ).alias("rb")
    probe_rows = probes.select(key_col, rb).select(
        key_col, "rb.row", "rb.bucket"
    )
    joined = probe_rows.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


def grouped_kmv(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    k: int = 64,
) -> "DataFrame":
    """(group, n_seen, ndv_estimate): per-group KMV distinct-count
    sketch — the engine-portable HLL alternative, per key (distinct
    users per event type, distinct urls per host). Estimate =
    (k-1) / fraction(k-th smallest md5), or the exact count when a
    group holds fewer than ``k`` distinct values.

    Shape: distinct (group, value) -> md5 -> per-group rank window
    keeping k rows -> 1-row-per-group aggregate. Bounded state per
    group (k hashes), mergeable (union = k smallest of the union),
    no driver collect. The 12-nibble fraction is an exact
    integer-valued double (16^12 < 2^53), so both engines compute the
    identical estimate.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    hashed = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .distinct()
        .select("g", F.md5(F.col("v").cast("string")).alias("h"))
    )
    w = Window.partitionBy("g").orderBy("h")
    topk = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    agg = topk.groupBy("g").agg(
        F.count("*").alias("n_seen"), F.max("h").alias("kth")
    )
    frac = F.conv(F.substring("kth", 1, 12), 16, 10).cast("double") / F.lit(
        float(16**12)
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("long")
    ).otherwise(F.floor(F.lit(k - 1) / frac).cast("long"))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_seen").cast("long").alias("n_seen"),
        est.alias("ndv_estimate"),
    )
