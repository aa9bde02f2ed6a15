"""Fixed-size sketches over unbounded key domains: count-min
(Cormode & Muthukrishnan 2005), HyperLogLog (Flajolet et al. 2007),
and mergeable KMV set sketches.

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

from pyspark.sql import Window
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


# --------------------------------------------------------------------------
# HyperLogLog

_HLL_RHO_NIBBLES = 12  # 48-bit rho window after the bucket nibbles
_HLL_RHO_MAX = 4 * _HLL_RHO_NIBBLES + 1  # all-zero window -> 49


def hll_build(df: "DataFrame", value_col: str, p: int = 8) -> "DataFrame":
    """(bucket, max_rho) HyperLogLog registers over the distinct values
    of ``value_col`` — at most ``2**p`` output rows regardless of input
    size, built with one map-side-combined shuffle (per-partition MAX
    partials ARE partial sketches, so the register table is mergeable
    by construction).

    Everything stays integer/string arithmetic on md5 hex so the DuckDB
    oracle rebuilds bit-identical registers: bucket = the first ``p/4``
    hex nibbles; rho = 1 + number of leading zero BITS in the next 48
    bits, derived from the leading-zero-nibble count plus a 4-way CASE
    on the first non-zero nibble (no floating log anywhere).
    """
    if p % 4 != 0 or p <= 0 or p > 16:
        raise ValueError(f"p must be a positive multiple of 4 <= 16, got {p}")
    bucket_nibbles = p // 4
    distinct = df.select(F.col(value_col).alias("v")).distinct()
    h = F.md5(F.col("v").cast("string"))
    bucket = F.conv(F.substring(h, 1, bucket_nibbles), 16, 10).cast("long")
    w = F.substring(h, bucket_nibbles + 1, _HLL_RHO_NIBBLES)
    z = F.length(F.regexp_extract(w, "^0*", 0))
    v = F.conv(
        F.substr(h, F.lit(bucket_nibbles + 1) + z, F.lit(1)), 16, 10
    ).cast("int")
    lead_bits_in_nibble = (
        F.when(v >= 8, F.lit(0))
        .when(v >= 4, F.lit(1))
        .when(v >= 2, F.lit(2))
        .otherwise(F.lit(3))
    )
    rho = F.when(z == _HLL_RHO_NIBBLES, F.lit(_HLL_RHO_MAX)).otherwise(
        z * 4 + lead_bits_in_nibble + 1
    )
    return (
        distinct.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant for ``m >= 128`` registers.
    Computed once and inlined as the same decimal literal on both
    engines, so the final double expression is operand-identical."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_linear_table(m: int) -> list:
    """Small-range linear-counting estimates ``round(m * ln(m / V))``
    for V = 1..m, precomputed in Python and inlined as the SAME integer
    literals on both engines — neither engine evaluates ln, so the
    transcendental never threatens cross-engine exactness."""
    import math

    return [round(m * math.log(m / v)) for v in range(1, m + 1)]


def hll_estimate(registers: "DataFrame", p: int = 8) -> "DataFrame":
    """One row ``(m, n_zero, scaled_sum, raw_estimate, ndv_estimate)``
    from an ``hll_build`` register table.

    Cross-engine determinism: the harmonic-mean denominator is kept as
    an exact BIGINT ``scaled_sum = sum(2**(RHO_MAX - max_rho))`` with
    absent registers contributing ``2**RHO_MAX`` (max 2**(p+RHO_MAX)
    < 2**63, fold-order-free integer addition), and only the final
    ``alpha * m^2 * 2**RHO_MAX / scaled_sum`` runs in doubles — a fixed
    expression tree over identical operands, so IEEE correctly-rounded
    ops give the identical floor on both engines. The standard
    small-range correction (linear counting when raw <= 2.5m and any
    register is empty) is applied via :func:`hll_linear_table` — a
    precomputed integer lookup, no engine-side ln.
    """
    m = 2**p
    alpha = hll_alpha(m)
    lc = hll_linear_table(m)
    pow2max = float(2**_HLL_RHO_MAX)
    agg = registers.agg(
        F.count("*").alias("n_buckets"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(_HLL_RHO_MAX) - F.col("max_rho")).cast(
                "long"
            )
        ).alias("present_sum"),
    )
    n_zero = (F.lit(m) - F.col("n_buckets")).cast("long")
    scaled_sum = (
        F.coalesce(F.col("present_sum"), F.lit(0)) + n_zero * F.lit(2**_HLL_RHO_MAX)
    ).cast("long")
    raw = F.floor(
        F.lit(alpha) * F.lit(float(m * m)) * F.lit(pow2max)
        / scaled_sum.cast("double")
    ).cast("long")
    lc_arr = F.array(*[F.lit(int(v)) for v in lc])
    est = (
        F.when(F.col("n_buckets") == 0, F.lit(0))
        .when(
            (n_zero > 0) & (raw <= F.lit(int(2.5 * m))),
            F.element_at(lc_arr, n_zero.cast("int")),
        )
        .otherwise(raw)
        .cast("long")
    )
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        n_zero.alias("n_zero"),
        scaled_sum.alias("scaled_sum"),
        raw.alias("raw_estimate"),
        est.alias("ndv_estimate"),
    )


# --------------------------------------------------------------------------
# Mergeable KMV set sketches

def kmv_sketch(df: "DataFrame", value_col: str, k: int = 64) -> "DataFrame":
    """The k smallest md5 hashes of the distinct values — a KMV set
    sketch as a DataFrame (single column ``h``). Per-partition top-k
    then global top-k; never more than ``k`` rows leave any stage."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.select(F.md5(F.col(value_col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: "DataFrame", b: "DataFrame", k: int = 64) -> "DataFrame":
    """Union of two KMV sketches = the k smallest of the combined hash
    sets (the defining mergeability property: per-shard sketches union
    into the corpus sketch without touching the shards again)."""
    return a.union(b).distinct().orderBy("h").limit(k)


def kmv_ndv(sketch: "DataFrame", k: int = 64) -> "DataFrame":
    """(n_seen, ndv_estimate) from a KMV sketch — exact count when the
    sketch is not full, else (k-1)/fraction(k-th smallest hash). The
    12-nibble fraction is an exact integer-valued double (16^12 < 2^53)
    so both engines compute the identical estimate."""
    agg = sketch.agg(F.count("*").alias("n_seen"), F.max("h").alias("kth"))
    frac = F.conv(F.substring("kth", 1, 12), 16, 10).cast("double") / F.lit(
        float(16**12)
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("long")
    ).otherwise(F.floor(F.lit(k - 1) / frac).cast("long"))
    return agg.select(
        F.col("n_seen").cast("long").alias("n_seen"),
        est.alias("ndv_estimate"),
    )


def quantile_sketch(
    df: "DataFrame",
    value_col: str,
    id_col: str,
    n_shards: int = 16,
    k_per_shard: int = 32,
    k_merged: int = 64,
    qs_u: tuple = (250_000, 500_000, 750_000),
    scale: int = 1_000_000,
    salt: str = "qsketch-v1",
) -> "DataFrame":
    """(q_u, est_u, sample_n): approximate quantiles from MERGEABLE
    bounded per-shard samples — the deterministic stand-in for a
    t-digest/KLL pipeline: each shard keeps its k_per_shard rows with
    the smallest md5(id|salt) (a uniform sample whose membership is a
    pure function of the row id, not of partition layout), shard
    sketches merge by keeping the k_merged hash-smallest rows of the
    union, and quantiles are exact ceil-ranks over the merged sample.

    Scale shape: shards are EXPLICIT (id mod n_shards), so the sketch
    is identical on any cluster layout; per-shard state is bounded at
    k rows (a window over shard touches only that shard's rows), the
    merge is one TakeOrderedAndProject of <= n_shards * k rows, and
    the corpus is never globally sorted. Mergeability means yesterday's
    shard sketches combine with today's without rescanning — the same
    continuous-crawl contract as the KMV/HLL sketches. NULL and NaN
    values are excluded (the portable contract, see
    stats.group_quantiles_u).
    """
    if not qs_u:
        raise ValueError("qs_u must be non-empty")
    if n_shards < 1 or k_per_shard < 1 or k_merged < 1:
        raise ValueError("n_shards, k_per_shard, k_merged must be >= 1")
    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull() & ~F.isnan(v)).select(
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).alias("shard"),
        F.floor(v * scale).cast("long").alias("v_u"),
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))
        ).alias("h"),
        F.col(id_col).cast("long").alias("rid"),
    )
    w = Window.partitionBy("shard").orderBy("h", "rid")
    shard_sample = (
        rows.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k_per_shard)
        .select("v_u", "h", "rid")
    )
    merged = shard_sample.orderBy("h", "rid").limit(k_merged)
    ranked = merged.select(
        "v_u",
        F.row_number()
        .over(Window.orderBy("v_u", "rid"))
        .alias("vrk"),
    ).crossJoin(
        merged.agg(F.count("*").cast("long").alias("sample_n"))
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(int(qu)).cast("long").alias("q_u"),
                F.expr(
                    f"({int(qu)} * sample_n + {scale - 1}) div {scale}"
                ).alias("r"),
            )
            for qu in qs_u
        ]
    )
    return (
        ranked.select("v_u", "vrk", "sample_n", F.explode(targets).alias("t"))
        .where(F.col("vrk") == F.col("t.r"))
        .select(
            F.col("t.q_u").alias("q_u"),
            F.col("v_u").alias("est_u"),
            "sample_n",
        )
    )


def count_min_inner_product(
    sketch_a: "DataFrame",
    sketch_b: "DataFrame",
    depth: int = 4,
) -> "DataFrame":
    """One row (est): AMS/CMS inner-product estimate of
    sum_k count_a(k) * count_b(k) — the equi-join CARDINALITY of the
    two sketched relations (Cormode & Muthukrishnan 2005 §4.2, the
    join-size estimator an optimizer consults before picking a
    shuffle strategy). Per row r: sum_b a[r,b]*b[r,b] contains every
    true product plus non-negative collision cross-terms, so each row
    overestimates; the min over rows is the estimate and
    est >= true ALWAYS — the one-sided guarantee that makes it safe
    for worst-case planning (never under-provisions the join).

    Both inputs are <= depth*width rows whatever the corpora sized;
    the join/aggregate here touches only sketch cells. Missing cells
    count 0 — the join is LEFT from sketch_a (a sketch built over a
    non-empty relation populates every row), so a row with no
    overlapping buckets correctly contributes a 0 estimate.
    """
    a = sketch_a.select("row", "bucket", F.col("cnt").alias("ca"))
    b = sketch_b.select("row", "bucket", F.col("cnt").alias("cb"))
    per_row = (
        a.join(F.broadcast(b), ["row", "bucket"], "left")
        .groupBy("row")
        .agg(
            F.sum(F.expr("ca * coalesce(cb, 0)")).cast("long").alias("ip")
        )
    )
    return per_row.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("long").alias("est")
    )
