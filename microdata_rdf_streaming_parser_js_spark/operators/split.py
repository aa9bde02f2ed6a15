"""Deterministic dataset splitting: hash-bucket train/val/test
assignment.

Training pipelines need splits that are (a) stable across reruns and
cluster layouts, (b) disjoint, (c) reproducible from the row key alone
— ``df.randomSplit`` is none of these across engines. The assignment
here is pure content hashing: bucket = first 8 hex nibbles of
md5(key|salt) mod 1e6, compared against cumulative micro-unit
fractions. No shuffle at all — the split column is a scan-side
codegen'd expression, and the same md5 arithmetic runs verbatim in the
DuckDB oracle. Changing ``salt`` re-draws the assignment; keeping it
pins every key to its split forever (the property that matters when a
corpus is re-crawled and re-processed incrementally).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

_BUCKETS = 1_000_000


def split_bucket(key: "Column", salt: str) -> "Column":
    """Deterministic bucket in [0, 1e6): md5(key|salt) first 8 hex
    nibbles as an integer, mod 1e6 (16^8 fits a long exactly)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"|{salt}")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(_BUCKETS)
    )


def hash_split(
    df: "DataFrame",
    key_col: str,
    splits: Sequence[tuple[str, int]] = (
        ("train", 980_000),
        ("val", 10_000),
        ("test", 10_000),
    ),
    salt: str = "split",
    out_col: str = "split",
) -> "DataFrame":
    """``df`` plus a ``split`` column assigning each row by hash bucket.

    ``splits`` is an ordered (name, micro-fraction) sequence summing to
    exactly 1e6 — ordered so bucket ranges (and therefore assignments)
    are stable when fractions are renegotiated but order kept.
    """
    total = sum(f for _, f in splits)
    if total != _BUCKETS:
        raise ValueError(f"split fractions must sum to {_BUCKETS}, got {total}")
    if len({name for name, _ in splits}) != len(splits):
        raise ValueError("split names must be unique")
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    cum = 0
    for name, frac in splits:
        cum += frac
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: "DataFrame",
    key_col: str,
    group_col: str,
    weights_u: dict[str, int],
    default_u: int = 0,
    salt: str = "mix",
) -> "DataFrame":
    """Deterministic data-mixture downsampling: keep a row iff its hash
    bucket falls under its group's micro-fraction keep rate.

    ``weights_u`` maps group values (e.g. the ``source`` column) to
    keep rates in micro-units (1e6 = keep all); groups not listed get
    ``default_u``. Like :func:`hash_split` this is a scan-side
    codegen'd filter — zero shuffles, pushdown-friendly — and the SAME
    row survives on every rerun and partitioning (the property a
    resumable 100 TB mixing job needs). Use a different ``salt`` than
    any split salt so sampling and splitting stay independent draws.
    """
    for g, w in weights_u.items():
        if not 0 <= w <= _BUCKETS:
            raise ValueError(f"weight for {g!r} must be in [0, {_BUCKETS}], got {w}")
    if not 0 <= default_u <= _BUCKETS:
        raise ValueError(f"default_u must be in [0, {_BUCKETS}], got {default_u}")
    bucket = split_bucket(F.col(key_col), salt)
    rate = F.lit(default_u)
    for g, w in sorted(weights_u.items()):
        rate = F.when(F.col(group_col) == g, F.lit(w)).otherwise(rate)
    return df.where(bucket < rate)


def per_group_quota(
    df: "DataFrame",
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "quota",
    rank_col: str = "quota_rank",
) -> "DataFrame":
    """Per-group document cap (domain quotas): keep at most ``cap``
    rows per ``group_col`` value, chosen by a deterministic content
    hash rather than input order.

    Web-corpus curation caps documents per host so a handful of
    mega-domains cannot dominate the training mixture. The selection
    order inside a group is ``md5(key|salt)`` (ties broken by the key
    itself), so the SAME ``cap`` survivors are chosen on every rerun,
    partitioning, and engine — a re-crawl adds/removes only the rows
    whose own keys changed. One shuffle, on ``group_col``.

    Scale note: ``row_number`` sorts each group partition; for a
    mega-host (10^9 rows) that sort dominates. Because the order key
    is a uniform digest, callers at that scale can pre-filter with a
    conservative digest-prefix threshold (keep the smallest ~4x
    cap/count fraction) before this exact pass — the pre-filter is a
    scan-side codegen'd predicate and never changes the final set.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    digest = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}"))
    )
    w = Window.partitionBy(group_col).orderBy(
        digest.asc(), F.col(key_col).asc()
    )
    return df.withColumn(
        rank_col, F.row_number().over(w).cast("long")
    ).where(F.col(rank_col) <= cap)


def epoch_shuffle(
    df: "DataFrame",
    id_col: str,
    n_epochs: int = 2,
    n_blocks: int = 8,
    salt: str = "epoch-v1",
) -> "DataFrame":
    """(epoch, block, pos, id): deterministic per-epoch training-order
    shuffle — the data-ordering job in front of an LLM training run.

    A true global permutation would need a global sort; instead the
    corpus is hash-scattered into ``n_blocks`` blocks per epoch
    (block = md5(salt:epoch:id) mod n_blocks — a different draw every
    epoch) and ordered within each block by the same digest. Readers
    stream blocks in id order and rows in ``pos`` order, giving a
    reshuffled-every-epoch, fully-reproducible order with ONE shuffle
    whose parallelism is n_blocks x epochs — the block-shuffled
    loading shape (Megatron/ Pile style) that scales to any corpus
    because no single ordering task ever sees more than one block.
    """
    if n_epochs < 1 or n_blocks < 1:
        raise ValueError("n_epochs and n_blocks must be >= 1")
    epochs = F.explode(
        F.array(*[F.lit(e).cast("long") for e in range(n_epochs)])
    ).alias("epoch")
    base = df.select(F.col(id_col).cast("string").alias("_id"), epochs)
    h = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col("epoch").cast("string"), F.lit(":"), F.col("_id"))
    )
    keyed = base.select(
        "epoch",
        "_id",
        h.alias("_h"),
        F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_blocks)
        ).alias("block"),
    )
    w = Window.partitionBy("epoch", "block").orderBy("_h", "_id")
    return keyed.select(
        "epoch",
        "block",
        F.row_number().over(w).cast("long").alias("pos"),
        F.col("_id").alias(id_col),
    )


def weighted_sample(
    df: "DataFrame",
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample-v1",
) -> "DataFrame":
    """(key, weight, priority): deterministic weighted sampling
    without replacement — the k rows with the smallest
    ``priority = md5_u60(key|salt) div weight`` (integer division;
    weights clamped to >= 1), ties broken on key.

    This is an integer surrogate of the A-ES exponential-jumps scheme
    (Efraimidis-Spirtakis: priority u^(1/w)): a doubled weight halves
    a key's priority, so selection probability grows with weight,
    while the draw stays a pure function of (key, salt) — stable
    across reruns, partition layouts, and engines (no float pow, no
    engine-native RNG). One TakeOrderedAndProject reduction: no
    shuffle of the corpus, no global sort — each partition keeps its
    local top-k and the driver merges k rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(key_col).cast("string")
    h = F.md5(F.concat(key, F.lit(f"|{salt}")))
    u60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    weight = F.greatest(F.col(weight_col).cast("long"), F.lit(1))
    # integer `div`, NOT `/`: u60 reaches 2^60, beyond double's 2^53
    # exact-integer range, so float division would drift vs the
    # oracle's `//` (both operands non-negative: floor == trunc)
    return (
        df.select(key.alias("key"), weight.alias("weight"), u60.alias("_u"))
        .select(
            "key",
            "weight",
            F.expr("_u div weight").cast("long").alias("priority"),
        )
        .orderBy("priority", "key")
        .limit(k)
    )


def stratified_sample(
    df: "DataFrame",
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "strat-v1",
) -> "DataFrame":
    """(group, key, rk): deterministic stratified sample — exactly
    min(k, |group|) rows per group, chosen by md5 priority over
    (key | salt) — the per-source / per-language quota draw that
    keeps a training mixture from being swamped by its largest
    stratum, reproducible across reruns and engines (same rows for
    the same salt, no RNG state).

    One shuffle: a row_number window partitioned by the group over
    (md5, key) order; the per-partition heap never materializes the
    full sorted group. Skew note: a single giant stratum lands on one
    task — at crawl scale pre-aggregate with a two-level draw (salt
    the group into shards, draw k from each, re-rank the k*shards
    survivors) exactly like the documented top-k pattern.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pri = F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(pri, F.col(key_col))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(key_col).alias("key"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= F.lit(k))
    )


def stratified_sample_sharded(
    df: "DataFrame",
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "strat-v1",
    shards: int = 8,
) -> "DataFrame":
    """Two-level variant of :func:`stratified_sample` for skewed
    strata, with PROVABLY identical output: stage 1 takes the top-k
    priorities within each (stratum, shard) — the shard is carved
    from the md5 priority's own leading bits, so it is deterministic
    and engine-free — and stage 2 re-ranks only the surviving
    k x shards rows per stratum. Because per-stratum top-k by a total
    order is associative (the global top-k is contained in the union
    of per-shard top-k), the result equals the single-level draw row
    for row — the oracle IS the single-level SQL.

    Scale shape: stage 1's window partitions on (group, shard), so a
    billion-row stratum spreads over ``shards`` tasks instead of one;
    stage 2's per-group partition sees at most k x shards rows. Two
    exchanges total, no global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if shards < 2:
        raise ValueError(f"shards must be >= 2, got {shards}")
    pri = F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt)))
    stage1 = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(key_col).alias("key"),
            pri.alias("_pri"),
            F.pmod(
                F.conv(F.substring(pri, 1, 8), 16, 10).cast("long"),
                F.lit(int(shards)),
            ).alias("_shard"),
        )
        .withColumn(
            "_rk1",
            F.row_number().over(
                Window.partitionBy("grp", "_shard").orderBy("_pri", "key")
            ),
        )
        .where(F.col("_rk1") <= F.lit(k))
    )
    return (
        stage1.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("grp").orderBy("_pri", "key")
            ),
        )
        .where(F.col("rk") <= F.lit(k))
        .select("grp", "key", "rk")
    )


def isqrt_long(x: "Column") -> "Column":
    """Exact integer floor-sqrt of a non-negative long: float sqrt
    seeds, then a +/-1 integer correction — for x < 2^52 the double
    estimate is within 1 of truth, so the corrected result is exact
    (and engine-identical) regardless of IEEE rounding direction."""
    r0 = F.floor(F.sqrt(x.cast("double"))).cast("long")
    return (
        F.when((r0 + 1) * (r0 + 1) <= x, r0 + 1)
        .when(r0 * r0 > x, r0 - 1)
        .otherwise(r0)
    )


def temperature_weights(
    df: "DataFrame",
    group_col: str,
    target_total: int,
    scale: int = _BUCKETS,
) -> "DataFrame":
    """(group, cnt, w, rate_u, expect_keep): alpha=0.5 temperature
    resampling plan for a multi-source mixture (the multinomial
    p_i^alpha smoothing of Conneau & Lample 2019 / mT5 — upweight
    low-resource sources, damp the mega-source) as exact integers:

    w = isqrt(cnt)  (= cnt^alpha at alpha = 1/2, floored);
    rate_u = min(scale, (target_total * w * scale) div (sum_w * cnt));
    expect_keep = (cnt * rate_u) div scale.

    Feed ``rate_u`` straight into :func:`mixture_sample` as
    ``weights_u`` to materialize the draw — this operator is the
    planning half (per-group keep rates that hit ``target_total`` in
    expectation under the smoothed distribution).

    Scale shape: ONE map-side-combined shuffle (the group count);
    sum_w is a 1-row broadcast back onto the k-row group table. Exact
    while target_total * max(w) * scale < 2^63 (e.g. a 10^8-doc
    target over groups of <= 8.1e7 docs at scale 1e6); shrink
    ``scale`` beyond.
    """
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    cnts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    ws = cnts.select("grp", "cnt", isqrt_long(F.col("cnt")).alias("w"))
    tot = ws.agg(F.sum("w").cast("long").alias("sum_w"))
    rate = F.least(
        F.lit(scale).cast("long"),
        F.expr(f"({target_total} * w * {scale}) div (sum_w * cnt)"),
    )
    return (
        ws.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "cnt",
            "w",
            rate.cast("long").alias("rate_u"),
            F.expr(f"(cnt * least({scale}, "
                   f"({target_total} * w * {scale}) div (sum_w * cnt)))"
                   f" div {scale}")
            .cast("long")
            .alias("expect_keep"),
        )
    )
