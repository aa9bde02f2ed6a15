"""Temporal joins Spark lacks natively: backward as-of join.

An as-of join annotates each left row with the payload of the most
recent right row at-or-before it (per key) — "what was the last
purchase before this click", "which config version was live at this
event". The naive formulation is a range join (left.ts >= right.ts)
that Spark plans as a per-key cross product; this implementation is
the union-window shape instead:

  tag right rows side=0 and left rows side=1, union, then one window
  per key ordered by (ts, side, tie) takes last(payload ignorenulls)
  over the unbounded-preceding frame — right payloads are non-NULL,
  left rows are NULL, so each left row sees exactly the latest right
  payload at-or-before it. One shuffle on the key, one in-partition
  sort, zero joins, fully codegen'd.

Determinism contract: the ordering (ts, side, tie) is total (``tie``
must be unique per row, e.g. an event id), so when several right rows
share a timestamp the one with the greatest tie value wins — on every
partitioning and every engine. A right row exactly at the left row's
timestamp matches (side 0 sorts first): "at-or-before".

Scale: identical shape to sessionization — hash shuffle on key,
sort within partition. Skewed keys are bounded by AQE; there is no
candidate blow-up because no range join ever materializes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def asof_join_backward(
    left: "DataFrame",
    right: "DataFrame",
    key_col: str,
    ts_col: str,
    tie_col: str,
    payload_cols: Sequence[str],
    tolerance: int | None = None,
) -> "DataFrame":
    """All ``left`` columns plus, per row, ``payload_cols`` and
    ``matched_ts`` from the most recent ``right`` row with
    ``right.ts <= left.ts`` for the same key (NULLs when none).

    ``ts_col`` must be numeric (cast timestamps to epoch seconds
    first — keeps the ordering and the optional ``tolerance``
    arithmetic engine-portable). ``tie_col`` must exist in BOTH frames
    (e.g. a shared event-id column) and be unique per right row; ties
    on ts resolve to the greatest tie value. With
    ``tolerance`` (same unit as ts), matches older than
    ``left.ts - tolerance`` are nulled out rather than dropped.
    """
    payload_cols = list(payload_cols)
    clash = (set(payload_cols) | {"matched_ts"}) & set(left.columns)
    if clash:
        raise ValueError(f"payload/output columns collide with left: {sorted(clash)}")
    left_cols = [c for c in left.columns]

    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        F.struct(
            F.col(ts_col).alias("matched_ts"),
            *[F.col(c) for c in payload_cols],
        ).alias("_p"),
    )
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(tie_col).alias("_tie"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
    )
    u = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType)).unionByName(l)

    w = Window.partitionBy("_k").orderBy("_ts", "_side", "_tie").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    matched = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_m.matched_ts") >= F.col("_ts") - F.lit(tolerance),
                F.col("_m"),
            ),
        )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        F.col("_m.matched_ts").alias("matched_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )


def funnel_stages(
    events: "DataFrame",
    stages: "Sequence[str]",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> "DataFrame":
    """(key, t1_s..tN_s, stage_reached): classic ordered-funnel
    analysis — for each key, the earliest time each stage happened at
    or after the previous stage's earliest completion (ties count:
    ``>=``, so a same-timestamp next stage advances the funnel).
    Stage times are epoch seconds (long), NULL once the funnel stalls;
    ``stage_reached`` counts completed stages.

    Scale shape: stage 1 is one groupBy(key) min; each later stage is
    a key-equi-join against the previous frontier plus a filtered
    groupBy — all shuffles on the same key, so after the first
    exchange every stage reuses the partitioning (no skew beyond the
    key's own). No windows over full event sequences, no UDF.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    e = events.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    )
    keys = e.select("k").distinct()
    frontier = (
        e.filter(F.col("et") == stages[0])
        .groupBy("k")
        .agg(F.min("ts").alias("t1"))
    )
    out = keys.join(frontier, "k", "left")
    for i, st in enumerate(stages[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            e.filter(F.col("et") == st)
            .join(out.select("k", prev).where(F.col(prev).isNotNull()), "k")
            .filter(F.col("ts") >= F.col(prev))
            .groupBy("k")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        out = out.join(nxt, "k", "left")
    cols = [F.col("k").alias(key_col)]
    for i in range(1, len(stages) + 1):
        cols.append(F.unix_timestamp(f"t{i}").cast("long").alias(f"t{i}_s"))
    reached = sum(
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(stages) + 1)
    )
    cols.append(reached.cast("long").alias("stage_reached"))
    return out.select(*cols)


def interval_join(
    events: "DataFrame",
    intervals: "DataFrame",
    ts_col: str = "ts_s",
    start_col: str = "s",
    end_col: str = "e",
    bucket_s: int = 1800,
) -> "DataFrame":
    """Point-in-interval join (event.ts in [start, end)) as an
    EQUI-join on coarse time buckets plus an exact residual filter —
    the range-join strategy Spark lacks natively. A naive inequality
    join degenerates to BroadcastNestedLoopJoin (O(|events| x
    |intervals|) comparisons); here each interval is exploded to the
    ``ceil(len / bucket_s) + 1`` buckets it overlaps, events key on
    floor(ts / bucket_s), and the join is hash-partitionable on the
    bucket id. Pick ``bucket_s`` >= the typical interval length so the
    explosion factor stays ~2; skewed hot buckets fall to AQE skew
    handling like any equi-join.

    Requires ``end > start`` (enforced; an empty interval matches
    nothing and would break the bucket sequence). Returns the joined
    rows with both sides' columns, residual-filtered exactly — callers
    aggregate. All arithmetic is integer (epoch seconds), so the
    DuckDB oracle can replay the same containment with a plain
    inequality join.
    """
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    iv = intervals.where(F.col(end_col) > F.col(start_col))
    iv = iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_s).cast("long"),
                F.floor((F.col(end_col) - 1) / bucket_s).cast("long"),
            )
        ),
    )
    ev = events.withColumn(
        "_bucket", F.floor(F.col(ts_col) / bucket_s).cast("long")
    )
    return (
        ev.join(iv, "_bucket")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bucket")
    )


def gap_fill_locf(
    events: "DataFrame",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_hours: int = 1,
) -> "DataFrame":
    """(key, bucket_ts, value_u, is_gap): regularize a per-key event
    stream onto a dense hourly (or ``step_hours``-hourly) spine and
    fill empty buckets by carrying the last observed value forward
    (LOCF) — the time-series gap-filling step feature pipelines run
    before windowed modeling, and the `time_bucket_gapfill` +
    `locf` pair of the hypertable model re-expressed for Spark.

    Per key, the spine runs from the key's first to last truncated
    bucket (``sequence`` + explode, generated scan-side — no cross
    join against a global calendar, so a key active for one hour
    costs one row, not the corpus's full time range). Observed
    buckets carry sum(value) in integer micro-units (each event
    floored BEFORE the sum, so distributed fold order cannot drift
    the total); empty buckets take the previous bucket's running
    value via `last(ignorenulls)` over an ordered per-key window,
    flagged ``is_gap = 1``.

    Shuffles: per-key bucket agg (1, map-side combined) + min/max agg
    reuse the same exchange; the LOCF window re-partitions by key
    (1). State is bounded by spine length per key — no global
    single-partition window anywhere.
    """
    if step_hours < 1:
        raise ValueError(f"step_hours must be >= 1, got {step_hours}")
    step = F.expr(f"interval {int(step_hours)} hours")
    b = events.select(
        F.col(key_col).alias("key"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
        F.floor(F.col(value_col) * F.lit(1_000_000)).alias("v_u"),
    )
    if step_hours != 1:
        anchor = F.lit("2000-01-01 00:00:00").cast("timestamp")
        secs = F.unix_timestamp("bucket_ts") - F.unix_timestamp(anchor)
        b = b.withColumn(
            "bucket_ts",
            F.timestamp_seconds(
                F.unix_timestamp(anchor)
                + (secs - F.pmod(secs, F.lit(step_hours * 3600)))
            ),
        )
    obs = b.groupBy("key", "bucket_ts").agg(F.sum("v_u").alias("obs_u"))
    spine = (
        obs.groupBy("key")
        .agg(
            F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
        )
        .select(
            "key",
            F.explode(F.sequence("lo", "hi", step)).alias("bucket_ts"),
        )
    )
    joined = spine.join(obs, ["key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_ts",
        F.last("obs_u", ignorenulls=True).over(w).alias("value_u"),
        F.when(F.col("obs_u").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_gap"),
    )


def cusum_drift(
    df: "DataFrame",
    key_col: str,
    ts_col: str,
    bucket_s: int = 300,
) -> "DataFrame":
    """(key, n_buckets, max_s, peak_bucket): one-sided CUSUM change
    detection over per-key event rates — the drift monitor a streaming
    pipeline alarms on. Events bucket into ``bucket_s``-second bins on
    a GAP-FILLED spine (empty bins count 0 — a traffic DROP is drift
    too); the drift signal per bin is x - k (k = the key's mean bin
    count, integer div); and the classic recursion
    S_t = max(0, S_{t-1} + d_t) is rewritten CLOSED-FORM as
    S_t = P_t - min(0, min_{j<=t} P_j) with P the running sum of d —
    so the whole detector is two ordered windows per key, no
    recursion, no Python, engine-portable integers throughout.
    peak_bucket = the first bin where the maximum is attained.

    Scale shape: one groupBy(key, bucket) with map-side combine; the
    spine explode and both windows run per key over time-bounded bin
    counts, partitioned by key — never a global sort.
    """
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    ep = F.unix_timestamp(ts_col)
    binned = (
        df.select(F.col(key_col).alias("k"),
                  (F.floor(ep / bucket_s) * bucket_s)
                  .cast("long").alias("b"))
        .groupBy("k", "b")
        .agg(F.count("*").cast("long").alias("x"))
    )
    span = binned.groupBy("k").agg(
        F.min("b").alias("b_lo"), F.max("b").alias("b_hi"),
        F.sum("x").cast("long").alias("total"),
    )
    spine = span.select(
        "k",
        "total",
        F.explode(
            F.sequence(F.col("b_lo"), F.col("b_hi"),
                       F.lit(bucket_s).cast("long"))
        ).alias("b"),
    )
    n_b = spine.groupBy("k").agg(F.count("*").cast("long").alias("nb"))
    filled = (
        spine.join(binned, ["k", "b"], "left")
        .join(n_b, "k")
        .select(
            "k", "b",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
            F.expr("total div nb").cast("long").alias("mean_x"),
            "nb",
        )
    )
    w = Window.partitionBy("k").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cur = filled.select(
        "k", "b", "nb",
        F.sum(F.expr("x - mean_x")).over(w).cast("long").alias("p"),
    )
    s = cur.select(
        "k", "b", "nb",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(w)))
        .cast("long").alias("s"),
    )
    peak = s.groupBy("k", "nb").agg(F.max("s").cast("long").alias("max_s"))
    first_peak = (
        s.join(peak, "k")
        .where(F.col("s") == F.col("max_s"))
        .groupBy("k")
        .agg(F.min("b").cast("long").alias("peak_bucket"))
    )
    return (
        peak.join(first_peak, "k")
        .select(
            F.col("k").alias(key_col),
            F.col("nb").alias("n_buckets"),
            "max_s",
            "peak_bucket",
        )
    )
