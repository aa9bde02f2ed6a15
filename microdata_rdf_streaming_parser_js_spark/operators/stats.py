"""Distribution statistics operators: exact per-group quantiles.

Training-data pipelines gate on distribution cut-points (p50/p90/p99
of document length, latency, quality score) rather than means.
``group_quantiles_u`` computes EXACT discrete quantiles per group in
one shuffle: values are floored to micro-units (so the cross-engine
comparison has no rounding ambiguity), ranked per group with a window,
and the quantile is the value at rank ``ceil(q * n)`` — a selection,
not a sum, so tie order and fold order cannot drift the result (all
rows tied at a rank share the same value).

Scale shape: one hash shuffle on the group key, in-partition sort for
the window — the standard distributed grouped-window plan. Per-group
row counts bound the sort; for heavily skewed groups pre-aggregate to
a (group, value, count) histogram first. No driver collect, no UDFs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def group_quantiles_u(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    qs_u: Sequence[int] = (500_000, 900_000, 990_000),
    scale: int = 1_000_000,
) -> "DataFrame":
    """(group, q_u, quantile_u): for each group and each micro-unit
    quantile fraction in ``qs_u``, the exact discrete quantile of
    ``floor(value * scale)`` — the value at 1-based rank
    ``(q_u * n + scale - 1) div scale`` (integer ceil of q*n) in the
    group's sorted order. NULL values are excluded (they sort first in
    Spark but last in most SQL engines — excluding them is the only
    portable contract).
    """
    if not qs_u:
        raise ValueError("qs_u must be non-empty")
    vals = df.select(
        F.col(group_col).alias("g"),
        F.floor(F.col(value_col) * scale).cast("long").alias("v_u"),
    ).where(F.col("v_u").isNotNull())
    w = Window.partitionBy("g").orderBy("v_u")
    ranked = vals.select(
        "g",
        "v_u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n_g"),
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(int(qu)).cast("long").alias("q_u"),
                F.expr(f"({int(qu)} * n_g + {scale - 1}) div {scale}").alias("r"),
            )
            for qu in qs_u
        ]
    )
    return (
        ranked.select("g", "v_u", "rn", F.explode(targets).alias("t"))
        .where(F.col("rn") == F.col("t.r"))
        .select(
            F.col("g").alias(group_col),
            F.col("t.q_u").alias("q_u"),
            F.col("v_u").alias("quantile_u"),
        )
    )
