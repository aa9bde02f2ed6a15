"""Graph analytics over the constructed KG (nodes/edges DataFrames).

- :func:`connected_components` — iterative min-label propagation
  (the Pregel/large-star family): each node's component label is the
  lexicographically smallest node id reachable from it. The driver
  runs the fixpoint loop (bounded by graph diameter); every iteration
  is two shuffles (edge-label join + min-aggregate), all JVM-side.
  At cluster scale the identical loop runs with ``localCheckpoint``
  every few rounds to truncate lineage — the per-iteration plan shape
  is what matters and it contains no Python.
- :func:`degree_stats` — in/out/total degree per node, one shuffle.

These are the "iterative algorithm" representatives: SQL cannot
express the fixpoint directly, but DuckDB's recursive CTE can — the
driver oracle in plans/queries.py uses exactly that, so even the
iterative operator is value-checked cross-engine.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def connected_components(
    nodes: "DataFrame",
    edges: "DataFrame",
    id_col: str = "iri",
    src_col: str = "subj",
    dst_col: str = "obj",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> "DataFrame":
    """(iri, comp) with comp = min node id in the undirected component."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist()
    )
    # seed labels from nodes UNION edge endpoints: an endpoint missing
    # from `nodes` must still self-label, or min-propagation both skips
    # its id as a candidate minimum and exits early on the changed
    # check (wrong components, silently)
    labels = (
        nodes.select(F.col(id_col).alias("node"))
        .union(und.select(F.col("a").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .persist()
    )
    converged = False
    try:
        for i in range(max_iter):
            prop = und.join(
                labels, und["a"] == labels["node"]
            ).select(und["b"].alias("node"), labels["comp"])
            new_labels = (
                labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                new_labels = new_labels.localCheckpoint()
            new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (component diameter exceeds max_iter); "
                "raise max_iter — unconverged labels would silently "
                "split real components"
            )
        return labels.select(F.col("node").alias(id_col), "comp")
    finally:
        und.unpersist()


def degree_stats(
    edges: "DataFrame", src_col: str = "subj", dst_col: str = "obj"
) -> "DataFrame":
    """(iri, out_deg, in_deg, total_deg) — one union + one shuffle."""
    out_d = edges.groupBy(F.col(src_col).alias("iri")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("iri")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "iri", "full_outer")
        .select(
            "iri",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("total_deg", F.col("out_deg") + F.col("in_deg"))
    )
