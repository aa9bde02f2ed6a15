"""D5 — triple dedup + subject canonicalization.

Dedup is a single shuffle on the full triple key; AQE coalesces the
post-shuffle partitions. Canonicalization maps co-referent subject IRIs
(same canonical entity key) onto one canonical IRI chosen
deterministically (min), via a mapping table that is broadcast when
small and sort-merge joined otherwise (Catalyst/AQE decides from stats;
we hint broadcast below a row threshold).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

TRIPLE_KEY = ["subj", "pred", "obj", "obj_kind", "obj_lang", "obj_datatype"]


def dedup_triples(triples: "DataFrame", per_graph: bool = False) -> "DataFrame":
    """Exact duplicate elimination over the RDF triple key.

    ``per_graph=True`` keeps one copy per (url, triple) — provenance-
    preserving; default collapses across the whole corpus (RDF set
    semantics). Map-side partial aggregation applies automatically
    (HashAggregate before the exchange).
    """
    key = (["url"] if per_graph else []) + TRIPLE_KEY
    return triples.dropDuplicates(key)


def canonicalize_subjects(
    triples: "DataFrame",
    mapping: "DataFrame",
    broadcast_threshold: int | None = 10_000_000,
    mapping_rows: int | None = None,
) -> "DataFrame":
    """Rewrite subj/obj IRIs through a (iri -> canonical_iri) mapping.

    ``mapping`` columns: ``iri``, ``canonical_iri``. Small mappings are
    broadcast (no shuffle of the big triples side); large ones are
    sort-merge joined (``hint("merge")`` — explicit, so a bad stats
    estimate can never force a 500M-row mapping into executor memory)
    with AQE skew splitting.

    The size gate is a capped probe: ``limit(threshold+1).count()``
    stops scanning once it has threshold+1 rows, so deciding is O(min
    (|mapping|, threshold)), not a full count. Pass ``mapping_rows``
    (e.g. from a count the caller already did) to skip the probe job
    entirely. ``broadcast_threshold=None`` leaves the strategy to
    Catalyst/AQE stats.
    """
    if broadcast_threshold is not None:
        n = mapping_rows
        if n is None:
            n = mapping.limit(broadcast_threshold + 1).count()
        if n <= broadcast_threshold:
            mapping = F.broadcast(mapping)
        else:
            mapping = mapping.hint("merge")
    m_subj = mapping.withColumnRenamed("iri", "subj").withColumnRenamed(
        "canonical_iri", "_canon_subj"
    )
    m_obj = mapping.withColumnRenamed("iri", "obj").withColumnRenamed(
        "canonical_iri", "_canon_obj"
    )
    out = (
        triples.join(m_subj, "subj", "left")
        .join(m_obj.withColumnRenamed("obj", "_m_obj"),
              (F.col("obj") == F.col("_m_obj")) & (F.col("obj_kind") == "iri"),
              "left")
        .withColumn("subj", F.coalesce("_canon_subj", "subj"))
        .withColumn("obj", F.coalesce("_canon_obj", "obj"))
        .drop("_canon_subj", "_canon_obj", "_m_obj")
    )
    return out
