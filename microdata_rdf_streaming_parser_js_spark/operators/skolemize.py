"""D3 — blank-node skolemization (pure column expressions, no UDF).

Blank labels ``_:bN`` are document-scoped; to make them globally unique
and stable across retries/resumes they become salted-hash IRIs keyed by
``(url, label)``:

    urn:skolem:<sha256(url || salt || label)>

Whole-stage-codegen'd JVM expressions — this stage adds no shuffle and
no Python crossing, so it is effectively free at 100 TB scale.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

DEFAULT_SALT = "mrsp-v1"


def _skolem(url: "Column", label: "Column", salt: str) -> "Column":
    return F.concat(
        F.lit("urn:skolem:"),
        F.sha2(F.concat(url, F.lit("|" + salt + "|"), label), 256),
    )


def skolemize(triples: "DataFrame", salt: str = DEFAULT_SALT) -> "DataFrame":
    """Replace blank subjects/objects with stable skolem IRIs.

    obj_kind 'blank' becomes 'iri' afterwards; subjects are rewritten
    in place (a subject starting with '_:' is by construction blank).
    """
    subj_blank = F.col("subj").startswith("_:")
    obj_blank = F.col("obj_kind") == "blank"
    return (
        triples.withColumn(
            "subj",
            F.when(subj_blank, _skolem(F.col("url"), F.col("subj"), salt)).otherwise(
                F.col("subj")
            ),
        )
        .withColumn(
            "obj",
            F.when(obj_blank, _skolem(F.col("url"), F.col("obj"), salt)).otherwise(
                F.col("obj")
            ),
        )
        .withColumn(
            "obj_kind", F.when(obj_blank, F.lit("iri")).otherwise(F.col("obj_kind"))
        )
    )
