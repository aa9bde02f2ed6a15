"""RDF serialization: triples DataFrame -> canonical N-Triples lines.

The reference emits RDFJS quads into a streaming serializer; the
Spark-native counterpart is a codegen'd column expression that formats
each (subj, pred, obj, obj_kind, obj_lang, obj_datatype) row as one
W3C N-Triples line (https://www.w3.org/TR/n-triples/):

- IRI terms as ``<iri>``; blank-node labels (``_:b0``) pass through
  for the pre-skolemization path;
- literals as ``"escaped"`` with ``@lang`` / ``^^<datatype>`` suffix;
- ECHAR escaping for the five characters N-Triples cannot carry raw in
  a literal: backslash, double quote, LF, CR, TAB (backslash first —
  order matters).

Everything is built-in string functions — whole-stage codegen, no UDF,
no shuffle: serialization is a map over however the triples are
already partitioned, ready for ``df.write.text`` sharded output.
IRIs are emitted as-is (the extractor already validated/resolved them;
a crawl IRI containing spaces or control chars would have been
quarantined upstream).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

# ECHAR pairs in application order: literal backslash FIRST, then the
# quote and control characters (each maps to backslash + letter).
_ESCAPES = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
)


def escape_literal(col: "Column") -> "Column":
    for raw, esc in _ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def _term(col: "Column") -> "Column":
    """IRI or blank-node label -> N-Triples term."""
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def to_ntriples(
    triples: "DataFrame", line_col: str = "line", keep: tuple[str, ...] = ()
) -> "DataFrame":
    """``triples`` plus a ``line`` column holding the N-Triples
    serialization of each row; ``keep`` lists passthrough columns
    (e.g. ``("url",)`` for provenance-sharded writes)."""
    obj_literal = F.concat(
        F.lit('"'),
        escape_literal(F.col("obj")),
        F.lit('"'),
        F.when(
            F.col("obj_lang").isNotNull(),
            F.concat(F.lit("@"), F.col("obj_lang")),
        )
        .when(
            F.col("obj_datatype").isNotNull(),
            F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
        )
        .otherwise(F.lit("")),
    )
    obj_term = F.when(F.col("obj_kind") == "literal", obj_literal).otherwise(
        _term(F.col("obj"))
    )
    line = F.concat(
        _term(F.col("subj")),
        F.lit(" "),
        F.lit("<"),
        F.col("pred"),
        F.lit("> "),
        obj_term,
        F.lit(" ."),
    )
    return triples.select(*keep, line.alias(line_col))
