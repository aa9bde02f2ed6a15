"""PySpark-native knowledge-graph construction engine with the
HTML-Microdata -> RDF semantics of rubensworks/microdata-rdf-streaming-parser.js.

Layout:
- functions/  pure-Python per-document core (parser, IRI, handlers)
              + Spark column-expression helpers
- operators/  distributed stages (extract, skolemize, dedup, linking,
              similarity, multimodal)
- sources/    pages corpus synthesis + pluggable readers
- plans/      end-to-end pipeline assembly, checkpoint/resume
- streaming/  Structured Streaming variant
"""

from .functions.microdata import MicrodataExtractor, Triple, extract_text, parse_html

__all__ = ["parse_html", "extract_text", "Triple", "MicrodataExtractor"]
