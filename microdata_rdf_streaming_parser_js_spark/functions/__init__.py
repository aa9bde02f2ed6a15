from .iri import InvalidIriError, is_valid_iri, resolve_iri
from .microdata import MicrodataExtractor, Triple, extract_text, parse_html
from .registry import DEFAULT_VOCAB_REGISTRY, RDF_NS, XSD_NS, derive_vocab

__all__ = [
    "parse_html",
    "extract_text",
    "Triple",
    "MicrodataExtractor",
    "is_valid_iri",
    "resolve_iri",
    "InvalidIriError",
    "derive_vocab",
    "DEFAULT_VOCAB_REGISTRY",
    "RDF_NS",
    "XSD_NS",
]
