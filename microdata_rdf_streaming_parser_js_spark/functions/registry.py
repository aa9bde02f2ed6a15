"""Vocabulary registry + property-URI generation rules.

Ports the W3C Microdata-to-RDF vocabulary rules as implemented by the
reference:

- default registry contents: /root/reference/lib/vocab-registry-default.json
  (mirrors https://www.w3.org/ns/md)
- ``deriveVocab``: /root/reference/lib/Util.ts:123-147
- ``createVocabIris``: /root/reference/lib/Util.ts:44-57
- ``getVocabularyExpansionType``: /root/reference/lib/Util.ts:65-89

All pure Python; the registry dict is captured in the extraction UDF's
closure and shipped once per executor (broadcast-equivalent).
"""

from __future__ import annotations

import re

from .iri import InvalidIriError, is_valid_iri, resolve_iri

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

# Default vocabulary registry (https://www.w3.org/ns/md): schema.org's
# additionalType acts as rdf:type via subPropertyOf expansion; the
# hcard prefix is registered with no property rules.
DEFAULT_VOCAB_REGISTRY: dict = {
    "http://schema.org/": {
        "properties": {
            "additionalType": {"subPropertyOf": RDF_NS + "type"},
        },
    },
    "http://microformats.org/profile/hcard": {},
}

# JS /\s+/u parity: include U+FEFF which JS \s matches but Python's doesn't.
_WS_SPLIT = re.compile(r"[\s﻿]+")


def split_ws(value: str) -> list[str]:
    """Split an attribute value on whitespace runs (JS ``/\\s+/u``)."""
    return _WS_SPLIT.split(value)


def derive_vocab(type_iri: str, vocab_registry: dict) -> str:
    """Vocabulary IRI for a type IRI (longest-prefix registry match,
    else strip after '#', else drop the last path segment)."""
    for uri_prefix in vocab_registry:
        if type_iri.startswith(uri_prefix):
            vocab = uri_prefix
            if not vocab.endswith("/"):
                vocab += "#"
            return vocab
    hash_pos = type_iri.find("#")
    if hash_pos > 0:
        return type_iri[: hash_pos + 1]
    return resolve_iri(".", type_iri)


def create_vocab_iris(
    terms: str, vocab: str | None, base_iri: str, allow_relative: bool
) -> list[str]:
    """IRI list for a whitespace-separated terms attribute.

    Relative terms are dropped when ``allow_relative`` is false
    (itemtype), else prefixed with the scope vocab or ``{base}#``
    (itemprop / itemprop-reverse).
    """
    out: list[str] = []
    for term in split_ws(terms):
        if not term:
            continue
        if not is_valid_iri(term):
            if not allow_relative:
                continue
            term = f"{vocab or f'{base_iri}#'}{term}"
        out.append(term)
    return out


def get_vocabulary_expansion_type(
    terms: str, vocab: str | None, vocab_registry: dict
) -> list[str]:
    """Predicates to append when the itemprop value triggers vocabulary
    expansion (literal subPropertyOf/equivalentProperty tokens, or a
    registry-declared property of the active vocab)."""
    parts = split_ws(terms)
    if "subPropertyOf" in parts or "equivalentProperty" in parts:
        return [RDF_NS + "type"]

    if vocab and vocab in vocab_registry:
        properties = vocab_registry[vocab].get("properties")
        if properties:
            predicates: list[str] = []
            for prop, expansions in properties.items():
                if prop in parts:
                    predicates = list(expansions.values())
            return predicates

    return []


def create_subject(itemid: str, base_iri: str) -> str | None:
    """Resolve an itemid to an absolute IRI, or None (-> blank-node
    fallback) when resolution fails (lib/Util.ts:96-105)."""
    if not is_valid_iri(itemid):
        try:
            itemid = resolve_iri(itemid, base_iri)
        except InvalidIriError:
            return None
    return itemid
