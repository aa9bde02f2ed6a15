"""Special item-property handlers (ordered chain, first-registered order).

Ports the behavior of /root/reference/lib/propertyhandler/*.ts and the
handler table at /root/reference/lib/MicrodataRdfParser.ts:22-38:

1. any tag with a ``content`` attribute -> plain/lang-tagged literal
2. URL tags (a/area@href, audio...video@src, link@href, object@data)
   -> IRI resolved against the base IRI
3. data@value, meter@value -> xsd:integer / xsd:double / plain literal
4. time@datetime -> first-matching xsd temporal datatype, else plain

Terms are modeled as tuples:
  ('iri', value) | ('blank', label) | ('literal', value, lang, datatype)
"""

from __future__ import annotations

import re

from .iri import InvalidIriError, resolve_iri
from .jsnum import js_parse_float_ok, js_parse_int_ok
from .registry import XSD_NS

# Regexes ported verbatim from ItemPropertyHandlerTime.ts:10-23,
# including the single-digit-fraction quirk in duration seconds.
_TIME_REGEXES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^-?P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d)?S)?)?$"), "duration"),
    (re.compile(r"^\d+-\d\d-\d\dT\d\d:\d\d:\d\d((Z?)|([+-]\d\d:\d\d))$"), "dateTime"),
    (re.compile(r"^\d+-\d\d-\d\dZ?$"), "date"),
    (re.compile(r"^\d\d:\d\d:\d\d((Z?)|([+-]\d\d:\d\d))$"), "time"),
    (re.compile(r"^\d+-\d\d$"), "gYearMonth"),
    (re.compile(r"^\d+$"), "gYear"),
]

# tag -> URL attribute (lib/MicrodataRdfParser.ts:24-34)
URL_TAG_ATTRS: dict[str, str] = {
    "a": "href",
    "area": "href",
    "audio": "src",
    "embed": "src",
    "iframe": "src",
    "img": "src",
    "link": "href",
    "object": "data",
    "source": "src",
    "track": "src",
    "video": "src",
}

_NUMBER_TAGS = ("data", "meter")


def _literal(value: str, language: str | None):
    return ("literal", value, language or None, None)


def handle_content(tag: str, attrs: dict, base_iri: str, language: str | None):
    if "content" in attrs:
        return _literal(attrs["content"], language)
    return None


def handle_url(tag: str, attrs: dict, base_iri: str, language: str | None):
    attr = URL_TAG_ATTRS.get(tag)
    if attr is not None and attr in attrs:
        # relative-to-absolute-iri throws on a schemeless base; the
        # reference wraps onTagOpen in try/catch and emits a stream
        # error (MicrodataRdfParser.ts:325-333), aborting the page.
        # Letting InvalidIriError propagate routes the page into the
        # extract quarantine column — the distributed equivalent.
        return ("iri", resolve_iri(attrs[attr], base_iri))
    return None


def handle_number(tag: str, attrs: dict, base_iri: str, language: str | None):
    if tag in _NUMBER_TAGS and "value" in attrs:
        value = attrs["value"]
        datatype = None
        if js_parse_int_ok(value) and "." not in value:
            datatype = XSD_NS + "integer"
        elif js_parse_float_ok(value):
            datatype = XSD_NS + "double"
        if datatype:
            return ("literal", value, None, datatype)
        return _literal(value, None)
    return None


def handle_time(tag: str, attrs: dict, base_iri: str, language: str | None):
    if tag == "time" and "datetime" in attrs:
        value = attrs["datetime"]
        for regex, xsd_type in _TIME_REGEXES:
            if regex.match(value):
                return ("literal", value, None, XSD_NS + xsd_type)
        return _literal(value, None)
    return None


# Chain order matches the reference's handler list; every matching
# handler fires (the reference loop has no break,
# lib/MicrodataRdfParser.ts:400-409).
ITEM_PROPERTY_HANDLERS = (handle_content, handle_url, handle_number, handle_time)
