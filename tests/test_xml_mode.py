"""xmlMode parity tests: strict XML tokenizer (expat), case
preservation, self-closing handling, xml:lang, error on malformed."""

import pytest

from microdata_rdf_streaming_parser_js_spark.functions.microdata import (
    extract_text,
    parse_html,
)

BASE = "http://example.org/document.html"


def test_basic_xhtml():
    triples = parse_html(
        '<html><body><span itemscope="" itemtype="http://example.org/Type">'
        '<span itemprop="http://example.org/prop">abc</span></span></body></html>',
        BASE,
        xml_mode=True,
    )
    assert {(t.subj, t.pred, t.obj) for t in triples} == {
        ("_:b0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://example.org/Type"),
        ("_:b0", "http://example.org/prop", "abc"),
    }


def test_case_preserved():
    # In xmlMode tag/attr case is preserved: 'ITEMSCOPE' is NOT itemscope.
    triples = parse_html(
        '<html><body><span ITEMSCOPE="" itemtype="http://example.org/T"/></body></html>',
        BASE,
        xml_mode=True,
    )
    assert triples == []


def test_self_closing_and_void_not_special():
    # <link/> self-closes; a non-self-closed <link> wraps children in XML.
    triples = parse_html(
        '<root><span itemscope=""><link itemprop="http://e/p" href="http://x/y"/></span></root>',
        BASE,
        xml_mode=True,
    )
    assert ("_:b0", "http://e/p", "http://x/y") in {
        (t.subj, t.pred, t.obj) for t in triples
    }


def test_xml_lang():
    triples = parse_html(
        '<root><span itemscope="" xml:lang="en">'
        '<span itemprop="http://e/p">b</span></span></root>',
        BASE,
        xml_mode=True,
    )
    assert triples[0].obj_lang == "en"


def test_malformed_raises():
    import xml.parsers.expat

    with pytest.raises(xml.parsers.expat.ExpatError):
        parse_html("<a><b></a>", BASE, xml_mode=True)


def test_extract_text_xml():
    assert extract_text("<a>x<b>y</b>z</a>", xml_mode=True) == "xyz"


def test_xml_entities_decoded():
    triples = parse_html(
        '<r><s itemscope=""><p itemprop="http://e/p">a &amp; b</p></s></r>',
        BASE,
        xml_mode=True,
    )
    assert triples[0].obj == "a & b"
