"""Additional semantics pins derived from the reference source (not in
its golden suite) + hostile-input hardening."""

import pytest

from microdata_rdf_streaming_parser_js_spark.functions.microdata import parse_html

BASE = "http://example.org/document.html"
EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def triples(html):
    return {(t.subj, t.pred, t.obj, t.obj_kind, t.obj_lang, t.obj_datatype)
            for t in parse_html(html, BASE)}


def test_reverse_with_content_literal_dropped():
    # content handler yields a literal; reverse literals are dropped
    # (lib/MicrodataRdfParser.ts:433-437)
    assert triples(
        '<div itemscope><span itemprop-reverse="http://e/p" content="x">t</span></div>'
    ) == set()


def test_number_leading_whitespace_integer():
    # JS parseInt(' 3', 10) === 3; no '.' in raw value -> xsd:integer
    assert triples('<div itemscope><data itemprop="http://e/p" value=" 3"></data></div>') == {
        ("_:b0", "http://e/p", " 3", "literal", None, XSD + "integer")
    }


def test_number_exponent_counts_as_integer():
    # '3e2': parseInt -> 3 (ok), no '.' -> integer per the reference rule
    assert triples('<div itemscope><data itemprop="http://e/p" value="3e2"></data></div>') == {
        ("_:b0", "http://e/p", "3e2", "literal", None, XSD + "integer")
    }


def test_number_prefix_double():
    # '3.5abc': parseInt ok but '.' present; parseFloat ok -> double
    assert triples('<div itemscope><data itemprop="http://e/p" value="3.5abc"></data></div>') == {
        ("_:b0", "http://e/p", "3.5abc", "literal", None, XSD + "double")
    }


def test_time_date_with_z():
    assert triples(
        '<div itemscope><time itemprop="http://e/p" datetime="2012-03-18Z"></time></div>'
    ) == {("_:b0", "http://e/p", "2012-03-18Z", "literal", None, XSD + "date")}


def test_itemtype_mixed_valid_invalid():
    got = triples('<div itemscope itemtype="NotAnIri http://e/T"></div>')
    assert got == {
        ("_:b0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://e/T", "iri", None, None)
    }


def test_vocab_expansion_with_extra_prop():
    # 'p subPropertyOf' -> predicates {vocab+p, vocab+subPropertyOf} + rdf:type
    got = triples(
        '<div itemscope itemtype="http://e/T">'
        '<link itemprop="p subPropertyOf" href="http://e/H"></div>'
    )
    preds = {p for (_s, p, _o, _k, _l, _d) in got}
    assert "http://e/p" in preds
    assert "http://e/subPropertyOf" in preds
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" in preds


def test_duplicate_itemref_tokens_replay_twice_set_equal():
    got = triples(
        '<div itemscope itemid="http://e/s" itemref="a a"></div>'
        '<span id="a"><span itemprop="http://e/p">v</span></span>'
    )
    assert got == {("http://e/s", "http://e/p", "v", "literal", None, None)}


def test_itemprop_on_root_without_scope_ignored():
    assert triples('<span itemprop="http://e/p">x</span>') == set()


def test_content_on_itemscope_tag_itself():
    # itemscope+itemprop tag: nested-item rule wins over content handler
    got = triples(
        '<div itemscope><span itemprop="http://e/p" itemscope content="c"></span></div>'
    )
    assert got == {("_:b0", "http://e/p", "_:b1", "blank", None, None)}


def test_meta_void_content_inside_scope():
    got = triples('<div itemscope><meta itemprop="http://e/p" content="m">ignored</div>')
    assert ("_:b0", "http://e/p", "m", "literal", None, None) in got


class TestHardening:
    def test_oversized_page_quarantined(self, spark):
        from microdata_rdf_streaming_parser_js_spark.operators.extract import (
            extract_triples,
        )

        big = ("<div>" + "x" * 200 + "</div>") * 90_000  # ~19 MB
        pages = spark.createDataFrame(
            [("http://h/big", bytearray(big.encode())), ("http://h/ok",
              bytearray(b'<div itemscope itemtype="http://e/T"></div>'))],
            schema="url string, html binary",
        )
        out = extract_triples(pages, keep_errors=True)
        errs = {r.url: r.error for r in out.collect() if r.error}
        assert "http://h/big" in errs and "too large" in errs["http://h/big"]
        ok = [r for r in out.collect() if r.url == "http://h/ok" and not r.error]
        assert len(ok) == 1

    def test_null_html_quarantined(self, spark):
        from microdata_rdf_streaming_parser_js_spark.operators.extract import (
            extract_triples,
        )

        pages = spark.createDataFrame(
            [("http://h/null", None)], schema="url string, html binary"
        )
        out = extract_triples(pages, keep_errors=True).collect()
        assert out[0].error is not None


def test_empty_itemprop_no_crash():
    # itemprop="" yields an empty predicate list; the reference still
    # collects text for it (JS [] is truthy) and emits nothing
    assert triples("<div itemscope itemscope><div itemprop>x</div></div>") == set()
    assert triples('<div itemscope><span itemprop="">text</span></div>') == set()
    assert triples('<div itemscope><span itemprop=" ">text</span></div>') == set()
