"""Unit tests for IRI / vocab / JS-number utilities.

Pins the pure-function behaviors the reference tests pin
(/root/reference/test/Util-test.ts) plus resolution edge cases the
golden suite depends on.
"""

import pytest

from microdata_rdf_streaming_parser_js_spark.functions.iri import (
    InvalidIriError,
    is_valid_iri,
    resolve_iri,
)
from microdata_rdf_streaming_parser_js_spark.functions.jsnum import (
    js_parse_float_ok,
    js_parse_int_ok,
)
from microdata_rdf_streaming_parser_js_spark.functions.registry import (
    create_vocab_iris,
    derive_vocab,
    get_vocabulary_expansion_type,
)


class TestIsValidIri:
    def test_plain_string(self):
        assert not is_valid_iri("string")

    def test_prefixed(self):
        assert is_valid_iri("ex:abc")

    def test_url(self):
        assert is_valid_iri("http://example.org/")

    def test_space_rejected(self):
        assert not is_valid_iri("http://example.org/a b")

    def test_underscore_scheme(self):
        assert is_valid_iri("_:b0")


class TestDeriveVocab:
    # test/Util-test.ts:44-68
    def test_hash_empty_registry(self):
        assert derive_vocab("http://ex.org/a/b/c#xyz", {}) == "http://ex.org/a/b/c#"

    def test_last_segment_empty_registry(self):
        assert derive_vocab("http://ex.org/a/b/c", {}) == "http://ex.org/a/b/"
        assert derive_vocab("http://ex.org/a/b/c/", {}) == "http://ex.org/a/b/c/"

    def test_prefix_with_slash(self):
        assert (
            derive_vocab("http://ex.org/a/b/c#xyz", {"http://ex.org/": {}})
            == "http://ex.org/"
        )

    def test_prefix_without_slash_appends_fragment(self):
        assert (
            derive_vocab("http://ex.org/value/b/c#xyz", {"http://ex.org/value": {}})
            == "http://ex.org/value#"
        )


class TestResolveIri:
    BASE = "http://example.org/document.html"

    def test_relative(self):
        assert resolve_iri("id", self.BASE) == "http://example.org/id"

    def test_hash_relative(self):
        assert resolve_iri("#id", self.BASE) == self.BASE + "#id"

    def test_empty_returns_base(self):
        assert resolve_iri("", self.BASE) == self.BASE

    def test_absolute_passthrough(self):
        assert resolve_iri("http://ex.org/x", self.BASE) == "http://ex.org/x"

    def test_no_base_raises(self):
        with pytest.raises(InvalidIriError):
            resolve_iri("id", "")

    def test_dot_drops_last_segment(self):
        assert resolve_iri(".", "http://ex.org/a/b/c") == "http://ex.org/a/b/"
        assert resolve_iri(".", "http://ex.org/a/b/c/") == "http://ex.org/a/b/c/"
        assert resolve_iri(".", "http://ex.org") == "http://ex.org/"

    def test_base_fragment_stripped(self):
        assert resolve_iri("x", "http://ex.org/a#frag") == "http://ex.org/x"

    def test_protocol_relative(self):
        assert resolve_iri("//other.org/p", self.BASE) == "http://other.org/p"

    def test_query_relative(self):
        assert resolve_iri("?q=1", self.BASE) == self.BASE + "?q=1"

    def test_parent_segments(self):
        assert resolve_iri("../x", "http://ex.org/a/b/c") == "http://ex.org/a/x"


class TestCreateVocabIris:
    def test_absolute_kept(self):
        assert create_vocab_iris("http://ex.org/T", None, "", False) == ["http://ex.org/T"]

    def test_relative_dropped_when_disallowed(self):
        assert create_vocab_iris("T", None, "http://b/", False) == []

    def test_relative_uses_vocab(self):
        assert create_vocab_iris("p", "http://v/", "http://b", True) == ["http://v/p"]

    def test_relative_uses_base_hash_without_vocab(self):
        assert create_vocab_iris("p", None, "http://b", True) == ["http://b#p"]

    def test_multi_whitespace(self):
        assert create_vocab_iris(
            " http://a/1\thttp://a/2\nhttp://a/3 ", None, "", False
        ) == ["http://a/1", "http://a/2", "http://a/3"]


class TestVocabExpansion:
    def test_subpropertyof_literal(self):
        assert get_vocabulary_expansion_type("subPropertyOf", None, {}) == [
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        ]

    def test_registry_property(self):
        reg = {"http://v/": {"properties": {"p": {"x": "http://e/E"}}}}
        assert get_vocabulary_expansion_type("p", "http://v/", reg) == ["http://e/E"]

    def test_registry_without_properties(self):
        assert get_vocabulary_expansion_type("p", "http://v/", {"http://v/": {}}) == []

    def test_no_match(self):
        assert get_vocabulary_expansion_type("other", None, {}) == []


class TestJsNumbers:
    def test_int_prefix_parse(self):
        assert js_parse_int_ok("3abc")
        assert js_parse_int_ok(" 42")
        assert js_parse_int_ok("-7x")
        assert not js_parse_int_ok("abc")
        assert not js_parse_int_ok("")
        assert not js_parse_int_ok(".5")

    def test_float_prefix_parse(self):
        assert js_parse_float_ok("1.5x")
        assert js_parse_float_ok(".5")
        assert js_parse_float_ok("Infinity")
        assert js_parse_float_ok("1e3")
        assert not js_parse_float_ok("x1")
