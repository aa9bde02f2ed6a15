"""Golden-fixture conformance tests for the pure-Python core parser.

Mirrors the reference's Jest golden suite
(/root/reference/test/MicrodataRdfParser-test.ts) via graph
isomorphism, like its ``toBeRdfIsomorphic`` matcher.
"""

import pytest

from microdata_rdf_streaming_parser_js_spark.fixtures import FIXTURES
from microdata_rdf_streaming_parser_js_spark.functions.isomorphism import (
    diff_summary,
    is_isomorphic,
)
from microdata_rdf_streaming_parser_js_spark.functions.microdata import parse_html


@pytest.mark.parametrize("fixture", FIXTURES, ids=[f.name for f in FIXTURES])
def test_fixture(fixture):
    actual = parse_html(fixture.html, fixture.base_iri)
    assert is_isomorphic(actual, fixture.expected), diff_summary(
        actual, fixture.expected
    )
