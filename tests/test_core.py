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


def test_url_property_schemeless_base_errors():
    """Stream-error parity (reference MicrodataRdfParser.ts:325-333 +
    relative-to-absolute-iri): a URL property against a schemeless
    base IRI must raise (-> quarantine in the pipeline), not emit the
    raw attribute value as an IRI."""
    from microdata_rdf_streaming_parser_js_spark.functions.iri import (
        InvalidIriError,
    )

    html = (
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<a itemprop="url" href="page.html">x</a></div>'
    )
    with pytest.raises(InvalidIriError, match="invalid baseIRI"):
        parse_html(html, "no-scheme-base")
    # absolute href against the same broken base resolves fine (the
    # resolver only needs the base when the IRI is relative)
    ok = parse_html(html.replace("page.html", "http://x.example/p"), "no-scheme-base")
    assert any(
        t.obj == "http://x.example/p" and t.obj_kind == "iri" for t in ok
    )
    # literal-only items never touch the resolver
    lit = parse_html(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<span itemprop="name">ok</span></div>',
        "no-scheme-base",
    )
    assert len(lit) == 2
