"""Anchor-text extraction contract (operators/links.extract_anchors).

The q_anchor_texts oracle replays the SAME kernel, so these tests pin
the semantics against EXPLICIT expected values — the independent check
the shared-kernel oracle cannot provide.
"""

import pytest

from microdata_rdf_streaming_parser_js_spark.operators.links import (
    compute_anchors,
)


def test_anchor_kernel_explicit_values():
    html = (
        '<p>intro <a href="/plain/0">plain text</a> mid</p>'
        '<a href="http://abs.example.org/0"><b>bold</b> and <i>italic</i> run</a>'
        '<a href="/entities/0?a=1&amp;b=2">x &lt; y &amp; z</a>'
        "<a name='nh'>not a link</a>"
        '<a href="/outer">outer <a href="/inner">inner</a> tail</a>'
        '<a href="/void">before<br>after<img src="x.png">end</a>'
        '<table><tr><td><a href="/cell">cell link</a><tr><td>next</table>'
        '<a href="/eof">unclosed at eof'
    )
    assert compute_anchors(html) == [
        ("/plain/0", "plain text"),
        ("http://abs.example.org/0", "bold and italic run"),
        # entities decode in BOTH href and text
        ("/entities/0?a=1&b=2", "x < y & z"),
        # <a name> without href is not a link
        # nested <a>: the outer anchor is finalized at the inner open
        # (HTML5 implied close); trailing "tail" belongs to no anchor
        ("/outer", "outer"),
        ("/inner", "inner"),
        # void elements inside the anchor don't end it
        ("/void", "beforeafterend"),
        # implied-close table markup around the anchor
        ("/cell", "cell link"),
        # still-open anchor at EOF is finalized
        ("/eof", "unclosed at eof"),
    ]


def test_anchor_kernel_whitespace_and_case():
    assert compute_anchors(
        "<A HREF='/x'>  spaced\n\t out  </A>"
    ) == [("/x", "spaced out")]
    assert compute_anchors("<a href=''></a>") == [("", "")]
    assert compute_anchors("no links at all") == []
    assert compute_anchors(b"<a href='/b'>bytes</a>") == [("/b", "bytes")]


@pytest.mark.spark
def test_extract_anchors_operator(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.links import (
        extract_anchors,
        resolve_links,
    )

    pages = spark.createDataFrame(
        [
            ("http://h.example.org/d/p.html",
             '<a href="sub/x.html">rel <b>link</b></a><a href="/root">r2</a>'),
        ],
        "url string, html string",
    )
    rows = sorted(
        (r.dst_url, r.anchor_text)
        for r in resolve_links(extract_anchors(pages)).collect()
    )
    assert rows == [
        ("http://h.example.org/d/sub/x.html", "rel link"),
        ("http://h.example.org/root", "r2"),
    ]
