"""Unit tests for sources/warc.py: record-walk correctness
(non-response skipping, HTTP envelope stripping, extension headers),
malformed-stream errors, and the Spark binaryFile->pages roundtrip."""

import pytest

from microdata_rdf_streaming_parser_js_spark.sources.warc import (
    encode_warc,
    parse_warc,
)


def test_roundtrip_with_and_without_base_iri():
    recs = [("http://a/1", b"<p>hi</p>", "http://base/x"), ("http://a/2", b"<i>y</i>")]
    out = parse_warc(encode_warc(recs))
    assert [(u, h) for u, h, _ in out] == [
        ("http://a/1", b"<p>hi</p>"),
        ("http://a/2", b"<i>y</i>"),
    ]
    assert out[0][2]["warc-x-base-iri"] == "http://base/x"
    assert "warc-x-base-iri" not in out[1][2]
    # the empty-string base must survive (it is a valid parser base)
    out2 = parse_warc(encode_warc([("http://a/3", b"z", "")]))
    assert out2[0][2]["warc-x-base-iri"] == ""


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n"
        b"\r\n"
        b"robots: x"
        b"\r\n\r\n"
    )
    data = info + encode_warc([("http://a/1", b"<p>q</p>")])
    out = parse_warc(data)
    assert [(u, h) for u, h, _ in out] == [("http://a/1", b"<p>q</p>")]


def test_payload_without_http_envelope_passes_through():
    payload = b"<b></b"  # 6 bytes, no HTTP envelope, no CRLF CRLF
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://a/r\r\n"
        b"Content-Length: 6\r\n"
        b"\r\n"
    ) + payload
    out = parse_warc(raw)
    assert out[0][:2] == ("http://a/r", payload)


@pytest.mark.parametrize(
    "bad",
    [
        b"NOTWARC/1.0\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\n",  # unterminated headers
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n",  # no Content-Length
        (b"WARC/1.0\r\nWARC-Type: response\r\n"
         b"Content-Length: 99\r\n\r\nshort"),  # truncated payload
    ],
)
def test_malformed_warc_raises(bad):
    with pytest.raises(ValueError):
        parse_warc(bad)


@pytest.mark.spark
def test_read_warc_pages_binaryfile_roundtrip(spark, tmp_path):
    from microdata_rdf_streaming_parser_js_spark.sources.warc import read_warc_pages

    recs = [
        (f"http://h/{i}", f"<p itemscope>page {i}</p>".encode(), None)
        for i in range(7)
    ]
    (tmp_path / "a.warc").write_bytes(encode_warc(recs[:4]))
    (tmp_path / "b.warc").write_bytes(encode_warc(recs[4:]))
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    rows = read_warc_pages(spark, str(tmp_path)).collect()
    got = sorted((r["url"], r["html"], r["base_iri"]) for r in rows)
    want = sorted(
        (u, h.decode(), u) for u, h, _b in recs  # base falls back to url
    )
    assert got == want


def test_warc_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    urls = st.text(
        st.sampled_from(list("abcxyz0123./:-_")), min_size=1, max_size=30
    ).map(lambda s: "http://h/" + s)
    htmls = st.binary(min_size=0, max_size=200)
    bases = st.one_of(st.none(), st.just(""), urls)

    @settings(max_examples=50, deadline=None)
    @given(recs=st.lists(st.tuples(urls, htmls, bases), min_size=0, max_size=6))
    def check(recs):
        out = parse_warc(encode_warc(recs))
        assert [(u, h) for u, h, _hd in out] == [(u, h) for u, h, _b in recs]
        for (_u, _h, headers), (_u2, _h2, base) in zip(out, recs):
            if base is None:
                assert "warc-x-base-iri" not in headers
            else:
                assert headers["warc-x-base-iri"] == base

    check()


def test_http_envelope_charset_is_transport_default():
    """RFC 9110 Content-Type charset is honored as the LAST-RESORT
    default: it decodes pages with no in-document evidence, and loses
    to a meta declaration when one exists."""
    from microdata_rdf_streaming_parser_js_spark.sources.warc import (
        encode_warc,
        parse_warc,
    )
    from microdata_rdf_streaming_parser_js_spark.functions.charset import (
        decode_html,
    )

    plain = "caf\xe9 au lait sans d\xe9claration".encode("cp1252")
    warc = encode_warc(
        [("http://x.example/a", plain)],
        content_type='text/html; charset="ISO-8859-1"',
    )
    (url, html, headers), = parse_warc(warc)
    assert headers["x-http-charset"] == "iso-8859-1"
    assert decode_html(html, default=headers["x-http-charset"]) == (
        "café au lait sans déclaration"
    )
    # a meta declaration outranks a LYING transport header
    meta = "<meta charset=utf-8>café".encode("utf-8")
    warc2 = encode_warc(
        [("http://x.example/b", meta)],
        content_type="text/html; charset=shift_jis",
    )
    (_, html2, h2), = parse_warc(warc2)
    assert h2["x-http-charset"] == "shift_jis"
    assert decode_html(html2, default=h2["x-http-charset"]).endswith("café")


def test_read_warc_pages_uses_transport_charset(spark, tmp_path):
    from microdata_rdf_streaming_parser_js_spark.sources.warc import (
        encode_warc,
        read_warc_pages,
    )

    raw = "na\xefve \xe9t\xe9".encode("cp1252")
    (tmp_path / "t.warc").write_bytes(
        encode_warc([("http://x.example/p", raw)],
                    content_type="text/html; charset=windows-1252")
    )
    rows = read_warc_pages(spark, str(tmp_path)).collect()
    assert [r["html"] for r in rows] == ["na\xefve \xe9t\xe9"]
