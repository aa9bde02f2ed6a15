"""Charset sniff + decode contract (functions/charset.py).

SURVEY §2.1 S1: "charset from meta / UTF-8 fallback". The reference
parser consumes already-decoded strings (lib/MicrodataRdfParser.ts:
94-97, chunk toString()), so the decode step is this repo's own
contract; these tests pin it without Spark (pure kernels) plus the
library surface (parse_html over raw bytes).
"""

import codecs

import pytest

from microdata_rdf_streaming_parser_js_spark.functions.charset import (
    PRESCAN_BYTES,
    decode_html,
    resolve_label,
    sniff_charset,
)


# --- sniffing priority ------------------------------------------------------

def test_bom_beats_meta():
    raw = codecs.BOM_UTF8 + b"<meta charset=shift_jis>x"
    assert sniff_charset(raw) == "utf-8"
    assert decode_html(raw) == "<meta charset=shift_jis>x"  # BOM stripped


def test_utf16_boms():
    assert sniff_charset(codecs.BOM_UTF16_LE + b"a\x00") == "utf-16-le"
    assert sniff_charset(codecs.BOM_UTF16_BE + b"\x00a") == "utf-16-be"
    assert decode_html(codecs.BOM_UTF16_LE + "é中".encode("utf-16-le")) == "é中"


@pytest.mark.parametrize(
    ("decl", "want"),
    [
        (b'<meta charset="windows-1252">', "cp1252"),
        (b"<meta charset=ISO-8859-1>", "cp1252"),  # WHATWG latin-1 quirk
        (b"<meta charset='EUC-JP'>", "euc_jp"),
        (b'<META HTTP-EQUIV="Content-Type" '
         b'CONTENT="text/html; charset=Shift_JIS">', "cp932"),
        (b"<meta charset=gb2312>", "gbk"),  # WHATWG gb2312 -> GBK
        (b"<meta charset=utf-16le>", "utf-8"),  # ASCII prescan can't see utf-16
        (b"<meta charset=x-user-defined>", "cp1252"),
        (b"<meta charset=x-klingon>", "utf-8"),  # unknown -> fallback
    ],
)
def test_meta_labels(decl, want):
    assert sniff_charset(decl + b"<body>x</body>") == want


def test_prescan_window_bound():
    late = b'<meta data-pad="' + b"x" * (PRESCAN_BYTES + 200) + b'">' \
        + b"<meta charset=windows-1252>"
    assert sniff_charset(late) == "utf-8"
    # within the window it IS honored
    early = b"<meta charset=windows-1252>" + b"z" * 2000
    assert sniff_charset(early) == "cp1252"


def test_resolve_label_trims_and_quotes():
    assert resolve_label(' "UTF-8" ') == "utf-8"
    assert resolve_label("latin1") == "cp1252"
    assert resolve_label(None) is None
    assert resolve_label("no-such-charset") is None


# --- decoding ---------------------------------------------------------------

def test_decode_cp1252_exotics():
    # 0x80 (EURO) / 0x92 (RIGHT SINGLE QUOTE) are invalid in pure
    # latin-1; browsers (and we) decode them per windows-1252
    raw = b"<meta charset=iso-8859-1><span>\x80 \x92</span>"
    assert "€ ’" in decode_html(raw)


def test_decode_cjk_roundtrips():
    for codec, decl, text in [
        ("cp932", "shift_jis", "日本語テスト"),
        ("gbk", "gb2312", "中文测试"),
        ("euc_jp", "euc-jp", "演習データ"),
    ]:
        raw = f"<meta charset={decl}>{text}".encode(codec)
        assert text in decode_html(raw)


def test_default_used_only_without_in_document_evidence():
    latin1 = b"caf\xe9 au lait"
    assert decode_html(latin1, default="iso-8859-1") == "café au lait"
    # in-document meta outranks the transport default
    declared = "<meta charset=utf-8>café".encode("utf-8")
    assert decode_html(declared, default="shift_jis").endswith("café")


def test_decode_fallback_replaces_never_raises():
    out = decode_html(b"caf\xe9 plain")  # latin-1 bytes, no declaration
    assert "�" in out and out.startswith("caf")
    assert decode_html(None) is None
    assert decode_html("already str") == "already str"


# --- library surface --------------------------------------------------------

def test_parse_html_sniffs_bytes():
    from microdata_rdf_streaming_parser_js_spark import parse_html

    src = ('<meta charset=windows-1252>'
           '<div itemscope itemtype="http://schema.org/Thing">'
           '<span itemprop="name">l’été – café</span></div>')
    triples = parse_html(src.encode("cp1252"), "http://x.example/")
    names = [t.obj for t in triples if t.pred.endswith("/name")]
    assert names == ["l’été – café"]


def test_extract_text_sniffs_bytes():
    from microdata_rdf_streaming_parser_js_spark import extract_text

    raw = codecs.BOM_UTF16_LE + "<p>中 é</p>".encode("utf-16-le")
    assert extract_text(raw) == "中 é"
