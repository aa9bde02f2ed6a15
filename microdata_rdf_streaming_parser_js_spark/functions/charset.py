"""Charset sniffing + decoding for raw crawl bytes (pure Python).

SURVEY §2.1 S1 promises "charset from meta / UTF-8 fallback". The
reference parser consumes already-decoded JS strings (chunk
``toString()``, ``lib/MicrodataRdfParser.ts:94-97``) — decoding happens
upstream of it. At crawl scale WE are that upstream, so the decode
contract lives here: a deterministic, dependency-free subset of the
WHATWG encoding sniff. Several percent of a real Common-Crawl slice is
non-UTF-8 (windows-1252, Shift_JIS, GBK, ...); decoding those pages as
UTF-8 turns every non-ASCII literal into mojibake that matches nothing.

Algorithm (in priority order, mirroring the HTML5 prescan):

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win over any
   in-document declaration (the document *demonstrates* its encoding).
   The BOM itself is stripped from the decoded text.
2. **meta prescan** — the first ``PRESCAN_BYTES`` (1024) bytes are
   scanned for ``<meta charset=...>`` or
   ``<meta http-equiv=content-type content="...; charset=...">``
   (both quote styles + bare). Labels resolve through a WHATWG-informed
   alias table; per the spec's gotcha, ``iso-8859-1`` / ``ascii``
   resolve to **windows-1252** (cp1252) and a meta-declared ``utf-16``
   resolves to UTF-8 (an ASCII-compatible prescan cannot be trusted
   about UTF-16).
3. **UTF-8 fallback** — no BOM, no recognizable declaration.

Everything decodes with ``errors="replace"`` — a truncated multi-byte
sequence costs replacement characters, never a task failure (same
quarantine philosophy as operators/extract.py).

This module is imported inside Arrow UDF workers: keep it free of
Spark imports and module-level work beyond small dicts.
"""

from __future__ import annotations

import codecs
import re

#: how many leading bytes the meta prescan may inspect (HTML5 uses 1024)
PRESCAN_BYTES = 1024

# BOMs in longest-first order (UTF-16LE's FF FE is a prefix-free set
# here since we do not sniff UTF-32; WHATWG's prescan doesn't either).
_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# WHATWG-informed label -> Python codec table (subset: the encodings a
# crawl actually sees). Keys are lower-cased, trimmed labels. Notable
# spec behaviors kept: latin-1/ascii are windows-1252 in browsers;
# gb2312 is GBK; Shift_JIS is the Windows superset cp932; EUC-KR is
# the Windows superset cp949; x-user-defined falls back to cp1252.
_LABELS: dict[str, str] = {
    # UTF-8 family
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # windows-1252 and everything browsers treat as it
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "iso_8859-1": "cp1252",
    "iso88591": "cp1252", "latin-1": "cp1252", "latin1": "cp1252",
    "l1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "ansi_x3.4-1968": "cp1252", "x-user-defined": "cp1252",
    # other single-byte windows/iso pages
    "windows-1250": "cp1250", "cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-5": "iso8859-5", "iso-8859-7": "iso8859-7",
    "iso-8859-9": "cp1254",  # WHATWG: iso-8859-9 -> windows-1254
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "windows-874": "cp874", "tis-620": "cp874", "iso-8859-11": "cp874",
    # CJK
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "ms_kanji": "cp932", "ms932": "cp932",
    "windows-31j": "cp932", "cp932": "cp932",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp", "cseucpkdfmtjapanese": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "chinese": "gbk", "csgb2312": "gbk", "x-gbk": "gbk", "csiso58gb231280": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "csbig5": "big5", "x-x-big5": "big5",
    "euc-kr": "cp949", "cseuckr": "cp949", "korean": "cp949",
    "ks_c_5601-1987": "cp949", "ks_c_5601-1989": "cp949",
    "ksc_5601": "cp949", "ksc5601": "cp949", "windows-949": "cp949",
    # an ASCII-compatible prescan that "finds" utf-16 cannot be right:
    # WHATWG maps a meta-declared utf-16 label to UTF-8
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    "utf16": "utf-8",
}

# one pattern covers both declaration forms: `<meta charset=X>` and
# `<meta http-equiv=... content="text/html; charset=X">` — both carry
# a literal `charset=` inside the meta tag. Quoted or bare labels.
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:+-]+)",
    re.IGNORECASE,
)


def resolve_label(label: str | None) -> str | None:
    """WHATWG-style label -> Python codec name, or None if unknown."""
    if not label:
        return None
    return _LABELS.get(label.strip().strip("\"'").lower())


def sniff_charset(raw: bytes, prescan_bytes: int = PRESCAN_BYTES) -> str:
    """BOM -> meta prescan -> 'utf-8' fallback. Returns a Python codec
    name (one of the values of the alias table, or 'utf-8')."""
    for bom, name in _BOMS:
        if raw.startswith(bom):
            return name
    m = _META_CHARSET_RE.search(raw[:prescan_bytes])
    if m:
        resolved = resolve_label(m.group(1).decode("ascii", "replace"))
        if resolved is not None:
            return resolved
    return "utf-8"


def decode_html(raw, default: str | None = None) -> str:
    """Decode raw page bytes to text (str passes through unchanged).

    ``default`` (e.g. a charset from an HTTP/WARC header) is used only
    when the bytes carry no BOM and no recognizable meta declaration —
    in-document evidence outranks transport metadata, matching how
    browsers recover from mislabeled servers.
    """
    if raw is None or isinstance(raw, str):
        return raw
    raw = bytes(raw)
    for bom, name in _BOMS:
        if raw.startswith(bom):
            return raw[len(bom):].decode(name, errors="replace")
    m = _META_CHARSET_RE.search(raw[:PRESCAN_BYTES])
    if m:
        resolved = resolve_label(m.group(1).decode("ascii", "replace"))
        if resolved is not None:
            return raw.decode(resolved, errors="replace")
    if default is not None:
        resolved = resolve_label(default) or (
            default if _codec_exists(default) else None
        )
        if resolved is not None:
            return raw.decode(resolved, errors="replace")
    return raw.decode("utf-8", errors="replace")


def _codec_exists(name: str) -> bool:
    try:
        codecs.lookup(name)
        return True
    except LookupError:
        return False
