"""HTML tag-event tokenizer with htmlparser2-compatible event emission.

Drives an ``onTagOpen(name, attrs) / onText(data) / onTagClose()``
sink the way the reference's htmlparser2@9 configuration does
(/root/reference/lib/MicrodataRdfParser.ts:302-352: ``decodeEntities:
true, recognizeSelfClosing: true``). Built on the stdlib
``html.parser.HTMLParser`` (``convert_charrefs=True`` matches
``decodeEntities``), plus a normalization layer reproducing
htmlparser2's HTML-mode structural fixups:

- void elements are implicitly closed right after opening;
  explicit ``</img>``-style end tags for voids are dropped
  (``</br>`` synthesizes an empty ``br`` element, as htmlparser2 does)
- ``openImpliesClose``: e.g. a new ``li`` closes an open ``li``,
  block elements close an open ``p``
- an end tag matching a non-top open tag implicitly closes everything
  above it; an unmatched ``</p>`` synthesizes an empty ``p``
- duplicate attributes keep the FIRST occurrence; valueless
  attributes get ``''``
- at end of input all remaining open tags are closed
- inside ``svg``/``math`` foreign content the void/implies-close
  fixups are disabled

The reference's ``xmlMode`` option maps to :class:`XmlTagEventParser`
(expat-based, case-preserving, strict) below.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Protocol


class TagEventSink(Protocol):
    def on_tag_open(self, name: str, attributes: dict[str, str]) -> None: ...
    def on_text(self, data: str) -> None: ...
    def on_tag_close(self) -> None: ...
    def on_end(self) -> None: ...


VOID_ELEMENTS = frozenset(
    "area base basefont br col command embed frame hr img input isindex "
    "keygen link meta param source track wbr".split()
)

_FORM_TAGS = frozenset(
    ["input", "option", "optgroup", "select", "button", "datalist", "textarea"]
)
_P_TAG = frozenset(["p"])
_TABLE_SECTION_TAGS = frozenset(["thead", "tbody"])
_DD_DT = frozenset(["dd", "dt"])
_RTP = frozenset(["rt", "rp"])

OPEN_IMPLIES_CLOSE: dict[str, frozenset[str]] = {
    "tr": frozenset(["tr", "th", "td"]),
    "th": frozenset(["th"]),
    "td": frozenset(["thead", "th", "td"]),
    "body": frozenset(["head", "link", "script"]),
    "li": frozenset(["li"]),
    "p": _P_TAG,
    "h1": _P_TAG,
    "h2": _P_TAG,
    "h3": _P_TAG,
    "h4": _P_TAG,
    "h5": _P_TAG,
    "h6": _P_TAG,
    "select": _FORM_TAGS,
    "input": _FORM_TAGS,
    "output": _FORM_TAGS,
    "button": _FORM_TAGS,
    "datalist": _FORM_TAGS,
    "textarea": _FORM_TAGS,
    "option": frozenset(["option"]),
    "optgroup": frozenset(["optgroup", "option"]),
    "dd": _DD_DT,
    "dt": _DD_DT,
    "address": _P_TAG,
    "article": _P_TAG,
    "aside": _P_TAG,
    "blockquote": _P_TAG,
    "details": _P_TAG,
    "div": _P_TAG,
    "dl": _P_TAG,
    "fieldset": _P_TAG,
    "figcaption": _P_TAG,
    "figure": _P_TAG,
    "footer": _P_TAG,
    "form": _P_TAG,
    "header": _P_TAG,
    "hr": _P_TAG,
    "main": _P_TAG,
    "nav": _P_TAG,
    "ol": _P_TAG,
    "pre": _P_TAG,
    "section": _P_TAG,
    "table": _P_TAG,
    "ul": _P_TAG,
    "rt": _RTP,
    "rp": _RTP,
    "tbody": _TABLE_SECTION_TAGS,
    "tfoot": _TABLE_SECTION_TAGS,
}

_FOREIGN_CONTEXT = frozenset(["math", "svg"])
_HTML_INTEGRATION = frozenset(
    ["mi", "mo", "mn", "ms", "mtext", "annotation-xml", "foreignobject", "desc", "title"]
)


class HtmlTagEventParser(HTMLParser):
    """Streaming tokenizer: feed() chunks, end() flushes implicit closes."""

    def __init__(self, sink: TagEventSink, xml_mode: bool = False):
        super().__init__(convert_charrefs=True)
        self._sink = sink
        self._xml = xml_mode
        self._stack: list[str] = []
        self._foreign: list[bool] = []

    # -- normalization helpers -------------------------------------------

    def _attrs_dict(self, attrs: list[tuple[str, str | None]]) -> dict[str, str]:
        out: dict[str, str] = {}
        for name, value in attrs:
            if name not in out:
                out[name] = value if value is not None else ""
        return out

    def _is_void(self, name: str) -> bool:
        return not self._xml and name in VOID_ELEMENTS

    def _open(self, name: str, attrs: dict[str, str]) -> None:
        if not self._xml and not (self._foreign and self._foreign[-1]):
            closes = OPEN_IMPLIES_CLOSE.get(name)
            if closes:
                while self._stack and self._stack[-1] in closes:
                    self._stack.pop()
                    self._sink.on_tag_close()
        void = self._is_void(name)
        if not void:
            self._stack.append(name)
            if name in _FOREIGN_CONTEXT:
                self._foreign.append(True)
            elif name in _HTML_INTEGRATION:
                self._foreign.append(False)
        self._sink.on_tag_open(name, attrs)
        if void:
            self._sink.on_tag_close()

    def _close(self, name: str) -> None:
        if name in _FOREIGN_CONTEXT or name in _HTML_INTEGRATION:
            if self._foreign:
                self._foreign.pop()
        if not self._is_void(name):
            stack = self._stack
            pos = len(stack) - 1
            while pos >= 0 and stack[pos] != name:  # last occurrence, no copy
                pos -= 1
            if pos >= 0:
                while len(stack) > pos:
                    stack.pop()
                    self._sink.on_tag_close()
            elif not self._xml and name == "p":
                self._open("p", {})
                if self._stack and self._stack[-1] == "p":
                    self._stack.pop()
                    self._sink.on_tag_close()
        elif not self._xml and name == "br":
            self._sink.on_tag_open("br", {})
            self._sink.on_tag_close()

    # position bookkeeping (lineno/offset) is only used for getpos();
    # skipping it shaves measurable time off the tokenizer hot loop
    def updatepos(self, i: int, j: int) -> int:
        return j

    # -- HTMLParser callbacks --------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        self._open(tag, self._attrs_dict(attrs))

    def handle_startendtag(self, tag: str, attrs) -> None:
        # recognizeSelfClosing: true -> '<x/>' is open+close even in
        # HTML mode (lib/MicrodataRdfParser.ts:348).
        attrs_d = self._attrs_dict(attrs)
        if self._is_void(tag):
            self._open(tag, attrs_d)  # _open emits the close for voids
        else:
            self._open(tag, attrs_d)
            if self._stack and self._stack[-1] == tag:
                self._stack.pop()
                if tag in _FOREIGN_CONTEXT or tag in _HTML_INTEGRATION:
                    if self._foreign:
                        self._foreign.pop()
                self._sink.on_tag_close()

    def handle_endtag(self, tag: str) -> None:
        self._close(tag)

    def handle_data(self, data: str) -> None:
        if data:
            self._sink.on_text(data)

    # comments / doctype / PIs carry no microdata and emit no text
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass

    def unknown_decl(self, data: str) -> None:
        pass

    # -- lifecycle ---------------------------------------------------------

    def end(self) -> None:
        super().close()
        while self._stack:
            self._stack.pop()
            self._sink.on_tag_close()
        self._sink.on_end()


class XmlTagEventParser:
    """Strict-X(HT)ML tokenizer for ``xmlMode`` parity, built on the
    stdlib C expat parser.

    Matches htmlparser2's xmlMode configuration
    (lib/MicrodataRdfParser.ts:346-350): tag/attribute case preserved,
    no void elements, no implied closes, self-closing tags recognized,
    only XML entities decoded. Malformed XML raises
    ``xml.parsers.expat.ExpatError`` (the reference emits a stream
    error; our extraction UDF quarantines it in the ``error`` column).
    """

    def __init__(self, sink: TagEventSink, xml_mode: bool = True):
        import xml.parsers.expat as expat

        self._sink = sink
        self._parser = expat.ParserCreate()
        self._parser.buffer_text = True
        self._parser.StartElementHandler = self._start
        self._parser.EndElementHandler = self._end
        self._parser.CharacterDataHandler = self._text
        self._ended = False

    def _start(self, name, attrs):
        self._sink.on_tag_open(name, attrs)

    def _end(self, name):
        self._sink.on_tag_close()

    def _text(self, data):
        if data:
            self._sink.on_text(data)

    def feed(self, data: str) -> None:
        self._parser.Parse(data, False)

    def end(self) -> None:
        if not self._ended:
            self._ended = True
            self._parser.Parse("", True)
        self._sink.on_end()
