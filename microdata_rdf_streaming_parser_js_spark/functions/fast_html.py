"""Fast whole-document HTML tokenizer (regex scanner).

Drop-in replacement for the stdlib-``html.parser`` tokenizer in
:mod:`html_events` for the extraction hot path. It produces the same
``handle_starttag / handle_startendtag / handle_endtag / handle_data``
callback stream and DELEGATES to the existing
:class:`~.html_events.HtmlTagEventParser` adapter instance for all
structural normalization (void elements, openImpliesClose, implicit
closes, first-wins attributes) — so the htmlparser2-parity semantics
live in exactly one place.

Scope: whole-document parsing (the extraction UDF always has the full
page per row). ``feed`` accumulates; ``end`` scans once. Equivalence
with the stdlib path is enforced by the golden conformance suite plus
differential fuzzing (tests/test_fast_html.py).
"""

from __future__ import annotations

import re
from html import unescape

from .html_events import HtmlTagEventParser, TagEventSink

_TAG_OPEN = re.compile(r"<(?:(/)\s*)?([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_MARKUP_SKIP = re.compile(r"<(!--|[!?/])")
# faithful port of the stdlib tokenizer's attrfind_tolerant: attr name
# must follow a separator (lookbehind), '=+' value indicator, bare
# values may not start with a quote, trailing separators consumed
_ATTR = re.compile(
    r"""((?<=['"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"""
    r"""('[^']*'|"[^"]*"|(?!['"])[^>\s]*))?(?:\s|/(?!>))*"""
)
# consume a start-tag body up to the closing '>' with quote skipping
_TAG_BODY = re.compile(r"""(?:[^>"']|"[^"]*"|'[^']*')*""")
# stdlib parity: a comment closes at '--' + optional ws + '>'
_COMMENT_CLOSE = re.compile(r"--\s*>")
# marked sections (<![CDATA[ ... ]]>, <![if ...]>): _markupbase parity
_MS_NAME = re.compile(r"([a-zA-Z][-_.a-zA-Z0-9]*)\s*")
_MS_CLOSE_DOUBLE = re.compile(r"]\s*]\s*>")
_MS_CLOSE_SINGLE = re.compile(r"]\s*>")
_MS_DOUBLE_KW = frozenset(["temp", "cdata", "ignore", "include", "rcdata"])
_MS_SINGLE_KW = frozenset(["if", "else", "endif"])
_RAWTEXT_END = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}


class FastHtmlTokenizer:
    """Tokenize ``end()``-time over the accumulated document."""

    def __init__(self, sink: TagEventSink):
        # the adapter carries ALL structural semantics; we bypass its
        # stdlib feed() and call its handle_* callbacks directly.
        self._adapter = HtmlTagEventParser(sink)
        self._chunks: list[str] = []

    def feed(self, data: str) -> None:
        self._chunks.append(data)

    def end(self) -> None:
        self._scan("".join(self._chunks))
        self._chunks.clear()
        self._adapter.end()

    # ------------------------------------------------------------------
    def _emit_text(self, raw: str) -> None:
        if raw:
            self._adapter.handle_data(unescape(raw) if "&" in raw else raw)

    def _scan(self, doc: str) -> None:  # noqa: PLR0912 - single hot loop
        adapter = self._adapter
        n = len(doc)
        pos = 0
        text_start = 0
        while pos < n:
            lt = doc.find("<", pos)
            if lt < 0:
                break
            m = _TAG_OPEN.match(doc, lt)
            if m is None:
                ms = _MARKUP_SKIP.match(doc, lt)
                if ms is None:
                    # stray '<' is literal text; keep scanning after it
                    pos = lt + 1
                    continue
                self._emit_text(doc[text_start:lt])
                if ms.group(1) == "!" and doc.startswith("<![", lt):
                    # marked section: closes at ']]>' (cdata family) or
                    # ']>' (if/else/endif) per _markupbase — NOT at the
                    # first '>'. Unknown keyword / missing name raises
                    # in the stdlib; delegate so even that is faithful.
                    mm = _MS_NAME.match(doc, lt + 3)
                    kw = mm.group(1).lower() if mm else None
                    if kw in _MS_DOUBLE_KW:
                        cre = _MS_CLOSE_DOUBLE
                    elif kw in _MS_SINGLE_KW:
                        cre = _MS_CLOSE_SINGLE
                    else:
                        adapter.feed(doc[lt:])
                        adapter.goahead(1)
                        pos = text_start = n
                        return
                    cm2 = cre.search(doc, lt + 3)
                    if cm2 is not None:
                        pos = text_start = cm2.end()  # unknown_decl: no events
                        continue
                    # unterminated at EOF: stdlib recovery — data up to
                    # and incl. the next '>', else next '<', else one
                    # char — then resume scanning
                    k = doc.find(">", lt + 1)
                    if k >= 0:
                        k += 1
                    else:
                        k2 = doc.find("<", lt + 1)
                        k = k2 if k2 >= 0 else lt + 1
                    self._emit_text(doc[lt:k])
                    pos = text_start = k
                    continue
                if ms.group(1) == "!--":
                    cm = _COMMENT_CLOSE.search(doc, ms.end())
                    if cm is None:
                        # stdlib close()-time recovery for an
                        # unterminated comment ('<!-->', '<!-- x'):
                        # emit data up to and including the next '>',
                        # else up to the next '<', else one char —
                        # then RESUME scanning (the stdlib does not
                        # swallow the rest of the document)
                        k = doc.find(">", lt + 1)
                        if k >= 0:
                            k += 1
                        else:
                            k2 = doc.find("<", lt + 1)
                            k = k2 if k2 >= 0 else lt + 1
                        self._emit_text(doc[lt:k])
                        pos = text_start = k
                        continue
                    close, close_end = cm.start(), cm.end()
                else:  # <!doctype> / <?pi> / bogus end tag "</!" "</>"
                    close = doc.find(">", ms.end())
                    close_end = close + 1
                if close < 0:
                    # unterminated markup at EOF: stdlib flushes it as text
                    self._emit_text(doc[lt:])
                    pos = n
                else:
                    pos = close_end
                text_start = pos
                continue

            self._emit_text(doc[text_start:lt])
            is_end, name = m.group(1, 2)
            name = name.lower()

            if is_end:
                close = doc.find(">", m.end())
                if close < 0:
                    # unterminated end tag at EOF: stdlib flushes as text
                    self._emit_text(doc[lt:])
                    pos = text_start = n
                    break
                adapter.handle_endtag(name)
                pos = text_start = close + 1
                continue

            # start tag: find its real end, honoring quoted attr values
            me = m.end()
            bm = _TAG_BODY.match(doc, me)
            i = bm.end()
            # bounded finds instead of slicing out a body_peek string
            if (
                (doc.find('"', me, i) != -1 or doc.find("'", me, i) != -1)
                and (doc.find("<", me, i) != -1 or doc.find(">", me, i) != -1)
            ):
                # quoted attr values containing angle brackets hit the
                # stdlib tokenizer's tolerant-regex recovery paths;
                # delegate the rest of the document for exact parity
                adapter.feed(doc[lt:])
                adapter.goahead(1)
                pos = text_start = n
                return
            if i < n and doc[i] != ">":
                # unterminated quoted attribute: the stdlib tokenizer's
                # recovery is an intricate backtracking dance; route the
                # rest of the document through the embedded stdlib
                # parser (the adapter IS one) for exact parity. This is
                # a broken-markup path, never the hot path. (pending
                # text before this tag was already emitted above)
                adapter.feed(doc[lt:])
                adapter.goahead(1)
                pos = text_start = n
                return
            if i >= n:
                # unterminated tag at EOF: stdlib emits the rest as data
                self._emit_text(doc[lt:])
                pos = text_start = n
                break
            # stdlib-parity attr loop: anchored matches from the end of
            # the tag-name match (which consumed trailing separators);
            # a non-matching remainder stops the loop, and a leftover
            # tail other than '>'/'/>' turns the whole tag into data.
            attrs: list[tuple[str, str | None]] = []
            k = m.end()
            while k < i:
                am = _ATTR.match(doc, k)
                if am is None or am.end() > i:
                    break
                aname = am.group(1).lower()
                value = am.group(3)
                if value is not None:
                    if value[:1] in "\"'" and value[:1] == value[-1:]:
                        value = value[1:-1]
                    if "&" in value:
                        value = unescape(value)
                attrs.append((aname, value))
                if am.end() == k:
                    break
                k = am.end()
            tail = doc[k : i + 1].strip()
            self_closing = tail == "/>"
            if tail == ">":
                adapter.handle_starttag(name, attrs)
            elif self_closing:
                adapter.handle_startendtag(name, attrs)
            elif doc.find('"', me, i) != -1 or doc.find("'", me, i) != -1:
                # junk tail AND quotes in the body: _TAG_BODY pairs
                # quotes greedily from the first one, the stdlib pairs
                # them at attr-value positions — when they disagree
                # (e.g. <r "=">">) the stdlib may accept a tag where we
                # see junk. Don't guess: replay the remainder through
                # the embedded stdlib parser for exact parity.
                adapter.feed(doc[lt:])
                adapter.goahead(1)
                pos = text_start = n
                return
            else:
                # quote-free junk inside the tag: stdlib emits the
                # whole tag as data
                self._emit_text(doc[lt : i + 1])
                pos = text_start = i + 1
                continue
            pos = text_start = i + 1

            # raw-text elements: script/style content is CDATA
            raw_re = _RAWTEXT_END.get(name)
            if raw_re is not None and not self_closing:
                em = raw_re.search(doc, pos)
                if em is None:
                    # unterminated script/style at EOF: the stdlib
                    # tokenizer discards the buffered CDATA; match it
                    pos = text_start = n
                    break
                if em.start() > pos:
                    adapter.handle_data(doc[pos:em.start()])
                pos = text_start = em.start()

        if text_start < n:
            self._emit_text(doc[text_start:])
