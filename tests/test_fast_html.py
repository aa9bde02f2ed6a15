"""Differential tests: FastHtmlTokenizer must emit the exact same
normalized event stream as the stdlib-backed HtmlTagEventParser on the
golden fixtures AND on hypothesis-fuzzed HTML-ish documents."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from microdata_rdf_streaming_parser_js_spark.fixtures import FIXTURES
from microdata_rdf_streaming_parser_js_spark.functions.fast_html import (
    FastHtmlTokenizer,
)
from microdata_rdf_streaming_parser_js_spark.functions.html_events import (
    HtmlTagEventParser,
)


class RecordingSink:
    def __init__(self):
        self.events = []
        self._text = []

    def _flush(self):
        if self._text:
            self.events.append(("text", "".join(self._text)))
            self._text = []

    def on_tag_open(self, name, attributes):
        self._flush()
        self.events.append(("open", name, dict(attributes)))

    def on_text(self, data):
        # text chunking may differ between tokenizers; coalesce
        self._text.append(data)

    def on_tag_close(self):
        self._flush()
        self.events.append(("close",))

    def on_end(self):
        self._flush()
        self.events.append(("end",))


def events_stdlib(doc: str):
    sink = RecordingSink()
    p = HtmlTagEventParser(sink)
    p.feed(doc)
    p.end()
    return sink.events


def events_fast(doc: str):
    sink = RecordingSink()
    p = FastHtmlTokenizer(sink)
    p.feed(doc)
    p.end()
    return sink.events


@pytest.mark.parametrize("fixture", FIXTURES, ids=[f.name for f in FIXTURES])
def test_fixture_event_parity(fixture):
    assert events_fast(fixture.html) == events_stdlib(fixture.html)


REALISTIC = [
    '<!DOCTYPE html><html lang="en"><head><meta charset="utf-8">'
    "<title>T &amp; U</title><style>p>a{color:red}</style></head>"
    '<body><p>one<p>two<ul><li>a<li>b</ul><img src="x.png" alt>'
    "<script>if (a<b) { x(\"</div>\"); }</script>tail</body></html>",
    "<table><tr><td>1<td>2<tr><td>3</table>",
    '<div itemscope itemtype="http://schema.org/Thing" ITEMPROP="p" itemprop="q">x</div>',
    "<p>a &notin; b &amp c &unknown; d &#65; e &#x42; f</p>",
    "<a href=/x//>text</a>",
    "<br/><br></br><hr>",
    "<div>unclosed <span>spans",
    "< notatag <3 <<div>ok</div>",
    "<!-- comment <div>no</div> --><p>after</p>",
    "<![CDATA[ not html ]]><p>x</p>",
    "<svg><title>svg title<circle/></title></svg>",
    "<select><option>a<option>b</select>",
    "text only, no tags at all & entities &lt;here&gt;",
    "",
    "<p attr='sq' other=\"dq\" bare=unquoted flag>mix</p>",
    # quote-pairing mismatch between the scanner's greedy TAG_BODY and
    # the stdlib's attr-value-positioned pairing: the scanner must
    # delegate, not guess data-vs-tag (soak regression)
    '<r "=">">',
    "<a href=<c;\nb\t><span itemid='x\"\"y' itemscope=b;c\"a itemref>t",
    "<x-y itemid lang><</style><style datetime=\"ba&'a; class=\"\nc \" itemprop=\"\t>&a'\">",
    # unterminated comment: stdlib EOF recovery emits up to the next
    # '>' as data then RESUMES scanning (soak regression)
    "<!--><l>",
    "a<!-- never closed <div>x</div>",
    # marked sections close at ']]>' / ']>' (not the first '>'), with
    # the same EOF recovery when unterminated (soak regression)
    "<![CDATA[ a>b ]]>after<p>x</p>",
    '<![CDATA[x</mi><table id="=>">',
    "<![if ie]>x<![endif]>tail",
    "<![rcdata[y>z]]>t",
]


@pytest.mark.parametrize("doc", REALISTIC, ids=range(len(REALISTIC)))
def test_realistic_event_parity(doc):
    assert events_fast(doc) == events_stdlib(doc)


_tag_names = st.sampled_from(
    ["div", "span", "p", "li", "ul", "a", "img", "br", "table", "tr", "td",
     "script", "style", "b", "i", "time", "meta", "link", "data"]
)
_attr_names = st.sampled_from(
    ["itemscope", "itemtype", "itemprop", "itemref", "itemid", "id", "lang",
     "href", "src", "content", "datetime", "value", "class"]
)
_attr_values = st.text(
    alphabet="abc &#;<'\"=/ \t\né", min_size=0, max_size=12
)
_texts = st.text(alphabet="ab &#;x<>/!-\n\té", min_size=0, max_size=20)


@st.composite
def html_docs(draw):
    parts = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 5))
        if kind == 0:
            parts.append(draw(_texts))
        elif kind == 1:
            name = draw(_tag_names)
            attrs = []
            for _ in range(draw(st.integers(0, 3))):
                a = draw(_attr_names)
                if draw(st.booleans()):
                    v = draw(_attr_values).replace('"', "")
                    attrs.append(f'{a}="{v}"')
                else:
                    attrs.append(a)
            slash = "/" if draw(st.booleans()) else ""
            parts.append(f"<{name} {' '.join(attrs)}{slash}>")
        elif kind == 2:
            parts.append(f"</{draw(_tag_names)}>")
        elif kind == 3:
            parts.append(f"<!-- {draw(_texts)} -->")
        elif kind == 4:
            parts.append(draw(st.sampled_from([
                "<", "< ", "<3", "<>", "<!", "<!x>", "<?pi>",
                "<!-->", "<![CDATA[x", "<![CDATA[ a>b ]]>", "]]>",
                "<![if x]>", '<a b="', "<a b='x", '<r "=">',
            ])))
        else:
            parts.append(f"&{draw(st.sampled_from(['amp;', 'lt;', 'notin;', 'amp', 'bogus;', '#65;', '#x42;']))}")
    return "".join(parts)


@settings(max_examples=400, deadline=None)
@given(html_docs())
def test_fuzz_event_parity(doc):
    assert events_fast(doc) == events_stdlib(doc)


@settings(max_examples=150, deadline=None)
@given(html_docs())
def test_fuzz_triple_parity(doc):
    from microdata_rdf_streaming_parser_js_spark.functions.microdata import (
        MicrodataExtractor,
    )

    def run(tokcls):
        ex = MicrodataExtractor("http://example.org/document.html")
        tk = tokcls(ex)
        tk.feed(doc)
        tk.end()
        return ex.triples

    assert run(FastHtmlTokenizer) == run(HtmlTagEventParser)


class RawSink:
    """No text coalescing — records each on_text call separately, like
    the reference's jest.fn() listener."""

    def __init__(self):
        self.events = []

    def on_tag_open(self, name, attributes):
        self.events.append(("open", name, dict(attributes)))

    def on_text(self, data):
        self.events.append(("text", data))

    def on_tag_close(self):
        self.events.append(("close",))

    def on_end(self):
        self.events.append(("end",))


_LISTENER_HTML = """<html>
<head></head>
<body>
    <span itemscope>
        <span itemprop="http://example.org/prop1">abc</span>
        <span itemprop="http://example.org/prop2">def</span>
        <span itemprop="http://example.org/prop3">ghi</span>
    </span>
</body>
</html>"""

# transcribed from /root/reference/test/MicrodataRdfParser-test.ts:
# 1813-1866 ("and call the HTML listener"): 7 opens with these exact
# attr dicts, 7 closes, 12 text calls with these exact payloads, 1 end
_LISTENER_EVENTS = [
    ("open", "html", {}),
    ("text", "\n"),
    ("open", "head", {}),
    ("close",),
    ("text", "\n"),
    ("open", "body", {}),
    ("text", "\n    "),
    ("open", "span", {"itemscope": ""}),
    ("text", "\n        "),
    ("open", "span", {"itemprop": "http://example.org/prop1"}),
    ("text", "abc"),
    ("close",),
    ("text", "\n        "),
    ("open", "span", {"itemprop": "http://example.org/prop2"}),
    ("text", "def"),
    ("close",),
    ("text", "\n        "),
    ("open", "span", {"itemprop": "http://example.org/prop3"}),
    ("text", "ghi"),
    ("close",),
    ("text", "\n    "),
    ("close",),
    ("text", "\n"),
    ("close",),
    ("text", "\n"),
    ("close",),
    ("end",),
]


@pytest.mark.parametrize("make", [HtmlTagEventParser, FastHtmlTokenizer],
                         ids=["stdlib", "fast"])
def test_listener_exact_event_sequence(make):
    sink = RawSink()
    p = make(sink)
    p.feed(_LISTENER_HTML)
    p.end()
    assert sink.events == _LISTENER_EVENTS
    assert sum(e[0] == "open" for e in sink.events) == 7
    assert sum(e[0] == "close" for e in sink.events) == 7
    assert sum(e[0] == "text" for e in sink.events) == 12


def test_listener_document_triples():
    from microdata_rdf_streaming_parser_js_spark.functions.microdata import (
        parse_html,
    )

    ts = parse_html(_LISTENER_HTML, "http://example.org/")
    got = sorted((t.pred, t.obj) for t in ts)
    assert got == [
        ("http://example.org/prop1", "abc"),
        ("http://example.org/prop2", "def"),
        ("http://example.org/prop3", "ghi"),
    ]
    assert {t.subj for t in ts} == {"_:b0"}
