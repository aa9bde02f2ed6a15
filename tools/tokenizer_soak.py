#!/usr/bin/env python
"""Extended differential soak of the fast tokenizer vs the stdlib
adapter — the long-running version of tests/test_fast_html.py's fuzz.

Generates hostile markup (raw quotes/angles inside attribute values,
unterminated comments, marked sections, bogus declarations, microdata
attrs incl. itemref chains) and asserts event-stream AND triple-stream
parity, including exception parity, between FastHtmlTokenizer and
HtmlTagEventParser.

Round-1 record: three 50-60k-doc runs (seeds 99 / 424242 / 31337 over
generator profiles "hostile" and "microdata") are clean after fixing
the three divergence classes this soak originally surfaced
(quote-pairing delegation, unterminated-comment recovery, marked
sections).

Usage: python tools/tokenizer_soak.py [n_docs] [seed] [profile]
       profile in {hostile, microdata}
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microdata_rdf_streaming_parser_js_spark.functions.fast_html import (  # noqa: E402
    FastHtmlTokenizer,
)
from microdata_rdf_streaming_parser_js_spark.functions.html_events import (  # noqa: E402
    HtmlTagEventParser,
)
from microdata_rdf_streaming_parser_js_spark.functions.microdata import (  # noqa: E402
    MicrodataExtractor,
)


class _Collector:
    def __init__(self):
        self.events = []
        self._buf = []

    def _flush(self):
        if self._buf:
            self.events.append(("text", "".join(self._buf)))
            self._buf.clear()

    def on_tag_open(self, name, attributes):
        self._flush()
        self.events.append(("open", name, dict(attributes)))

    def on_text(self, data):
        self._buf.append(data)

    def on_tag_close(self):
        self._flush()
        self.events.append(("close",))

    def on_end(self):
        self._flush()
        self.events.append(("end",))


def events(doc: str, tokcls):
    c = _Collector()
    tk = tokcls(c)
    tk.feed(doc)
    tk.end()
    return c.events


def triples(doc: str, tokcls):
    ex = MicrodataExtractor("http://example.org/document.html")
    tk = tokcls(ex)
    tk.feed(doc)
    tk.end()
    return ex.triples


def make_doc(rng: random.Random, profile: str) -> str:
    tags = ["div", "span", "p", "a", "br", "time", "meta", "data", "meter",
            "table", "tr", "td", "li", "ul", "script", "style", "svg",
            "math", "mi", "DIV", "x-y"]
    val_chars = "abc &#;<>'\"=/ \t\né🙂"
    txt_chars = "ab &#;x<>/!-\n\t'\"é]"

    def rs(chars, n):
        return "".join(rng.choice(chars) for _ in range(rng.randint(0, n)))

    parts = []
    for _ in range(rng.randint(0, 18)):
        k = rng.randint(0, 8)
        if k <= 1:
            parts.append(rs(txt_chars, 22))
        elif k <= 4:
            name = rng.choice(tags)
            attrs = []
            if profile == "microdata":
                if rng.random() < 0.5:
                    attrs.append("itemscope")
                if rng.random() < 0.4:
                    attrs.append(f'itemprop="{rng.choice(["p1", "p2", "http://e.x/p"])}"')
                if rng.random() < 0.3:
                    attrs.append(f'itemtype="http://schema.org/{rng.choice(["A", "B"])}"')
                if rng.random() < 0.25:
                    attrs.append(f'itemref="{rng.choice(["a", "b", "a b"])}"')
                if rng.random() < 0.25:
                    attrs.append(f'id="{rng.choice(["a", "b", "c"])}"')
                if rng.random() < 0.2:
                    attrs.append(f'itemid="{rs("ab:/.#", 8)}"')
            else:
                for _ in range(rng.randint(0, 4)):
                    a = rng.choice(["itemscope", "itemprop", "itemtype", "id",
                                    "lang", "href", "content", "datetime",
                                    "value", "class"])
                    style = rng.randint(0, 3)
                    v = rs(val_chars, 14)
                    if style == 0:
                        attrs.append(a)
                    elif style == 1:
                        attrs.append(f'{a}="{v.replace(chr(34), "")}"')
                    elif style == 2:
                        attrs.append(f"{a}='{v.replace(chr(39), '')}'")
                    else:
                        attrs.append(f"{a}={v.replace(' ', '') or 'x'}")
            slash = "/" if rng.random() < 0.25 else ""
            parts.append(f"<{name} {' '.join(attrs)}{slash}>")
        elif k == 5:
            parts.append(f"</{rng.choice(tags)}>")
        elif k == 6:
            parts.append(rng.choice([
                "<!--x-->", "<!-->", "<!--" + rs(txt_chars, 6),
                "<![CDATA[y]]>", "<![CDATA[", "<![if x]>", "<![endif]>",
                "<!doctype html>", "<?pi>",
            ]))
        elif k == 7:
            parts.append(rng.choice([
                "<", "< ", "<3", "<>", "<!", "<!x>", "</ >", "</>",
                '<a b="', "<a b='x", '<r "=">', "]]>", "]>",
            ]))
        else:
            parts.append("&" + rng.choice(
                ["amp;", "lt;", "notin;", "amp", "bogus;", "#65;", "#x42;", "#;"]
            ))
    return "".join(parts)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    profile = sys.argv[3] if len(sys.argv) > 3 else "hostile"
    rng = random.Random(seed)
    bad = 0
    for i in range(n):
        d = make_doc(rng, profile)

        def run(fn, tokcls):
            try:
                return fn(d, tokcls)
            except Exception as e:  # noqa: BLE001 - exception parity
                return ("EXC", type(e).__name__)

        ef, es = run(events, FastHtmlTokenizer), run(events, HtmlTagEventParser)
        if ef != es:
            print(f"EVENT DIVERGENCE at {i}: {d!r}")
            bad += 1
        elif run(triples, FastHtmlTokenizer) != run(triples, HtmlTagEventParser):
            print(f"TRIPLE DIVERGENCE at {i}: {d!r}")
            bad += 1
        if bad > 5:
            break
    print(f"soak({n=}, {seed=}, {profile=}):",
          "CLEAN" if bad == 0 else f"{bad} divergences")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
