#!/usr/bin/env python
"""Spark-free scaling control for the BENCH/BASELINE.md evidence.

Runs the identical per-page Microdata parser over the identical bench
pages with a raw ``multiprocessing.Pool`` — embarrassingly parallel,
zero coordination, no shuffle — at two process counts. The
core-normalized ratio is the HARDWARE's own 4->16 scaling
(frequency / memory-bandwidth roll-off as cores activate); dividing
the Spark pipeline's measured efficiency by this number isolates the
pipeline-intrinsic scaling the north-rule criterion is about.

Usage: python tools/scaling_control.py [N [4N]]   (defaults 4 16)
"""

from __future__ import annotations

import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pages(n: int = 40000) -> list[tuple[str, str]]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM '{_SF_DIR}/documents.parquet'"
    ).fetchall()

    def page(i: int, text: str) -> tuple[str, str]:
        words = text.split()
        url = f"http://host{i % 7}.example.org/a/{i}"
        return (url, f"""<!DOCTYPE html><html><head><title>doc {i}</title></head><body>
<article itemscope itemtype="http://schema.org/Article" itemid="{url}">
  <h1 itemprop="headline">{' '.join(words[:6])}</h1>
  <span itemprop="author" itemscope itemtype="http://schema.org/Person"><span itemprop="name">Author {i % 50}</span></span>
  <time itemprop="datePublished" datetime="2024-01-{1 + i % 28:02d}">jan</time>
  <div itemprop="articleBody">{text[:400]}</div>
  <a itemprop="url" href="/a/{i}">link</a>
</article></body></html>""")

    return [page(i, rows[i % len(rows)][0]) for i in range(n)]


def _work(chunk: list[tuple[str, str]]) -> int:
    from microdata_rdf_streaming_parser_js_spark.functions.fast_html import (
        FastHtmlTokenizer,
    )
    from microdata_rdf_streaming_parser_js_spark.functions.microdata import (
        MicrodataExtractor,
    )

    n = 0
    for url, html in chunk:
        ex = MicrodataExtractor(url, None)
        tok = FastHtmlTokenizer(ex)
        tok.feed(html)
        tok.end()
        n += len(ex.triples)
    return n


def run(pages: list, procs: int, passes: int = 3) -> float:
    chunks = [pages[i::procs] for i in range(procs)]
    best = 0.0
    with Pool(procs) as p:
        p.map(_work, [c[:50] for c in chunks])  # warm imports
        for _ in range(passes):
            t0 = time.time()
            sum(p.map(_work, chunks))
            best = max(best, len(pages) / (time.time() - t0))
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * n
    pages = _pages()
    rn, rn4 = run(pages, n), run(pages, n4)
    print(f"control {n} procs: {rn:.0f} pages/s ({rn / n:.0f}/proc)")
    print(f"control {n4} procs: {rn4:.0f} pages/s ({rn4 / n4:.0f}/proc)")
    print(f"hardware {n}->{n4} core-normalized efficiency: "
          f"{(rn4 / n4) / (rn / n):.3f}")


if __name__ == "__main__":
    main()
