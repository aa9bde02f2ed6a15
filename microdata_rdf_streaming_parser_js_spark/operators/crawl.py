"""Crawl governance: robots.txt (RFC 9309) URL filtering.

The step between fetching and processing in any compliant crawl
pipeline: given the corpus of pages and the per-host robots.txt
bodies, keep only URLs the configured agent may crawl.

Shape: pages join the robots table on a regex-extracted host, then an
Arrow ``mapInPandas`` stage applies the RFC longest-match semantics —
rule parsing is cached per distinct robots body within each batch, so
the per-row work is one regex scan over the pre-compiled rule list.
Matching is genuinely imperative (wildcards, $-anchors, longest-match/
allow-wins tie rule), which is exactly the documented threshold for
dropping to a Python kernel.

The join strategy is SIZE-GATED, same capped-probe gate as
``canonicalize_subjects``: a small robots table broadcasts (the page
side never shuffles), but "one row per host" at Common-Crawl scale is
~10^8 hosts x KB-scale bodies — tens of GB, an executor OOM if
broadcast unconditionally — so above the threshold the join is an
explicit sort-merge on ``_host``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.robots import parse_robots, url_allowed
from .links import HOST_PATTERN

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

_PATH_PATTERN = r"^https?://[^/]+(/.*)?$"


def robots_filter(
    pages: "DataFrame",
    robots: "DataFrame",
    agent: str = "sparkbot",
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
    broadcast_threshold: int | None = 1_000_000,
    robots_rows: int | None = None,
) -> "DataFrame":
    """``pages`` plus an ``allowed`` boolean per row: whether ``agent``
    may crawl the URL under its host's robots.txt (hosts with no
    robots row are allowed, per the protocol's missing-file rule).
    Callers filter on it; keeping the column makes the decision
    auditable.

    The size gate is a capped probe (``limit(threshold+1).count()`` —
    O(min(|robots|, threshold)), not a full count); pass ``robots_rows``
    from a count the caller already has to skip the probe job, or
    ``broadcast_threshold=None`` to leave the strategy to Catalyst/AQE
    stats. The threshold is rows, deliberately lower than
    canonicalize's: robots rows carry KB-scale bodies, not bare IRIs.
    """
    import pandas as pd

    out_schema = T.StructType(
        list(pages.schema.fields) + [T.StructField("allowed", T.BooleanType(), True)]
    )
    robots_kv = robots.select(
        F.col(host_col).alias("_host"), F.col(txt_col).alias("_robots")
    )
    if broadcast_threshold is not None:
        n = robots_rows
        if n is None:
            n = robots_kv.limit(broadcast_threshold + 1).count()
        if n <= broadcast_threshold:
            robots_kv = F.broadcast(robots_kv)
        else:
            robots_kv = robots_kv.hint("merge")
    joined = pages.withColumn(
        "_host", F.regexp_extract(F.col(url_col), HOST_PATTERN, 1)
    ).join(robots_kv, "_host", "left")
    page_cols = [f.name for f in pages.schema.fields]

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import re

        path_rx = re.compile(_PATH_PATTERN)
        cache: dict[str, list] = {}
        for pdf in batches:
            allowed = []
            for url, txt in zip(pdf[url_col], pdf["_robots"]):
                if txt is None:
                    allowed.append(True)
                    continue
                rules = cache.get(txt)
                if rules is None:
                    rules = cache[txt] = parse_robots(txt, agent)
                m = path_rx.match(url or "")
                path = (m.group(1) or "/") if m else "/"
                allowed.append(url_allowed(rules, path))
            out = pdf[page_cols].copy()
            out["allowed"] = allowed
            yield out

    return joined.mapInPandas(fn, schema=out_schema)
