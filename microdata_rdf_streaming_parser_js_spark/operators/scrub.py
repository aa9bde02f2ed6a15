"""PII scrubbing for training-data pipelines.

Emails, phone numbers, and IPv4 literals are replaced with placeholder
tokens (``<EMAIL>`` / ``<PHONE>`` / ``<IP>``) — the standard pre-release
redaction pass over web text. Everything is codegen'd
``regexp_replace`` / ``regexp_extract_all`` expressions (zero shuffles,
no UDF); the patterns are deliberately limited to the regex subset
where Java (Spark) and RE2 (DuckDB) agree — no lookaround, no
backreferences — so the DuckDB oracle replays redaction exactly.

The three pattern strings are the shared contract with the oracle SQL
in plans/queries.py — change both sides together.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

PII_PATTERNS = (
    # order matters: emails first (their local part could otherwise be
    # clipped by the phone pattern), then IPs, then phones
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"(\+\d{1,2}-)?\d{3}-\d{3,4}-\d{4}\b", "<PHONE>"),
)


def redact_pii(
    df: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """(doc_id, clean_text, n_email, n_ip, n_phone): placeholder-token
    redaction plus per-category match counts (counted on the ORIGINAL
    text, before any replacement interferes). Pure scan-side
    projection."""
    original = F.col(text_col)
    clean = original
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(original, F.lit(pat), 0)).cast(
                "long"
            ).alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, token)
    return df.select(
        F.col(id_col).alias("doc_id"), clean.alias("clean_text"), *counts
    )


def blocklist_filter(
    df: "DataFrame",
    terms: "tuple[str, ...] | list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
    max_ratio_u: int = 0,
) -> "DataFrame":
    """(doc_id, n_toks, hits, hit_ratio_u, keep): C4-style blocklist
    gate (Raffel et al. 2020 drop any page containing a term from the
    'List of Dirty, Naughty …' blocklist; this sandbox uses a neutral
    term list). Matching is exact on normalized whitespace tokens —
    the same tokenization every text operator here shares — so a term
    inside a longer word does NOT hit (C4 matches words, not
    substrings).

    hits = occurrences of any blocked token; hit_ratio_u =
    ``hits * scale div n_toks`` (0 for empty docs); keep =
    ``hit_ratio_u <= max_ratio_u`` — the default 0 is C4's
    zero-tolerance policy, a positive budget gives the
    Gopher/FineWeb-style soft gate.

    Scale shape: tokens explode scan-side; the term list is a
    plan-time literal ``isin`` filter (no join, no shuffle for the
    match itself — blocklists are a few thousand terms, well inside
    codegen); one map-side-combined shuffle sums hits per document.
    For six-figure blocklists swap the isin for a broadcast-join
    against a terms frame — same plan shape one node later.
    """
    from ..functions.text import _tokens

    terms = list(terms)
    if not terms:
        raise ValueError("blocklist_filter: empty term list")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(_tokens(F.col(text_col)), lambda t: t != "")).alias(
            "t"
        ),
    )
    hits = (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum(F.when(F.col("t").isin(terms), 1).otherwise(0))
            .cast("long")
            .alias("hits"),
        )
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    out = ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
        F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
    )
    ratio = F.when(
        F.col("n_toks") > 0, F.expr(f"(hits * {scale}) div n_toks")
    ).otherwise(F.lit(0))
    return out.select(
        "doc_id",
        "n_toks",
        "hits",
        ratio.cast("long").alias("hit_ratio_u"),
        (ratio <= max_ratio_u).alias("keep"),
    )
