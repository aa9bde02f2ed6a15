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
