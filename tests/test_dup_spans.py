"""dup_span_islands (wave 23b): Lee-et-al-style maximal duplicated
token spans. Plants verbatim quotes and checks exact span extents;
cross-engine exactness is the sweep's job (q_dup_spans)."""

import pytest
from pyspark.sql import functions as F

from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
    dup_span_islands,
)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_cross_doc_quote_span(spark):
    src = _words("a", 30)                       # doc 1: the original
    quote = " ".join(src.split()[5:17])         # 12 words of doc 1
    docs = spark.createDataFrame(
        [
            (1, src),
            (2, f"{_words('b', 5)} {quote} {_words('c', 5)}"),
        ],
        "doc_id int, text string",
    )
    rows = dup_span_islands(docs, k=8).collect()
    # quote occupies tokens 5..16 of doc 2; its 5 interior 8-grams
    # (starts 5..9) are non-first duplicates -> ONE maximal island
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["start_tok"], r["end_tok"],
            r["span_toks"], r["n_dup_grams"]) == (2, 5, 16, 12, 5)


def test_within_doc_repeat_flags_second_occurrence(spark):
    phrase = _words("p", 10)
    docs = spark.createDataFrame(
        [(7, f"{phrase} {_words('x', 6)} {phrase}")],
        "doc_id int, text string",
    )
    rows = dup_span_islands(docs, k=8).collect()
    # second occurrence starts at token 16; 3 duplicated 8-grams
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["start_tok"], r["end_tok"],
            r["span_toks"], r["n_dup_grams"]) == (7, 16, 25, 10, 3)


def test_exact_copy_is_one_full_span(spark):
    t = _words("z", 20)
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id int, text string"
    )
    rows = dup_span_islands(docs, k=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["start_tok"], r["end_tok"],
            r["span_toks"]) == (2, 0, 19, 20)


def test_no_duplicates_empty(spark):
    docs = spark.createDataFrame(
        [(1, _words("u", 12)), (2, _words("v", 12))],
        "doc_id int, text string",
    )
    assert dup_span_islands(docs, k=8).count() == 0


def test_k_guard(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="k must be"):
        dup_span_islands(docs, k=1)
