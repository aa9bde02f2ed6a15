"""PII redaction + span dedup contracts (explicit expected values)."""

import pytest

pytestmark = pytest.mark.spark


def test_redact_pii_explicit(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.scrub import (
        redact_pii,
    )

    d = spark.createDataFrame(
        [
            (0, "mail a.b+c@sub.example.org and bob@x.co end"),
            (1, "server at 192.168.0.1 port 80, call +1-555-867-5309"),
            (2, "bare phone 555-867-5309 and no-match 12-34"),
            (3, "clean text only"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(d).collect()}
    assert rows[0].clean_text == "mail <EMAIL> and <EMAIL> end"
    assert (rows[0].n_email, rows[0].n_ip, rows[0].n_phone) == (2, 0, 0)
    assert rows[1].clean_text == "server at <IP> port 80, call <PHONE>"
    assert (rows[1].n_email, rows[1].n_ip, rows[1].n_phone) == (0, 1, 1)
    assert rows[2].clean_text == "bare phone <PHONE> and no-match 12-34"
    assert rows[3].clean_text == "clean text only"
    assert (rows[3].n_email, rows[3].n_ip, rows[3].n_phone) == (0, 0, 0)


def test_span_dedup_first_occurrence_wins(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        span_dedup,
    )

    boiler = "one two three four five"  # 5 words = one span at span_words=5
    d = spark.createDataFrame(
        [
            (0, boiler + " unique tail words here now"),
            (1, boiler + " other trailing content words go"),
            (2, "totally different words in this doc"),
        ],
        "doc_id bigint, text string",
    )
    out = {(r.doc_id, r.span_no): r.keep for r in span_dedup(d, span_words=5).collect()}
    # the shared boilerplate span: doc 0 (first) keeps, doc 1 drops
    assert out[(0, 0)] is True and out[(1, 0)] is False
    # every other span is unique -> kept
    # every other span is unique -> kept (doc 2's 6 words = 5+1 spans)
    assert out[(0, 1)] and out[(1, 1)] and out[(2, 0)] and out[(2, 1)]
    assert len(out) == 6


def test_span_dedup_trailing_short_span_kept(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        span_dedup,
    )

    d = spark.createDataFrame(
        [(0, "a b c d e f g")],  # 7 words -> spans of 5 + trailing 2
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r.span_no, r.keep) for r in span_dedup(d, span_words=5).collect()
    )
    assert rows == [(0, True), (1, True)]
