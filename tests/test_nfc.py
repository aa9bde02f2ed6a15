"""Unicode-NFC-aware dedup (wave 23c): functions/text.nfc_digest +
operators/dedup.nfc_dedup. Cross-engine exactness is the sweep's job
(q_nfc_dedup); these pin the normalization semantics."""

from microdata_rdf_streaming_parser_js_spark.functions.text import nfc_digest
from microdata_rdf_streaming_parser_js_spark.operators.dedup import nfc_dedup

# (composed, decomposed) pairs that must digest identically
PAIRS = [
    ("café", "café"),                 # combining acute
    ("naïve", "naïve"),               # combining diaeresis
    ("각", "각"),            # Hangul jamo -> syllable
    ("ṩ", "ṩ"),                 # mark reordering
    ("Å", "Å"),                       # Angstrom sign -> Å
]


def test_nfc_digest_merges_encoding_variants():
    for composed, decomposed in PAIRS:
        assert nfc_digest(composed) == nfc_digest(decomposed), composed


def test_nfc_is_not_nfkc():
    # ligature fi is NFC-invariant (compatibility decomposition only)
    assert nfc_digest("ﬁ") != nfc_digest("fi")


def test_nfc_digest_none_is_empty():
    assert nfc_digest(None) == nfc_digest("")


def test_nfc_dedup_operator(spark):
    docs = spark.createDataFrame(
        [
            (1, "the café report"),
            (2, "the café report"),      # decomposed twin of 1
            (3, "an unrelated document"),
        ],
        "doc_id long, text string",
    )
    rows = {r["digest"]: r for r in nfc_dedup(docs).collect()}
    assert len(rows) == 2
    merged = [r for r in rows.values() if r["n_dups"] == 2]
    assert len(merged) == 1
    assert merged[0]["canonical_doc_id"] == 1
