"""Unit tests for operators/serialize.py (N-Triples lines) and
operators/linking.fuzzy_link_mentions (Levenshtein record linkage)."""

import pytest

pytestmark = pytest.mark.spark

TRIPLE_COLS = (
    "url string, subj string, pred string, obj string, "
    "obj_kind string, obj_lang string, obj_datatype string"
)


def _lines(spark, rows):
    from microdata_rdf_streaming_parser_js_spark.operators.serialize import (
        to_ntriples,
    )

    df = spark.createDataFrame(rows, TRIPLE_COLS)
    return [r["line"] for r in to_ntriples(df).collect()]


def test_ntriples_terms_and_suffixes(spark):
    rows = [
        ("u", "http://e/s", "http://e/p", "http://e/o", "iri", None, None),
        ("u", "_:b0", "http://e/p", "_:b1", "blank", None, None),
        ("u", "http://e/s", "http://e/p", "hi", "literal", "en", None),
        ("u", "http://e/s", "http://e/p", "5", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    assert _lines(spark, rows) == [
        "<http://e/s> <http://e/p> <http://e/o> .",
        "_:b0 <http://e/p> _:b1 .",
        '<http://e/s> <http://e/p> "hi"@en .',
        '<http://e/s> <http://e/p> '
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    ]


def test_ntriples_echar_escaping(spark):
    # all five ECHARs, with backslash applied first so later escapes
    # don't double-escape it
    raw = 'a\\b"c\nd\re\tf'
    rows = [("u", "http://e/s", "http://e/p", raw, "literal", None, None)]
    (line,) = _lines(spark, rows)
    assert line == (
        '<http://e/s> <http://e/p> "a\\\\b\\"c\\nd\\re\\tf" .'
    )


def _fuzzy(spark, mentions, dictionary, **kw):
    from microdata_rdf_streaming_parser_js_spark.operators.linking import (
        fuzzy_link_mentions,
    )

    m = spark.createDataFrame([(x,) for x in mentions], "mention_key string")
    d = spark.createDataFrame(dictionary, "entity_id string, name string")
    return {
        r["mention_key"]: (r["entity_id"], r["distance"])
        for r in fuzzy_link_mentions(m, d, **kw).collect()
    }


def test_fuzzy_link_basic_and_band_exclusion(spark):
    out = _fuzzy(
        spark,
        ["alice", "bob"],
        [
            ("e1", "alicex"),     # distance 1
            ("e2", "aliceqqq"),   # distance 3: excluded by band+bound
            ("e3", "zzzzzzzzzz"), # unrelated
        ],
    )
    assert out == {"alice": ("e1", 1)}


def test_fuzzy_link_tiebreak_smaller_entity_id(spark):
    # smaller distance wins over smaller id (namex=1 vs znamo=2)
    out = _fuzzy(
        spark, ["name"], [("b-ent", "namex"), ("a-ent", "znamo")]
    )
    assert out == {"name": ("b-ent", 1)}
    # equal distance: smaller entity_id wins
    out2 = _fuzzy(spark, ["name"], [("b-ent", "namex"), ("a-ent", "namez")])
    assert out2 == {"name": ("a-ent", 1)}


def test_fuzzy_link_rejects_negative_distance(spark):
    with pytest.raises(ValueError, match="max_distance"):
        _fuzzy(spark, ["a"], [("e", "a")], max_distance=-1)
