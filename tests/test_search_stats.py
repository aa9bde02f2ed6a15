"""Unit tests for operators/search.py (integer BM25) and
operators/stats.py (exact grouped quantiles): hand-checkable corpora
plus a pure-Python mirror of the documented integer formula, and the
input-validation guards."""

import pytest

pytestmark = pytest.mark.spark

SCALE = 1_000_000
K1_U = 1_200_000
B_U = 750_000
CAP = 1_000_000_000_000


def _bm25_py(docs, terms):
    """Pure-Python mirror of the documented micro-unit BM25 formula."""
    toks = {d: t.split() for d, t in docs.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(docs)
    avgdl = max(1, sum(dl.values()) // n)
    c2 = (K1_U * B_U) // SCALE
    c1 = K1_U - c2
    tf = {
        (d, t): toks[d].count(t)
        for d in docs
        for t in set(toks[d])
        if t in terms
    }
    df = {t: sum(1 for (d2, t2) in tf if t2 == t) for t in terms}
    scores = {}
    for (d, t), f in tf.items():
        idf = min(((n - df[t] + 1) * SCALE) // (df[t] + 1), CAP)
        denom = f * SCALE + c1 + (c2 * dl[d]) // avgdl
        tfnorm = (f * (K1_U + SCALE) * SCALE) // denom
        scores[d] = scores.get(d, 0) + (idf * tfnorm) // SCALE
    return scores


def test_bm25_matches_python_mirror(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import bm25_topk

    docs = {1: "x x y", 2: "y z", 3: "z z z z", 4: "w w w"}
    sdf = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["score_u"]
        for r in bm25_topk(sdf, ("x", "z"), topk=10).collect()
    }
    assert out == _bm25_py(docs, ("x", "z"))
    # doc 4 matches no query term and must be absent, not zero-scored
    assert 4 not in out


def test_bm25_topk_tie_break_by_doc_id(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import bm25_topk

    # four identical docs tie exactly; topk=2 must keep the smallest ids
    sdf = spark.createDataFrame(
        [(i, "q q r") for i in (9, 3, 7, 5)], "doc_id long, text string"
    )
    rows = bm25_topk(sdf, ("q",), topk=2).collect()
    assert [r["doc_id"] for r in rows] == [3, 5]
    assert rows[0]["score_u"] == rows[1]["score_u"]


def test_bm25_empty_terms_raises(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import bm25_topk

    sdf = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(sdf, ())


def test_group_quantiles_exact_ranks(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        group_quantiles_u,
    )

    rows = [("g", float(v)) for v in (1, 2, 3, 4)] + [("h", 10.5)]
    sdf = spark.createDataFrame(rows, "k string, value double")
    out = {
        (r["k"], r["q_u"]): r["quantile_u"]
        for r in group_quantiles_u(sdf, "k", "value").collect()
    }
    # ceil-rank selection: p50 of 4 rows -> rank 2; p90/p99 -> rank 4
    assert out == {
        ("g", 500_000): 2_000_000,
        ("g", 900_000): 4_000_000,
        ("g", 990_000): 4_000_000,
        ("h", 500_000): 10_500_000,
        ("h", 900_000): 10_500_000,
        ("h", 990_000): 10_500_000,
    }


def test_group_quantiles_excludes_nulls_and_guards(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        group_quantiles_u,
    )

    sdf = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", float("nan")), ("g", 3.0)],
        "k string, value double",
    )
    out = {
        r["q_u"]: r["quantile_u"]
        for r in group_quantiles_u(sdf, "k", "value", qs_u=(500_000,)).collect()
    }
    # NULL and NaN excluded -> n=2, p50 rank ceil(0.5*2)=1 -> value 1.0
    # (a NaN would otherwise cast to 0 in Spark but error in DuckDB)
    assert out == {500_000: 1_000_000}
    with pytest.raises(ValueError, match="non-empty"):
        group_quantiles_u(sdf, "k", "value", qs_u=())


def test_ngram_repetition_hand_counted(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        ngram_repetition,
    )

    sdf = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z"), (3, "w")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["top_frac_u"], r["dup_frac_u"])
        for r in ngram_repetition(sdf, k=2).collect()
    }
    # doc 1: bigrams [a b, b a, a b, b c] -> total 4, top 2, distinct 3
    # doc 2: all unique; doc 3: < k tokens -> absent
    assert out == {1: (4, 500_000, 250_000), 2: (2, 500_000, 0)}


def test_pack_sequences_hand_counted(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.pack import pack_sequences

    # bucket_size=10 puts ids 0-9 in bucket 0, 10+ in bucket 1;
    # ntok = tokens + 1 separator; seq_len=4
    sdf = spark.createDataFrame(
        [
            (0, "a b c"),        # ntok 4, offset 0, chunks 0-0
            (1, "d e"),          # ntok 3, offset 4, chunks 1-1
            (2, "f g h i j"),    # ntok 6, offset 7, chunks 1-3
            (3, ""),             # dropped (no tokens)
            (4, None),           # dropped (NULL)
            (10, "x"),           # new bucket: ntok 2, offset 0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["bucket"], r["n_tokens"], r["offset"],
                      r["first_chunk"], r["last_chunk"])
        for r in pack_sequences(sdf, seq_len=4, bucket_size=10).collect()
    }
    assert out == {
        0: (0, 4, 0, 0, 0),
        1: (0, 3, 4, 1, 1),
        2: (0, 6, 7, 1, 3),
        10: (1, 2, 0, 0, 0),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        pack_sequences(sdf, seq_len=0)


def test_gopher_rules_features_and_keep(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        gopher_rules,
    )

    good = " ".join(["word"] * 60)  # 60 words, mean len 4
    short = "too few words"
    bullety = "intro line\n- a\n- b\n- c"  # 3/4 bullet lines
    symbolic = " ".join(["w###"] * 60)  # 3 hashes per word
    rows = [(1, good), (2, short), (3, bullety), (4, symbolic), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}

    assert out[1]["n_words"] == 60
    assert out[1]["mean_word_len_u"] == 4_000_000
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False  # below min_words
    assert out[3]["bullet_frac_u"] == 750_000
    assert out[4]["symbol_ratio_u"] == 3_000_000
    assert out[4]["keep"] is False  # symbol screen
    assert out[5]["n_words"] == 0 and out[5]["keep"] is False


def test_gopher_rules_ellipsis_lines(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        gopher_rules,
    )

    text = "ends here ...\nends with char …\nplain line\nfourth"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = gopher_rules(df).collect()
    assert r["ellipsis_frac_u"] == 500_000


def test_count_min_exact_when_no_collisions(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    items = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "k string"
    )
    sketch = count_min_build(items, "k", depth=4, width=4096)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("absent",)], "k string"
    )
    out = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sketch, probes, "k", depth=4, width=4096
        ).collect()
    }
    # 9 items in 4x4096 cells: no collisions, estimates are exact
    assert out == {"a": 5, "b": 3, "c": 1, "absent": 0}


def test_count_min_overestimates_never_under(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    items = spark.createDataFrame(
        [(f"k{i}",) for i in range(200) for _ in range(i % 3 + 1)],
        "k string",
    )
    sketch = count_min_build(items, "k", depth=2, width=8)  # heavy collisions
    probes = spark.createDataFrame([(f"k{i}",) for i in range(200)], "k string")
    est = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sketch, probes, "k", depth=2, width=8
        ).collect()
    }
    for i in range(200):
        assert est[f"k{i}"] >= i % 3 + 1


def test_count_min_guards(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        count_min_build,
    )

    items = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="depth/width"):
        count_min_build(items, "k", depth=0)


def test_phrase_pmi_hand_computed(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        phrase_pmi,
    )

    # "new york" appears 3x; tokens: 3x("new york is") = 9 tokens
    docs = spark.createDataFrame(
        [(i, "new york is") for i in range(3)], "doc_id long, text string"
    )
    out = phrase_pmi(docs, min_count=3, topk=10).collect()
    scores = {r["gram"]: (r["n_bigram"], r["score_u"]) for r in out}
    # n_tokens=9, n(new)=n(york)=n(is)=3
    # score(new york) = (3 * 9 * 1e6) // (3*3) = 3_000_000
    assert scores["new york"] == (3, 3_000_000)
    assert scores["york is"] == (3, 3_000_000)
    assert set(scores) == {"new york", "york is"}


def test_tfidf_top_terms_hand_computed(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): (r["score_u"], r["rank"])
        for r in tfidf_top_terms(docs, topk=2).collect()
    }
    # n_docs=2; df(apple)=1, df(banana)=2, df(cherry)=1
    # doc1: apple tf=2 -> 2*(2e6//1)=4e6 ; banana tf=1 -> 1e6
    assert out[(1, "apple")] == (4_000_000, 1)
    assert out[(1, "banana")] == (1_000_000, 2)
    # doc2: cherry 2e6 rank1, banana 1e6 rank2
    assert out[(2, "cherry")] == (2_000_000, 1)
    assert out[(2, "banana")] == (1_000_000, 2)


def test_grouped_kmv_exact_branch_and_guard(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        grouped_kmv,
    )

    df = spark.createDataFrame(
        [("t1", i % 3) for i in range(30)] + [("t2", i) for i in range(5)],
        "event_type string, user_id long",
    )
    out = {
        r["event_type"]: (r["n_seen"], r["ndv_estimate"])
        for r in grouped_kmv(df, "event_type", "user_id", k=8).collect()
    }
    # both groups have fewer than k distinct -> exact counts
    assert out == {"t1": (3, 3), "t2": (5, 5)}
    with pytest.raises(ValueError, match="k must be"):
        grouped_kmv(df, "event_type", "user_id", k=1)
