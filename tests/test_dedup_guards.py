"""Guards + blocking-invariance for operators/dedup.py (round-2
review items): pigeonhole preconditions must raise instead of silently
dropping true near-dup pairs; combination blocking must be exact (pair
set independent of n_chunks); the hot-shingle df cap must drop only
boilerplate-carried overlap while keeping exact denominators."""

import pytest

pytestmark = pytest.mark.spark


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


_NEAR_DUPS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy dog again and again!",
    "a completely different document about spark query planning",
    "the quick brown fox leaps over the lazy dog again and again",
    "unrelated text with nothing shared at all whatsoever here",
]


def test_simhash_pigeonhole_guard_raises(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        simhash32_pairs,
        simhash_pairs,
    )

    d = _docs(spark, _NEAR_DUPS)
    for fn in (simhash_pairs, simhash32_pairs):
        with pytest.raises(ValueError, match="max_hamming < n_chunks"):
            fn(d, max_hamming=4, n_chunks=4)
        with pytest.raises(ValueError, match="n_chunks"):
            fn(d, max_hamming=0, n_chunks=0)


def test_simhash_blocking_invariant_under_n_chunks(spark):
    """Exact-blocking claim: the final pair set is identical for the
    classic single-chunk pigeonhole (n_chunks = max_hamming + 1) and
    the combination blocking default."""
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        simhash32_pairs,
    )

    d = _docs(spark, _NEAR_DUPS * 3)  # dups across copies too
    base = sorted(
        map(tuple, simhash32_pairs(d, max_hamming=3, n_chunks=4).collect())
    )
    for n_chunks in (6, 8):
        got = sorted(
            map(tuple, simhash32_pairs(d, max_hamming=3, n_chunks=n_chunks).collect())
        )
        assert got == base
    assert base  # the corpus really produces near-dup pairs


def test_ngram_df_cap_drops_boilerplate_overlap(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # two docs whose entire overlap is one boilerplate shingle shared
    # by every doc; with the cap their intersection drops to zero
    boiler = "terms of service apply"
    texts = [f"{boiler} unique{i} content{i} here{i}" for i in range(6)]
    d = _docs(spark, texts)
    uncapped = ngram_jaccard_pairs(d, k=3, threshold=0.01).collect()
    capped = ngram_jaccard_pairs(
        d, k=3, threshold=0.01, max_shingle_df=3
    ).collect()
    assert len(uncapped) > 0
    assert len(capped) == 0


def test_ngram_df_cap_keeps_true_near_dups(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # true near-dups share many rare shingles — the cap must not
    # change their pair (denominators stay exact full sizes)
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "totally different words in this one not shared anywhere else",
    ]
    d = _docs(spark, texts)
    out = ngram_jaccard_pairs(d, k=3, threshold=0.8, max_shingle_df=10).collect()
    assert [(r["doc_id_a"], r["doc_id_b"], r["jaccard"]) for r in out] == [(0, 1, 1.0)]


def test_minhash_incremental_cross_and_within_pairs(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        minhash_signatures,
    )

    old = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "entirely different words here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps"),   # dup of old doc 1
            (11, "some brand new content now"),  # unrelated
            (12, "some brand new content now"),  # within-batch dup of 11
        ],
        "doc_id long, text string",
    )
    old_sigs = minhash_signatures(old, num_hashes=8, k=3)
    pairs = {
        (r["new_doc_id"], r["matched_doc_id"])
        for r in minhash_lsh_pairs_incremental(
            new, old_sigs, num_hashes=8, bands=4, k=3
        ).collect()
    }
    assert (10, 1) in pairs       # cross: new dup of the old corpus
    assert (11, 12) in pairs      # within-batch, ordered a < b
    assert not any(a == 11 and b in (1, 2) for a, b in pairs)


def test_ngram_uncapped_guard_raises_above_doc_threshold(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    d = _docs(spark, _NEAR_DUPS)
    with pytest.raises(ValueError, match="uncapped all-pairs"):
        ngram_jaccard_pairs(d, max_docs_uncapped=3)
    # a df cap, a candidate set, or an explicit opt-out all lift it
    assert ngram_jaccard_pairs(d, max_shingle_df=100).count() >= 0
    assert ngram_jaccard_pairs(d, max_docs_uncapped=None).count() >= 0
    cands = spark.createDataFrame(
        [(0, 1)], "doc_id_a bigint, doc_id_b bigint"
    )
    assert ngram_jaccard_pairs(d, candidates=cands, max_docs_uncapped=3).count() >= 0


def test_winnow_shared_substring_guarantee(spark):
    """SIGMOD'03 winnowing guarantee: two documents sharing a substring
    of length >= k + window - 1 must share at least one fingerprint."""
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        winnow_fingerprints,
    )

    k, w = 8, 4
    shared = "absolutely identical stretch of text"  # len 36 >= k+w-1
    d = _docs(
        spark,
        [
            f"prefix one {shared} suffix alpha",
            f"other start {shared} different ending here",
            "no overlap with anything else in this corpus at all",
        ],
    )
    fp = winnow_fingerprints(d, k=k, window=w)
    rows = fp.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert sets[0] & sets[1], "shared substring must yield a shared fingerprint"
    assert not (sets[0] & sets[1] & sets[2])


def test_winnow_short_and_exact_docs(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        winnow_fingerprints,
    )

    d = _docs(spark, ["tiny", "", "exactly11ch"])  # < k+w-1 = 11 chars
    fp = winnow_fingerprints(d, k=8, window=4)
    got = {r.doc_id: r.fingerprint for r in fp.collect()}
    # docs 0,1 are shorter than k+w-1 -> doc 0 has < window grams, doc 1 none
    assert 0 not in got and 1 not in got
    # doc 2 has exactly window grams -> exactly one window -> one fingerprint
    assert fp.filter("doc_id = 2").count() == 1


def test_winnow_identical_docs_identical_fingerprints(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        winnow_fingerprints,
    )

    t = "The  Quick Brown   fox jumps over the lazy dog many times over"
    d = _docs(spark, [t, t.lower()])  # normalization folds case/space
    fp = winnow_fingerprints(d)
    a = {r.fingerprint for r in fp.filter("doc_id = 0").collect()}
    b = {r.fingerprint for r in fp.filter("doc_id = 1").collect()}
    assert a == b and a


def test_near_dup_clusters_resolution(spark):
    """LSH pairs -> components -> canonical: near-dup groups collapse
    to one kept doc (the min id); singletons keep themselves."""
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        near_dup_clusters,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the observers take careful notes about every movement"
    )
    d = _docs(
        spark,
        [
            base,
            base + " indeed",
            base + " truly",
            "a completely different document about spark query planning",
            "unrelated text with nothing shared at all whatsoever here",
        ],
    )
    out = {r.doc_id: (r.cluster_id, r.keep) for r in near_dup_clusters(d).collect()}
    assert len(out) == 5  # one row per input doc, singletons included
    # docs 0,1,2 are near-dups -> same cluster, min id kept
    assert out[0] == (0, True)
    assert out[1][0] == 0 and out[1][1] is False
    assert out[2][0] == 0 and out[2][1] is False
    # singletons are their own kept cluster
    assert out[3] == (3, True) and out[4] == (4, True)
    # exactly one keep per cluster
    clusters = {}
    for _, (cid, keep) in out.items():
        clusters[cid] = clusters.get(cid, 0) + (1 if keep else 0)
    assert all(v == 1 for v in clusters.values())


def test_containment_uncapped_guard_raises(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        containment_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(5)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="uncapped all-pairs"):
        containment_pairs(docs, max_docs_uncapped=3).collect()
    # candidates path bypasses the guard
    cand = spark.createDataFrame([(0, 1)], "doc_id_a long, doc_id_b long")
    out = containment_pairs(
        docs, threshold_u=1, candidates=cand, max_docs_uncapped=3
    ).collect()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in out} <= {(0, 1), (1, 0)}
