"""Wave 50-52 invariants: held-out surprisal floors (unseen bigram /
unseen context / empty doc), Adamic-Adar + Resource-Allocation
integer weights and the hub guard, training-triplet composition.
"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# wave 50: held-out LM surprisal
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_heldout_surprisal_floors(spark):
    """Hand arithmetic: train 'a b a b' gives cnt12(a,b)=2, (b,a)=1,
    ctx(a)=2, ctx(b)=1, V=2. Seen bigram (a,b): (2+2)*1e6 div 3 =
    1333333. Unseen bigram under seen context (a,c): (2+2)*1e6 div 1.
    Unseen context (z,q): (0+2)*1e6 div 1. No-bigram doc scores 0/0."""
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        heldout_surprisal,
    )

    train = _docs(spark, [(1, "a b a b")])
    valid = _docs(
        spark, [(10, "a b"), (11, "a c"), (12, "z q"), (13, "a")]
    )
    got = {
        r.id: (r.n_bigrams, r.surprisal_u)
        for r in heldout_surprisal(train, valid).collect()
    }
    assert got == {
        10: (1, 1_333_333),
        11: (1, 4_000_000),
        12: (1, 2_000_000),
        13: (0, 0),
    }


def test_heldout_surprisal_train_rows_never_scored(spark):
    """Output ids are exactly the valid split — the train side feeds
    the LM only."""
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        heldout_surprisal,
    )

    train = _docs(spark, [(1, "x y"), (2, "y z")])
    valid = _docs(spark, [(7, "x y z")])
    rows = heldout_surprisal(train, valid).collect()
    assert {r.id for r in rows} == {7}
    # "x y" seen (cnt12=1, ctx(x)=1, V=3): (1+3)*1e6 div 2 = 2000000
    # "y z" seen (cnt12=1, ctx(y)=1):      (1+3)*1e6 div 2 = 2000000
    assert rows[0].n_bigrams == 2 and rows[0].surprisal_u == 2_000_000


def test_q_heldout_split_is_the_md5_bucket(spark, sf_dir):
    """The query's valid side is exactly the >= 800000 md5 bucket of
    doc_id — rerun-pinned, engine-replayable."""
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        split_bucket,
    )
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _HS_SALT,
        _HS_TRAIN_U,
        q_heldout_surprisal,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {
        r.doc_id
        for r in docs.where(
            split_bucket(F.col("doc_id"), _HS_SALT) >= F.lit(_HS_TRAIN_U)
        ).collect()
    }
    got = {r.id for r in q_heldout_surprisal(spark, sf_dir).collect()}
    assert got == expect and len(got) > 0


# ---------------------------------------------------------------------------
# wave 51: Adamic-Adar / Resource Allocation
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_adamic_adar_hand_weights(spark):
    """1 and 2 share neighbors 10 (deg 4) and 11 (deg 2):
    aa = 1e6 div log2(4) + 1e6 div log2(2) = 500000 + 1000000;
    ra = 1e6 div 4 + 1e6 div 2 = 250000 + 500000."""
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        adamic_adar_pairs,
    )

    e = _edges(
        spark,
        [(1, 10), (2, 10), (3, 10), (4, 10), (1, 11), (2, 11)],
    )
    got = {
        (r.u, r.w): (r.common, r.aa_u, r.ra_u)
        for r in adamic_adar_pairs(
            e, min_common=2, src_col="src", dst_col="dst"
        ).collect()
    }
    assert got[(1, 2)] == (2, 1_500_000, 750_000)
    # adjacent pairs never appear; (10, 11) share {1, 2} -> present
    assert (1, 10) not in got and got[(10, 11)][0] == 2


def test_adamic_adar_adjacent_pairs_dropped(spark):
    """An existing edge between the endpoints removes the candidate
    even when they share neighbors."""
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        adamic_adar_pairs,
    )

    e = _edges(spark, [(1, 10), (2, 10), (1, 11), (2, 11), (1, 2)])
    got = {
        (r.u, r.w)
        for r in adamic_adar_pairs(
            e, min_common=1, src_col="src", dst_col="dst"
        ).collect()
    }
    assert (1, 2) not in got


def test_adamic_adar_hub_guard(spark):
    """The uncapped path refuses a hub above the threshold; the capped
    path excludes the hub from wedge centers instead."""
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        adamic_adar_pairs,
    )

    hub = [(i, 100) for i in range(6)]  # deg(100) = 6
    e = _edges(spark, hub + [(0, 200), (1, 200)])
    with pytest.raises(ValueError, match="max degree 6 exceeds 3"):
        adamic_adar_pairs(
            e, src_col="src", dst_col="dst", max_hub_degree_uncapped=3
        ).collect()
    capped = {
        (r.u, r.w): r.common
        for r in adamic_adar_pairs(
            e, src_col="src", dst_col="dst", max_wedge_degree=3
        ).collect()
    }
    # hub 100 (deg 6) is excluded as a CENTER: (0, 1) keeps only its
    # wedge through 200, and (100, 200) appears via centers 0 and 1 —
    # the cap changes which common neighbors are counted, not which
    # nodes may be endpoints
    assert capped == {(0, 1): 1, (100, 200): 2}


# ---------------------------------------------------------------------------
# wave 52: training triplets
# ---------------------------------------------------------------------------


def test_training_triplets_invariants(spark, sf_dir):
    """One triplet per anchor; positive/negative are non-self and
    distinct; the margin is the exact cos_u gap and never negative
    (positive ranks above negative by construction)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _N_QUERIES,
        q_training_triplets,
    )

    rows = q_training_triplets(spark, sf_dir).collect()
    assert len(rows) == _N_QUERIES
    assert {r.anchor_id for r in rows} == set(range(_N_QUERIES))
    for r in rows:
        assert r.pos_id != r.anchor_id and r.neg_id != r.anchor_id
        assert r.pos_id != r.neg_id
        assert r.margin_u == r.pos_cos_u - r.neg_cos_u
        assert r.margin_u >= 0


def test_training_triplets_match_topk_leg(spark, sf_dir):
    """The positive is the best-ranked non-self row of the verified
    top-k leg and the negative the worst-ranked one."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_topk_cosine,
        q_training_triplets,
    )

    tk = q_topk_cosine(spark, sf_dir).collect()
    by_q = {}
    for r in tk:
        if r.vec_id != r.query_id:
            by_q.setdefault(r.query_id, []).append(r)
    got = {r.anchor_id: r for r in q_training_triplets(spark, sf_dir).collect()}
    for qid, members in by_q.items():
        members.sort(key=lambda r: r.rank)
        t = got[qid]
        assert t.pos_id == members[0].vec_id
        assert t.neg_id == members[-1].vec_id
        assert t.pos_cos_u == members[0].cos_u
        assert t.neg_cos_u == members[-1].cos_u


# ---------------------------------------------------------------------------
# wave 53: memorization scan
# ---------------------------------------------------------------------------


def test_memorization_scan_hand_rates(spark):
    """valid doc 10 repeats a train 5-gram verbatim (rate 1e6), doc 11
    shares none (rate 0), doc 12 mixes one seen + one unseen distinct
    5-gram (rate 500000), doc 13 is too short to form any (0/0)."""
    from microdata_rdf_streaming_parser_js_spark.operators.decontaminate import (
        memorization_scan,
    )

    train = _docs(spark, [(1, "the quick brown fox jumps over it")])
    valid = _docs(
        spark,
        [
            (10, "the quick brown fox jumps"),
            (11, "a b c d e"),
            (12, "quick brown fox jumps over nothing"),
            (13, "too short"),
        ],
    )
    got = {
        r.id: (r.n_ngrams, r.n_seen, r.mem_rate_u)
        for r in memorization_scan(train, valid, k=5).collect()
    }
    assert got[10] == (1, 1, 1_000_000)
    assert got[11] == (1, 0, 0)
    # doc 12: 'quick brown fox jumps over' seen, 'brown fox jumps over
    # nothing' unseen
    assert got[12] == (2, 1, 500_000)
    assert got[13] == (0, 0, 0)


def test_memorization_scan_distinct_ngrams(spark):
    """Repeated k-grams inside one valid doc count once (set
    semantics, the standard memorization denominator)."""
    from microdata_rdf_streaming_parser_js_spark.operators.decontaminate import (
        memorization_scan,
    )

    train = _docs(spark, [(1, "x y z w v")])
    valid = _docs(spark, [(10, "x y z w v x y z w v")])
    rows = memorization_scan(train, valid, k=5).collect()
    # 10 tokens -> 6 positional 5-grams but only 5 distinct; the
    # wrap-around ones ('w v x y z' etc.) are unseen
    assert rows[0].n_ngrams == 5 and rows[0].n_seen == 1
    assert rows[0].mem_rate_u == 200_000


# ---------------------------------------------------------------------------
# wave 54: collocations
# ---------------------------------------------------------------------------


def test_collocations_lift_arithmetic(spark):
    """One dominant pair: 'new york' x5 among 10 total bigrams.
    cnt1(new)=5, cnt2(york)=5 -> lift_u = 5*10*1000 // 25 = 2000
    (positive association: > 1000)."""
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        collocations,
    )

    docs = _docs(
        spark,
        [(i, "new york") for i in range(5)]
        + [(10, "a b"), (11, "c d"), (12, "e f"), (13, "g h"), (14, "i j")],
    )
    rows = collocations(docs, min_count=5, topn=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.t1, r.t2) == ("new", "york")
    assert (r.cnt12, r.cnt1, r.cnt2) == (5, 5, 5)
    assert r.lift_u == 2_000 and r.rank == 1


def test_collocations_min_count_prunes(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        collocations,
    )

    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "c d")])
    got = {(r.t1, r.t2) for r in collocations(docs, min_count=2).collect()}
    assert got == {("a", "b")}
    with pytest.raises(ValueError):
        collocations(docs, min_count=0)


# ---------------------------------------------------------------------------
# wave 55: cross-source duplication matrix
# ---------------------------------------------------------------------------


def test_crosssource_dups_rollup(spark, sf_dir):
    """The matrix totals exactly the verified pair count, sources are
    unordered (a <= b), and every count is positive."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_crosssource_dups,
        q_minhash_lsh_pairs,
    )

    n_pairs = q_minhash_lsh_pairs(spark, sf_dir).count()
    rows = q_crosssource_dups(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b and r.n_pairs > 0


# ---------------------------------------------------------------------------
# wave 56: TextRank keywords
# ---------------------------------------------------------------------------


def test_textrank_two_node_fixpoint(spark, tmp_path):
    """The 2-node symmetric graph is a PageRank fixpoint at the
    uniform rank: contrib = (500000*850000)//1e6 = 425000, teleport =
    150000//2 = 75000 -> rank stays 500000 every round; ties break by
    token."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_textrank,
    )

    sf = str(tmp_path)
    _docs(spark, [(i, "a b") for i in range(5)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")
    rows = sorted(q_textrank(spark, sf).collect(), key=lambda r: r.rank)
    assert [(r.tok, r.rank_u, r.rank) for r in rows] == [
        ("a", 500_000, 1),
        ("b", 500_000, 2),
    ]


def test_textrank_ranks_dense_and_sorted(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _TR_TOPN,
        q_textrank,
    )

    rows = sorted(q_textrank(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= _TR_TOPN
    for a, b in zip(rows, rows[1:]):
        assert (a.rank_u, b.tok) > (b.rank_u, a.tok) or a.rank_u > b.rank_u \
            or (a.rank_u == b.rank_u and a.tok < b.tok)


# ---------------------------------------------------------------------------
# wave 57: curation funnel
# ---------------------------------------------------------------------------


def test_curation_funnel_monotone(spark, sf_dir):
    """Six stages in pipeline order; doc and token counts never
    increase down the funnel; the raw stage equals the corpus."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_curation_funnel,
    )

    rows = sorted(q_curation_funnel(spark, sf_dir).collect(),
                  key=lambda r: r.stage)
    assert [r.stage_name for r in rows] == [
        "raw", "dedup", "gopher", "fineweb", "blocklist", "mixture",
    ]
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs >= b.n_docs and a.n_tokens >= b.n_tokens
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[0].n_docs == n_docs and rows[-1].n_docs > 0
