"""Wave 44-47 invariants: co-citation/coupling wedge semantics and
guard, edit-distance verification arithmetic, confident-learning
threshold/assignment math and planted-noise recovery, proximity-search
bucketed-join equivalence.
"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# wave 44: co-citation + bibliographic coupling
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_cocitation_shared_in_neighbors(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        cocitation_pairs,
    )

    # sources 0,1,2 all cite 10 and 11; source 3 cites only 10
    e = _edges(
        spark,
        [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 11), (3, 10)],
    )
    got = {
        (r.u, r.w): (r.common, r.dice_u)
        for r in cocitation_pairs(e, direction="in").collect()
    }
    # (10,11): co-cited by 0,1,2 -> common=3; deg_in(10)=4, deg_in(11)=3
    # dice_u = floor(2*3*1e6/(4+3)) = 857142
    assert got == {(10, 11): (3, 857_142)}


def test_bib_coupling_shared_out_neighbors(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        cocitation_pairs,
    )

    # 0 and 1 both cite {10, 11}; 2 cites {10} only
    e = _edges(
        spark,
        [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10)],
    )
    got = {
        (r.u, r.w): (r.common, r.dice_u)
        for r in cocitation_pairs(e, direction="out").collect()
    }
    # (0,1): common=2; deg_out(0)=2, deg_out(1)=2 -> dice = 1e6
    assert got == {(0, 1): (2, 1_000_000)}


def test_cocitation_existing_edge_stays_eligible(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        cocitation_pairs,
    )

    # 10 -> 11 is an existing edge AND both are cited by 0 and 1:
    # unlike link_prediction, the pair must still be reported
    e = _edges(
        spark, [(0, 10), (0, 11), (1, 10), (1, 11), (10, 11)]
    )
    got = {(r.u, r.w) for r in cocitation_pairs(e, direction="in").collect()}
    assert (10, 11) in got


def test_cocitation_guard_fires_on_hub_fanout(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        cocitation_pairs,
    )

    hub = [(0, d) for d in range(1, 30)]
    e = _edges(spark, hub)
    with pytest.raises(ValueError, match="max center fanout"):
        cocitation_pairs(e, direction="in", max_center_degree_uncapped=10)
    # hub exclusion drops the oversized center instead of raising
    out = cocitation_pairs(
        e, direction="in", max_center_degree=10,
        max_center_degree_uncapped=10,
    )
    assert out.count() == 0
    with pytest.raises(ValueError, match="direction"):
        cocitation_pairs(e, direction="both")


def test_cocitation_center_cap_changes_common_only(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        cocitation_pairs,
    )

    # two small centers (fanout 2) + one big center (fanout 3):
    # capping at 2 drops only the big center's wedge contribution,
    # while in-degrees in the Dice denominator stay exact
    e = _edges(
        spark,
        [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 11), (2, 12)],
    )
    uncapped = {
        (r.u, r.w): r.common
        for r in cocitation_pairs(
            e, direction="in", max_center_degree_uncapped=None
        ).collect()
    }
    capped = {
        (r.u, r.w): (r.common, r.dice_u)
        for r in cocitation_pairs(
            e, direction="in", max_center_degree=2
        ).collect()
    }
    assert uncapped[(10, 11)] == 3
    # center 2 excluded -> common drops to 2, degrees still 3 and 3
    assert capped[(10, 11)] == (2, (2 * 2 * 1_000_000) // 6)


# ---------------------------------------------------------------------------
# wave 45: edit-distance verification
# ---------------------------------------------------------------------------


def test_edit_verify_known_distances(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        edit_distance_verify,
    )

    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitting"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (3, 4), (1, 4)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r.doc_id_a, r.doc_id_b): (r.lev, r.sim_u)
        for r in edit_distance_verify(docs, cand).collect()
    }
    # classic kitten/sitting = 3; maxlen 7 -> floor(4e6/7)
    assert got[(1, 2)] == (3, (4 * 1_000_000) // 7)
    # both empty (None coalesced) -> identical, sim pinned to 1e6
    assert got[(3, 4)] == (0, 1_000_000)
    # one empty: lev = len("kitten") = 6, sim 0
    assert got[(1, 4)] == (6, 0)
    with pytest.raises(ValueError):
        edit_distance_verify(docs, cand, prefix=0)


def test_edit_verify_prefix_caps_the_dp(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        edit_distance_verify,
    )

    docs = spark.createDataFrame(
        [(1, "ab" * 300), (2, "ab" * 300 + "zzz")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long")
    row = edit_distance_verify(docs, cand, prefix=256).collect()[0]
    # both prefixes identical within the 256-char cap
    assert (row.lev, row.sim_u) == (0, 1_000_000)


# ---------------------------------------------------------------------------
# wave 46: confident learning
# ---------------------------------------------------------------------------


def _cl_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, label int, p_u long")


def test_confident_joint_thresholds_and_cells(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.classify import (
        confident_learning_joint,
    )

    # label-1 examples: p_u 900k, 700k -> t1 = 800000
    # label-0 examples: conf0 900k, 700k -> t0 = 800000
    # plus one mislabeled each side (confident other class)
    rows = [
        (1, 1, 900_000), (2, 1, 700_000),
        (3, 0, 100_000), (4, 0, 300_000),
        (5, 1, 50_000),   # labeled 1, confidently 0 (conf0 950k >= t0)
        (6, 0, 950_000),  # labeled 0, confidently 1
    ]
    got = {
        (r.label, r.yhat): (r.n, r.threshold_u)
        for r in confident_learning_joint(_cl_frame(spark, rows)).collect()
    }
    # t1 = (900k+700k+50k) div 3 = 550000; t0 = (900k+700k+50k) div 3
    t1 = (900_000 + 700_000 + 50_000) // 3
    t0 = (900_000 + 700_000 + 50_000) // 3
    assert got[(1, 1)] == (2, t1)
    assert got[(0, 0)] == (2, t0)
    assert got[(1, 0)] == (1, t0)
    assert got[(0, 1)] == (1, t1)


def test_confident_joint_single_class_abstains_other(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.classify import (
        confident_learning_joint,
    )

    rows = [(1, 1, 900_000), (2, 1, 100_000)]
    got = {
        (r.label, r.yhat): r.n
        for r in confident_learning_joint(_cl_frame(spark, rows)).collect()
    }
    # no label-0 examples -> t0 unattainable (1e6+1): nothing assigned 0
    assert got == {(1, 1): 1}


def test_label_issues_match_joint_off_diagonal(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.classify import (
        confident_learning_joint,
        label_issues,
    )

    rows = [
        (1, 1, 900_000), (2, 1, 700_000),
        (3, 0, 100_000), (4, 0, 300_000),
        (5, 1, 50_000), (6, 0, 950_000),
    ]
    joint = {
        (r.label, r.yhat): r.n
        for r in confident_learning_joint(_cl_frame(spark, rows)).collect()
    }
    issues = label_issues(_cl_frame(spark, rows)).collect()
    assert len(issues) == joint[(1, 0)] + joint[(0, 1)]
    assert {r.doc_id for r in issues} == {5, 6}
    # conf_u is confidence in the CONFIDENT class
    by_id = {r.doc_id: r.conf_u for r in issues}
    assert by_id[5] == 950_000 and by_id[6] == 950_000


def test_confident_learning_recovers_planted_flips(spark, sf_dir):
    """End-to-end on the sf0.001 corpus: flagged docs must be
    dominated by the planted 10% flips (precision of the method on
    the quality-scorer bed), and a majority of flips on docs the
    scorer separates well must be caught."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_label_issues,
    )
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        split_bucket,
    )

    issues = q_label_issues(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        (split_bucket(F.col("doc_id"), "cl-noise") < 100_000).alias("flip"),
    )
    j = issues.join(docs, "doc_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("flip").cast("int")).alias("n_flipped"),
    ).collect()[0]
    assert j.n > 0
    # flagged set is majority planted noise
    assert j.n_flipped * 2 > j.n


# ---------------------------------------------------------------------------
# wave 47: proximity search
# ---------------------------------------------------------------------------


def test_proximity_counts_in_window_pairs(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import (
        proximity_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha x x x beta"),        # |0-4| = 4 <= 5 -> 1 pair
            (2, "alpha x x x x x x beta"),  # |0-7| = 7 -> no pair
            (3, "alpha beta alpha beta"),   # pairs: 4 in-window
            (4, "gamma delta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_pairs, r.rank)
        for r in proximity_topk(docs, "alpha", "beta", window=5).collect()
    }
    assert got == {3: (4, 1), 1: (1, 2)}
    with pytest.raises(ValueError):
        proximity_topk(docs, "alpha", "alpha")
    with pytest.raises(ValueError):
        proximity_topk(docs, "a", "b", window=-1)
    with pytest.raises(ValueError):
        proximity_topk(docs, "a", "b", k=0)


def test_proximity_bucketed_join_equals_naive(spark):
    """The bucketed equi-join must count exactly the pairs the naive
    |i-j| <= w predicate counts, across window boundaries."""
    from microdata_rdf_streaming_parser_js_spark.operators.search import (
        proximity_topk,
    )

    text = " ".join(
        "a" if i % 7 == 0 else ("b" if i % 5 == 0 else f"w{i}")
        for i in range(60)
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = text.split(" ")
    for w in (0, 1, 3, 5):
        naive = sum(
            1
            for i, ta in enumerate(toks)
            if ta == "a"
            for j, tb in enumerate(toks)
            if tb == "b" and abs(i - j) <= w
        )
        rows = proximity_topk(docs, "a", "b", window=w, k=5).collect()
        got = rows[0].n_pairs if rows else 0
        assert got == naive, f"window={w}"


def test_proximity_rank_is_deterministic_on_ties(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import (
        proximity_topk,
    )

    docs = spark.createDataFrame(
        [(5, "a b"), (2, "a b"), (9, "a b")], "doc_id long, text string"
    )
    rows = proximity_topk(docs, "a", "b", window=5, k=2).collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(2, 1), (5, 2)]


# ---------------------------------------------------------------------------
# wave 48: hard negatives + quality-argmax canonical selection
# ---------------------------------------------------------------------------


def test_hard_negatives_anti_join_semantics(spark, sf_dir):
    """lex_topk \\ vec_topk: every returned id must be in the BM25
    top list and absent from the cosine top-10 of query 0; ids in
    BOTH lists must be excluded."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _BM25_B_U,
        _BM25_IDF_CAP_U,
        _BM25_K1_U,
        _BM25_SCALE,
        _BM25_TERMS,
        _BM25_TOPK,
        _TOPK_K,
        q_hard_negatives,
    )
    from microdata_rdf_streaming_parser_js_spark.operators.search import bm25_topk
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        cosine_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex_ids = {
        r.doc_id
        for r in bm25_topk(
            docs, _BM25_TERMS, topk=_BM25_TOPK, scale=_BM25_SCALE,
            k1_u=_BM25_K1_U, b_u=_BM25_B_U, idf_cap_u=_BM25_IDF_CAP_U,
        ).collect()
    }
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec_ids = {r.vec_id for r in cosine_topk(emb, qv, k=_TOPK_K).collect()}
    got = {r.id for r in q_hard_negatives(spark, sf_dir).collect()}
    assert got == lex_ids - vec_ids


def test_cluster_canonical_keeps_best_quality(spark, sf_dir):
    """Exactly one keep per cluster; within every multi-doc cluster
    the kept doc has the max quality (min doc_id on ties), which for
    clusters of near-identical texts may differ from min-id — the
    delta vs near_dup_clusters' keep rule."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_cluster_canonical,
    )

    rows = q_cluster_canonical(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(1 for r in rows if r.keep) == len(by_cluster)
    for cid, members in by_cluster.items():
        kept = [r for r in members if r.keep]
        assert len(kept) == 1
        best = max(members, key=lambda r: (r.quality_u, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
    # one row per input document
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs


# ---------------------------------------------------------------------------
# wave 49: prototype-based data pruning
# ---------------------------------------------------------------------------


def test_proto_select_rank_and_flags(spark, sf_dir):
    """Per cluster: ranks are a dense 1..n permutation ordered by d2
    (ties to smaller vec_id), exactly one is_proto (the closest
    member), and keep_hard marks precisely the far half
    (rank * 2 > n)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_proto_select,
    )

    rows = q_proto_select(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cid, []).append(r)
    for cid, members in by_cluster.items():
        members.sort(key=lambda r: (r.d2, r.vec_id))
        n = len(members)
        assert all(r.cluster_n == n for r in members)
        assert [r.rank_in_cluster for r in members] == list(range(1, n + 1))
        assert [r.is_proto for r in members] == [True] + [False] * (n - 1)
        for r in members:
            assert r.keep_hard == (r.rank_in_cluster * 2 > n)


def test_kmeans_assign_dist_matches_assign(spark, sf_dir):
    """The distance-emitting variant must agree with kmeans_assign on
    every label, and d2 must equal the integer squared distance to
    the assigned centroid."""
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        kmeans_assign,
        kmeans_assign_dist,
    )
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _cached_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = _cached_centroids(emb, (sf_dir, "raw"))
    a = {r.vec_id: r.cid for r in kmeans_assign(emb, cents).collect()}
    d = {
        r.vec_id: (r.cid, r.d2)
        for r in kmeans_assign_dist(emb, cents).collect()
    }
    assert {k: v[0] for k, v in d.items()} == a
    # spot-verify d2 on a few rows against pure-Python arithmetic
    import math

    sample = emb.limit(3).collect()
    for row in sample:
        v = [math.floor(x * 1_000_000) for x in row.embedding]
        cid, d2 = d[row.vec_id]
        expect = sum((a_ - b_) ** 2 for a_, b_ in zip(v, cents[cid]))
        assert d2 == expect
