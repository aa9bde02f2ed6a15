"""Unit tests for the round-3 third-wave operators: SemDeDup semantic
dedup, HITS, stream-stream interval join, co-occurrence counts, the
hashed linear classifier, unigram rarity, and the range histogram.

Cross-engine exactness for each is covered by tests/test_oracles.py
(every operator has an exact DuckDB oracle); these pin the
operator-level semantics on tiny hand-checked inputs.
"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------

def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_semantic_dedup_drops_higher_id_of_near_pair(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        semantic_dedup,
    )

    # 4 vectors, 2 centroids (init = ids 0,1): 0/2 nearly parallel
    # (cos ~ 1), 1/3 orthogonal to them and to each other.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            _emb_df(spark, rows), threshold=0.95, n_centroids=2, iterations=1
        ).collect()
    }
    assert out[0] == 1 and out[2] == 0  # lower id of the near pair survives
    assert out[1] == 1 and out[3] == 1


def test_semantic_dedup_chain_keeps_lowest(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        semantic_dedup,
    )

    # three mutually-near vectors: only the lowest id survives
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.001]),
        (2, [0.998, 0.002]),
        (3, [0.0, 1.0]),
    ]
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            _emb_df(spark, rows), threshold=0.95, n_centroids=2, iterations=1
        ).collect()
    }
    assert out == {0: 1, 1: 0, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------

def test_hits_hub_authority_split(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import hits

    # star: h -> a1, h -> a2. h is the only hub; a1/a2 the authorities.
    nodes = spark.createDataFrame([("h",), ("a1",), ("a2",)], "id string")
    edges = spark.createDataFrame(
        [("h", "a1"), ("h", "a2")], "src string, dst string"
    )
    out = {r["id"]: (r["auth_u"], r["hub_u"]) for r in hits(nodes, edges).collect()}
    assert out["h"] == (0, 1_000_000)  # max-normalized sole hub
    assert out["a1"] == (1_000_000, 0)
    assert out["a2"] == (1_000_000, 0)


def test_hits_isolated_node_scores_zero(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import hits

    nodes = spark.createDataFrame([("u",), ("v",), ("lone",)], "id string")
    edges = spark.createDataFrame([("u", "v")], "src string, dst string")
    out = {r["id"]: (r["auth_u"], r["hub_u"]) for r in hits(nodes, edges).collect()}
    assert out["lone"] == (0, 0)
    assert out["u"][1] == 1_000_000 and out["v"][0] == 1_000_000


# ---------------------------------------------------------------------------
# cooccurrence_counts
# ---------------------------------------------------------------------------

def test_cooccurrence_window_and_unordered_key(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        cooccurrence_counts,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )
    out = {
        (r["t_a"], r["t_b"]): r["n"]
        for r in cooccurrence_counts(docs, window=1, min_count=1).collect()
    }
    # adjacent pairs: (a,b) x3 in doc1 + (b,a)->(a,b) in doc2
    assert out == {("a", "b"): 4}


def test_cooccurrence_min_count_filters(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        cooccurrence_counts,
    )

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    out = cooccurrence_counts(docs, window=2, min_count=2).collect()
    assert out == []  # every pair occurs once


# ---------------------------------------------------------------------------
# linear_classify / unigram_rarity
# ---------------------------------------------------------------------------

def test_linear_classify_empty_doc_scores_zero(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.classify import (
        linear_classify,
    )

    docs = spark.createDataFrame(
        [(1, "some words here"), (2, "")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in linear_classify(docs).collect()}
    assert out[2]["score_u"] == 0 and out[2]["label"] == 0
    assert out[1]["score_u"] > 0


def test_unigram_rarity_rare_doc_scores_higher(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        unigram_rarity,
    )

    # 'common' appears 6x, 'rare' once -> doc 2 is rarer on average
    docs = spark.createDataFrame(
        [(1, "common common common"), (2, "rare common common"), (3, "common")],
        "doc_id long, text string",
    )
    out = {r["id"]: r["rarity_u"] for r in unigram_rarity(docs).collect()}
    assert out[2] > out[1] == out[3]


# ---------------------------------------------------------------------------
# range_histogram
# ---------------------------------------------------------------------------

def test_range_histogram_heavy_value_never_splits(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        range_histogram,
    )

    # 90 copies of 1.0 + ten distinct values: the heavy value must land
    # in exactly one bin, and bin occupancies must sum to 100
    vals = [(1.0,)] * 90 + [(float(i),) for i in range(2, 12)]
    df = spark.createDataFrame(vals, "value double")
    out = range_histogram(df, n_bins=4).collect()
    assert sum(r["n_rows"] for r in out) == 100
    heavy_bins = [r for r in out if r["min_u"] <= 1_000_000 <= r["max_u"]]
    assert len(heavy_bins) == 1 and heavy_bins[0]["n_rows"] >= 90


def test_range_histogram_excludes_null_and_nan(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        range_histogram,
    )

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (float("nan"),)], "value double"
    )
    out = range_histogram(df, n_bins=2).collect()
    assert sum(r["n_rows"] for r in out) == 2


# ---------------------------------------------------------------------------
# stream_stream_interval_join (batch-shape check of the join predicate)
# ---------------------------------------------------------------------------

def test_stream_stream_join_lag_bound(spark, sf_dir):
    from __spark_entry__ import queries

    out = queries()["q_stream_stream_join"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(0 <= r["lag_s"] <= 6 * 3600 for r in rows)


# ---------------------------------------------------------------------------
# funnel_stages
# ---------------------------------------------------------------------------

def test_funnel_requires_stage_order(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        funnel_stages,
    )

    # u1 completes in order; u2 purchased BEFORE clicking -> stalls at 2
    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        (2, "2024-01-01 00:00:00", "purchase"),
        (2, "2024-01-01 01:00:00", "view"),
        (2, "2024-01-01 02:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = {
        r["user_id"]: r["stage_reached"]
        for r in funnel_stages(df, ("view", "click", "purchase")).collect()
    }
    assert out == {1: 3, 2: 2}


def test_funnel_same_timestamp_advances(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        funnel_stages,
    )

    rows = [(1, "2024-01-01 00:00:00", "view"), (1, "2024-01-01 00:00:00", "click")]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = funnel_stages(df, ("view", "click")).collect()[0]
    assert out["stage_reached"] == 2 and out["t1_s"] == out["t2_s"]


# ---------------------------------------------------------------------------
# script_mix / skew_profile / distribution_drift
# ---------------------------------------------------------------------------

def test_script_mix_fractions(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import script_mix

    docs = spark.createDataFrame(
        [(1, "ab你好"), (2, ""), (3, "1234")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in script_mix(docs).collect()}
    assert out[1]["latin_u"] == 500_000 and out[1]["cjk_u"] == 500_000
    assert out[2]["n_chars"] == 0 and out[2]["latin_u"] == 0
    assert out[3]["digit_u"] == 1_000_000


def test_skew_profile_orders_heavy_first(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import skew_profile

    df = spark.createDataFrame(
        [(k,) for k in [1] * 8 + [2] * 2], "k long"
    )
    out = skew_profile(df, "k", topk=2).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["key"] == 1 and by_rank[1]["share_u"] == 800_000
    assert by_rank[2]["key"] == 2 and by_rank[2]["share_u"] == 200_000


def test_distribution_drift_flags_mover(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        distribution_drift,
    )

    a = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "x y y")], "doc_id long, text string")
    out = {r["token"]: r for r in distribution_drift(a, b, topk=5).collect()}
    # x: 2/3 -> 1/3, y: 1/3 -> 2/3 — both move by 1/3
    # (666_666 - 333_333 with per-share floors)
    assert out["x"]["delta_u"] == out["y"]["delta_u"] == 333_333


def test_distribution_drift_empty_snapshot_all_zero_shares(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        distribution_drift,
    )

    a = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    b = spark.createDataFrame([], "doc_id long, text string")
    out = {r["token"]: r for r in distribution_drift(a, b, topk=5).collect()}
    assert out["x"]["q_u"] == 0 and out["x"]["p_u"] == 500_000


# ---------------------------------------------------------------------------
# layout: z_value / zorder_layout / bloom_build
# ---------------------------------------------------------------------------

def test_z_value_interleaves_bits(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.layout import z_value

    df = spark.createDataFrame([(3, 1)], "a long, b long")
    out = df.select(
        z_value(F.col("a"), F.col("b"), bits=4).alias("z")
    ).collect()[0]["z"]
    # a=0b11 -> bits at 0,2 ; b=0b1 -> bit at 1 ==> z = 0b111 = 7
    assert out == 7


def test_zorder_files_bound_both_dimensions(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.layout import (
        zorder_layout,
    )

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_layout(df, "a", "b", bits=4, file_shift=2).collect()
    assert sum(r["n_rows"] for r in out) == 256
    # every z-range "file" of 4 z-values spans <= 2 in EACH dimension —
    # the locality property a single-column sort cannot give for b
    for r in out:
        assert r["max_a"] - r["min_a"] <= 2
        assert r["max_b"] - r["min_b"] <= 2


def test_bloom_build_bounded_and_deterministic(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.layout import (
        bloom_build,
    )

    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    a = sorted(r["pos"] for r in bloom_build(df, "k", m=64, k=3).collect())
    b = sorted(r["pos"] for r in bloom_build(df, "k", m=64, k=3).collect())
    assert a == b and len(a) <= 64 and all(0 <= p < 64 for p in a)


# ---------------------------------------------------------------------------
# wave 4: containment / phash pairs / personalized pagerank
# ---------------------------------------------------------------------------

def test_containment_detects_embedded_doc(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        containment_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, short),
            (2, "start filler words here " + short + " trailing filler words end"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r["containment_u"]
        for r in containment_pairs(docs, k=3, threshold_u=500_000).collect()
    }
    assert out[(1, 2)] == 1_000_000  # the short doc is fully contained
    assert (2, 1) not in out  # the long doc is NOT contained in the short

def test_phash_pairs_hamming_threshold(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        phash_pairs,
    )

    feats = spark.createDataFrame(
        [
            (1, "0000000000000000"),
            (2, "0000000000000007"),  # hamming 3 to id 1
            (3, "ffffffffffffffff"),  # hamming 64 / 61
        ],
        "media_id long, phash string",
    )
    out = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_pairs(feats, max_hamming=10).collect()
    }
    assert out == {(1, 2): 3}


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        personalized_pagerank,
    )

    # chain 0 -> 1 -> 2, seed {0}: rank must be 0-heavy and node 2
    # reachable only via the chain
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    out = {
        r["id"]: r["rank_u"]
        for r in personalized_pagerank(
            nodes, edges, seeds, iterations=3
        ).collect()
    }
    assert out[0] > out[1] > out[2] > 0
