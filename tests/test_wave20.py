"""Wave-20 invariants: landmark harmonic centrality arithmetic and
hop bound, sharded-vs-single stratified equivalence, winsorize band
clipping.
"""

import pytest

pytestmark = pytest.mark.spark


def test_harmonic_centrality_path_graph(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        harmonic_centrality,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "subj long, obj long"
    )
    seeds = spark.createDataFrame([(0,)], "seed long")
    got = {
        r.node: (r.centrality_u, r.n_seeds_reached)
        for r in harmonic_centrality(edges, seeds, max_hops=6).collect()
    }
    # floor(1e6/1), floor(1e6/2), floor(1e6/3); the seed itself (d=0)
    # contributes nothing and is absent here (no other seed reaches it)
    assert got == {1: (1_000_000, 1), 2: (500_000, 1), 3: (333_333, 1)}


def test_harmonic_centrality_two_seeds_sum_and_bound(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        harmonic_centrality,
    )

    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 3), (3, 4)], "subj long, obj long"
    )
    seeds = spark.createDataFrame([(0,), (1,)], "seed long")
    got = {
        r.node: (r.centrality_u, r.n_seeds_reached)
        for r in harmonic_centrality(edges, seeds, max_hops=2).collect()
    }
    # node 2 at d=1 from both seeds; node 3 at d=2; node 4 is beyond
    # the 2-hop bound and must be absent
    assert got == {2: (2_000_000, 2), 3: (1_000_000, 2)}
    with pytest.raises(ValueError):
        harmonic_centrality(edges, seeds, max_hops=0)


def test_stratified_sharded_equals_single_level(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        stratified_sample,
        stratified_sample_sharded,
    )

    df = spark.createDataFrame(
        [(f"g{i % 3}", i * 17 + 5) for i in range(200)],
        "grp_col string, key_col long",
    )
    plain = sorted(
        (r.grp, r.key, r.rk)
        for r in stratified_sample(df, "grp_col", "key_col", k=7).collect()
    )
    sharded = sorted(
        (r.grp, r.key, r.rk)
        for r in stratified_sample_sharded(
            df, "grp_col", "key_col", k=7, shards=4
        ).collect()
    )
    assert sharded == plain
    with pytest.raises(ValueError):
        stratified_sample_sharded(df, "grp_col", "key_col", k=7, shards=1)


def test_winsorize_clips_to_exact_band(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        winsorize_u,
    )

    rows = [("a", i, float(i)) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = winsorize_u(df, "g", "id", "value", lo_u=100_000, hi_u=900_000)
    got = {r.id: r.clipped_u for r in out.collect()}
    # ceil-rank p10 of 100 rows = rank 10 -> 10.0; p90 -> rank 90
    assert got[1] == 10_000_000 and got[5] == 10_000_000
    assert got[10] == 10_000_000 and got[11] == 11_000_000
    assert got[90] == 90_000_000 and got[95] == 90_000_000
    assert got[50] == 50_000_000  # interior untouched
    with pytest.raises(ValueError):
        winsorize_u(df, "g", "id", "value", lo_u=900_000, hi_u=100_000)


def test_winsorize_excludes_null_and_nan(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        winsorize_u,
    )

    rows = [("a", i, float(i)) for i in range(1, 11)] + [
        ("a", 100, None),
        ("a", 101, float("nan")),
    ]
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = winsorize_u(df, "g", "id", "value").collect()
    assert sorted(r.id for r in out) == list(range(1, 11))


def test_walk_skipgrams_window_semantics(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        walk_skipgrams,
    )

    # one walk 10 -> 11 -> 12 -> 13 (steps 0..3)
    walks = spark.createDataFrame(
        [(1, s, 10 + s) for s in range(4)],
        "walk_id long, step long, node long",
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in walk_skipgrams(walks, window=2).collect()
    }
    # window 2, both directions: each interior node pairs with up to
    # two on each side; no self pairs, no distance-3 pairs
    assert got == {
        (10, 11): 1, (10, 12): 1,
        (11, 10): 1, (11, 12): 1, (11, 13): 1,
        (12, 10): 1, (12, 11): 1, (12, 13): 1,
        (13, 11): 1, (13, 12): 1,
    }
    assert (10, 13) not in got and (10, 10) not in got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        walk_skipgrams(walks, window=0)


def test_walk_skipgrams_counts_repeat_visits(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        walk_skipgrams,
    )

    # walk revisits node 5: 5 -> 6 -> 5; (5,6) occurs from both visits
    walks = spark.createDataFrame(
        [(1, 0, 5), (1, 1, 6), (1, 2, 5)],
        "walk_id long, step long, node long",
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in walk_skipgrams(walks, window=1).collect()
    }
    assert got == {(5, 6): 2, (6, 5): 2}


def test_rrf_fuse_arithmetic_and_overlap(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.search import (
        rrf_fuse,
    )

    a = spark.createDataFrame([(10, 1), (11, 2)], "id long, rank long")
    b = spark.createDataFrame([(11, 1), (12, 2)], "id long, rank long")
    got = {
        r.id: (r.rrf_u, r.n_lists)
        for r in rrf_fuse([a, b], k_const=60).collect()
    }
    # floor(1e6/61)=16393, floor(1e6/62)=16129
    assert got == {
        10: (16_393, 1),
        11: (16_129 + 16_393, 2),  # rank 2 in a, rank 1 in b
        12: (16_129, 1),
    }
    # overlap outranks single-list items: the fused winner is the doc
    # both retrievers surfaced
    assert max(got, key=lambda i: got[i][0]) == 11
    with pytest.raises(ValueError):
        rrf_fuse([], k_const=60)
    with pytest.raises(ValueError):
        rrf_fuse([a], k_const=0)


def test_stratified_sharded_equivalence_randomized(spark):
    """The top-k associativity argument, exercised across shard counts
    and skewed group sizes: the sharded draw must be row-identical to
    the single-level draw for every configuration."""
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        stratified_sample,
        stratified_sample_sharded,
    )

    rows = (
        [("big", i * 13 + 1) for i in range(150)]
        + [("mid", i * 7 + 2) for i in range(20)]
        + [("one", 999)]
    )
    df = spark.createDataFrame(rows, "g string, k long")
    plain = sorted(
        (r.grp, r.key, r.rk)
        for r in stratified_sample(df, "g", "k", k=9, salt="eq").collect()
    )
    for shards in (2, 3, 8, 32):
        sharded = sorted(
            (r.grp, r.key, r.rk)
            for r in stratified_sample_sharded(
                df, "g", "k", k=9, salt="eq", shards=shards
            ).collect()
        )
        assert sharded == plain, f"diverged at shards={shards}"
