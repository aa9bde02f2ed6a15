"""Wave-18 invariants: k-truss peeling semantics on known graphs,
truss nesting, and parameter guards.
"""

import pytest

pytestmark = pytest.mark.spark


def _truss(spark, edges, k, rounds=3):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import ktruss

    df = spark.createDataFrame(edges, "src long, dst long")
    return sorted((r.a, r.b) for r in ktruss(df, k=k, rounds=rounds).collect())


def _clique(nodes):
    ns = sorted(nodes)
    return [(a, b) for i, a in enumerate(ns) for b in ns[i + 1 :]]


def test_ktruss_keeps_clique_drops_pendant(spark):
    edges = _clique(range(4)) + [(3, 9), (9, 10)]
    assert _truss(spark, edges, k=4) == _clique(range(4))


def test_ktruss_k5_needs_support_three(spark):
    # K5: every edge sits in 3 triangles -> survives k=5; K4 does not
    assert _truss(spark, _clique(range(5)), k=5) == _clique(range(5))
    assert _truss(spark, _clique(range(4)), k=5) == []


def test_ktruss_nesting(spark):
    # (k+1)-truss is a subgraph of the k-truss
    edges = _clique(range(5)) + _clique(range(4, 8)) + [(0, 20), (20, 21)]
    t4 = set(_truss(spark, edges, k=4))
    t5 = set(_truss(spark, edges, k=5))
    assert t5 <= t4
    assert set(_clique(range(5))) <= t5


def test_ktruss_cascading_peel_needs_a_second_round(spark):
    # triangle chain: t0={0,1,2}, t1={2,3,4} share only vertex 2 plus
    # a bridge edge (1,3) forming triangle {1,2,3}; peeling the weak
    # bridge in round 1 drops support for its partners in round 2
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (1, 3)]
    one = _truss(spark, edges, k=4, rounds=1)
    two = _truss(spark, edges, k=4, rounds=2)
    assert set(two) <= set(one)
    assert two == []  # everything cascades away at k=4


def test_ktruss_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import ktruss

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        ktruss(df, k=2)
    with pytest.raises(ValueError):
        ktruss(df, k=4, rounds=0)
