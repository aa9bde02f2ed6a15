"""Scale guards for the two remaining silent-quadratic paths flagged
by the round-3 review: the uncapped link-prediction wedge join
(operators/graph.py) and range_histogram's distinct-value-sized
single-partition sort (operators/stats.py). Same contract as the
dedup guards: refuse to run, don't document away."""

import pytest

pytestmark = pytest.mark.spark


def _star(spark, hub_deg):
    # hub 0 connected to 1..hub_deg, plus one spoke-spoke edge
    rows = [(0, i) for i in range(1, hub_deg + 1)] + [(1, 2)]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_link_prediction_uncapped_guard_raises(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        link_prediction,
    )

    g = _star(spark, hub_deg=6)
    with pytest.raises(ValueError, match="uncapped wedge join"):
        link_prediction(g, max_hub_degree_uncapped=4)
    # a wedge cap, or an explicit opt-out, lifts the guard
    assert link_prediction(
        g, max_wedge_degree=4, max_hub_degree_uncapped=4
    ).count() >= 0
    assert link_prediction(g, max_hub_degree_uncapped=None).count() >= 0
    # graphs under the probe threshold run uncapped
    assert link_prediction(
        _star(spark, hub_deg=3), max_hub_degree_uncapped=4
    ).count() >= 0


def test_link_prediction_capped_ignores_hub_guard(spark):
    """The production shape (max_wedge_degree set) must never probe:
    hub exclusion already bounds the join, whatever the max degree."""
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        link_prediction,
    )

    g = _star(spark, hub_deg=50)
    out = link_prediction(g, min_common=1, max_wedge_degree=5,
                          max_hub_degree_uncapped=2)
    assert out.count() >= 0  # no raise despite hub 50 > 2


def test_range_histogram_distinct_guard_raises(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        range_histogram,
    )

    df = spark.range(0, 500).selectExpr("CAST(id AS DOUBLE) AS value")
    with pytest.raises(ValueError, match="distinct values"):
        range_histogram(df, max_distinct_uncapped=50)
    # explicit opt-out and under-threshold inputs still run
    assert range_histogram(df, max_distinct_uncapped=None).count() > 0
    small = spark.range(0, 500).selectExpr(
        "CAST(id % 10 AS DOUBLE) AS value"
    )
    assert range_histogram(small, max_distinct_uncapped=50).count() > 0
