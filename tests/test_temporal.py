"""Unit tests for operators/temporal.asof_join_backward: match
selection, at-or-before tie semantics, greatest-tie resolution among
same-timestamp right rows, tolerance nulling, and the column-collision
guard."""

import pytest

pytestmark = pytest.mark.spark


def test_asof_basic_and_no_match(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        asof_join_backward,
    )

    left = spark.createDataFrame(
        [(1, "u", 5), (2, "u", 15), (3, "u", 2), (4, "w", 10)],
        "eid long, k string, ts_s long",
    )
    right = spark.createDataFrame(
        [("u", 3, 100, 30), ("u", 10, 101, 40)],
        "k string, ts_s long, eid long, v long",
    )
    out = {
        r["eid"]: (r["matched_ts"], r["v"])
        for r in asof_join_backward(
            left, right, "k", "ts_s", "eid", ["v"]
        ).collect()
    }
    # eid 1 (t=5) -> right t=3; eid 2 (t=15) -> right t=10;
    # eid 3 (t=2) precedes all rights; key w has no rights at all
    assert out == {
        1: (3, 30),
        2: (10, 40),
        3: (None, None),
        4: (None, None),
    }


def test_asof_equal_ts_matches_and_greatest_tie_wins(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        asof_join_backward,
    )

    left = spark.createDataFrame([(1, "u", 7)], "eid long, k string, ts_s long")
    # two right rows exactly at the left timestamp: side 0 sorts first
    # (at-or-before includes equality) and eid 9 > eid 8 wins the tie
    right = spark.createDataFrame(
        [("u", 7, 8, 80), ("u", 7, 9, 90)],
        "k string, ts_s long, eid long, v long",
    )
    rows = asof_join_backward(left, right, "k", "ts_s", "eid", ["v"]).collect()
    assert (rows[0]["matched_ts"], rows[0]["v"]) == (7, 90)


def test_asof_tolerance_nulls_stale_matches(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        asof_join_backward,
    )

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 200)], "eid long, k string, ts_s long"
    )
    right = spark.createDataFrame(
        [("u", 95, 1, 10)], "k string, ts_s long, eid long, v long"
    )
    out = {
        r["eid"]: (r["matched_ts"], r["v"])
        for r in asof_join_backward(
            left, right, "k", "ts_s", "eid", ["v"], tolerance=10
        ).collect()
    }
    # the t=95 purchase is within 10s of t=100 but stale for t=200
    assert out == {1: (95, 10), 2: (None, None)}


def test_asof_column_collision_raises(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        asof_join_backward,
    )

    left = spark.createDataFrame([(1, "u", 5, 0)], "eid long, k string, ts_s long, v long")
    right = spark.createDataFrame(
        [("u", 3, 1, 30)], "k string, ts_s long, eid long, v long"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join_backward(left, right, "k", "ts_s", "eid", ["v"])
