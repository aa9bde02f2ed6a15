"""Wave-19 invariants: bounded SCC semantics, link-prediction scoring,
LOCF gap-fill, integer z-score outliers, stratified sampling quotas,
and the referential-integrity audit (NULL keys included).
"""

import datetime as dt

import pytest

pytestmark = pytest.mark.spark


def _scc(spark, edges, max_depth=8):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        scc_bounded,
    )

    df = spark.createDataFrame(edges, "subj long, obj long")
    return {r.node: r.scc_id for r in scc_bounded(df, max_depth=max_depth).collect()}


def test_scc_two_cycles_one_way_bridge(spark):
    # 0->1->2->0 and 3->4->5->3 joined by 2->3: two SCCs, min labels
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    got = _scc(spark, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_scc_dag_is_all_singletons(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = _scc(spark, edges)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_scc_bound_splits_long_cycle_and_depth_heals_it(spark):
    # directed 10-cycle: within 4 hops no pair is mutually reachable
    # (the return path is >= 6 edges), so every node is a singleton;
    # at depth 16 the full cycle collapses to one component
    ring = [(i, (i + 1) % 10) for i in range(10)]
    shallow = _scc(spark, ring, max_depth=4)
    assert shallow == {i: i for i in range(10)}
    deep = _scc(spark, ring, max_depth=16)
    assert deep == {i: 0 for i in range(10)}


def test_link_prediction_scores_and_threshold(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        link_prediction,
    )

    # star a=0 with leaves 1,2,3 plus edge (1,2): candidates through
    # the hub are (1,3) and (2,3); (1,2) is adjacent and excluded
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long"
    )
    got = {
        (r.u, r.w): (r.common, r.jaccard_u)
        for r in link_prediction(df, min_common=1).collect()
    }
    # deg: 0->3, 1->2, 2->2, 3->1
    assert got == {
        (1, 3): (1, 1_000_000 // (2 + 1 - 1)),
        (2, 3): (1, 1_000_000 // (2 + 1 - 1)),
    }
    assert link_prediction(df, min_common=2).count() == 0
    with pytest.raises(ValueError):
        link_prediction(df, min_common=0)


def test_gap_fill_locf_carries_and_flags(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        gap_fill_locf,
    )

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    df = spark.createDataFrame(
        [
            (7, t(0, 5), 1.5),
            (7, t(0, 40), 0.25),  # same bucket: summed
            (7, t(3, 10), 2.0),
            (9, t(5, 0), 4.0),  # single-bucket key: spine of one
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {
        (r.user_id, r.bucket_ts.hour): (r.value_u, r.is_gap)
        for r in gap_fill_locf(df).collect()
    }
    assert rows == {
        (7, 0): (1_750_000, 0),
        (7, 1): (1_750_000, 1),
        (7, 2): (1_750_000, 1),
        (7, 3): (2_000_000, 0),
        (9, 5): (4_000_000, 0),
    }
    with pytest.raises(ValueError):
        gap_fill_locf(df, step_hours=0)


def test_gap_fill_step_hours_aligns_buckets(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        gap_fill_locf,
    )

    t = lambda h: dt.datetime(2024, 1, 1, h, 30)
    df = spark.createDataFrame(
        [(1, t(1), 1.0), (1, t(6), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    out = gap_fill_locf(df, step_hours=2).collect()
    hours = sorted(r.bucket_ts.hour for r in out)
    # buckets align to even hours from the epoch-anchored grid
    assert hours == [0, 2, 4, 6]
    gaps = {r.bucket_ts.hour: r.is_gap for r in out}
    assert gaps == {0: 0, 2: 1, 4: 1, 6: 0}


def test_zscore_outliers_integer_rule(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        zscore_outliers,
    )

    rows = [("a", i, 0.0) for i in range(9)] + [("a", 99, 100.0)]
    # mean 10, population std 30: |100-10| = 90 > 2*30 -> outlier
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double"
    )
    got = zscore_outliers(df).collect()
    assert [(r.event_type, r.event_id, r.value_u) for r in got] == [
        ("a", 99, 10_000)
    ]
    # tighten the spread: [0]*3 + [100] -> |100-25| = 75 < 2*43.3
    df2 = spark.createDataFrame(
        [("a", i, 0.0) for i in range(3)] + [("a", 9, 100.0)],
        "event_type string, event_id long, value double",
    )
    assert zscore_outliers(df2).count() == 0
    with pytest.raises(ValueError):
        zscore_outliers(df, z=0)


def test_zscore_outliers_skips_null_and_nan(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        zscore_outliers,
    )

    rows = [("a", i, 0.0) for i in range(9)] + [
        ("a", 99, 100.0),
        ("a", 100, None),
        ("a", 101, float("nan")),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double"
    )
    got = zscore_outliers(df).collect()
    assert [r.event_id for r in got] == [99]


def test_stratified_sample_quota_and_determinism(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [("en", i) for i in range(5)] + [("de", i) for i in range(100, 102)],
        "lang string, doc_id long",
    )
    out = stratified_sample(df, "lang", "doc_id", k=3)
    got = sorted((r.grp, r.key, r.rk) for r in out.collect())
    by_grp = {}
    for g, k, rk in got:
        by_grp.setdefault(g, []).append(rk)
    assert sorted(by_grp["en"]) == [1, 2, 3]  # quota enforced
    assert sorted(by_grp["de"]) == [1, 2]  # small stratum kept whole
    again = sorted(
        (r.grp, r.key, r.rk)
        for r in stratified_sample(df, "lang", "doc_id", k=3).collect()
    )
    assert again == got
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", "doc_id", k=0)


def test_referential_orphans_counts_and_null_fk(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.stats import (
        referential_orphans,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "fk_key long"
    )
    parent = spark.createDataFrame([(1,), (3,)], "pk_key long")
    got = {
        r.fk: r.n_orphans
        for r in referential_orphans(child, parent, "fk_key", "pk_key").collect()
    }
    assert got == {2: 1, None: 1}


def test_link_prediction_hub_cap_excludes_center(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        link_prediction,
    )

    # hub 0 (degree 3) is the only wedge center: capping it below its
    # degree removes every candidate; at the cap they return, and the
    # Jaccard denominator still uses the hub's FULL degree
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    assert link_prediction(df, min_common=1, max_wedge_degree=2).count() == 0
    got = {
        (r.u, r.w): r.jaccard_u
        for r in link_prediction(
            df, min_common=1, max_wedge_degree=3
        ).collect()
    }
    assert got == {(1, 2): 1_000_000, (1, 3): 1_000_000, (2, 3): 1_000_000}
    with pytest.raises(ValueError):
        link_prediction(df, min_common=1, max_wedge_degree=0)
