"""Wave-7 KG schema/validation invariants: transitive_closure
semantics, the star-BGP pivot's no-self-join plan, the subclass
inference broadcast, and SHACL report coverage of fact-less entities.
"""

import io
from contextlib import redirect_stdout

import pytest

pytestmark = pytest.mark.spark


def plan_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _closure_pairs(spark, edges, **kw):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        transitive_closure,
    )

    e = spark.createDataFrame(edges, "subj long, obj long")
    return {
        (r.subj, r.obj) for r in transitive_closure(e, **kw).collect()
    }


def test_closure_path_graph_reflexive(spark):
    # 0->1->...->5: p* gives every i <= j pair
    edges = [(i, i + 1) for i in range(5)]
    got = _closure_pairs(spark, edges, max_depth=6)
    want = {(i, j) for i in range(6) for j in range(6) if i <= j}
    assert got == want


def test_closure_path_graph_nonreflexive(spark):
    # p+ semantics: strict i < j pairs only
    edges = [(i, i + 1) for i in range(5)]
    got = _closure_pairs(spark, edges, max_depth=6, reflexive=False)
    want = {(i, j) for i in range(6) for j in range(6) if i < j}
    assert got == want


def test_closure_depth_bound_covers_requested_depth(spark):
    # chain of 9 edges, max_depth=9 -> rounds=ceil(log2(9))=4 covers
    # paths up to 2^4=16 edges; the full chain must be present
    edges = [(i, i + 1) for i in range(9)]
    got = _closure_pairs(spark, edges, max_depth=9)
    assert (0, 9) in got
    assert len(got) == sum(range(11))  # 55 pairs incl. reflexive


def test_closure_binary_tree_ancestors(spark):
    # the q_rdfs_subclass_infer ontology: parent(c) = (c-1) div 2
    edges = [(c, (c - 1) // 2) for c in range(1, 64)]
    got = _closure_pairs(spark, edges, max_depth=6)
    # ancestors of 63: 63,31,15,7,3,1,0
    assert {(63, a) for a in (63, 31, 15, 7, 3, 1, 0)} <= got
    # no sideways reachability
    assert (2, 1) not in got and (5, 6) not in got


def test_closure_rejects_bad_depth(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        transitive_closure,
    )

    e = spark.createDataFrame([(0, 1)], "subj long, obj long")
    with pytest.raises(ValueError):
        transitive_closure(e, max_depth=0)


def test_star_bgp_pivot_has_no_fact_self_join(spark, sf_dir):
    # the star is ONE pivot aggregation: no SortMergeJoin anywhere and
    # exactly one shuffle (the final agg exchange); the only join is
    # the broadcast of the 1-row count frame from _kg_synth_base
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_star_bgp_pivot,
    )

    plan = plan_str(q_star_bgp_pivot(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # exactly one hash-partitioned (fact-table) shuffle: the final agg.
    # the other exchanges are the 1-row count frame (SinglePartition +
    # BroadcastExchange), not data movement.
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "partial_max" in plan  # map-side combine before the exchange


def test_subclass_infer_broadcasts_closure(spark, sf_dir):
    # the ontology closure must broadcast onto the instance table —
    # the instance side may shuffle only for the final aggregation
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_rdfs_subclass_infer,
    )

    plan = plan_str(q_rdfs_subclass_infer(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shacl_report_includes_factless_entities(spark, sf_dir):
    # i = 0 has neither name nor worksFor (0 % 11 == 0 % 13 == 0): it
    # appears in NO fact row, yet must yield BOTH violation rows
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _KG_ENT,
        q_shacl_mincount,
    )

    rows = q_shacl_mincount(spark, sf_dir).collect()
    zero = sorted(r.missing for r in rows if r.subj == f"{_KG_ENT}0")
    assert zero == [
        "http://ex.org/name",
        "http://ex.org/worksFor",
    ]


def test_functional_conflicts_planted_count(spark, sf_dir):
    # exactly the i % 97 == 0 entities conflict, each with 2 values
    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_functional_conflicts,
    )

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    rows = q_functional_conflicts(spark, sf_dir).collect()
    assert len(rows) == len(range(0, n, 97))
    assert all(r.n_values == 2 for r in rows)


# --- wave 8: KG lifecycle & census ---


def test_kg_delta_status_counts(spark, sf_dir):
    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _KG_BIRTHYEAR,
        _KG_WORKSFOR,
        q_kg_delta,
    )

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    got = {
        (r.pred, r.status): r.n
        for r in q_kg_delta(spark, sf_dir).collect()
    }
    ids = range(n)
    assert got[(_KG_BIRTHYEAR, "added")] == sum(1 for i in ids if i % 5 == 0)
    assert got[(_KG_WORKSFOR, "removed")] == sum(
        1 for i in ids if i % 13 == 0
    )
    assert got[(_KG_WORKSFOR, "changed")] == sum(
        1 for i in ids if i % 7 == 0 and i % 13 != 0
    )
    # every (subj, pred) slot is classified exactly once
    assert sum(got.values()) == 2 * n


def test_symmetric_gap_is_antisymmetric(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_symmetric_gap,
    )

    pairs = {
        (r.subj, r.obj) for r in q_symmetric_gap(spark, sf_dir).collect()
    }
    assert pairs  # the synthetic edge set is mostly asymmetric
    # a missing-reciprocal edge's reversal is not in the edge set at
    # all, so it can never be reported too
    assert not any((b, a) in pairs for (a, b) in pairs)


def test_cardinality_histogram_mass_conservation(spark, sf_dir):
    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _KG_WORKSFOR,
        q_cardinality_histogram,
    )

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    rows = q_cardinality_histogram(spark, sf_dir).collect()
    works = {r.k: r.n_subjects for r in rows if r.pred == _KG_WORKSFOR}
    assert works == {1: n}  # worksFor is strictly single-valued


def test_vocab_coverage_plan_topk_and_broadcast(spark, sf_dir):
    # vocabulary selection must be TakeOrderedAndProject (no global
    # sort materialization) and must broadcast onto the token stream
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_vocab_coverage,
    )

    plan = plan_str(q_vocab_coverage(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_vocab_coverage_bounds(spark, sf_dir):
    import re

    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _VC_TOPK,
        q_vocab_coverage,
    )

    rows = q_vocab_coverage(spark, sf_dir).collect()
    assert all(0 <= r.oov_ppm <= 1_000_000 for r in rows)
    # OOV tokens exist only if the corpus vocabulary exceeds the top-k
    # cut (at sf0.001 it may not — everything is then in-vocabulary)
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    distinct = {
        t
        for s in texts.column("text").to_pylist()
        for t in re.sub(r"\s+", " ", s.strip().lower()).split(" ")
        if t
    }
    if len(distinct) > _VC_TOPK:
        assert any(r.oov_ppm > 0 for r in rows)
    else:
        assert all(r.oov_ppm == 0 for r in rows)


# --- wave 9: range-join strategy + grouped top-k ---


def test_interval_join_exact_membership(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        interval_join,
    )

    ev = spark.createDataFrame(
        [(1, 100), (2, 1799), (3, 1800), (4, 3599), (5, 5000)],
        "event_id long, ts_s long",
    )
    # window B spans the 1800s bucket boundary; C is zero-length
    iv = spark.createDataFrame(
        [("A", 50, 150), ("B", 1700, 1900), ("C", 5000, 5000)],
        "interval_id string, s long, e long",
    )
    got = {
        (r.interval_id, r.event_id)
        for r in interval_join(ev, iv, bucket_s=1800).collect()
    }
    assert got == {("A", 1), ("B", 2), ("B", 3)}


def test_interval_join_rejects_bad_bucket(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.temporal import (
        interval_join,
    )

    ev = spark.createDataFrame([(1, 0)], "event_id long, ts_s long")
    iv = spark.createDataFrame([("A", 0, 1)], "interval_id string, s long, e long")
    with pytest.raises(ValueError):
        interval_join(ev, iv, bucket_s=0)


def test_interval_join_plan_is_equi_join(spark, sf_dir):
    # the events x intervals join must be a hash equi-join on the
    # bucket key; the ONLY nested-loop join allowed is the 1-row
    # bounds broadcast (crossJoin of tmin/span)
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_interval_join,
    )

    import re

    plan = plan_str(q_interval_join(spark, sf_dir))
    # formatted explain prints each node in the tree AND as a detail
    # header — count the detail headers
    bnlj = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)
    assert len(bnlj) == 1
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_group_topk_k_rows_per_group(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _GT_K,
        q_group_topk,
    )

    rows = q_group_topk(spark, sf_dir).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.event_type, []).append(r)
    for g, rs in by_g.items():
        assert len(rs) <= _GT_K
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1))
        # rank order follows (count desc, user_id asc)
        srt = sorted(rs, key=lambda r: (-r.n_events, r.user_id))
        assert [r.rk for r in srt] == list(range(1, len(rs) + 1))


# --- wave 10: negatives, transitions, co-typing ---


def test_kg_negatives_exclude_true_facts(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _KG_ENT,
        _KG_ORG,
        q_kg_negatives,
    )

    rows = q_kg_negatives(spark, sf_dir).collect()
    assert rows
    for r in rows:
        i = int(r.subj[len(_KG_ENT):])
        true_obj = f"{_KG_ORG}{i % 37}"
        assert r.obj != true_obj  # anti-join removed accidental positives
        # candidates come only from the two corruption generators
        assert r.obj in {
            f"{_KG_ORG}{(i * 13 + 5) % 37}",
            f"{_KG_ORG}{(i * 17 + 11) % 37}",
        }


def test_markov_transitions_mass(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_markov_transitions,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    rows = q_markov_transitions(spark, sf_dir).collect()
    # each user's first event has no predecessor; everything else
    # contributes exactly one transition
    assert sum(r.n for r in rows) == n_events - n_users


def test_type_cooccurrence_ordered_pairs(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_type_cooccurrence,
    )

    rows = q_type_cooccurrence(spark, sf_dir).collect()
    assert rows  # multi-typed fixtures exist in the golden corpus
    assert all(r.cls_a < r.cls_b and r.n_subjects >= 1 for r in rows)


# --- wave 11: JSON payloads, CUBE, running totals ---


def test_json_props_prunes_scan(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_json_props,
    )

    df = q_json_props(spark, sf_dir)
    plan = plan_str(df)
    # the JSON path must not defeat column pruning
    assert "ReadSchema: struct<event_type:string,props:string>" in plan
    rows = df.collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n for r in rows) == total


def test_events_cube_grouping_set_mass(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_events_cube,
    )

    rows = q_events_cube(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    grand = [r for r in rows if r.g_type == 1 and r.g_day == 1]
    assert len(grand) == 1 and grand[0].n == total
    cells = [r for r in rows if r.g_type == 0 and r.g_day == 0]
    assert sum(r.n for r in cells) == total
    # every marginal also conserves mass
    assert sum(r.n for r in rows if r.g_type == 1 and r.g_day == 0) == total
    assert sum(r.n for r in rows if r.g_type == 0 and r.g_day == 1) == total


def test_running_total_matches_user_sums(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_running_total,
    )

    rt = q_running_total(spark, sf_dir)
    finals = {
        r.user_id: r.cum_value_u
        for r in rt.groupBy("user_id")
        .agg(F.max("cum_value_u").alias("cum_value_u"))
        .collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.floor(F.col("value") * 1e6).cast("long").alias("v")
    )
    # cum total is monotone within a user only if values are >= 0;
    # compare the true per-user sum against the LAST row instead
    last = {
        r.user_id: r.cum
        for r in rt.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts_s").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", F.col("cum_value_u").alias("cum"))
        .collect()
    }
    sums = {
        r.user_id: r.s
        for r in ev.groupBy("user_id").agg(F.sum("v").alias("s")).collect()
    }
    assert last == sums
    assert set(finals) == set(sums)


def test_ann_recall_bounds_and_nonzero(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _TOPK_K,
        q_ann_recall,
    )

    rows = q_ann_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= r.n_exact <= _TOPK_K
    # LSH must find at least the query point itself (cos=1 with itself
    # always shares every band bucket)
    assert all(r.n_hits >= 1 for r in rows)


# --- wave 13: SPARQL algebra completions ---


def test_bgp_optional_keeps_nameless_entities(spark, sf_dir):
    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_bgp_optional,
    )

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    rows = q_bgp_optional(spark, sf_dir).collect()
    assert len(rows) == n  # OPTIONAL never drops the required side
    nameless = [r for r in rows if r.nm is None]
    assert len(nameless) == sum(1 for i in range(n) if i % 11 == 0)


def test_construct_inverse_shape(spark, sf_dir):
    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _KG_ORG,
        q_construct_inverse,
    )

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    rows = q_construct_inverse(spark, sf_dir).collect()
    inv = [r for r in rows if r.pred == "http://ex.org/employs"]
    typ = [r for r in rows if r.pred != "http://ex.org/employs"]
    assert len(inv) == n  # one inverse edge per worksFor fact
    assert len(typ) == len({i % 37 for i in range(n)})  # distinct orgs
    assert all(r.subj.startswith(_KG_ORG) for r in rows)


# --- wave 14: SCD2 islands, table fingerprint ---


def test_scd2_islands_partition_versions(spark, sf_dir):
    import pyarrow.parquet as pq

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_scd2_islands,
    )

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    rows = q_scd2_islands(spark, sf_dir).collect()
    by_subj = {}
    for r in rows:
        by_subj.setdefault(r.subj, []).append(r)
    assert len(by_subj) == n
    for subj, ivs in by_subj.items():
        ivs = sorted(ivs, key=lambda r: r.valid_from)
        # intervals tile [0, 3] exactly: contiguous, non-overlapping
        assert ivs[0].valid_from == 0 and ivs[-1].valid_to == 3
        for a, b in zip(ivs, ivs[1:]):
            assert b.valid_from == a.valid_to + 1
            assert b.org != a.org  # adjacent islands really differ


def test_table_fingerprint_detects_any_row_change(spark, tmp_path):
    from pyspark.sql import functions as F

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_table_fingerprint,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    src.write.parquet(f"{a}/documents.parquet")
    src.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    ).write.parquet(f"{b}/documents.parquet")
    fa = q_table_fingerprint(spark, a).collect()[0]
    fb = q_table_fingerprint(spark, b).collect()[0]
    assert fa.n_rows == fb.n_rows
    assert fa.sum_h != fb.sum_h  # a single-byte change flips the sum
    # and the fingerprint is partition-layout invariant
    spark.read.parquet(f"{a}/documents.parquet").repartition(7).write.parquet(
        f"{b}/redistributed/documents.parquet"
    )
    fc = q_table_fingerprint(spark, f"{b}/redistributed").collect()[0]
    assert (fa.n_rows, fa.sum_h, fa.min_h, fa.max_h) == (
        fc.n_rows, fc.sum_h, fc.min_h, fc.max_h,
    )


def test_hypertable_rollup_levels_merge_exactly(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_hypertable_rollup,
    )

    rows = q_hypertable_rollup(spark, sf_dir).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r)
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for level in ("minute", "hour", "day"):
        lv = by_level[level]
        assert sum(r.n for r in lv) == total  # every level conserves mass
        assert {r.bucket % {"minute": 60, "hour": 3600, "day": 86400}[level]
                for r in lv} == {0}
    # each hour row is exactly the combine of its minute rows
    mins = by_level["minute"]
    for h in by_level["hour"]:
        kids = [m for m in mins if m.bucket // 3600 * 3600 == h.bucket]
        assert h.n == sum(m.n for m in kids)
        assert h.sum_value_u == sum(m.sum_value_u for m in kids)
        assert h.min_value_u == min(m.min_value_u for m in kids)
        assert h.max_value_u == max(m.max_value_u for m in kids)
