"""Wave-16 invariants: quantile-sketch replay + partition-layout
invariance + bounded state, and the correlated-subquery decorrelation
plan pin.
"""

import hashlib
import io
import math
from contextlib import redirect_stdout

import pytest

pytestmark = pytest.mark.spark


def plan_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _py_quantile_sketch(rows, n_shards, k_shard, k_merged, qs_u, scale=10**6):
    """(id, value) rows -> {(q_u, est_u, sample_n)} replay."""
    keyed = []
    for rid, v in rows:
        if v is None or math.isnan(v):
            continue
        h = hashlib.md5(f"{rid}|qsketch-v1".encode()).hexdigest()
        keyed.append((rid % n_shards, math.floor(v * scale), h, rid))
    shards: dict[int, list] = {}
    for s, v_u, h, rid in keyed:
        shards.setdefault(s, []).append((h, rid, v_u))
    merged = []
    for s, items in shards.items():
        items.sort()
        merged.extend(items[:k_shard])
    merged.sort()
    merged = merged[:k_merged]
    n = len(merged)
    by_val = sorted((v_u, rid) for h, rid, v_u in merged)
    out = set()
    for q in qs_u:
        r = (q * n + scale - 1) // scale
        if 1 <= r <= n:
            out.add((q, by_val[r - 1][0], n))
    return out


def test_quantile_sketch_matches_replay_and_is_layout_invariant(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        quantile_sketch,
    )

    rows = [(i, ((i * 37) % 101) / 7.0 - 5.0) for i in range(400)]
    rows += [(400, None), (401, float("nan"))]
    df = spark.createDataFrame(rows, "event_id long, value double")
    kw = dict(
        n_shards=8, k_per_shard=16, k_merged=40,
        qs_u=(250_000, 500_000, 750_000),
    )
    got = {
        (r.q_u, r.est_u, r.sample_n)
        for r in quantile_sketch(df, "value", "event_id", **kw).collect()
    }
    want = _py_quantile_sketch(
        [(i, v) for i, v in rows], 8, 16, 40, (250_000, 500_000, 750_000)
    )
    assert got == want
    # sample is bounded by k_merged regardless of input size
    assert all(n <= 40 for _, _, n in got)
    # partition layout must not change the sketch (shards are explicit)
    got_rep = {
        (r.q_u, r.est_u, r.sample_n)
        for r in quantile_sketch(
            df.repartition(13), "value", "event_id", **kw
        ).collect()
    }
    assert got_rep == got


def test_quantile_sketch_small_input_returns_exact_ranks(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        quantile_sketch,
    )

    # fewer rows than k: the sample IS the data, so the sketch is the
    # exact ceil-rank quantile
    rows = [(i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    got = {
        r.q_u: r.est_u
        for r in quantile_sketch(
            df, "value", "event_id", n_shards=4, k_per_shard=8, k_merged=32,
            qs_u=(500_000,),
        ).collect()
    }
    # rank = ceil(0.5 * 10) = 5 -> value 4.0 -> 4_000_000
    assert got == {500_000: 4_000_000}


def test_quantile_sketch_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        quantile_sketch,
    )

    df = spark.createDataFrame([(1, 1.0)], "event_id long, value double")
    with pytest.raises(ValueError):
        quantile_sketch(df, "value", "event_id", qs_u=())
    with pytest.raises(ValueError):
        quantile_sketch(df, "value", "event_id", n_shards=0)


def test_max_order_per_cust_is_decorrelated(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_max_order_per_cust,
    )

    df = q_max_order_per_cust(spark, sf_dir)
    plan = plan_str(df)
    # Catalyst rewrote the correlated scalar subquery into an
    # aggregate + join: no per-row subquery survives in the physical
    # plan
    assert "Subquery" not in plan
    assert "Join" in plan
    # and ties at the max are kept: every (custkey, price) group in
    # the result is that customer's max
    rows = df.collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    mx: dict[int, int] = {}
    for o in orders:
        c = o.o_custkey
        cents = math.floor(o.o_totalprice * 100)
        if c not in mx or cents > mx[c]:
            mx[c] = cents
    assert {(r.o_custkey, r.price_cents) for r in rows} == set(mx.items())
