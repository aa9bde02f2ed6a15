"""Product quantization (wave 23): per-subspace integer Lloyd
codebooks, scan-side encode, ADC top-k. Cross-engine exactness is the
sweep's job (q_pq_codes / q_pq_topk); these tests pin the semantics
and the plan shape."""

import pytest
from pyspark.sql import functions as F

from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
    pq_codebooks_u,
    pq_encode,
    pq_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir_oracle):
    return spark.read.parquet(f"{sf_dir_oracle}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq_codebooks_u(emb, m=4, ksub=8, iterations=2, dim=64)


def test_codebook_shape_and_determinism(emb, books):
    assert len(books) == 4
    assert all(len(b) == 8 for b in books)
    assert all(len(cw) == 16 for b in books for cw in b)
    # micro-unit integers, deterministic across retrains
    assert all(isinstance(x, int) for b in books for cw in b for x in cw)
    again = pq_codebooks_u(emb, m=4, ksub=8, iterations=2, dim=64)
    assert again == books


def test_encode_zero_shuffle_plan(emb, books):
    codes = pq_encode(emb, books)
    plan = codes._sc._jvm.PythonSQLUtils.explainString(
        codes._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # encode is a pure scan-side pass
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_encode_codes_in_range(emb, books):
    codes = pq_encode(emb, books).select(
        F.min(F.array_min("code")).alias("lo"),
        F.max(F.array_max("code")).alias("hi"),
        F.min(F.size("code")).alias("m"),
    ).first()
    assert codes["lo"] >= 0 and codes["hi"] <= 7 and codes["m"] == 4


def test_adc_self_query_ranks_first(emb, books):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq_topk(emb, queries, books, k=5)
    firsts = {
        r["query_id"]: r["vec_id"]
        for r in top.filter("rank = 1").collect()
    }
    # ADC(self) = the vector's own quantization error, which is minimal
    # for itself in this corpus — the standard PQ sanity check
    assert firsts == {0: 0, 1: 1, 2: 2}
    assert top.count() == 15


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_u(emb, m=5, ksub=8, iterations=1, dim=64)


def test_adc_fanout_invariance(emb, books):
    """The two-level top-k's bucket count changes the plan, never the
    result — global top-k is a subset of the union of bucket top-ks."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, pq_topk(emb, queries, books, k=7, fanout=1).collect()))
    b = sorted(map(tuple, pq_topk(emb, queries, books, k=7, fanout=7).collect()))
    c = sorted(map(tuple, pq_topk(emb, queries, books, k=7, fanout=64).collect()))
    assert a == b == c and len(a) == 21


def test_ivfpq_probe_all_equals_flat_pq(emb, books):
    """With n_probe = n_centroids the coarse quantizer prunes nothing,
    so IVF-PQ must reduce exactly to flat ADC over all codes."""
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        ivfpq_topk,
        kmeans_centroids_u,
    )

    cents = kmeans_centroids_u(emb, n_centroids=8, iterations=1)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = sorted(map(tuple, ivfpq_topk(
        emb, queries, cents, books, k=5, n_probe=8).collect()))
    flat = sorted(map(tuple, pq_topk(emb, queries, books, k=5).collect()))
    assert full == flat and len(full) == 15


def test_ivfpq_self_rank_one(emb, books):
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        ivfpq_topk,
        kmeans_centroids_u,
    )

    cents = kmeans_centroids_u(emb, n_centroids=8, iterations=1)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = ivfpq_topk(emb, queries, cents, books, k=5, n_probe=2)
    firsts = {r["query_id"]: r["vec_id"]
              for r in top.filter("rank = 1").collect()}
    # a query's own list is always its top probe, so self is findable
    assert firsts == {0: 0, 1: 1, 2: 2}
