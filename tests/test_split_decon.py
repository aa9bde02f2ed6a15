"""Unit tests for operators/split.py (deterministic hash split) and
operators/decontaminate.py (eval-set n-gram overlap): a hashlib mirror
of the bucket arithmetic, stability/disjointness, hand-counted overlap
cases, and the guards."""

import hashlib

import pytest

pytestmark = pytest.mark.spark


def _bucket_py(key, salt="split"):
    h = hashlib.md5(f"{key}|{salt}".encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


def test_hash_split_matches_hashlib_mirror(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import hash_split

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    splits = (("train", 800_000), ("val", 100_000), ("test", 100_000))
    out = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", splits=splits).collect()
    }
    for i in range(200):
        b = _bucket_py(i)
        want = "train" if b < 800_000 else ("val" if b < 900_000 else "test")
        assert out[i] == want, (i, b, out[i], want)


def test_hash_split_salt_redraws_and_guards(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import hash_split

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    splits = (("a", 500_000), ("b", 500_000))
    one = {r["doc_id"]: r["split"]
           for r in hash_split(df, "doc_id", splits, salt="s1").collect()}
    two = {r["doc_id"]: r["split"]
           for r in hash_split(df, "doc_id", splits, salt="s1").collect()}
    other = {r["doc_id"]: r["split"]
             for r in hash_split(df, "doc_id", splits, salt="s2").collect()}
    assert one == two  # same salt -> pinned assignment
    assert one != other  # different salt -> re-draw
    with pytest.raises(ValueError, match="sum"):
        hash_split(df, "doc_id", (("a", 1),))
    with pytest.raises(ValueError, match="unique"):
        hash_split(df, "doc_id", (("a", 500_000), ("a", 500_000)))


def _decon(spark, docs, evals, **kw):
    from microdata_rdf_streaming_parser_js_spark.operators.decontaminate import (
        ngram_contamination,
    )

    d = spark.createDataFrame(docs, "doc_id long, text string")
    e = spark.createDataFrame(evals, "eval_doc_id long, text string")
    return {
        (r["doc_id"], r["eval_doc_id"]): r["n_shared"]
        for r in ngram_contamination(d, e, **kw).collect()
    }


def test_contamination_hand_counted(spark):
    # k=2 shingles: doc 1 shares {"a b", "b c"} with eval 10;
    # doc 2 shares only {"c d"}; doc 3 shares nothing
    out = _decon(
        spark,
        [(1, "a b c x"), (2, "z c d"), (3, "q r s")],
        [(10, "a b c d")],
        k=2,
    )
    assert out == {(1, 10): 2, (2, 10): 1}
    # min_overlap=2 drops the single-shingle match
    out2 = _decon(
        spark,
        [(1, "a b c x"), (2, "z c d")],
        [(10, "a b c d")],
        k=2,
        min_overlap=2,
    )
    assert out2 == {(1, 10): 2}


def test_contamination_eval_df_cap(spark):
    # "a b" appears in BOTH eval docs (df=2) and is dropped by the
    # cap; the match via the rarer "b c" (df=1) survives
    out = _decon(
        spark,
        [(1, "a b c")],
        [(10, "a b c"), (11, "a b z")],
        k=2,
        max_shingle_df=1,
    )
    assert out == {(1, 10): 1}


def test_mixture_sample_deterministic_and_weighted(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        mixture_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    sdf = spark.createDataFrame(rows, "doc_id long, src string")
    kept = mixture_sample(
        sdf, "doc_id", "src", {"a": 1_000_000, "b": 0}, default_u=0
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # keep-all group survives entirely, zero-rate group fully dropped
    assert ids == [i for i in range(400) if i % 2 == 0]
    # hashlib mirror of the bucket for a partial rate
    import hashlib

    def bucket(i, salt="mix"):
        return int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:8], 16) % 1_000_000

    kept_half = {
        r["doc_id"]
        for r in mixture_sample(
            sdf, "doc_id", "src", {"a": 500_000}, default_u=200_000
        ).collect()
    }
    for i in range(400):
        want = bucket(i) < (500_000 if i % 2 == 0 else 200_000)
        assert (i in kept_half) == want, i
    with pytest.raises(ValueError, match="weight"):
        mixture_sample(sdf, "doc_id", "src", {"a": 2_000_000})


def test_per_group_quota_cap_and_determinism(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        per_group_quota,
    )

    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = per_group_quota(df, "source", "doc_id", 5).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r["source"], set()).add(r["doc_id"])
        assert 1 <= r["quota_rank"] <= 5
    assert {len(v) for v in by_g.values()} == {5}
    # same survivors regardless of input partitioning
    kept2 = per_group_quota(
        df.repartition(7), "source", "doc_id", 5
    ).collect()
    assert {(r["doc_id"], r["quota_rank"]) for r in kept} == {
        (r["doc_id"], r["quota_rank"]) for r in kept2
    }


def test_per_group_quota_rejects_bad_cap(spark):
    import pytest as _pytest

    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        per_group_quota,
    )

    df = spark.createDataFrame([(1, "g")], "doc_id long, source string")
    with _pytest.raises(ValueError, match="cap"):
        per_group_quota(df, "source", "doc_id", 0)
