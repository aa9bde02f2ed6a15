"""Unit tests for the round-3 fifth-wave operators: HyperLogLog,
mergeable KMV sketches, BPE pair counting, and bounded multi-source
BFS. Cross-engine exactness is covered by tests/test_oracles.py; these
pin operator-level semantics on tiny hand-checked inputs.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _py_hll_register(value: str, p: int = 8):
    """Pure-Python twin of hll_build's (bucket, rho) derivation."""
    h = hashlib.md5(value.encode()).hexdigest()
    bn = p // 4
    bucket = int(h[:bn], 16)
    w = h[bn : bn + 12]
    bits = bin(int(w, 16))[2:].zfill(48)
    rho = 49 if int(w, 16) == 0 else bits.index("1") + 1
    return bucket, rho


def _strings_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "t string")


def test_hll_build_matches_python_reference(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import hll_build

    vals = [f"tok{i}" for i in range(200)]
    got = {
        r["bucket"]: r["max_rho"]
        for r in hll_build(_strings_df(spark, vals), "t").collect()
    }
    want = {}
    for v in vals:
        b, rho = _py_hll_register(v)
        want[b] = max(want.get(b, 0), rho)
    assert got == want


def test_hll_build_dedups_input(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import hll_build

    once = hll_build(_strings_df(spark, ["a", "b", "c"]), "t").collect()
    thrice = hll_build(
        _strings_df(spark, ["a", "b", "c"] * 3), "t"
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, thrice))


def test_hll_estimate_accuracy_and_fields(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    n = 5000
    vals = [f"v{i}" for i in range(n)]
    row = hll_estimate(hll_build(_strings_df(spark, vals), "t")).collect()[0]
    assert row["m"] == 256
    assert row["n_zero"] == 0  # 5000 >> 256 registers
    # standard error for m=256 is ~6.5%; allow 3 sigma
    assert abs(row["ndv_estimate"] - n) < 0.2 * n


def test_hll_registers_merge_by_max(spark):
    """Mergeability: registers of the union == per-bucket max of the
    shard registers."""
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import hll_build

    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(300)]
    ra = {r["bucket"]: r["max_rho"] for r in hll_build(_strings_df(spark, a), "t").collect()}
    rb = {r["bucket"]: r["max_rho"] for r in hll_build(_strings_df(spark, b), "t").collect()}
    ru = {
        r["bucket"]: r["max_rho"]
        for r in hll_build(_strings_df(spark, a + b), "t").collect()
    }
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert ru == merged


def test_hll_build_rejects_bad_p(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import hll_build

    df = _strings_df(spark, ["x"])
    for bad in (0, 3, 6, 20, -4):
        with pytest.raises(ValueError):
            hll_build(df, "t", p=bad)


# ---------------------------------------------------------------------------
# KMV sketches
# ---------------------------------------------------------------------------

def test_kmv_merge_equals_sketch_of_union(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        kmv_merge,
        kmv_sketch,
    )

    a_vals = [f"a{i}" for i in range(100)]
    b_vals = [f"b{i}" for i in range(100)] + a_vals[:50]  # overlap
    a = kmv_sketch(_strings_df(spark, a_vals), "t", k=16)
    b = kmv_sketch(_strings_df(spark, b_vals), "t", k=16)
    merged = sorted(r["h"] for r in kmv_merge(a, b, k=16).collect())
    direct = sorted(
        r["h"]
        for r in kmv_sketch(
            _strings_df(spark, a_vals + b_vals), "t", k=16
        ).collect()
    )
    assert merged == direct


def test_kmv_ndv_exact_below_k(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        kmv_ndv,
        kmv_sketch,
    )

    sk = kmv_sketch(_strings_df(spark, ["x", "y", "z", "x"]), "t", k=16)
    row = kmv_ndv(sk, k=16).collect()[0]
    assert row["n_seen"] == 3 and row["ndv_estimate"] == 3


def test_kmv_sketch_rejects_small_k(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import kmv_sketch

    with pytest.raises(ValueError):
        kmv_sketch(_strings_df(spark, ["x"]), "t", k=1)


# ---------------------------------------------------------------------------
# BPE pair counts
# ---------------------------------------------------------------------------

def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_pair_counts_hand_checked(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import (
        bpe_pair_counts,
    )

    # corpus: "abab ab" and "ab" -> word counts: abab:1, ab:2
    # pairs: abab -> ab, ba, ab (x1); ab -> ab (x2) => ab:4, ba:1
    out = bpe_pair_counts(
        _docs_df(spark, ["abab ab", "ab"]), top_n=10
    ).collect()
    got = [(r["pair"], r["cnt"]) for r in out]
    assert got == [("ab", 4), ("ba", 1)]


def test_bpe_pair_counts_tie_break_and_limit(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import (
        bpe_pair_counts,
    )

    # "xy" and "ax" each appear once -> pairs xy:1, ax:1; tie breaks
    # on pair asc so "ax" first; top_n=1 keeps only "ax"
    out = bpe_pair_counts(_docs_df(spark, ["xy ax"]), top_n=1).collect()
    assert [(r["pair"], r["cnt"]) for r in out] == [("ax", 1)]


def test_bpe_pair_counts_skips_single_char_words(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import (
        bpe_pair_counts,
    )

    out = bpe_pair_counts(_docs_df(spark, ["a b c ab"]), top_n=10).collect()
    assert [(r["pair"], r["cnt"]) for r in out] == [("ab", 1)]


def test_bpe_pair_counts_rejects_bad_top_n(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import (
        bpe_pair_counts,
    )

    with pytest.raises(ValueError):
        bpe_pair_counts(_docs_df(spark, ["ab"]), top_n=0)


# ---------------------------------------------------------------------------
# BFS hops
# ---------------------------------------------------------------------------

def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "subj long, obj long")


def _seeds_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_bfs_hops_hand_checked_distances(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import bfs_hops

    # 0 -> 1 -> 2 -> 3 -> 4, plus shortcut 0 -> 3; node 9 unreachable
    edges = _edges_df(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (8, 9)]
    )
    out = {
        r["id"]: r["dist"]
        for r in bfs_hops(edges, _seeds_df(spark, [0]), max_hops=4).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bfs_hops_multi_source_takes_nearest_seed(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import bfs_hops

    edges = _edges_df(spark, [(0, 1), (1, 2), (5, 2)])
    out = {
        r["id"]: r["dist"]
        for r in bfs_hops(edges, _seeds_df(spark, [0, 5]), max_hops=3).collect()
    }
    assert out == {0: 0, 5: 0, 1: 1, 2: 1}


def test_bfs_hops_respects_bound(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import bfs_hops

    edges = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    out = {
        r["id"]: r["dist"]
        for r in bfs_hops(edges, _seeds_df(spark, [0]), max_hops=2).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2}  # node 3 is 3 hops away: absent


def test_bfs_hops_zero_hops_returns_seeds_only(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import bfs_hops

    edges = _edges_df(spark, [(0, 1)])
    out = bfs_hops(edges, _seeds_df(spark, [0]), max_hops=0).collect()
    assert [(r["id"], r["dist"]) for r in out] == [(0, 0)]
    with pytest.raises(ValueError):
        bfs_hops(edges, _seeds_df(spark, [0]), max_hops=-1)


# ---------------------------------------------------------------------------
# wave 6 queries: class-property matrix, cohort retention
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_type_property_matrix_invariants(spark):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_type_property_matrix,
    )

    rows = q_type_property_matrix(spark, SF).collect()
    assert rows, "conformance corpus has typed items with properties"
    for r in rows:
        # classes are IRIs — vocabulary IRIs or skolemized blank nodes
        assert r["cls"].startswith(("http", "urn:skolem:"))
        assert 1 <= r["n_items"] <= r["n_triples"]


def test_cohort_retention_invariants(spark):
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_cohort_retention,
    )
    from pyspark.sql import functions as F

    out = q_cohort_retention(spark, SF)
    rows = out.collect()
    assert rows
    assert all(r["week_offset"] >= 0 for r in rows)
    # offset-0 cell of each cohort holds the full cohort: every user
    # is active in their own first week
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    assert week0 == n_users
    # retention can never exceed the cohort size
    by_cohort = {}
    for r in rows:
        if r["week_offset"] == 0:
            by_cohort[r["cohort_week"]] = r["n_users"]
    for r in rows:
        assert r["n_users"] <= by_cohort[r["cohort_week"]]


def test_hll_estimate_empty_input_is_zero(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    empty = _strings_df(spark, []).filter("t is not null")
    row = hll_estimate(hll_build(empty, "t")).collect()[0]
    assert row["n_zero"] == 256 and row["ndv_estimate"] == 0


def test_hll_small_range_uses_linear_counting(spark):
    """With most registers empty the estimator must switch to the
    precomputed linear-counting table — the raw harmonic estimate
    overshoots several-fold in this regime."""
    from microdata_rdf_streaming_parser_js_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    n = 30
    vals = [f"s{i}" for i in range(n)]
    row = hll_estimate(hll_build(_strings_df(spark, vals), "t")).collect()[0]
    assert row["n_zero"] > 0
    assert abs(row["ndv_estimate"] - n) <= 3  # LC is near-exact here
    assert row["raw_estimate"] > row["ndv_estimate"]  # raw overshoots


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_text(n=600):
    # deterministic varied text, no randomness
    words = []
    for i in range(n // 6):
        words.append(f"w{(i * 7919) % 997:03d}")
    return " ".join(words)


def test_cdc_chunks_reassemble_to_normalized_text(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        cdc_chunks,
        norm_text,
    )

    txt = _cdc_text()
    df = _docs_df(spark, [txt])
    rows = sorted(
        cdc_chunks(df, window=8, divisor=32).collect(),
        key=lambda r: r["chunk_no"],
    )
    assert rows
    # chunk lengths tile the normalized text exactly
    norm = df.select(norm_text(F.col("text")).alias("t")).collect()[0]["t"]
    assert sum(r["chunk_len"] for r in rows) == len(norm)
    assert [r["chunk_no"] for r in rows] == list(range(1, len(rows) + 1))


def test_cdc_chunks_realign_after_insertion(spark):
    """The CDC property: prefixing text shifts every byte offset but
    boundaries re-align, so most chunks still dedup against the
    original — byte-offset chunking would share nothing."""
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        cdc_chunks,
    )

    base = _cdc_text()
    df = _docs_df(spark, [base, "inserted prefix " + base])
    rows = cdc_chunks(df, window=8, divisor=32).collect()
    a = {r["chunk_hash"] for r in rows if r["doc_id"] == 0}
    b = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    assert len(a) >= 5
    assert len(a & b) >= len(a) // 2


def test_cdc_chunks_short_and_empty_docs(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        cdc_chunks,
    )

    rows = cdc_chunks(
        _docs_df(spark, ["", "tiny"]), window=8, divisor=32
    ).collect()
    # empty doc -> no chunks; short doc (< window) -> one whole-doc chunk
    assert [(r["doc_id"], r["chunk_no"], r["chunk_len"]) for r in rows] == [
        (1, 1, 4)
    ]


def test_cdc_chunks_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.dedup import (
        cdc_chunks,
    )

    df = _docs_df(spark, ["x"])
    with pytest.raises(ValueError):
        cdc_chunks(df, window=0)
    with pytest.raises(ValueError):
        cdc_chunks(df, divisor=0)
    with pytest.raises(ValueError):
        cdc_chunks(df, window=12)  # polynomial overflow


# ---------------------------------------------------------------------------
# BGP path join + sameAs closure rewrite
# ---------------------------------------------------------------------------

def test_path_2hop_invariants(spark):
    """Every path count is consistent with the synthetic KG's known
    out-degrees: each entity has <= 2 knows edges and exactly 1
    worksFor edge, so total paths == number of (a knows b) edges and
    n_people <= n_paths per org."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_path_2hop,
    )

    rows = q_path_2hop(spark, SF).collect()
    assert rows
    n = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    total_paths = sum(r["n_paths"] for r in rows)
    # knows edges: 2 per entity minus self-loop exclusions; every b
    # has exactly one worksFor, so paths == knows edges
    self_k1 = sum(1 for i in range(n) if (i * 7 + 3) % n == i)
    self_k2 = sum(1 for i in range(n) if (i + 13) % n == i)
    assert total_paths == 2 * n - self_k1 - self_k2
    for r in rows:
        assert 1 <= r["n_people"] <= r["n_paths"]


def test_sameas_rewrite_conserves_and_is_transitive(spark):
    """(1) Conservation: collapsing duplicates never drops facts —
    sum(n_sources) equals the pre-rewrite fact count. (2) Transitive
    closure is load-bearing: the bridge 30k sameAs 30k+3 means entity
    30k+5 (two hops from its canonical) must never survive as a
    subject. (3) Idempotence: every surviving subject is its own
    canonical (a component minimum)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_sameas_rewrite,
    )

    rows = q_sameas_rewrite(spark, SF).collect()
    assert rows
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    self_k = sum(1 for i in range(n) if (i * 7 + 3) % n == i)
    assert sum(r["n_sources"] for r in rows) == 2 * n - self_k
    # Python union-find twin of the sameAs closure; canonical = the
    # LEXICOGRAPHIC min IRI in the component (both engines compare
    # the IRI strings, so 'e/100' beats 'e/99')
    pref = "http://ex.org/e/"
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for i in range(n):
        if i % 3 != 0:
            union(i, i - i % 3)
        if i % 30 == 0 and i + 3 < n:
            union(i, i + 3)
    canon = {}
    for i in range(n):
        r = find(i)
        cur = canon.get(r)
        iri = pref + str(i)
        canon[r] = iri if cur is None or iri < cur else cur
    expected_subjects = set(canon.values())
    subjects = {r["subj"] for r in rows}
    assert subjects == expected_subjects
    # transitive bridge is load-bearing: 30k's triad and 30k+3's triad
    # share ONE canonical (entity 30k+5 is two hops from it)
    if n > 35:
        assert canon[find(35)] == canon[find(30)]
        assert canon[find(33)] == canon[find(30)]
