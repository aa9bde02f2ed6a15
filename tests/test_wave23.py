"""Wave 58-61 invariants: KNN-Shapley closed-form recursion (hand
arithmetic + the all-same-label symmetry), two-stage re-rank
containment/exactness, Fellegi-Sunter pair-set accounting,
l-diversity audit consistency.
"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# wave 58: KNN-Shapley
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_shapley_hand_recursion(spark):
    """3 train points, 1 test point, K=2.  Neighbor order by cosine to
    t=[1,0]: a=[1,0.01] (ind 1), b=[1,1] (ind 0), c=[-1,0] (ind 1).
    Recursion in 1e-9 units: t3 = floor(1e9/3) = 333333333,
    t2 = floor(1e9*(0-1)*2/4) = -500000000, t1 = floor(1e9*1*1/2) =
    500000000; suffix sums: c=333333333, b=-166666667, a=333333333."""
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        knn_shapley,
    )

    train = _emb(
        spark,
        [(10, [1.0, 0.01], 0), (11, [1.0, 1.0], 1), (12, [-1.0, 0.0], 0)],
    )
    test = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], "query_id long, embedding array<float>, label int"
    )
    got = {
        r.vec_id: r.shap_u for r in knn_shapley(train, test, k=2).collect()
    }
    assert got == {10: 333333333, 11: -166666667, 12: 333333333}


def test_knn_shapley_uniform_labels_give_equal_value(spark):
    """All labels equal -> every boundary increment is zero and every
    training point inherits exactly s(N) = floor(scale/N): the Shapley
    symmetry axiom surfaced as an integer identity (here N=4)."""
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        knn_shapley,
    )

    train = _emb(
        spark,
        [
            (1, [1.0, 0.0], 7),
            (2, [0.5, 0.5], 7),
            (3, [0.0, 1.0], 7),
            (4, [-1.0, 0.3], 7),
        ],
    )
    test = spark.createDataFrame(
        [(0, [0.9, 0.1], 7)], "query_id long, embedding array<float>, label int"
    )
    vals = {r.shap_u for r in knn_shapley(train, test, k=3).collect()}
    assert vals == {250000000}


def test_knn_shapley_sums_over_test_points(spark):
    """Two test points -> each training value is the SUM of its two
    per-test suffix values (run the two single-test calls and add)."""
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        knn_shapley,
    )

    train = _emb(
        spark,
        [(10, [1.0, 0.01], 0), (11, [1.0, 1.0], 1), (12, [-1.0, 0.0], 0)],
    )
    t1 = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], "query_id long, embedding array<float>, label int"
    )
    t2 = spark.createDataFrame(
        [(1, [0.0, 1.0], 1)], "query_id long, embedding array<float>, label int"
    )
    both = t1.unionByName(t2)
    single = {}
    for t in (t1, t2):
        for r in knn_shapley(train, t, k=2).collect():
            single[r.vec_id] = single.get(r.vec_id, 0) + r.shap_u
    combined = {
        r.vec_id: r.shap_u for r in knn_shapley(train, both, k=2).collect()
    }
    assert combined == single


# ---------------------------------------------------------------------------
# wave 59: two-stage re-rank
# ---------------------------------------------------------------------------


def test_rerank_is_contained_in_shortlist_and_exact(spark, sf_dir):
    """Every re-ranked row must come from the PQ shortlist (same
    (query, vec) pairs), carry the EXACT cosine (equal to
    q_topk_cosine's value where the pair appears there too), and rank
    densely 1..K per query."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _RERANK_K,
        q_pq_topk,
        q_rerank_topk,
        q_topk_cosine,
    )

    rr = q_rerank_topk(spark, sf_dir).collect()
    shortlist = {
        (r.query_id, r.vec_id) for r in q_pq_topk(spark, sf_dir).collect()
    }
    exact = {
        (r.query_id, r.vec_id): r.cos_u
        for r in q_topk_cosine(spark, sf_dir).collect()
    }
    per_q = {}
    for r in rr:
        assert (r.query_id, r.vec_id) in shortlist
        if (r.query_id, r.vec_id) in exact:
            assert r.cos_u == exact[(r.query_id, r.vec_id)]
        per_q.setdefault(r.query_id, []).append(r.rerank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, _RERANK_K + 1))


# ---------------------------------------------------------------------------
# wave 60: Fellegi-Sunter weights
# ---------------------------------------------------------------------------


def test_fs_linkage_pair_accounting(spark, sf_dir):
    """n_m must equal the verified MinHash pair count (M reused
    verbatim), the U sample is non-empty and disjoint from M by
    construction, ratios sit in [0, 1e6], and all four fields report."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _FS_FIELDS,
        q_fs_linkage,
        q_minhash_lsh_pairs,
    )

    rows = {r.field: r for r in q_fs_linkage(spark, sf_dir).collect()}
    assert set(rows) == set(_FS_FIELDS)
    n_pairs = q_minhash_lsh_pairs(spark, sf_dir).count()
    for r in rows.values():
        assert r.n_m == n_pairs
        assert r.n_u > 0
        assert 0 <= r.agree_m <= r.n_m and 0 <= r.agree_u <= r.n_u
        assert 0 <= r.m_u <= 1_000_000 and 0 <= r.u_u <= 1_000_000


def test_fs_prefix_field_discriminates_on_near_dups(spark, sf_dir):
    """Near-duplicate pairs share normalized prefixes far more often
    than random pairs — the prefix field's m must exceed its u (the
    reason F-S weights order fields by m/u lift)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_fs_linkage,
    )

    rows = {r.field: r for r in q_fs_linkage(spark, sf_dir).collect()}
    assert rows["prefix"].m_u > rows["prefix"].u_u


# ---------------------------------------------------------------------------
# wave 61: l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_matches_independent_recount(spark, sf_dir):
    """The audit row must agree with an independently-written
    groupBy/countDistinct recount of the same QI/sensitive split."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _LDIV_L,
        _LDIV_LEN_BUCKET,
        q_l_diversity,
    )

    row = q_l_diversity(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grp = (
        docs.groupBy("source", F.expr(f"n_chars div {_LDIV_LEN_BUCKET}"))
        .agg(F.countDistinct("lang").alias("d"), F.count("*").alias("c"))
        .collect()
    )
    assert row.n_groups == len(grp)
    assert row.n_weak_groups == sum(1 for g in grp if g.d < _LDIV_L)
    assert row.n_weak_rows == sum(g.c for g in grp if g.d < _LDIV_L)
    assert row.min_diversity == min(g.d for g in grp)
    assert 0 <= row.weak_share_u <= 1_000_000


# ---------------------------------------------------------------------------
# wave 62: dedup cascade
# ---------------------------------------------------------------------------


def test_dedup_cascade_stage_accounting_is_consistent(spark, sf_dir):
    """n_out of each stage must equal n_in of the next, stage 1's n_in
    is the corpus size, and stage 1's removals equal the exact-dedup
    duplicate count (sum of (n_dups - 1) over digest groups)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_dedup_cascade,
        q_dedup_exact,
    )

    rows = sorted(
        q_dedup_cascade(spark, sf_dir).collect(), key=lambda r: r.stage_ord
    )
    assert [r.stage for r in rows] == ["1_exact", "2_simhash", "3_minhash"]
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[0].n_in == docs_n
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.n_out == nxt.n_in
        assert prev.n_out == prev.n_in - prev.n_removed
    exact_dups = sum(
        r.n_dups - 1 for r in q_dedup_exact(spark, sf_dir).collect()
    )
    assert rows[0].n_removed == exact_dups


def test_dedup_cascade_later_stages_never_recount_earlier_kills(spark, sf_dir):
    """Every simhash-stage removal must be a pair whose BOTH endpoints
    survived the exact stage — no doc is charged to two stages."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_dedup_cascade,
    )

    rows = {r.stage: r for r in q_dedup_cascade(spark, sf_dir).collect()}
    total_removed = sum(r.n_removed for r in rows.values())
    assert rows["3_minhash"].n_out == rows["1_exact"].n_in - total_removed


# ---------------------------------------------------------------------------
# wave 63: KS drift
# ---------------------------------------------------------------------------


def test_ks_drift_matches_scipy_free_reference(spark, sf_dir):
    """Recompute one pair's exact KS with plain Python over the same
    docs and compare the integer micro-units."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_ks_drift,
    )

    rows = q_ks_drift(spark, sf_dir).collect()
    assert rows, "expected at least one source pair"
    r = sorted(rows, key=lambda x: (x.source_a, x.source_b))[0]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    xa = sorted(d.n_chars for d in docs if d.source == r.source_a)
    xb = sorted(d.n_chars for d in docs if d.source == r.source_b)
    assert (len(xa), len(xb)) == (r.n_a, r.n_b)
    vals = sorted(set(xa) | set(xb))
    max_num = 0
    import bisect

    for v in vals:
        ca = bisect.bisect_right(xa, v)
        cb = bisect.bisect_right(xb, v)
        max_num = max(max_num, abs(ca * len(xb) - cb * len(xa)))
    assert r.ks_u == (max_num * 1_000_000) // (len(xa) * len(xb))


def test_ks_drift_pair_fanout_is_capped(spark, sf_dir):
    """At most C(top,2) pairs regardless of how many sources exist."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _KS_TOP_SOURCES,
        q_ks_drift,
    )

    n = q_ks_drift(spark, sf_dir).count()
    assert n <= _KS_TOP_SOURCES * (_KS_TOP_SOURCES - 1) // 2


# ---------------------------------------------------------------------------
# wave 64: Good-Turing
# ---------------------------------------------------------------------------


def test_good_turing_hand_counts(spark, tmp_path):
    """'a a b' + 'c' in one source: N=4, V=3, N1=2 (b, c), N2=1 (a),
    unseen mass = 2*1e6 div 4 = 500000."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_good_turing,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "a a b", "l0", "s0", 5), (2, "c", "l0", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = q_good_turing(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_tokens, r.vocab, r.n1, r.n2, r.unseen_mass_u) == (
        4, 3, 2, 1, 500_000,
    )


# ---------------------------------------------------------------------------
# wave 65: MMR re-rank
# ---------------------------------------------------------------------------


def test_mmr_matches_pure_python_reference(spark, sf_dir):
    """Differential: rebuild candidates + pairwise sims from the same
    verified legs, run a 10-line reference MMR in Python, and demand
    the identical (rank, vec, maxsim) selections."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _MMR_K,
        q_mmr_rerank,
        q_topk_cosine,
    )
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        cosine,
    )

    cand = {}
    for r in q_topk_cosine(spark, sf_dir).collect():
        cand.setdefault(r.query_id, {})[r.vec_id] = r.cos_u
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = sorted({v for c in cand.values() for v in c})
    sub = emb.filter(F.col("vec_id").isin(ids)).select("vec_id", "embedding")
    a = sub.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = sub.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    sims = {
        (r.a, r.b): r.s
        for r in a.crossJoin(b)
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.floor(
                F.round(
                    cosine(
                        F.col("va").cast("array<double>"),
                        F.col("vb").cast("array<double>"),
                    ),
                    6,
                )
                * 1e6
            ).cast("long").alias("s"),
        )
        .collect()
    }
    expect = {}
    for qid, rel in cand.items():
        sel = []
        for rank in range(1, _MMR_K + 1):
            rem = [v for v in rel if v not in {s[0] for s in sel}]
            if rank == 1:
                scored = [(rel[v], 0, v) for v in rem]
            else:
                scored = [
                    (
                        rel[v] - max(sims[(v, s[0])] for s in sel),
                        max(sims[(v, s[0])] for s in sel),
                        v,
                    )
                    for v in rem
                ]
            scored.sort(key=lambda t: (-t[0], t[2]))
            top = scored[0]
            sel.append((top[2], rank, rel[top[2]], top[1]))
        for v, rank, rel_u, maxsim in sel:
            expect[(qid, rank)] = (v, rel_u, maxsim)
    got = {
        (r.query_id, r.mmr_rank): (r.vec_id, r.rel_u, r.maxsim_u)
        for r in q_mmr_rerank(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# wave 66: MaxScore pruning audit
# ---------------------------------------------------------------------------


def test_maxscore_admissibility_and_theta(spark, sf_dir):
    """The bound must never prune an exact top-k doc (n_topk_pruned
    == 0 — the WAND safety property), theta must equal the k-th exact
    BM25 score, and the candidate universe matches the scored-doc
    count."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_bm25_topk,
        q_maxscore_prune,
    )

    row = q_maxscore_prune(spark, sf_dir).collect()[0]
    assert row.n_topk_pruned == 0
    assert row.n_pruned + row.n_survivors == row.n_candidates
    topk = q_bm25_topk(spark, sf_dir).collect()
    if topk:
        assert row.theta_u == min(r.score_u for r in topk)
    assert 0 <= row.prune_share_u <= 1_000_000


# ---------------------------------------------------------------------------
# wave 67: Zipf slope
# ---------------------------------------------------------------------------


def test_zipf_slope_hand_fit(spark, tmp_path):
    """Counts 4,2,1,1 -> (x,y) = (0,2),(1,1),(1,0),(2,0): exact
    integer least squares gives slope -1e6 (num=-8, den=8)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_zipf_slope,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "a a a a b b c d", "l0", "s0", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = q_zipf_slope(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_types, r.n_fit, r.zipf_slope_u) == (4, 4, -1_000_000)


# ---------------------------------------------------------------------------
# wave 68: quality mixture
# ---------------------------------------------------------------------------


def test_quality_mixture_budget_conservation(spark, sf_dir):
    """Truncation-aware conservation: each source's allocation is
    floored, so the sum must be within n_sources of the budget and
    never exceed it; weights behave the same against 1e6."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_quality_mixture,
    )

    rows = q_quality_mixture(spark, sf_dir).collect()
    assert rows
    budget = sum(r.n_tokens for r in rows)
    alloc = sum(r.alloc_tokens for r in rows)
    assert alloc <= budget
    wsum = sum(r.weight_u for r in rows)
    assert wsum <= 1_000_000
    assert budget - alloc <= sum(r.mean_quality_u for r in rows)


def test_quality_mixture_upsamples_better_sources(spark, sf_dir):
    """epochs_u orders with quality density: the source with the
    highest mean quality per token must not be downsampled harder
    than the one with the lowest."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_quality_mixture,
    )

    rows = [r for r in q_quality_mixture(spark, sf_dir).collect()
            if r.n_tokens > 0]
    hi = max(rows, key=lambda r: (r.mean_quality_u, r.source))
    lo = min(rows, key=lambda r: (r.mean_quality_u, r.source))
    if hi.n_tokens == lo.n_tokens:
        assert hi.epochs_u >= lo.epochs_u


# ---------------------------------------------------------------------------
# wave 69: k-center coreset
# ---------------------------------------------------------------------------


def test_coreset_matches_pure_python_greedy(spark, sf_dir):
    """Differential: run the textbook greedy k-center in Python over
    the same micro-unit vectors and demand identical picks and
    max-min values every round."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _CORESET_K,
        q_coreset_select,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vu = {
        r.vec_id: [int((x * 1_000_000) // 1) if x >= 0
                   else -int((-x * 1_000_000 + 0.999999999) // 1)
                   for x in map(float, r.embedding)]
        for r in emb
    }
    # exact floor on doubles, matching floor(x*1e6)
    import math

    vu = {
        k: [int(math.floor(float(x) * 1_000_000)) for x in r]
        for k, r in (
            (row.vec_id, row.embedding) for row in emb
        )
    }
    sel = [min(vu)]
    expect = {1: (sel[0], 0)}
    for rnd in range(2, _CORESET_K + 2):
        best = None
        for vid, v in vu.items():
            if vid in sel:
                continue
            md = min(
                sum((a - b) * (a - b) for a, b in zip(v, vu[s])) for s in sel
            )
            cand = (-md, vid)
            if best is None or cand < best:
                best = cand
        expect[rnd] = (best[1], -best[0])
        sel.append(best[1])
    got = {
        r.round: (r.vec_id, r.min_d2)
        for r in q_coreset_select(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# wave 70: bootstrap CI
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """64 replicates, ordered: lo <= med <= hi, the point estimate
    falls inside [lo, hi] (Poisson(1) resampling is centered), and
    n_reps is exactly B."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _BOOT_B,
        q_bootstrap_ci,
    )

    r = q_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r.n_reps == _BOOT_B
    assert r.boot_lo_u <= r.boot_med_u <= r.boot_hi_u
    assert r.boot_lo_u <= r.point_mean_u <= r.boot_hi_u


# ---------------------------------------------------------------------------
# wave 71: code detection
# ---------------------------------------------------------------------------


def test_code_detect_separates_code_from_prose(spark, tmp_path):
    """A code-looking doc (braces, keywords, indentation) must clear
    the threshold; plain prose must not."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_code_detect,
    )

    code = (
        "def f(x):\n    return x + 1;\n"
        "class A {\n    int v = 0;\n    void g() { v = 1; }\n}\n"
    )
    prose = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet field toward the river bank"
    )
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, code, "l0", "code_src", len(code)),
            (2, prose, "l0", "prose_src", len(prose)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.source: r for r in q_code_detect(spark, sf).collect()}
    assert rows["code_src"].n_code == 1
    assert rows["prose_src"].n_code == 0
    assert rows["code_src"].mean_score_u > rows["prose_src"].mean_score_u


# ---------------------------------------------------------------------------
# wave 72: char entropy
# ---------------------------------------------------------------------------


def test_char_entropy_hand_counts_and_tails(spark, tmp_path):
    """'aaaa' (N=4, one char): entropy 0 -> low tail.  'abcdefgh'
    (8 distinct): bit-floor entropy = (bitlen(8)-bitlen(1)) = 3 bits
    exactly -> 3_000_000, neither tail at the 1.5/4.5 thresholds...
    high tail needs > 4.5: use 'a b' style corpus to pin arithmetic
    instead: 'aab' -> N=3, cnts {a:2, b:1}: terms 2*(1-1)+1*(1-0)=1,
    entropy = 1e6 div 3 = 333333 -> low tail."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_char_entropy,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "aaaa", "l0", "rep", 4),
            (2, "aab", "l0", "rep", 3),
            (3, "abcdefgh", "l0", "uniq", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.source: r for r in q_char_entropy(spark, sf).collect()}
    assert rows["rep"].n_docs == 2
    assert rows["rep"].n_low == 2  # 0 and 333333 both < 1.5e6
    assert rows["rep"].mean_entropy_u == (0 + 333_333) // 2
    assert rows["uniq"].mean_entropy_u == 3_000_000
    assert rows["uniq"].n_low == 0 and rows["uniq"].n_high == 0


# ---------------------------------------------------------------------------
# wave 73: bot detection
# ---------------------------------------------------------------------------


def test_bot_detect_flags_metronome_not_human(spark, tmp_path):
    """User 1 fires exactly every 60s (CV=0 -> reg_u=0, bot); user 2
    has wildly varying gaps (CV >> threshold).  Hand-check the CV^2
    micro-units for user 2: gaps 10, 1000, 10: n=3, sg=1020,
    sgg=1000200, num=3*1000200-1020^2=1960200, den=(1020^2) div 1e6
    = 1 -> reg_u=1960200."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_bot_detect,
    )

    rows = []
    base = 1_700_000_000
    for i in range(6):  # metronome: 60s gaps
        rows.append((i, base + 60 * i, 1, "click", 1.0, "{}"))
    for j, off in enumerate([0, 10, 1010, 1020]):  # human: 10,1000,10
        rows.append((100 + j, base + off, 2, "view", 1.0, "{}"))
    from pyspark.sql import functions as F

    sf = str(tmp_path)
    (
        spark.createDataFrame(
            rows,
            "event_id long, ep long, user_id long, event_type string, "
            "value double, props string",
        )
        .select(
            "event_id", F.timestamp_seconds("ep").alias("ts"), "user_id",
            "event_type", "value", "props",
        )
        .write.parquet(f"{sf}/events.parquet")
    )
    got = {r.user_id: r for r in q_bot_detect(spark, sf).collect()}
    assert got[1].reg_u == 0 and got[1].is_bot == 1
    assert got[2].reg_u == 1_960_200 and got[2].is_bot == 0
    assert got[1].rank == 1


# ---------------------------------------------------------------------------
# wave 74: MaxSim
# ---------------------------------------------------------------------------


def test_maxsim_ge_single_vector_dot_and_matches_python(spark, sf_dir):
    """Differential vs a pure-Python MaxSim over the same micro-unit
    slices, plus the defining inequality: MaxSim >= the plain full
    dot (each subvector's best match is at least its aligned one)."""
    import math

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _MS_SUBDIM,
        _MS_SUBS,
        _N_QUERIES,
        _TOPK_K,
        q_maxsim_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vu = {
        r.vec_id: [int(math.floor(float(x) * 1_000_000)) for x in r.embedding]
        for r in emb
    }
    subs = {
        k: [v[i * _MS_SUBDIM:(i + 1) * _MS_SUBDIM] for i in range(_MS_SUBS)]
        for k, v in vu.items()
    }
    expect = {}
    for qid in range(_N_QUERIES):
        scores = []
        for vid, dsubs in subs.items():
            ms = sum(
                max(sum(a * b for a, b in zip(qs, ds)) for ds in dsubs)
                for qs in subs[qid]
            )
            full = sum(a * b for a, b in zip(vu[qid], vu[vid]))
            assert ms >= full
            scores.append((-ms, vid))
        scores.sort()
        for rank, (neg, vid) in enumerate(scores[:_TOPK_K], 1):
            expect[(qid, rank)] = (vid, -neg)
    got = {
        (r.query_id, r.rank): (r.vec_id, r.maxsim)
        for r in q_maxsim_topk(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# wave 75: ROUGE pairs
# ---------------------------------------------------------------------------


def test_rouge_hand_arithmetic_on_known_pair(spark, sf_dir):
    """Pick one MinHash pair and recompute ROUGE-1 with plain Python
    multiset clipping over the same normalized tokens; identities
    p_u = overlap*1e6 div na etc. must hold on every output row."""
    from collections import Counter

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_rouge_pairs,
    )

    rows = q_rouge_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.p_u <= 1_000_000 and 0 <= r.r_u <= 1_000_000
        assert r.f1_u <= max(r.p_u, r.r_u)
        exp_p = (r.overlap * 1_000_000) // r.na if r.na else 0
        exp_r = (r.overlap * 1_000_000) // r.nb if r.nb else 0
        assert (r.p_u, r.r_u) == (exp_p, exp_r)
    one = sorted(
        (r for r in rows if r.n == 1),
        key=lambda r: (r.doc_id_a, r.doc_id_b),
    )[0]
    docs = {
        d.doc_id: (d.text or "")
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if d.doc_id in (one.doc_id_a, one.doc_id_b)
    }

    def toks(t):
        return [w for w in " ".join(t.lower().split()).split(" ") if w]

    ca = Counter(toks(docs[one.doc_id_a]))
    cb = Counter(toks(docs[one.doc_id_b]))
    overlap = sum(min(ca[g], cb[g]) for g in ca)
    assert one.overlap == overlap
    assert one.na == sum(ca.values()) and one.nb == sum(cb.values())


# ---------------------------------------------------------------------------
# wave 76: max coverage
# ---------------------------------------------------------------------------


def test_maxcover_matches_python_greedy_and_is_concave(spark, sf_dir):
    """Differential vs plain-Python greedy max-cover on the same
    distinct 3-gram sets + the submodularity certificate: marginal
    gains must be non-increasing round over round."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        _MC_GRAM,
        _MC_K,
        q_maxcover_select,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def gramset(t):
        w = [x for x in " ".join((t or "").lower().split()).split(" ") if x]
        return {
            " ".join(w[i:i + _MC_GRAM]) for i in range(len(w) - _MC_GRAM + 1)
        }

    sets = {d.doc_id: gramset(d.text) for d in docs}
    sel, covered, expect = [], set(), []
    for r in range(1, _MC_K + 1):
        best = None
        for did, s in sets.items():
            if did in sel:
                continue
            gain = len(s - covered)
            cand = (-gain, did)
            if best is None or cand < best:
                best = cand
        sel.append(best[1])
        covered |= sets[best[1]]
        expect.append((r, best[1], -best[0], len(covered)))
    got = sorted(
        (r.round, r.doc_id, r.gain, r.covered_total)
        for r in q_maxcover_select(spark, sf_dir).collect()
    )
    assert got == expect
    gains = [g for (_, _, g, _) in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


# ---------------------------------------------------------------------------
# wave 77: source novelty
# ---------------------------------------------------------------------------


def test_source_novelty_accounting_identities(spark, sf_dir):
    """Sum of exclusive grams <= total distinct grams; coverage of
    each source <= 1e6; exclusive <= n_grams per source."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_source_novelty,
    )

    rows = q_source_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_exclusive <= r.n_grams
        assert 0 <= r.exclusive_share_u <= 1_000_000
        assert 0 < r.corpus_coverage_u <= 1_000_000


# ---------------------------------------------------------------------------
# wave 78: pruning curve
# ---------------------------------------------------------------------------


def test_pruning_curve_is_monotone(spark, sf_dir):
    """Raising the threshold can only shrink the kept set and raise
    (or hold) its mean quality; threshold 0 keeps everything."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_pruning_curve,
    )

    rows = sorted(
        q_pruning_curve(spark, sf_dir).collect(),
        key=lambda r: r.threshold_u,
    )
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[0].threshold_u == 0 and rows[0].n_kept == docs_n
    assert rows[0].kept_share_u == 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert b.n_kept <= a.n_kept and b.tokens_kept <= a.tokens_kept
        assert b.mean_quality_u >= a.mean_quality_u


# ---------------------------------------------------------------------------
# wave 79: canonical policy diff
# ---------------------------------------------------------------------------


def test_policy_diff_matches_cluster_recount(spark, sf_dir):
    """Recount the policy disagreement directly from
    q_cluster_canonical's rows and compare every summary field."""
    from collections import defaultdict

    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_canonical_policy_diff,
        q_cluster_canonical,
    )

    rows = q_cluster_canonical(spark, sf_dir).collect()
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    n_multi = n_diff = gain = 0
    for members in clusters.values():
        if len(members) < 2:
            continue
        n_multi += 1
        minid = min(m.doc_id for m in members)
        minid_q = next(m.quality_u for m in members if m.doc_id == minid)
        keep = next(m for m in members if m.keep)
        if keep.doc_id != minid:
            n_diff += 1
        gain += keep.quality_u - minid_q
    got = q_canonical_policy_diff(spark, sf_dir).collect()[0]
    assert got.n_clusters == len(clusters)
    assert got.n_multi == n_multi
    assert got.n_differs == n_diff
    assert got.quality_gain_total_u == gain
    assert got.quality_gain_total_u >= 0  # argmax never downgrades


# ---------------------------------------------------------------------------
# wave 80: burstiness
# ---------------------------------------------------------------------------


def test_burstiness_hand_counts(spark, tmp_path):
    """'x x x' in one doc + 'x' in 5 others: df=6, cf=8, burst =
    8e6 div 6 = 1333333; 'the' once in each of 6 docs: burst exactly
    1e6 (the uniform floor)."""
    from microdata_rdf_streaming_parser_js_spark.plans.queries import (
        q_term_burstiness,
    )

    sf = str(tmp_path)
    texts = ["x x x the"] + ["x the"] * 5
    spark.createDataFrame(
        [(i, t, "l0", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.t: r for r in q_term_burstiness(spark, sf).collect()}
    assert rows["x"].df == 6 and rows["x"].cf == 8
    assert rows["x"].burst_u == 1_333_333
    assert rows["the"].burst_u == 1_000_000
    assert rows["x"].rank < rows["the"].rank
