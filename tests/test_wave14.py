"""Wave-14 invariants: BPE merge-loop semantics (greedy leftmost,
overlap handling) vs a pure-Python reference, label-propagation
determinism vs a replay, weighted-sample selection properties.
"""

import hashlib

import pytest

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# BPE train
# ---------------------------------------------------------------------------

def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE: pair counts over the vocab, argmax (cnt desc,
    pair asc), greedy leftmost non-overlapping merge."""
    vocab = {" ".join(w): f for w, f in word_freqs.items()}
    merges = []
    for r in range(1, n_merges + 1):
        counts: dict[str, int] = {}
        for tok, f in vocab.items():
            parts = tok.split(" ")
            for x, y in zip(parts, parts[1:]):
                counts[f"{x} {y}"] = counts.get(f"{x} {y}", 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((r, pair, counts[pair]))
        a, b = pair.split(" ")
        new_vocab: dict[str, int] = {}
        for tok, f in vocab.items():
            parts = tok.split(" ")
            out = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            key = " ".join(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def _run_bpe(spark, texts, n_merges):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.round, r.pair, r.cnt)
        for r in bpe_train(df, n_merges=n_merges)
        .orderBy("round")
        .collect()
    ]


def test_bpe_train_matches_reference(spark):
    texts = [
        "low low low lower lower",
        "newest newest newest newest newest widest widest",
        "the the the the a a",
    ]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    assert _run_bpe(spark, texts, 4) == _py_bpe(freqs, 4)


def test_bpe_train_overlapping_pairs_merge_greedily(spark):
    # 'aaa' x2: pair (a,a) counts 2 per word = 4; greedy leftmost
    # gives 'aa a', NOT 'a aa' — and round 2 merges ('aa', 'a')
    got = _run_bpe(spark, ["aaa aaa"], 2)
    assert got == [(1, "a a", 4), (2, "aa a", 2)]


def test_bpe_train_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------

def _py_lpa(edges, rounds):
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = {a for a, _ in und}
    labels = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            counts: dict[int, int] = {}
            for a, b in und:
                if a == v:
                    lbl = labels[b]
                    counts[lbl] = counts.get(lbl, 0) + 1
            if counts:
                new[v] = min(counts, key=lambda l: (-counts[l], l))
            else:
                new[v] = labels[v]
        labels = new
    return labels


def _run_lpa(spark, edges, rounds):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.label
        for r in label_propagation(df, rounds=rounds).collect()
    }


def test_lpa_triangle_converges_to_min(spark):
    edges = [(0, 1), (1, 2), (0, 2)]
    got = _run_lpa(spark, edges, 3)
    assert got == {0: 0, 1: 0, 2: 0}


def test_lpa_matches_python_replay(spark):
    # two communities joined by one bridge, plus a self-loop node
    edges = [
        (0, 1), (1, 2), (0, 2),
        (10, 11), (11, 12), (10, 12), (12, 13),
        (2, 10),  # bridge
        (99, 99),  # self-loop
    ]
    for rounds in (1, 2, 3, 4):
        assert _run_lpa(spark, edges, rounds) == _py_lpa(edges, rounds)


def test_lpa_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


# ---------------------------------------------------------------------------
# weighted sample
# ---------------------------------------------------------------------------

def _py_priority(key: str, weight: int, salt: str = "wsample-v1") -> int:
    u60 = int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:15], 16)
    return u60 // max(weight, 1)


def test_weighted_sample_matches_python_and_is_stable(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        weighted_sample,
    )

    rows = [(i, 1 + (i * 13) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    out1 = [
        (r.key, r.weight, r.priority)
        for r in weighted_sample(df, "id", "w", k=10).collect()
    ]
    out2 = [
        (r.key, r.weight, r.priority)
        for r in weighted_sample(df, "id", "w", k=10).collect()
    ]
    assert out1 == out2  # deterministic across runs
    want = sorted(
        ((str(i), w, _py_priority(str(i), w)) for i, w in rows),
        key=lambda t: (t[2], t[0]),
    )[:10]
    assert out1 == want
    assert len({k for k, _, _ in out1}) == 10  # without replacement


def test_weighted_sample_huge_weight_always_selected(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        weighted_sample,
    )

    rows = [(i, 1) for i in range(100)] + [(999, 10**15)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = weighted_sample(df, "id", "w", k=1).collect()
    # u60 < 2^60 and weight 1e15 drives priority to ~1e3 — far below
    # any weight-1 key's expected ~1e17 priority
    assert out[0].key == "999"


def test_weighted_sample_rejects_bad_k(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        weighted_sample,
    )

    df = spark.createDataFrame([(1, 1)], "id long, w long")
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", k=0)
