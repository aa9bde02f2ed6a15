"""Wave-15 invariants: BPE encode vs a pure-Python reference, and
random-walk trajectory validity / determinism / sink behavior.
"""

import hashlib

import pytest

pytestmark = pytest.mark.spark


def test_bpe_encode_matches_reference(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import (
        bpe_encode,
    )

    texts = ["low low lower newest newest widest aaa aaa"]
    merges = [("l", "o"), ("lo", "w"), ("a", "a")]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r.token: r.cnt for r in bpe_encode(df, merges, top_n=100).collect()
    }
    # python reference: greedy leftmost merges in order, per word
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    counts: dict[str, int] = {}
    for w, f in freqs.items():
        parts = list(w)
        for a, b in merges:
            out = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        for tok in parts:
            counts[tok] = counts.get(tok, 0) + f
    assert got == counts
    # 'aaa' under merge (a,a) must be ['aa','a'], i.e. greedy leftmost
    assert got["aa"] == 2 and got["a"] == 2


def test_bpe_encode_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.bpe import (
        bpe_encode,
    )

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_encode(df, [], top_n=0)


def _walk_pick(walk_id: int, step: int, deg: int, salt: str = "walk-v1") -> int:
    h = hashlib.md5(f"{salt}:{walk_id}:{step}".encode()).hexdigest()
    return int(h[:8], 16) % deg


def test_random_walks_follow_edges_and_replay(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        random_walks,
    )

    edges = [(i, (i * 3 + 1) % 10) for i in range(10)] + [
        (i, (i * 7 + 2) % 10) for i in range(0, 10, 2)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = random_walks(df, steps=3).collect()
    adj: dict[int, list[int]] = {}
    for a, b in set(edges):
        adj.setdefault(a, []).append(b)
    for v in adj:
        adj[v].sort()
    traj: dict[int, dict[int, int]] = {}
    for r in rows:
        traj.setdefault(r.walk_id, {})[r.step] = r.node
    assert set(traj) == set(adj)  # one walk per node with out-edges
    for wid, t in traj.items():
        assert t[0] == wid
        for s in range(1, 4):
            prev = t[s - 1]
            want = adj[prev][_walk_pick(wid, s, len(adj[prev]))]
            assert t[s] == want


def test_random_walks_stop_at_sinks(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        random_walks,
    )

    # 0 -> 1 -> 2 (sink): the walk from 0 reaches 2 and stops
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = random_walks(df, steps=5).collect()
    t0 = {r.step: r.node for r in rows if r.walk_id == 0}
    assert t0 == {0: 0, 1: 1, 2: 2}  # no steps past the sink
    # node 2 has no out-edges, so no walk starts there
    assert {r.walk_id for r in rows} == {0, 1}


def test_random_walks_rejects_bad_steps(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.graph import (
        random_walks,
    )

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, steps=0)
