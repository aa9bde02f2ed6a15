"""Wave-13 invariants: applied Bloom pruning (no false negatives,
measured pruning), random-projection determinism + zero-shuffle plan,
epoch-shuffle permutation properties, compaction-plan conservation.
"""

import hashlib
import io
from contextlib import redirect_stdout

import pytest

pytestmark = pytest.mark.spark


def plan_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# bloom mask / membership
# ---------------------------------------------------------------------------

def _py_positions(key: str, m: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


def test_bloom_mask_words_packs_exactly():
    from microdata_rdf_streaming_parser_js_spark.operators.layout import (
        bloom_mask_words,
    )

    words = bloom_mask_words([0, 31, 32, 4095], m=4096)
    assert len(words) == 128
    assert words[0] == (1 | (1 << 31))
    assert words[1] == 1
    assert words[127] == 1 << 31
    assert all(0 <= w < 2**32 for w in words)
    with pytest.raises(ValueError):
        bloom_mask_words([4096], m=4096)
    with pytest.raises(ValueError):
        bloom_mask_words([], m=100)  # m not a multiple of 32


def test_bloom_member_no_false_negatives_and_prunes(spark):
    from pyspark.sql import functions as F

    from microdata_rdf_streaming_parser_js_spark.operators.layout import (
        bloom_build,
        bloom_mask_words,
        bloom_member,
    )

    m, k = 1024, 3
    build_keys = list(range(0, 50))
    build = spark.createDataFrame([(x,) for x in build_keys], "key long")
    positions = [r.pos for r in bloom_build(build, "key", m=m, k=k).collect()]
    # the Spark-built positions equal the pure-Python replay
    want = sorted({p for x in build_keys for p in _py_positions(str(x), m, k)})
    assert sorted(positions) == want

    mask = bloom_mask_words(positions, m=m)
    probe = spark.createDataFrame([(x,) for x in range(2000)], "key long")
    got = {
        r.key
        for r in probe.where(bloom_member(F.col("key"), mask, m=m, k=k)).collect()
    }
    # no false negatives: every build key passes
    assert set(build_keys) <= got
    # real pruning: the pass-through set is far below the probe size
    assert len(got) < 400
    # every passer is explained by the bloom (python replay agrees)
    pos_set = set(positions)
    for x in range(2000):
        expect = all(p in pos_set for p in _py_positions(str(x), m, k))
        assert (x in got) == expect


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------

def test_random_projection_matches_python_fold(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.functions.lattice import (
        plane_weights,
    )
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    rows = emb.collect()
    planes = plane_weights(64, 8, seed="rp-v1")
    import math

    want = {}
    for r in rows:
        e = [float(x) for x in r.embedding]
        for j, w in enumerate(planes):
            acc = 0.0
            for x, wi in zip(e, w):
                acc += x * float(wi)
            want[(r.vec_id, j)] = math.floor(acc * 1000)
    got = {
        (r.vec_id, r.dim_id): r.proj_u
        for r in random_projection(emb, out_dim=8, dim=64).collect()
    }
    assert got == want


def test_random_projection_plan_no_shuffle(spark, sf_dir):
    from microdata_rdf_streaming_parser_js_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_str(random_projection(emb))
    assert "Exchange" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# epoch shuffle
# ---------------------------------------------------------------------------

def test_epoch_shuffle_is_distinct_permutation_per_epoch(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        epoch_shuffle,
    )

    ids = [(i,) for i in range(300)]
    df = spark.createDataFrame(ids, "doc_id long")
    out = epoch_shuffle(df, "doc_id", n_epochs=2, n_blocks=4).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {0, 1}
    orders = {}
    for ep, rows in by_epoch.items():
        # every doc appears exactly once per epoch
        assert sorted(int(r.doc_id) for r in rows) == list(range(300))
        # positions are 1..n contiguous within each block
        blocks = {}
        for r in rows:
            blocks.setdefault(r.block, []).append(r.pos)
        for poss in blocks.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        orders[ep] = [
            r.doc_id for r in sorted(rows, key=lambda r: (r.block, r.pos))
        ]
    # the two epochs draw genuinely different orders
    assert orders[0] != orders[1]


def test_epoch_shuffle_rejects_bad_params(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.split import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", n_epochs=0)
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", n_blocks=0)


# ---------------------------------------------------------------------------
# compaction plan
# ---------------------------------------------------------------------------

def test_compaction_plan_conserves_and_fills(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.layout import (
        compaction_plan,
    )

    files = [
        ("a", i, 100 + (i * 37) % 900) for i in range(50)
    ] + [("b", i, 5000) for i in range(3)]
    df = spark.createDataFrame(files, "part string, fid long, sz long")
    out = compaction_plan(df, "part", "sz", "fid", target_bytes=2000).collect()
    per_part = {}
    for r in out:
        per_part.setdefault(r.part, []).append(r)
    for part, rows in per_part.items():
        want_bytes = sum(s for p, _, s in files if p == part)
        want_files = sum(1 for p, _, _ in files if p == part)
        assert sum(r.bin_bytes for r in rows) == want_bytes
        assert sum(r.n_files for r in rows) == want_files
        # first bin is 0; ids strictly increase (oversized files may
        # skip ids — a 5000-byte file spans multiple 2000-byte slots)
        rows_sorted = sorted(rows, key=lambda r: r.bin_id)
        assert rows_sorted[0].bin_id == 0
        # a new bin opens only once the running byte count has passed
        # that bin's start boundary — the sorted-fill guarantee
        cum = 0
        for r, nxt in zip(rows_sorted, rows_sorted[1:]):
            cum += r.bin_bytes
            assert cum >= nxt.bin_id * 2000
