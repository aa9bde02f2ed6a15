"""Production-merge-count BPE train evidence (round-4 verdict item 7).

q_bpe_train verifies the merge loop at 3 rounds; the per-round
one-row-collect shape (operators/bpe.bpe_train) was untested at
vocab-scale round counts. This tool runs a 256-merge train over the
sf1 documents table (500k docs), records the wall, and differentials
EVERY merge decision (round, pair, cnt) against an independent
pure-Python reference implementation (Sennrich et al. 2016 greedy
loop) whose word-frequency table comes from DuckDB using the same
tokenization envelope as the registry oracles — so neither the counts
nor the loop share code with the Spark side.

Usage: python tools/bpe_scale_run.py [sf_dir] [n_merges]
       (defaults: /root/repo/.sf1, 256)
Writes BENCH/BPE_SCALE_r05.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def python_reference_bpe(word_freqs: list[tuple[str, int]], n_merges: int):
    """Classic BPE training loop, pure Python: per round, count adjacent
    symbol pairs weighted by word freq, merge the (cnt desc, pair asc)
    argmax leftmost-non-overlapping in every word."""
    vocab = [([c for c in w], f) for w, f in word_freqs]
    merges: list[tuple[int, str, int]] = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (a, b), cnt = best
        merges.append((r, f"{a} {b}", cnt))
        merged = a + b
        for idx, (syms, f) in enumerate(vocab):
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[idx] = (out, f)
    return merges


def synth_word_freqs(n_words: int = 4000) -> list[tuple[str, int]]:
    """Deterministic rich vocabulary (the sf1 corpus has only 31
    distinct ^[a-z]+$ words, which exhausts all mergeable pairs after
    ~89 rounds): word i = base-26 spelling of i (a..z digits) repeated
    to >= 4 chars, freq = (i % 97) + 1. Pure arithmetic — no RNG — so
    both engines rebuild the identical corpus."""
    out = []
    for i in range(n_words):
        w, v = "", i
        while True:
            w = chr(ord("a") + v % 26) + w
            v //= 26
            if v == 0:
                break
        w = (w * 4)[: max(4, len(w))]
        out.append((w, (i % 97) + 1))
    return out


def run_differential(word_freqs, n_merges, spark, label):
    """Spark bpe_train vs the pure-Python loop on the same corpus;
    the Spark side reads a real parquet documents table whose token
    stream reproduces word_freqs exactly."""
    import pandas as pd

    t0 = time.monotonic()
    ref = python_reference_bpe(word_freqs, n_merges)
    ref_wall = time.monotonic() - t0

    from microdata_rdf_streaming_parser_js_spark.operators.bpe import bpe_train

    pdf = pd.DataFrame(
        {"doc_id": range(len(word_freqs)),
         "text": [(w + " ") * f for w, f in word_freqs]}
    )
    docs = spark.createDataFrame(pdf)
    t0 = time.monotonic()
    got = [(r.round, r.pair, r.cnt) for r in bpe_train(docs, n_merges=n_merges).collect()]
    spark_wall = time.monotonic() - t0
    mism = [i + 1 for i, (s, p) in enumerate(zip(got, ref)) if s != p]
    ok = not mism and len(got) == len(ref)
    print(json.dumps({"label": label, "rounds": len(got), "ok": ok,
                      "spark_wall_sec": round(spark_wall, 1),
                      "ref_wall_sec": round(ref_wall, 1)}))
    return got, ref, ok, spark_wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import duckdb

    from microdata_rdf_streaming_parser_js_spark.operators.bpe import bpe_train
    from microdata_rdf_streaming_parser_js_spark.plans.queries import _TOKS
    from microdata_rdf_streaming_parser_js_spark.session import get_spark

    # independent reference word-frequency table (DuckDB tokenization)
    con = duckdb.connect()
    toks = _TOKS.format(c="text")
    word_freqs = con.execute(
        f"""SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest({toks}) AS w
              FROM '{sf_dir}/documents.parquet')
        WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w ORDER BY w"""
    ).fetchall()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]

    t0 = time.monotonic()
    ref = python_reference_bpe(word_freqs, n_merges)
    ref_wall = time.monotonic() - t0

    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    got = [
        (r.round, r.pair, r.cnt)
        for r in bpe_train(docs, n_merges=n_merges).collect()
    ]
    spark_wall = time.monotonic() - t0

    # second leg: a deterministic 4,000-word vocabulary that SUSTAINS
    # the full 256 rounds (the sf1 corpus exhausts mergeable pairs
    # after ~89), so the production merge count is actually exercised
    synth = synth_word_freqs()
    got2, ref2, ok2, synth_wall = run_differential(
        synth, n_merges, spark, "synthetic-4000-words"
    )
    spark.stop()

    mismatches = [
        {"round": i + 1, "spark": list(s), "ref": list(p)}
        for i, (s, p) in enumerate(zip(got, ref))
        if s != p
    ]
    ok = not mismatches and len(got) == len(ref) and ok2
    result = {
        "tool": "bpe_scale_run",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "vocab_words": len(word_freqs),
        "n_merges_requested": n_merges,
        "n_merges_spark": len(got),
        "n_merges_ref": len(ref),
        "spark_wall_sec": round(spark_wall, 1),
        "ref_wall_sec": round(ref_wall, 1),
        "synth_rounds": len(got2),
        "synth_rounds_ref": len(ref2),
        "synth_wall_sec": round(synth_wall, 1),
        "synth_all_rounds_match": ok2,
        "all_rounds_match": ok,
        "n_mismatches": len(mismatches),
    }

    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "BPE_SCALE_r05.md",
    )
    with open(md, "w") as fh:
        fh.write("# 256-merge BPE train on sf1 (round-4 verdict item 7)\n\n")
        fh.write(
            f"- corpus: `{sf_dir}/documents.parquet` ({n_docs:,} docs), "
            f"vocabulary {len(word_freqs):,} distinct `^[a-z]+$` words\n"
            f"- Spark `bpe_train(n_merges={n_merges})`: "
            f"**{len(got)} merge rounds in {spark_wall:.1f}s wall** "
            f"(per-round one-decision-row collect + scan-side merge; "
            f"the corpus is scanned ONCE — rounds run on the vocab "
            f"table only)\n"
            f"- reference: pure-Python Sennrich loop over a DuckDB "
            f"word-frequency table ({ref_wall:.1f}s)\n"
            f"- differential: **{'ALL ' + str(len(got)) + ' rounds match' if not mismatches and len(got) == len(ref) else str(len(mismatches)) + ' MISMATCHES'}** "
            f"on (round, pair, cnt) exactly (the sf1 vocabulary "
            f"exhausts every mergeable pair after {len(got)} rounds — "
            f"the loop's empty-round break fired correctly)\n\n"
            f"## Sustained-{n_merges}-round leg (synthetic 4,000-word "
            f"vocabulary)\n\n"
            f"- deterministic base-26 vocabulary (4,000 distinct words, "
            f"freq = (i % 97) + 1), rich enough to sustain all "
            f"{n_merges} rounds\n"
            f"- Spark: **{len(got2)} merge rounds in {synth_wall:.1f}s "
            f"wall** ({synth_wall / max(1, len(got2)):.2f}s/round — the "
            f"per-round cost is the one-decision-row argmax collect + "
            f"vocab-table merge, independent of corpus size)\n"
            f"- differential vs the pure-Python Sennrich loop: "
            f"**{'ALL ' + str(len(got2)) + ' rounds match' if ok2 else 'MISMATCH'}** "
            f"on (round, pair, cnt) exactly\n"
        )
        if mismatches:
            fh.write("\n## Mismatches\n\n```json\n")
            json.dump(mismatches[:20], fh, indent=1)
            fh.write("\n```\n")
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
