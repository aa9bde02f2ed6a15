"""sf1 throughput evidence (round-4 verdict item 6).

Round 4 proved sf1 CORRECTNESS (31 queries value-exact at 10-100x
sweep scale) but recorded no sf1 THROUGHPUT. This tool runs the
extraction pipeline headline (extract -> skolemize -> dedup) over the
sf1-derived corpus at ~500k pages (50k sf1 docs x replicate 10) at
local[4] and local[16], each in a fresh subprocess (own JVM), exactly
like bench.py's scaling block — recording pages/s + triples/s at both
parallelism levels plus the core-normalized efficiency.

Usage: python tools/sf1_throughput.py [sf_dir] [replicate]
       (defaults: /root/repo/.sf1, 10)
Appends one JSON line per point to BENCH/sf1_throughput_r05.jsonl and
prints a summary JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "sf1_throughput_r05.jsonl")


def log(rec: dict) -> None:
    rec["ts"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")
    print(json.dumps(rec, sort_keys=True), flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        raise SystemExit(f"{sf_dir} missing — run tools/make_sf1.py first")

    import duckdb

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    n_pages = n_docs * replicate

    points = {}
    for level in (4, 16):
        env = {
            **os.environ,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_SCALING_REPLICATE": str(replicate),
            "SPARK_GRAFT_SCALING_PASSES": os.environ.get(
                "SPARK_GRAFT_SCALING_PASSES", "3"
            ),
        }
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--scale-point", str(level)],
            capture_output=True, text=True, env=env, check=True,
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rec["pages_per_sec"] = round(n_pages / rec["wall_sec"], 1)
        points[level] = rec
        log({"kind": f"sf1_point_local{level}", "n_pages": n_pages, **rec})

    t4, t16 = points[4]["triples_per_sec"], points[16]["triples_per_sec"]
    summary = {
        "kind": "sf1_throughput_summary",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "replicate": replicate,
        "n_pages": n_pages,
        "local4": points[4],
        "local16": points[16],
        "efficiency_4_to_16": round((t16 / 16) / (t4 / 4), 3),
    }
    log(summary)


if __name__ == "__main__":
    main()
