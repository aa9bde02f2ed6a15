#!/usr/bin/env python
"""Benchmark harness: headline throughput of the KG pipeline + the
training-data operators at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "triples_per_sec", "value": N, "unit": "sec",
   "queries": {name: seconds, ...}, "sf": 0.1, ...}

Extra modes:
  SPARK_GRAFT_SCALING=1  -> additionally run the extraction job at two
  parallelism levels (local[8] vs local[32]) on the identical corpus and
  report core-normalized scaling efficiency (the BASELINE.md criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return -1.0


def build_bench_pages(spark, sf_dir: str, replicate: int = 4):
    """Deterministic bench corpus: documents -> schema.org pages,
    replicated ``replicate``x with distinct doc ids (pure exprs)."""
    from pyspark.sql import functions as F

    from microdata_rdf_streaming_parser_js_spark.sources.pages import (
        pages_from_documents,
    )

    pages = pages_from_documents(spark, sf_dir)
    if replicate > 1:
        pages = pages.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        ).withColumn(
            "url", F.concat("url", F.lit("?r="), F.col("_r").cast("string"))
        ).drop("_r")
    return pages


def run_pipeline_bench(spark, sf_dir: str, replicate: int = 4):
    """Full extract -> skolemize -> dedup over the bench corpus;
    returns (n_pages, n_triples, wall_sec)."""
    from microdata_rdf_streaming_parser_js_spark.operators.canonicalize import (
        dedup_triples,
    )
    from microdata_rdf_streaming_parser_js_spark.operators.extract import (
        extract_triples,
    )
    from microdata_rdf_streaming_parser_js_spark.operators.skolemize import skolemize

    pages = build_bench_pages(spark, sf_dir, replicate).persist()
    n_pages = pages.count()  # materialize corpus outside the timed region
    t0 = time.time()
    triples = dedup_triples(skolemize(extract_triples(pages)), per_graph=True)
    n_triples = triples.count()
    wall = time.time() - t0
    pages.unpersist()
    return n_pages, n_triples, wall


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "4"))

    from microdata_rdf_streaming_parser_js_spark.plans.queries import QUERIES
    from microdata_rdf_streaming_parser_js_spark.session import get_spark

    spark = get_spark(cores=cpus)

    # headline: KG pipeline throughput
    n_pages, n_triples, wall = run_pipeline_bench(spark, sf_dir, replicate)
    triples_per_sec = n_triples / wall if wall > 0 else 0.0

    # per-operator timings (full action = .count())
    bench_queries = [
        "q_extract_triples",
        "q_entity_link_mapping",
        "q_dedup_exact",
        "q_minhash_lsh_pairs",
        "q_ngram_jaccard_pairs",
        "q_simhash_pairs",
        "q_token_stats",
        "q_lang_id",
        "q_quality",
        "q_topk_cosine",
        "q_lsh_topk",
        "q_embedding_near_dup",
        "q_events_window",
    ]
    query_secs: dict[str, float] = {"pipeline_extract_skolem_dedup": round(wall, 3)}
    for name in bench_queries:
        fn = QUERIES[name]
        try:
            query_secs[name] = timed(lambda: fn(spark, sf_dir).count())
        except Exception as exc:  # noqa: BLE001
            query_secs[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)

    result = {
        "metric": "triples_per_sec",
        "value": round(triples_per_sec, 1),
        "unit": "sec",
        "queries": query_secs,
        "sf": _sf_from_dir(sf_dir),
        "n_pages": n_pages,
        "n_triples": n_triples,
        "pages_per_sec": round(n_pages / wall, 1) if wall > 0 else 0.0,
        "cpus": cpus,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        points = {}
        for level in (8, 32):
            s = get_spark(app_name=f"bench-scale-{level}", cores=level)
            _, n_t, w = run_pipeline_bench(s, sf_dir, replicate)
            points[level] = {"wall_sec": round(w, 2), "triples_per_sec": round(n_t / w, 1)}
            s.stop()
        t8, t32 = points[8]["triples_per_sec"], points[32]["triples_per_sec"]
        # core-normalized efficiency from N=8 to 4N=32
        result["scaling"] = {
            "local8": points[8],
            "local32": points[32],
            "efficiency_8_to_32": round((t32 / 32.0) / (t8 / 8.0), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
