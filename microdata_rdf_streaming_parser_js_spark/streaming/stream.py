"""Structured Streaming variant of the extraction pipeline.

The reference is a *streaming* parser (Node Transform); the Spark
analogue of its continuous operation is a Structured Streaming job:
``readStream`` over an arriving pages feed -> the same
``mapInPandas`` extraction (mapInPandas works on streaming DataFrames)
-> skolemize -> ``foreachBatch`` materialization with the same
host-bucket layout, checkpointed by Spark's streaming checkpoint +
our _progress ledger per micro-batch.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..operators.extract import extract_triples
from ..operators.skolemize import skolemize
from ..sources.writers import materialize_wave, with_host_bucket

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.streaming import StreamingQuery


def read_pages_stream(
    spark: "SparkSession", path: str, schema, fmt: str = "parquet",
    max_files_per_trigger: int = 16,
) -> "DataFrame":
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def stream_triples(pages_stream: "DataFrame", vocab_registry: dict | None = None) -> "DataFrame":
    """Streaming pages -> streaming skolemized triples (stateless:
    extraction is per-row, so no watermark is needed)."""
    return skolemize(extract_triples(pages_stream, vocab_registry))


def start_pipeline_stream(
    spark: "SparkSession",
    pages_stream: "DataFrame",
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    salt_n: int = 8,
) -> "StreamingQuery":
    """foreachBatch writer: each micro-batch lands with the same
    host-bucket partitioning and appends its _progress lineage rows."""
    triples_stream = stream_triples(pages_stream)

    def write_batch(batch_df: "DataFrame", batch_id: int) -> None:
        b = with_host_bucket(batch_df, n_buckets)
        buckets = [r.host_bucket for r in b.select("host_bucket").distinct().collect()]
        materialize_wave(
            spark, b, out_dir, buckets, salt_n=salt_n,
            input_fingerprint=f"stream-batch-{batch_id}", run_id=f"batch{batch_id}",
            mode="append",
        )

    return (
        triples_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
