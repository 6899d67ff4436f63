"""Structured Streaming surface (SURVEY.md §2.9 — optional extension).

The reference is a synchronous batch library; the streaming analogue is
``readStream`` on the pages table -> the SAME stateless extraction batch
function -> ``foreachBatch`` append through the commit seam. Stateless, so
no watermarks or state stores are required; exactly-once lands on the
commit semantics of the sink (Iceberg append per micro-batch on a real
cluster; parquet dirs here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..core.extract import Config
from .job import run_extraction
from .schemas import INPUT_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream over a pages parquet directory (the sandbox stand-in
    for an Iceberg snapshot stream)."""
    return (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_extraction_stream(
    pages_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    config: Config | None = None,
    run_id: str = "stream",
    available_now: bool = True,
):
    """Run the extraction pipeline as a stream; one parquet append per
    micro-batch via foreachBatch (commit boundary = micro-batch)."""
    config = config or Config()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        results = run_extraction(batch_df, config, run_id=f"{run_id}-{batch_id}")
        results.write.mode("append").parquet(output_path)

    writer = pages_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
