"""SparkSession helpers tuned for the extraction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "htmlx",
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 256,
) -> SparkSession:
    """Build a local SparkSession with the engine's standard config.

    - AQE on (runtime re-planning, skew-join handling)
    - Arrow transport on; small maxRecordsPerBatch because rows carry
      multi-KB html payloads (SURVEY.md §4.3: bound Python-worker memory)
    - shuffle partitions ~ 2x cores so the salted repartition spreads work
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.driver.memory", os.environ.get("HTMLX_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
