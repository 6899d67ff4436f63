"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in htmlx/: a from-scratch PySpark-native reimplementation
of rnb3ds/html's HTML content-extraction pipeline (SURVEY.md). Queries
synthesize Common-Crawl-style pages from the `documents` parquet table
(deterministic SQL templates shared with the DuckDB oracles — see
htmlx/spark/pages.py), run the real extraction engine via mapInPandas, and
flatten results to oracle-comparable scalar columns.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full extraction over pages synthesized from sf0.001."""
    from htmlx.spark.entryqueries import q_extract_text

    return q_extract_text(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from htmlx.spark.entryqueries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from htmlx.spark.entryqueries import ORACLES

    return dict(ORACLES)
