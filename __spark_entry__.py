"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog from
``lrmr_spark.catalog`` (one entry per implemented operator from
SURVEY.md §2 plus the LLM-data-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lrmr_spark import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's GroupBy+Count pipeline shape —
    /root/reference/test/group_by.go:9-14) on /root/testdata/sf0.001."""
    return _catalog.queries()["flagship_event_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
