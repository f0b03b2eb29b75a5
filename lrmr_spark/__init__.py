"""lrmr_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of ab180/lrmr (reference at
/root/reference/), re-expressed Spark-first.

Layers:
- :mod:`lrmr_spark.pipeline` — the reference's chaining API
  (map/flat_map/reduce/sort/group_by_key/...) compiled to DataFrames.
- :mod:`lrmr_spark.job` — attached/detached run modes + metrics.
- :mod:`lrmr_spark.operators` — relational + LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal).
- :mod:`lrmr_spark.streaming` — Structured Streaming surface.
"""

from .job import JobHandle, Result, get_job, list_jobs
from .pipeline import Pipeline
from .session import get_spark
from .tables import load, load_all, register_views

__all__ = [
    "Pipeline",
    "JobHandle",
    "Result",
    "get_job",
    "list_jobs",
    "get_spark",
    "load",
    "load_all",
    "register_views",
]

__version__ = "0.1.0"
