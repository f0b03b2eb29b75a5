"""Query catalog: every operator from SURVEY §2 (plus the LLM-data
operators) registered as a named (spark_fn, oracle_sql) pair.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin wrappers over
this registry. Each spark_fn takes (spark, sf_dir) and returns a
DataFrame; each oracle is ANSI SQL DuckDB runs on the same parquet
tables (views: region nation customer supplier part orders lineitem
events documents embeddings). Column names are aliased identically on
both sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str | Callable[[], str]] = {}


def query(name: str, oracle: str | Callable[[], str] | None = None):
    """Register a catalog query. ``oracle=None`` → driver runs the weaker
    rows-only check (for non-SQL-expressible ops)."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return {n: (o() if callable(o) else o) for n, o in _ORACLES.items()}


_loaded = False


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    from . import core  # noqa: F401
    from . import relational  # noqa: F401
    from . import window_ops  # noqa: F401
    from . import events_ops  # noqa: F401
    from . import text_ops  # noqa: F401
    from . import dedup_ops  # noqa: F401
    from . import similarity_ops  # noqa: F401
    from . import multimodal_ops  # noqa: F401
    from . import advanced_ops  # noqa: F401
    from . import tpch_ops  # noqa: F401
    from . import streaming_ops  # noqa: F401
