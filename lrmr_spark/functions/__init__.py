"""Scalar function catalog: the engine's reusable column-expression
builders in one namespace (SURVEY §2.5 — the reference has no scalar
function library at all; everything here is JVM-side/codegen).

Grouped re-exports from the operator modules plus a few primitives that
belong to no single operator family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.similarity import cosine, dot, l2_norm
from ..operators.text import (
    STOPWORDS,
    distinct_tokens,
    fingerprint,
    language_id,
    language_scores,
    quality_features,
    shingles,
    token_count,
    tokens,
)

__all__ = [
    # text
    "tokens",
    "token_count",
    "distinct_tokens",
    "shingles",
    "fingerprint",
    "quality_features",
    "language_scores",
    "language_id",
    "STOPWORDS",
    # vectors
    "dot",
    "l2_norm",
    "cosine",
    # primitives
    "portable_hash",
    "fast_hash",
    "bucketize",
]


def portable_hash(col: Column | str, seed: int = 0) -> Column:
    """md5('<seed>:' || value): bit-identical in Spark / DuckDB /
    Python hashlib — the primitive every oracle-checkable operator
    hashes with."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(f"{seed}:"), c))


def fast_hash(col: Column | str, seed: int = 0) -> Column:
    """xxhash64: the production fast path (JVM, 64-bit int, no hex
    strings). NOT portable across engines — use portable_hash when a
    DuckDB oracle must reproduce the value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lit(seed), c)


def bucketize(col: Column | str, width: float) -> Column:
    """Fixed-width numeric bucketing (floor division, bigint bucket id)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / width).cast("bigint")
