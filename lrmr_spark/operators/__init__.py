"""Operator library: LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal) plus scale helpers (salting, skew).

Everything here is built from declarative DataFrame expressions first
(JVM-side, codegen'd); Pandas-UDF paths only where semantics require
imperative code. Each operator documents its 100 TB execution shape.
"""

from . import dedup, multimodal, similarity, skew, text

__all__ = ["dedup", "multimodal", "similarity", "skew", "text"]
