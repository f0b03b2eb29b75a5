"""Shared reader for stored-index ``_meta`` JSON (single-row, explicit
schema).

The r11 optimization round gave every hot-path ``_meta`` read an
explicit schema (kills the schema-inference scan job, ~0.13-0.15 s per
read). Two failure modes that schema inference used to catch loudly
came back silent with it (r11 ADVICE):

- a ``_meta`` dir that exists but contains no JSON rows (an
  interrupted overwrite that left only ``_temporary``/``_SUCCESS``)
  previously failed schema inference with AnalysisException; with an
  explicit schema the read returns an EMPTY frame and ``collect()[0]``
  raised a bare IndexError that bypassed the documented torn-state
  ValueErrors;
- a corrupt or field-renamed record parses to an all-NULL row under
  the JSON reader's default PERMISSIVE mode (inference failed loudly),
  surfacing later as a misleading "codebook drift vs None" or a
  TypeError from ``int(None)``.

``read_meta_row`` restores both loud failures: FAILFAST parse mode and
a :class:`TornMetaError` (a ValueError) on the physically-present-but-
empty dir. A MISSING ``_meta`` path still raises AnalysisException
exactly as before — callers that branch on absence
(``_read_winnowing_meta``, ``load_quality_model``) catch
``(AnalysisException, TornMetaError)`` and keep their documented
behavior.
"""

from __future__ import annotations

__all__ = ["TornMetaError", "read_meta_row"]


class TornMetaError(ValueError):
    """A stored index's ``_meta`` dir exists but holds no JSON row —
    the torn state an interrupted overwrite leaves behind."""


def read_meta_row(spark, meta_path: str, schema: str):
    """Single ``_meta`` row under an explicit schema, FAILFAST parse.

    Raises AnalysisException when ``meta_path`` is missing (unchanged
    contract) and TornMetaError when it exists but is empty."""
    rows = (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(meta_path)
        .collect()
    )
    if not rows:
        raise TornMetaError(
            f"stored-index _meta at {meta_path} exists but contains no "
            "rows — torn state from an interrupted write; rebuild the "
            "index or restore _meta"
        )
    return rows[0]
