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

import json

__all__ = ["TornMetaError", "read_meta_row", "write_meta_row"]


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


def write_meta_row(spark, meta_path: str, payload: dict) -> None:
    """Overwrite ``meta_path`` with ONE JSON row via the Hadoop
    filesystem API directly — a driver-side, milliseconds write.

    The previous shape (``spark.range(1).select(lits).coalesce(1)
    .write.json``) ran a full Spark job (~0.15-0.25 s scheduling +
    commit protocol) for a single row, once per stored-index
    write/delete/compact across the whole catalog — pure overhead for
    driver-scale data (r12, guide §5). Layout stays reader-compatible:
    a directory holding one ``part-00000.json`` file, exactly what the
    explicit-schema FAILFAST hot paths and the generic schema-inferred
    backup both read; works on any filesystem Spark's Hadoop conf
    resolves (same FS the old writer used).

    Torn-write discipline is PRESERVED: the row lands in a
    dot-prefixed temp file (hidden from readers) and renames into
    place — same-directory rename is atomic on local FS and HDFS. A
    crash mid-write leaves either an empty-looking dir (read raises
    TornMetaError) or nothing (AnalysisException), never a silent
    half-row; json.dumps cannot emit a prefix that parses as a
    complete object.

    ``None`` values are DROPPED from the payload: Spark's JSON writer
    omits null fields, and the schema-inferred backup reader
    distinguishes absent-column from present-null — keep that contract
    byte-identical."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    dirp = hpath(meta_path)
    fs = dirp.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(dirp):
        fs.delete(dirp, True)
    fs.mkdirs(dirp)
    tmp = hpath(f"{meta_path}/.part-00000.json.tmp")
    row = {k: v for k, v in payload.items() if v is not None}
    out = fs.create(tmp, True)
    try:
        line = json.dumps(row, separators=(",", ":")) + "\n"
        out.write(bytearray(line.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, hpath(f"{meta_path}/part-00000.json")):
        raise IOError(f"_meta rename failed under {meta_path}")
