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

__all__ = [
    "TornMetaError",
    "overwrite_parquet_swap",
    "read_meta_row",
    "write_meta_row",
]


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


def overwrite_parquet_swap(frame, final_dir: str, partition_by=None) -> None:
    """Replace the parquet dir at ``final_dir`` with ``frame``'s rows
    in ONE pass over the data: write to a dot-prefixed sibling temp
    dir, then delete the old dir and rename the temp into place (two
    driver-side FS metadata ops).

    This is the single-pass alternative to ``localCheckpoint(eager) +
    overwrite`` for rewrites whose checkpoint had exactly ONE consumer
    — the write itself (winnowing df merge, epoch compactors, the
    minhash delete's bands rewrite). ``frame``'s plan may READ from
    ``final_dir``: the job reads the old files while writing the temp
    dir — distinct paths, never read-and-overwrite one dir in a plan —
    and the old data stays intact until the job has fully succeeded.
    The checkpoint shape paid a full extra materialization (the whole
    rewritten table through executor storage, then a second pass to
    write it); at index scale that doubles the rewrite's data motion
    (r12, guide §5/§6).

    Crash discipline matches the checkpoint shape — callers invalidate
    ``_meta`` around the call: a crash mid-write leaves the old dir
    intact plus a stale temp (clobbered by the next call's overwrite
    and invisible to readers, which open named subdirs, never list the
    index root); a crash between delete and rename leaves the dir
    missing — both states fail loudly at the next ``_meta`` read.

    A leaked session-level ``partitionOverwriteMode=dynamic`` cannot
    half-replace the table here (the hazard the compactors pinned
    ``static`` against): the temp dir starts empty, so partitioned
    writes into it have no pre-existing partitions to leave alive, and
    the swap replaces the WHOLE final dir by construction."""
    spark = frame.sparkSession
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    final = hpath(final_dir)
    parent, name = final.getParent(), final.getName()
    tmp = hpath(parent, f".{name}.swap")
    fs = final.getFileSystem(spark._jsc.hadoopConfiguration())
    writer = frame.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(tmp))
    fs.delete(final, True)
    if not fs.rename(tmp, final):
        raise IOError(f"parquet swap rename failed for {final_dir}")
