"""Isolated A/B for the r12 single-pass rewrite swap
(overwrite_parquet_swap) against the former eager-checkpoint +
overwrite shape, on synthetic tables big enough that the rewrite's
data motion dominates job-scheduling noise.

Two op shapes, matching the shipped call sites:
- fold: epoch compaction (read 2-epoch table, distinct/fold, rewrite
  the same dir) — compact_winnowing_index / compact_line_index.
- merge: side-table delta merge (read table, union a delta, groupBy
  sum, rewrite the same dir) — _apply_winnowing_df_delta.

Each rep rebuilds the input dir OUTSIDE the timed region, then times
one rewrite. Arms interleaved; read-back fingerprint (count + sum)
asserted identical between arms on every rep BEFORE recording.

Usage: python tools/ab_swap_rewrite.py OUT.json [rows] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators._meta_io import overwrite_parquet_swap
from lrmr_spark.session import get_spark


def old_rewrite(frame, path, partition_by=None):
    ckpt = frame.localCheckpoint(eager=True)
    w = ckpt.write.mode("overwrite")
    if partition_by:
        w = w.option("partitionOverwriteMode", "static").partitionBy(
            *partition_by
        )
    w.parquet(path)
    ckpt.unpersist()


ARMS = {
    "v0_ckpt_overwrite": old_rewrite,
    "v1_swap": lambda frame, path, partition_by=None: overwrite_parquet_swap(
        frame, path, partition_by
    ),
}


def setup_fold(spark, path, rows):
    (
        spark.range(rows)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("fp"),
            (F.col("id") % 2).cast("int").alias("_epoch"),
        )
        .write.mode("overwrite")
        .partitionBy("_epoch")
        .parquet(path)
    )


def fold_frame(spark, path):
    return (
        spark.read.parquet(path)
        .select("id", "fp")
        .distinct()
        .withColumn("_epoch", F.lit(0))
    )


def setup_merge(spark, path, rows):
    (
        spark.range(rows)
        .select(
            F.md5(F.col("id").cast("string")).alias("fp"),
            (F.col("id") % 7 + 1).alias("df"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_frame(spark, path, rows):
    base = spark.read.parquet(path).select(
        "fp", F.col("df").cast("bigint").alias("_delta")
    )
    delta = spark.range(rows // 10).select(
        F.md5(F.col("id").cast("string")).alias("fp"),
        F.lit(1).cast("bigint").alias("_delta"),
    )
    return (
        base.unionByName(delta)
        .groupBy("fp")
        .agg(F.sum("_delta").cast("bigint").alias("df"))
        .filter(F.col("df") > 0)
    )


def readback_fp(spark, path):
    df = spark.read.parquet(path)
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(df.columns) + "))"
        ).alias("s"),
    ).collect()[0]
    return (r["n"], r["s"])


def main() -> None:
    out_path = sys.argv[1]
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("ab-swap-rewrite")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {"rows": rows, "ops": {}, "loadavg_start": round(os.getloadavg()[0], 2)}

    ops = {
        "fold": (setup_fold, lambda sp, p: (fold_frame(sp, p), ["_epoch"])),
        "merge": (
            setup_merge,
            lambda sp, p: (merge_frame(sp, p, rows), None),
        ),
    }
    for op, (setup, mk) in ops.items():
        times = {a: [] for a in ARMS}
        fps = {a: None for a in ARMS}
        path = f"/tmp/lrmr_ab_swap_{op}"
        for rep in range(reps):
            order = list(ARMS) if rep % 2 == 0 else list(reversed(ARMS))
            for arm in order:
                setup(spark, path, rows)
                frame, pb = mk(spark, path)
                spark.sparkContext.setJobDescription(f"ab_swap:{op}:{arm}")
                t0 = time.time()
                ARMS[arm](frame, path, pb)
                times[arm].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                fp = readback_fp(spark, path)
                if fps[arm] is None:
                    fps[arm] = fp
                assert fps[arm] == fp, (op, arm, fps[arm], fp)
        assert fps["v0_ckpt_overwrite"] == fps["v1_swap"], (op, fps)
        out["ops"][op] = {
            "sec": times,
            "min_sec": {a: min(t) for a, t in times.items()},
            "fingerprint": list(fps["v1_swap"]),
        }
        print(json.dumps({op: out["ops"][op]["min_sec"]}), flush=True)
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
