"""A/B for the r12 write_winnowing_index restructure (epoch lands
first in ONE fused compute+write pass; df-delta inputs derive from a
narrow read-back of the written partition; the batch-postings eager
checkpoint and the per-write eager `hit` checkpoint are gone — 5 jobs
per write down to 3).

v0 = the shipped pre-change body, copied verbatim (checkpoint postings
→ hit checkpoint → epoch write from cache → df merge from cache).
v1 = TX.write_winnowing_index as shipped now.

Each arm writes the same two epochs into a fresh dir; the stored
index content (postings + df table) AND the match output are
fingerprint-asserted identical between arms before timing. Timed
unit = the two-epoch write sequence. Interleaved, min-of-N.

Usage: python tools/ab_winnowing_write.py OUT.json [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators import text as TX
from lrmr_spark.operators._meta_io import write_meta_row
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def old_write(df, path, id_col="doc_id", text_col="text", k=3, w=4,
              max_df=8, epoch=0):
    """The shipped pre-r12-restructure body, verbatim (drift checks
    elided — fresh dirs only here)."""
    spark = df.sparkSession
    epochs = TX._winnowing_epochs(spark, path)
    post = (
        TX.winnowing_postings(df, id_col, text_col, k, w)
        .select(F.col("_id").alias("id"), "fp")
        .localCheckpoint(eager=True)
    )
    fs, jvm = TX._winnowing_fs(spark, path)
    old_e = hit = None
    if epochs:
        allp = spark.read.parquet(f"{path}/postings")
        probe = post.select("fp").distinct()
        hit = (
            allp.filter(F.col("_epoch") != int(epoch))
            .select("id", "fp")
            .join(F.broadcast(probe), "fp", "left_semi")
            .distinct()
            .localCheckpoint(eager=True)
        )
        inc = post.join(hit, ["id", "fp"], "left_anti")
    else:
        inc = post
    inc = inc.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("_delta")
    )
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/_meta"), True)
    (
        post.withColumn("_epoch", F.lit(int(epoch)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch")
        .parquet(f"{path}/postings")
    )
    # pre-change df merge: checkpoint + overwrite
    frames = []
    try:
        frames.append(
            spark.read.parquet(f"{path}/df").select(
                "fp", F.col("df").cast("bigint").alias("_delta")
            )
        )
    except Exception:
        pass
    frames.append(inc)
    merged = frames[0]
    for fr in frames[1:]:
        merged = merged.unionByName(fr)
    merged = (
        merged.groupBy("fp")
        .agg(F.sum("_delta").cast("bigint").alias("df"))
        .filter(F.col("df") > 0)
        .localCheckpoint(eager=True)
    )
    merged.write.mode("overwrite").parquet(f"{path}/df")
    merged.unpersist()
    write_meta_row(
        spark,
        f"{path}/_meta",
        {
            "k": k, "w": w, "max_df": max_df, "hash": "md5-8",
            "id_col": id_col,
            "id_type": df.schema[id_col].dataType.simpleString(),
            "empty": False,
        },
    )
    for cp in (post, old_e, hit):
        if cp is not None:
            cp.unpersist()


def two_epoch_write(fn, d, path):
    shutil.rmtree(path, ignore_errors=True)
    fn(d.filter(F.col("doc_id") % 4 == 0), path, epoch=0)
    fn(d.filter(F.col("doc_id") % 4 == 2), path, epoch=1)


def new_write(df, path, epoch=0, **kw):
    TX.write_winnowing_index(df, path, "doc_id", "text", epoch=epoch)


ARMS = {"v0_ckpt": lambda d, p, epoch=0, **kw: old_write(d, p, epoch=epoch),
        "v1_fused": new_write}


def index_fingerprint(spark, path, d):
    post = spark.read.parquet(f"{path}/postings")
    p = post.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(id, fp, _epoch))").alias("s"),
    ).collect()[0]
    dft = spark.read.parquet(f"{path}/df")
    q = dft.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(fp, df))").alias("s"),
    ).collect()[0]
    m = TX.match_winnowing_index(
        d.filter(F.col("doc_id") % 2 == 1), path, "doc_id", "text",
        min_shared=2,
    )
    r = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(new_id, base_id, n_shared))").alias("s"),
    ).collect()[0]
    return (p["n"], p["s"], q["n"], q["s"], r["n"], r["s"])


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab-winnowing-write")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load(spark, sf_dir, "documents").localCheckpoint(eager=True)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"

    fps = {}
    for arm, fn in ARMS.items():
        path = f"/tmp/lrmr_ab_winwrite_{tag}_{arm}"
        two_epoch_write(fn, d, path)
        fps[arm] = index_fingerprint(spark, path, d)
    if fps["v0_ckpt"] != fps["v1_fused"]:
        raise SystemExit(f"fingerprint mismatch: {fps}")

    out = {
        "sf_dir": sf_dir,
        "fingerprint": list(fps["v1_fused"]),
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    times = {a: [] for a in ARMS}
    for rep in range(n_reps):
        order = list(ARMS) if rep % 2 == 0 else list(reversed(ARMS))
        for arm in order:
            path = f"/tmp/lrmr_ab_winwrite_{tag}_{arm}"
            spark.sparkContext.setJobDescription(f"ab_winwrite:{arm}")
            t0 = time.time()
            two_epoch_write(ARMS[arm], d, path)
            times[arm].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out["sec"] = times
    out["min_sec"] = {a: min(t) for a, t in times.items()}
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["min_sec"]))


if __name__ == "__main__":
    main()
