"""Phase-split ONE write_winnowing_index call (the cost every
winnowing lifecycle entry pays twice; the r12 CRUD split only timed
whole writes). Replays the PRE-restructure internal sequence with a
wall-clock timer per phase: postings build+checkpoint, stored-side
hit scan (2nd epoch only), epoch parquet write, df-delta merge
(checkpoint + overwrite), _meta write.

NOTE: this is the BEFORE evidence (EXP_WINNOWING_WRITE_PHASES.json).
The shipped operator was restructured mid-r12 (epoch lands first in
one fused pass, df deltas from a narrow read-back, hit left lazy);
tools/ab_winnowing_write.py carries the after-evidence, with the old
body inlined and index/match fingerprints asserted identical.

Usage: python tools/exp_winnowing_write_phases.py OUT.json [sf_dir] [reps]
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
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


class P:
    def __init__(self, rec, name):
        self.rec, self.name = rec, name

    def __enter__(self):
        self.t0 = time.time()

    def __exit__(self, *exc):
        self.rec[self.name] = round(time.time() - self.t0, 3)
        return False


def split_write(spark, df, path, epoch, rec, pfx):
    """write_winnowing_index's body with phase timers (k=3, w=4,
    max_df=8 defaults; fresh-index and append cases both exercised)."""
    k, w, max_df = 3, 4, 8
    id_col, text_col = "doc_id", "text"
    with P(rec, f"{pfx}:meta_read+epochs"):
        meta = TX._read_winnowing_meta(spark, path)
        epochs = TX._winnowing_epochs(spark, path)
    assert (meta is None) == (not epochs)
    with P(rec, f"{pfx}:postings_ckpt"):
        post = (
            TX.winnowing_postings(df, id_col, text_col, k, w)
            .select(F.col("_id").alias("id"), "fp")
            .localCheckpoint(eager=True)
        )
    fs, jvm = TX._winnowing_fs(spark, path)
    old_e = hit = None
    if epochs:
        with P(rec, f"{pfx}:stored_hit_ckpt"):
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
    with P(rec, f"{pfx}:inc_agg_plan"):
        inc = inc.groupBy("fp").agg(
            F.count(F.lit(1)).cast("bigint").alias("_delta")
        )
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/_meta"), True)
    with P(rec, f"{pfx}:epoch_write"):
        (
            post.withColumn("_epoch", F.lit(int(epoch)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(f"{path}/postings")
        )
    with P(rec, f"{pfx}:df_delta_merge"):
        # pre-restructure merge, inlined verbatim (checkpoint +
        # overwrite) so re-runs keep measuring the BEFORE shape even
        # though the shipped _apply_winnowing_df_delta now swaps
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
    with P(rec, f"{pfx}:meta_write"):
        TX._write_winnowing_meta(
            spark, path, k=k, w=w, max_df=max_df, hash_name="md5-8",
            id_col=id_col, id_type=df.schema[id_col].dataType.simpleString(),
            empty=False,
        )
    for cp in (post, old_e, hit):
        if cp is not None:
            cp.unpersist()


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("exp-winnowing-write-phases")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load(spark, sf_dir, "documents")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join("/tmp", f"lrmr_winidx_wsplit_{tag}")
    out = {"sf_dir": sf_dir, "reps": []}
    for rep in range(reps):
        shutil.rmtree(path, ignore_errors=True)
        rec = {"loadavg": round(os.getloadavg()[0], 2)}
        t0 = time.time()
        split_write(
            spark, d.filter(F.col("doc_id") % 4 == 0), path, 0, rec, "e0"
        )
        split_write(
            spark, d.filter(F.col("doc_id") % 4 == 2), path, 1, rec, "e1"
        )
        rec["total"] = round(time.time() - t0, 3)
        out["reps"].append(rec)
        print(json.dumps(rec), flush=True)
    # sanity: the split replay must produce the same match answer as
    # the real operator
    n_split = (
        TX.match_winnowing_index(
            d.filter(F.col("doc_id") % 2 == 1), path, "doc_id", "text",
            min_shared=2,
        ).count()
    )
    real = os.path.join("/tmp", f"lrmr_winidx_wsplit_real_{tag}")
    shutil.rmtree(real, ignore_errors=True)
    TX.write_winnowing_index(
        d.filter(F.col("doc_id") % 4 == 0), real, "doc_id", "text", epoch=0
    )
    TX.write_winnowing_index(
        d.filter(F.col("doc_id") % 4 == 2), real, "doc_id", "text", epoch=1
    )
    n_real = (
        TX.match_winnowing_index(
            d.filter(F.col("doc_id") % 2 == 1), real, "doc_id", "text",
            min_shared=2,
        ).count()
    )
    assert n_split == n_real, (n_split, n_real)
    out["match_rows"] = n_split
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["reps"][-1]))


if __name__ == "__main__":
    main()
