"""Sub-phase split of containment_pairs inside dedup_pipeline_containment
(r12 verdict item 3: the 6 s 'containment_pairs_plan' phase of
EXP_CRUD_PHASES.json is the pipeline's dominant cost and its internal
shares — reps groupBy vs dfreq/rank vs candidate join vs verify — were
never measured).

Reproduces the catalog entry's survivors frame, checkpoints it so the
upstream near-dedup cost is excluded, then times each stage of the
containment_pairs body by materializing its frontier with count():

  reps        groupBy(_items) collapse (full shingle-string arrays)
  dfreq       posting explode + per-item document frequency
  ranked      posts x dfreq join + row_number window (rarest-first)
  cand        prefix explode x full postings join + distinct
  verify      exact containment on candidates (arrays re-attached)

Stages nest (each count re-runs its upstream), so per-stage cost is the
delta between consecutive rows. reps is persisted exactly as in the
operator, so downstream stages consume the persisted table the way the
real plan does.

Usage: python tools/exp_containment_phases.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import lrmr_spark.operators.dedup as DD
from lrmr_spark.operators.text import shingles
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def survivors_frame(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fps = DD.token_multiset_items(docs, "doc_id", "text").select(
        "_id", F.md5(F.array_join("items", " ")).alias("_fp")
    )
    keeps = fps.groupBy("_fp").agg(F.min("_id").alias("_keep"))
    exact_pruned = (
        fps.join(keeps, "_fp")
        .filter(F.col("_id") != F.col("_keep"))
        .select(F.col("_id").alias("doc_id"))
    )
    pairs = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=2, threshold=0.9
    )
    cc = DD.connected_components(pairs)
    cc_pruned = cc.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(
        cc_pruned.unionAll(exact_pruned), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)


def split_once(spark, surv, threshold=0.9, shingle_k=3):
    rec: dict[str, float] = {}

    def timed(tag, df):
        t0 = time.time()
        n = df.count()
        rec[tag] = round(time.time() - t0, 3)
        rec[f"{tag}_rows"] = n
        print(f"  {tag}: {rec[tag]} s ({n} rows)", file=sys.stderr, flush=True)
        return df

    raw = shingles(F.col("text"), shingle_k)
    items = F.array_sort(F.filter(F.array_distinct(raw), lambda x: x != F.lit("")))
    reps = (
        surv.select(F.col("doc_id").alias("_id"), items.alias("_items"))
        .filter(F.size("_items") > 0)
        .groupBy("_items")
        .agg(F.min("_id").alias("_id"))
        .persist()
    )
    timed("reps", reps)
    posts = reps.select(
        "_id", F.size("_items").alias("_m"), F.explode("_items").alias("_item")
    )
    dfreq = posts.groupBy("_item").agg(F.count(F.lit(1)).alias("_dfreq"))
    timed("dfreq", dfreq)
    prefix_len = (
        F.col("_m") - F.floor(F.lit(threshold) * F.col("_m")).cast("int") + 1
    )
    ranked = posts.join(dfreq, "_item").withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("_id").orderBy("_dfreq", "_item")),
    )
    prefix = ranked.filter(F.col("_rk") <= prefix_len).select("_id", "_item")
    timed("prefix", prefix)
    cand = (
        prefix.alias("p")
        .join(posts.select("_id", "_item").alias("t"), on="_item")
        .filter(F.col("p._id") != F.col("t._id"))
        .select(
            F.least("p._id", "t._id").alias("id_a"),
            F.greatest("p._id", "t._id").alias("id_b"),
        )
        .distinct()
    )
    timed("cand", cand)
    ia = reps.select(F.col("_id").alias("id_a"), F.col("_items").alias("_items_a"))
    ib = reps.select(F.col("_id").alias("id_b"), F.col("_items").alias("_items_b"))
    inter = F.size(F.array_intersect("_items_a", "_items_b"))
    union = F.size(F.array_union("_items_a", "_items_b"))
    smaller = F.least(F.size("_items_a"), F.size("_items_b"))
    out = (
        cand.join(ia, "id_a")
        .join(ib, "id_b")
        .withColumn("containment", F.round(inter / smaller, 4))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", F.round(inter / union, 4).alias("jaccard"))
    )
    timed("verify", out)
    reps.unpersist()
    rec["loadavg"] = round(os.getloadavg()[0], 2)
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("exp-containment-phases")
    spark.range(1000).selectExpr("sum(id)").collect()
    surv = survivors_frame(spark, sf_dir)
    print(f"survivors: {surv.count()}", file=sys.stderr, flush=True)
    recs = []
    for i in range(n_reps):
        print(f"rep {i}", file=sys.stderr, flush=True)
        recs.append(split_once(spark, surv))
    print(json.dumps({"sf_dir": sf_dir, "splits": recs}, indent=1))


if __name__ == "__main__":
    main()
