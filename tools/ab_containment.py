"""A/B for the r12 containment_pairs prefix-filter change (hashed
filter-stage items + one persisted postings frame) against an inline
copy of the shipped r11 body (string items, posts re-derived per
consumer). Both run on the same inputs; results must be
fingerprint-identical BEFORE timing (the pair set is provably the
same: prefix filtering is lossless under any consistent global item
order, and the exact verify re-attaches true string arrays).

Times both the dedup_containment shape (raw documents) and the
dedup_pipeline_containment shape (near-dedup survivors), interleaved,
min-of-N.

Usage: python tools/ab_containment.py OUT.json [sf_dir] [reps]
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


def old_containment_pairs(df, id_col, text_col, threshold=0.9, shingle_k=3):
    """The shipped r11 body, verbatim semantics: string filter stages."""
    raw = shingles(F.col(text_col), shingle_k)
    items = F.array_sort(F.filter(F.array_distinct(raw), lambda x: x != F.lit("")))
    reps = (
        df.select(F.col(id_col).alias("_id"), items.alias("_items"))
        .filter(F.size("_items") > 0)
        .groupBy("_items")
        .agg(F.min("_id").alias("_id"))
        .persist()
    )
    posts = reps.select(
        "_id", F.size("_items").alias("_m"), F.explode("_items").alias("_item")
    )
    dfreq = posts.groupBy("_item").agg(F.count(F.lit(1)).alias("_dfreq"))
    prefix_len = F.col("_m") - F.floor(F.lit(threshold) * F.col("_m")).cast("int") + 1
    ranked = posts.join(dfreq, "_item").withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("_id").orderBy("_dfreq", "_item")),
    )
    prefix = ranked.filter(F.col("_rk") <= prefix_len).select("_id", "_item")
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
        .select(
            "id_a", "id_b", "containment", F.round(inter / union, 4).alias("jaccard")
        )
    )
    out = out.localCheckpoint(eager=True)
    reps.unpersist()
    return out


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


def fingerprint(df):
    h = F.hash("id_a", "id_b", "containment", "jaccard").cast("long")
    r = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h").alias("s")
    ).collect()[0]
    return (r["n"], r["s"])


VARIANTS = {
    "v0_strings": old_containment_pairs,
    "v1_hashed": lambda df, i, t, **kw: DD.containment_pairs(df, i, t, **kw),
}


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab-containment")
    spark.range(1000).selectExpr("sum(id)").collect()
    inputs = {
        "documents": load(spark, sf_dir, "documents").localCheckpoint(eager=True),
        "survivors": survivors_frame(spark, sf_dir),
    }
    out = {"sf_dir": sf_dir, "inputs": {}}
    for tag, df in inputs.items():
        rec = {"loadavg_start": round(os.getloadavg()[0], 2)}
        fps = {}
        for v, fn in VARIANTS.items():
            res = fn(df, "doc_id", "text", threshold=0.9)
            fps[v] = fingerprint(res)
            res.unpersist()
        if fps["v0_strings"] != fps["v1_hashed"]:
            raise SystemExit(f"fingerprint mismatch on {tag}: {fps}")
        rec["fingerprint"] = list(fps["v0_strings"])
        times = {v: [] for v in VARIANTS}
        for rep in range(n_reps):
            order = list(VARIANTS) if rep % 2 == 0 else list(reversed(VARIANTS))
            for v in order:
                spark.sparkContext.setJobDescription(f"ab_containment:{v}:{tag}")
                t0 = time.time()
                res = VARIANTS[v](df, "doc_id", "text", threshold=0.9)
                res.count()
                times[v].append(round(time.time() - t0, 3))
                res.unpersist()
                spark.sparkContext.setJobDescription(None)
        rec["sec"] = times
        rec["min_sec"] = {v: min(ts) for v, ts in times.items()}
        rec["loadavg_end"] = round(os.getloadavg()[0], 2)
        out["inputs"][tag] = rec
        print(json.dumps({tag: rec}), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
