"""Dump the physical plans behind the r12 pipeline front-half sharing
claim (dedup_pipeline_containment tokenizes once): the exact-dup-prune
frame pre-checkpoint, before = built from token_multiset_items (its
own parquet Scan + tokenize/explode + count), after = derived from the
caller-persisted _minhash_items frame (InMemoryTableScan — the same
cache the minhash stage's _minhash_reps reads via shared_items).

Usage: python tools/dump_pipeline_front_plans.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import lrmr_spark.operators.dedup as DD
from lrmr_spark.plans import physical_plan
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def prune_frame(fps):
    keeps = fps.groupBy("_fp").agg(F.min("_id").alias("_keep"))
    return (
        fps.join(keeps, "_fp")
        .filter(F.col("_id") != F.col("_keep"))
        .select(F.col("_id").alias("doc_id"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r12"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-pipeline-front-plans")
    docs = load(spark, sf_dir, "documents")

    fps_before = DD.token_multiset_items(docs, "doc_id", "text").select(
        "_id", F.md5(F.array_join("items", " ")).alias("_fp")
    )
    p = os.path.join(out_dir, "pipeline_exact_prune_before.txt")
    with open(p, "w") as f:
        f.write(
            "# dedup_pipeline_containment exact-dup prune (before: own "
            f"token_multiset_items pass — separate parquet Scan + "
            f"tokenize/explode/count), sf_dir={sf_dir}\n"
        )
        f.write(physical_plan(prune_frame(fps_before)))
    print(p)

    items = DD._minhash_items(docs, "doc_id", "text", "multiset", 3).persist()
    items.count()  # fill the cache as the entry's first materialization does
    fps_after = (
        items.groupBy("_id")
        .agg(F.array_sort(F.collect_list("_item")).alias("items"))
        .select("_id", F.md5(F.array_join("items", " ")).alias("_fp"))
    )
    p = os.path.join(out_dir, "pipeline_exact_prune_after.txt")
    with open(p, "w") as f:
        f.write(
            "# dedup_pipeline_containment exact-dup prune (after: derived "
            f"from the shared persisted _minhash_items frame — "
            f"InMemoryTableScan, no second tokenize pass; the minhash "
            f"stage reads the SAME cache via shared_items), sf_dir={sf_dir}\n"
        )
        f.write(physical_plan(prune_frame(fps_after)))
    print(p)
    items.unpersist()


if __name__ == "__main__":
    main()
