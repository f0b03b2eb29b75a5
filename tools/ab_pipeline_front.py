"""A/B for sharing the tokenize/count items frame between
dedup_pipeline_containment's exact-dup prune and its minhash stage.

v0 (shipped): the exact-dup prune runs token_multiset_items (tokenize,
explode, count, collect per doc) and minhash_lsh_pairs independently
re-runs the same tokenize/explode/count front half inside
_minhash_reps — two full passes over the corpus text.

v1: build _minhash_items(unit="multiset") ONCE, persist it, derive the
exact-prune fingerprints from the cached items (one extra per-doc
collect over 8-byte-key cached rows) and pass it to minhash_lsh_pairs
via the shared_items passthrough (the change-11 machinery).

Item strings are identical by construction (same tokens(), same
concat(tok, ':', cnt)); both the pruned-id set and the pair set are
fingerprint-asserted identical before timing. Timed unit = the front
half the change touches (exact_pruned checkpoint + eager pairs),
interleaved arms, min-of-N.

Usage: python tools/ab_pipeline_front.py OUT.json [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import lrmr_spark.operators.dedup as DD
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def _prune_and_pairs_from_fps(docs, fps):
    keeps = fps.groupBy("_fp").agg(F.min("_id").alias("_keep"))
    exact_pruned = (
        fps.join(keeps, "_fp")
        .filter(F.col("_id") != F.col("_keep"))
        .select(F.col("_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    return exact_pruned


def v0_shipped(docs):
    fps = DD.token_multiset_items(docs, "doc_id", "text").select(
        "_id", F.md5(F.array_join("items", " ")).alias("_fp")
    )
    exact_pruned = _prune_and_pairs_from_fps(docs, fps)
    pairs = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=2, threshold=0.9
    )
    return exact_pruned, pairs


def v1_shared(docs):
    items = DD._minhash_items(docs, "doc_id", "text", "multiset", 3).persist()
    fps = (
        items.groupBy("_id")
        .agg(F.array_sort(F.collect_list("_item")).alias("items"))
        .select("_id", F.md5(F.array_join("items", " ")).alias("_fp"))
    )
    exact_pruned = _prune_and_pairs_from_fps(docs, fps)
    pairs = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=2, threshold=0.9,
        shared_items=items,
    )
    items.unpersist()
    return exact_pruned, pairs


VARIANTS = {"v0_twopass": v0_shipped, "v1_shared": v1_shared}


def fingerprint(exact_pruned, pairs):
    p = (
        exact_pruned.select(F.col("doc_id").cast("long").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
        .collect()[0]
    )
    q = (
        pairs.select(F.hash("id_a", "id_b", "jaccard").cast("long").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
        .collect()[0]
    )
    return (p["n"], p["s"], q["n"], q["s"])


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab-pipeline-front")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = load(spark, sf_dir, "documents").localCheckpoint(eager=True)

    fps = {}
    for v, fn in VARIANTS.items():
        ep, pr = fn(docs)
        fps[v] = fingerprint(ep, pr)
        ep.unpersist()
        pr.unpersist()
    if fps["v0_twopass"] != fps["v1_shared"]:
        raise SystemExit(f"fingerprint mismatch: {fps}")

    out = {
        "sf_dir": sf_dir,
        "fingerprint": list(fps["v0_twopass"]),
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    times = {v: [] for v in VARIANTS}
    for rep in range(n_reps):
        order = list(VARIANTS) if rep % 2 == 0 else list(reversed(VARIANTS))
        for v in order:
            spark.sparkContext.setJobDescription(f"ab_pipeline_front:{v}")
            t0 = time.time()
            ep, pr = VARIANTS[v](docs)
            times[v].append(round(time.time() - t0, 3))
            ep.unpersist()
            pr.unpersist()
            spark.sparkContext.setJobDescription(None)
    out["sec"] = times
    out["min_sec"] = {v: min(ts) for v, ts in times.items()}
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["min_sec"]))


if __name__ == "__main__":
    main()
