"""Phase-split the stored-index CRUD lifecycles (r12 verdict items 1-4).

Each catalog entry below bundles 3-5 maintenance operations plus a
serve query into one timed lifecycle; nobody has split where the time
goes the way EXP_IDX_WRITE.json did for the IVF-PQ build. This tool
replays each lifecycle with a wall-clock timer around every phase
(same inputs, same paths, same call order as the catalog entry) so the
optimization targets the measured phase, not a guess.

Usage: python tools/exp_crud_phases.py [sf_dir] [reps] [entry ...]
Writes EXP_CRUD_PHASES.json (list of per-rep phase dicts per entry).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lrmr_spark.operators import dedup as DD
from lrmr_spark.operators import similarity as SIM
from lrmr_spark.operators import text as TX
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


class P:
    """Phase timer: with P(rec, 'name'): ..."""

    def __init__(self, rec: dict, name: str):
        self.rec, self.name = rec, name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.rec[self.name] = round(time.time() - self.t0, 3)
        return False


def mh_append(spark, sf_dir: str, rec: dict) -> int:
    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    with P(rec, "minmax_agg"):
        lo, hi = corpus.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (lo + hi) // 2
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join("/tmp", f"lrmr_mh_append_phases_{tag}")
    with P(rec, "write_day1"):
        DD.write_minhash_index(
            corpus.filter(F.col("doc_id") <= mid), "doc_id", "text",
            path, num_hashes=16, bands=2, fast=False,
        )
    with P(rec, "append_day2"):
        DD.append_minhash_index(
            corpus.filter(F.col("doc_id") > mid), path, "doc_id", "text"
        )
    with P(rec, "match_day3"):
        out = DD.match_minhash_index(
            docs.filter(F.col("doc_id") % 5 == 0), path, "doc_id", "text",
            threshold=0.9,
        )
        n = out.count()
    return n


def mh_delete(spark, sf_dir: str, rec: dict) -> int:
    docs = load(spark, sf_dir, "documents")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join("/tmp", f"lrmr_mh_del_phases_{tag}")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    with P(rec, "write"):
        DD.write_minhash_index(
            base, "doc_id", "text", path, num_hashes=16, bands=2, fast=False
        )
    takedown = base.filter(F.col("doc_id") % 3 == 0)
    with P(rec, "delete1"):
        DD.delete_minhash_index_content(takedown, path, "doc_id", "text")
    with P(rec, "delete2_idempotent"):
        n2 = DD.delete_minhash_index_content(takedown, path, "doc_id", "text")
    assert n2 == 0, n2
    with P(rec, "match"):
        n = (
            DD.match_minhash_index(
                docs.filter(F.col("doc_id") % 5 == 0), path, "doc_id",
                "text", threshold=0.9,
            )
            .orderBy("new_id", "base_id")
            .count()
        )
    return n


def win_delete(spark, sf_dir: str, rec: dict) -> int:
    d = load(spark, sf_dir, "documents")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join("/tmp", f"lrmr_winidx_d_phases_{tag}")
    # fresh dir per rep: epoch-replay shortcut would change the shape
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    with P(rec, "write_e0"):
        TX.write_winnowing_index(
            d.filter(F.col("doc_id") % 4 == 0), path, "doc_id", "text", epoch=0
        )
    with P(rec, "write_e1"):
        TX.write_winnowing_index(
            d.filter(F.col("doc_id") % 4 == 2), path, "doc_id", "text", epoch=1
        )
    with P(rec, "collect_ids"):
        ids = [
            r["doc_id"]
            for r in d.filter(F.col("doc_id") % 6 == 0)
            .select("doc_id")
            .collect()
        ]
    with P(rec, "delete1"):
        TX.delete_winnowing_index_ids(spark, path, ids)
    with P(rec, "delete2_idempotent"):
        n2 = TX.delete_winnowing_index_ids(spark, path, ids)
    assert n2 == 0, n2
    with P(rec, "match"):
        n = (
            TX.match_winnowing_index(
                d.filter(F.col("doc_id") % 2 == 1), path, "doc_id", "text",
                min_shared=2,
            )
            .orderBy("new_id", "base_id")
            .count()
        )
    return n


def pq_append(spark, sf_dir: str, rec: dict) -> int:
    from lrmr_spark.catalog.similarity_ops import _centroids, _query_vec

    emb = load(spark, sf_dir, "embeddings")
    cents = [list(c) for c in _centroids()[:4]]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join("/tmp", f"lrmr_pq_append_phases_{tag}")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter(F.col("vec_id") % 3 == 0)
    with P(rec, "write"):
        SIM.write_pq_codes(base, path, cents, num_sub=8)
    with P(rec, "append1"):
        SIM.append_pq_codes(batch, path, cents)
    with P(rec, "append2_idempotent"):
        n2 = SIM.append_pq_codes(batch, path, cents)
    assert n2 == 0, n2
    with P(rec, "serve"):
        n = SIM.pq_adc_topk_stored(
            spark, path, list(_query_vec()), cents, k=10
        ).count()
    return n


def containment(spark, sf_dir: str, rec: dict) -> int:
    """dedup_pipeline_containment split: exact-fp prune plan is lazy;
    minhash pairs + CC are eager at call time; the final union of 4
    count aggs runs at count(). Phase-split the eager pieces."""
    docs = load(spark, sf_dir, "documents")
    with P(rec, "exact_fp_plan"):
        fps = DD.token_multiset_items(docs, "doc_id", "text").select(
            "_id", F.md5(F.array_join("items", " ")).alias("_fp")
        )
        keeps = fps.groupBy("_fp").agg(F.min("_id").alias("_keep"))
        exact_pruned = (
            fps.join(keeps, "_fp")
            .filter(F.col("_id") != F.col("_keep"))
            .select(F.col("_id").alias("doc_id"))
        )
    with P(rec, "minhash_pairs"):
        pairs = DD.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=16, bands=2, threshold=0.9
        )
    with P(rec, "connected_components"):
        cc = DD.connected_components(pairs)
        cc_pruned = cc.filter(F.col("comp") != F.col("id")).select(
            F.col("id").alias("doc_id")
        )
    survivors = docs.join(
        cc_pruned.unionAll(exact_pruned), "doc_id", "left_anti"
    )
    with P(rec, "containment_pairs_plan"):
        cont = DD.containment_pairs(survivors, "doc_id", "text", threshold=0.9)
    n = F.count(F.lit(1)).cast("bigint").alias("n")
    with P(rec, "final_union_count"):
        out = (
            docs.agg(n).select(F.lit("raw_docs").alias("stage"), "n")
            .unionAll(
                exact_pruned.agg(n).select(
                    F.lit("exact_dup_pruned").alias("stage"), "n"
                )
            )
            .unionAll(
                survivors.agg(n).select(
                    F.lit("neardedup_survivors").alias("stage"), "n"
                )
            )
            .unionAll(
                cont.agg(n).select(
                    F.lit("containment_pairs_among_survivors").alias("stage"),
                    "n",
                )
            )
        )
        cnt = out.count()
    return cnt


ENTRIES = {
    "dedup_minhash_index_append": mh_append,
    "dedup_minhash_index_delete": mh_delete,
    "text_winnowing_index_delete": win_delete,
    "ann_pq_append_topk": pq_append,
    "dedup_pipeline_containment": containment,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or list(ENTRIES)
    spark = get_spark("exp-crud-phases")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    out: dict[str, list] = {}
    for name in names:
        fn = ENTRIES[name]
        out[name] = []
        for rep in range(reps):
            rec: dict = {"loadavg": round(os.getloadavg()[0], 2)}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            rec["n_rows"] = fn(spark, sf_dir, rec)
            rec["total"] = round(time.time() - t0, 3)
            out[name].append(rec)
            print(f"{name} rep{rep}: {rec}", file=sys.stderr, flush=True)
    payload = {"sf_dir": sf_dir, "reps": reps, "phases": out}
    # partial re-runs must not clobber the full before-split artifact:
    # only write a file when EXP_CRUD_OUT is set explicitly (an r12
    # winnowing-only re-run silently overwrote the committed 5-entry
    # baseline through the old default)
    dest = os.environ.get("EXP_CRUD_OUT")
    if dest:
        with open(dest, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
