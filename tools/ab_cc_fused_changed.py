"""A/B for fusing connected_components' per-round convergence check
into the round's aggregate: the shipped hashmin loop runs TWO actions
per round (the label checkpoint, then a new-vs-old JOIN for the
changed count); the fused form tags the old label through the same
groupBy-min (_old = max of the single old row, NULL on neighbor rows)
so `changed` becomes a filter-count over the just-checkpointed cache —
no join, no second exchange.

Labels are fingerprint-asserted identical between arms before timing
on both inputs: the real near-dup pair shape (minhash pairs at the
given SF) and the contract clique shape (K-cliques at ~2M nodes,
HashMin's documented sweet spot: 2 rounds + 1 confirm).

Usage: python tools/ab_cc_fused_changed.py OUT.json [sf_dir] [reps] [clique_nodes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import lrmr_spark.operators.dedup as DD
from lrmr_spark.operators._iterloop import adjacency_cache, state_adjacency_join
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def v0_shipped(pairs, max_iter=25):
    """The shipped hashmin body, verbatim (hub_safe=False path)."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj, _ = adjacency_cache(both, key="dst", neighbor="src")
    labels = (
        adj.select(F.col("dst").alias("id"))
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = state_adjacency_join(
            adj, None, labels, "dst", state_key="id"
        ).select(F.explode("_nbrs").alias("id"), "comp")
        new = (
            labels.unionByName(nbr_min)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    adj.unpersist()
    return labels


def v1_fused(pairs, max_iter=25):
    """Same arithmetic; the old label rides the aggregate so the
    convergence count is a cache-only filter, no join."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj, _ = adjacency_cache(both, key="dst", neighbor="src")
    ckpt = (
        adj.select(F.col("dst").alias("id"))
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    labels = ckpt
    for _ in range(max_iter):
        nbr_min = state_adjacency_join(
            adj, None, labels, "dst", state_key="id"
        ).select(
            F.explode("_nbrs").alias("id"),
            F.col("comp"),
            F.lit(None).cast("long").alias("_old"),
        )
        tagged = labels.select("id", "comp", F.col("comp").alias("_old"))
        new = (
            tagged.unionByName(nbr_min)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"), F.max("_old").alias("_old"))
        ).localCheckpoint(eager=True)
        changed = new.filter(F.col("comp") != F.col("_old")).count()
        ckpt.unpersist()
        ckpt = new
        labels = new.select("id", "comp")
        if changed == 0:
            break
    adj.unpersist()
    return labels


ARMS = {"v0_join_changed": v0_shipped, "v1_fused_changed": v1_fused}


def fingerprint(labels):
    r = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(id, comp))").alias("s"),
    ).collect()[0]
    return (r["n"], r["s"])


def clique_pairs(spark, n_nodes, k=5):
    """K-cliques over n_nodes: all intra-clique pairs (the EXP_CC_CLIQUES
    contract shape, scaled)."""
    ids = spark.range(n_nodes).select(
        F.col("id"), (F.col("id") / k).cast("long").alias("_c"),
        (F.col("id") % k).alias("_j"),
    )
    l = ids.alias("l")
    r = ids.alias("r")
    return (
        l.join(r, (F.col("l._c") == F.col("r._c")) & (F.col("l._j") < F.col("r._j")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_clique = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000_000
    spark = get_spark("ab-cc-fused-changed")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = load(spark, sf_dir, "documents")
    inputs = {
        "minhash_pairs": DD.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=16, bands=2, threshold=0.9
        ),
        f"cliques_{n_clique}": clique_pairs(spark, n_clique).localCheckpoint(
            eager=True
        ),
    }
    out = {"sf_dir": sf_dir, "inputs": {}}
    for tag, pairs in inputs.items():
        fps = {}
        for arm, fn in ARMS.items():
            lab = fn(pairs)
            fps[arm] = fingerprint(lab)
            lab.unpersist()
        if fps["v0_join_changed"] != fps["v1_fused_changed"]:
            raise SystemExit(f"fingerprint mismatch on {tag}: {fps}")
        rec = {
            "fingerprint": list(fps["v1_fused_changed"]),
            "loadavg_start": round(os.getloadavg()[0], 2),
        }
        times = {a: [] for a in ARMS}
        for rep in range(n_reps):
            order = list(ARMS) if rep % 2 == 0 else list(reversed(ARMS))
            for arm in order:
                spark.sparkContext.setJobDescription(f"cc_fused:{arm}:{tag}")
                t0 = time.time()
                lab = ARMS[arm](pairs)
                times[arm].append(round(time.time() - t0, 3))
                lab.unpersist()
                spark.sparkContext.setJobDescription(None)
        rec["sec"] = times
        rec["min_sec"] = {a: min(t) for a, t in times.items()}
        rec["loadavg_end"] = round(os.getloadavg()[0], 2)
        out["inputs"][tag] = rec
        print(json.dumps({tag: rec["min_sec"]}), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
