"""Adjacency working-set generalization (r9): EXP_PAGERANK_SF10.json
measured the adjacency-list layout 1.7× over the copartitioned flat
edge cache for pagerank_ppm (37.9 vs 64.6 s paired at sf10). LPA and
HashMin connected_components run the SAME per-round shape — static
edge frame ⋈ node-sized table on the edge key, project per-edge rows,
aggregate by the other endpoint — so the lesson should transfer; this
measures it per operator before anything ships (the EXP_SHJ
discipline: the SHUFFLE_HASH hint also "obviously" transferred, and
inverted at sf10).

  lpa/v0_shipped      label_propagation as shipped (flat copartitioned
                      cache above the gate)
  lpa/vADJ            adjacency (src, nbrs[]) cache; labels node set
                      derived FROM the cache (src ∪ explode(nbrs)) so
                      the raw-edge checkpoint disappears; per round the
                      SMJ streams node-count rows, explode feeds the
                      (dst, label) count partial-agg in-stage
  hashmin/v0_shipped  connected_components as shipped (flat cache
                      copartitioned by dst above _CC_SHJ_MIN)
  hashmin/vADJ        adjacency keyed by dst ((dst, srcs[])); the
                      initial label table is the adjacency KEY SET
                      (already distinct — the edge-count distinct()
                      pass disappears too)

All variants of an operator must return identical rows (verified via
an order-independent JVM-side fingerprint before timing; LPA and
HashMin are deterministic by construction).

HISTORICAL NOTE: the measured pairs in EXP_ADJ_FAMILY.json ran with
the r8 operators (flat copartitioned caches, before commit "Ship the
adjacency working set for LPA and HashMin"); both adjacency arms won
and SHIPPED, so a re-run's v0_shipped now measures the adjacency loop
against itself.

Usage: python tools/exp_adj_family.py OUT.json SF_DIR [SF_DIR...] \
           [--ops lpa,hashmin] [--reps N]
Protocol: per dir, 1 fingerprint verify pass per variant (also warms),
then N interleaved timed rounds (A,B,A,B,…) timing a count() action;
min recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators._iterloop import adjacency_cache
from lrmr_spark.operators.dedup import connected_components
from lrmr_spark.operators.graph import label_propagation
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

ITERATIONS = 3


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    return fwd.unionAll(rev)


def _pairs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    return li.select(o.alias("id_a"), p.alias("id_b")).distinct()


def _lpa_adj(edges, iterations=ITERATIONS):
    adj, _ = adjacency_cache(edges)
    labels = (
        adj.select(F.col("src").alias("node"))
        .unionAll(adj.select(F.explode("_nbrs").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        votes = (
            adj.join(labels, adj.src == labels.node)
            .select(F.explode("_nbrs").alias("nd"), "label")
            .groupBy("nd", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        argmax = votes.groupBy(F.col("nd").alias("node")).agg(
            (-F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl")))["nl"])
            .cast("long")
            .alias("_vl")
        )
        new_labels = (
            labels.join(argmax, "node", "left")
            .select(
                "node", F.coalesce(F.col("_vl"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        labels.unpersist()
        labels = new_labels
    adj.unpersist()
    return labels


def _hashmin_adj(pairs, max_iter: int = 25):
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # keyed by dst: labels arrive keyed by id == dst
    adj, _ = adjacency_cache(both, key="dst", neighbor="src")
    labels = (
        adj.select(F.col("dst").alias("id"))
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = adj.join(labels, adj.dst == labels.id).select(
            F.explode("_nbrs").alias("id"), "comp"
        )
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


OPS = {
    "lpa": {
        "v0_shipped": lambda s, d: label_propagation(
            _edges(s, d), iterations=ITERATIONS
        ),
        "vADJ": lambda s, d: _lpa_adj(_edges(s, d)),
    },
    "hashmin": {
        "v0_shipped": lambda s, d: connected_components(_pairs(s, d)),
        "vADJ": lambda s, d: _hashmin_adj(_pairs(s, d)),
    },
}


def _fingerprint(df):
    h = F.hash(*[F.col(c) for c in df.columns]).cast("long")
    row = (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("h").alias("s"),
            F.expr("bit_xor(h)").alias("x"),
        )
        .collect()[0]
    )
    return (int(row["n"]), int(row["s"]), int(row["x"]))


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    only_ops, reps = None, 2
    if "--ops" in args:
        i = args.index("--ops")
        only_ops = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    dirs = args or ["/root/repo/.scratch/sf10"]
    spark = get_spark("exp-adj-family")
    import hostcal

    cal = hostcal.host_cal(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    for op, variants in OPS.items():
        if only_ops is not None and op not in only_ops:
            continue
        for sf_dir in dirs:
            tag = os.path.basename(os.path.normpath(sf_dir))
            golden = None
            for name, fn in variants.items():
                fp = _fingerprint(fn(spark, sf_dir))
                print(f"{op}/{name} @ {tag}: fp={fp}", file=sys.stderr,
                      flush=True)
                if golden is None:
                    golden = fp
                elif fp != golden:
                    raise AssertionError(f"{op}/{name} diverges at {tag}")
            for rep in range(reps):
                for name, fn in variants.items():
                    t0 = time.time()
                    fn(spark, sf_dir).count()
                    sec = round(time.time() - t0, 3)
                    rec = results.setdefault(op, {}).setdefault(
                        name, {}
                    ).setdefault(tag, {"runs": []})
                    rec["runs"].append(sec)
                    rec["min_sec"] = min(rec["runs"])
                    print(f"{op}/{name} @ {tag} rep{rep}: {sec}",
                          file=sys.stderr, flush=True)
    payload = {
        "experiment": "adjacency working set generalized to LPA + HashMin (r9)",
        "iterations": ITERATIONS,
        "protocol": (
            "per dir: 1 fingerprint verify pass per variant (equality "
            f"asserted, also warms), then {reps} interleaved timed rounds "
            "timing a count() action; min recorded"
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "ops": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
