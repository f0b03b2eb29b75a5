"""label_propagation working-set experiment (r8): the shipped loop
localCheckpoints the EDGE frame (row-serialized — the same disk cliff
kcore_peel escaped in r7 by switching to the columnar cache) and lets
every round's edges⋈labels join re-exchange the edge list (above the
broadcast gate both sides of the sort-merge join shuffle). The edge
frame is STATIC across rounds — its lineage never grows — so the
pitfall-20 lineage argument for checkpointing does not apply to it.

  v0_shipped  operators.graph.label_propagation as shipped
  vA_persist  edges persist(MEMORY_AND_DISK) instead of localCheckpoint
              (columnar dict/RLE cache vs row-serialized blocks)
  vB_copart   vA + edges hash-repartitioned by src ONCE before caching:
              the cached frame's outputPartitioning satisfies the
              join's distribution requirement, so each round's join
              exchanges ONLY the node-sized label table — one upfront
              edge shuffle buys back one edge-sized exchange per round

All variants must return identical (node, label) rows (verified before
timing; the operator is deterministic by construction).

Usage: python tools/exp_lpa.py OUT.json SF_DIR [SF_DIR...] \
           [--variants v0_shipped,vB_copart]
Protocol: 1 warm+verify + 2 timed per variant per dir, min recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lrmr_spark.operators.graph import _KEEP_BCAST_MAX, label_propagation
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

ITERATIONS = 3
_LVL = StorageLevel.MEMORY_AND_DISK


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    return fwd.unionAll(rev)


def _lpa_loop(edges, copartition: bool):
    """vA (copartition=False) / vB (copartition=True): the shipped loop
    with the edge frame on the columnar cache."""
    spark = edges.sparkSession
    if copartition:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        edges = edges.select("src", "dst").repartition(n_part, "src")
    else:
        edges = edges.select("src", "dst")
    edges = edges.persist(_LVL)
    labels = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    small = labels.count() <= _KEEP_BCAST_MAX
    for _ in range(ITERATIONS):
        lbl = F.broadcast(labels) if small else labels
        votes = (
            edges.join(lbl, edges.src == lbl.node)
            .groupBy(F.col("dst").alias("nd"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        argmax = votes.groupBy(F.col("nd").alias("node")).agg(
            (-F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl")))["nl"])
            .cast("long")
            .alias("_vl")
        )
        if small:
            argmax = F.broadcast(argmax)
        new_labels = (
            labels.join(argmax, "node", "left")
            .select(
                "node", F.coalesce(F.col("_vl"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        labels.unpersist()
        labels = new_labels
    edges.unpersist()
    return labels


def v0_shipped(spark, sf_dir):
    return label_propagation(_edges(spark, sf_dir), iterations=ITERATIONS).collect()


def vA_persist(spark, sf_dir):
    return _lpa_loop(_edges(spark, sf_dir), copartition=False).collect()


def vB_copart(spark, sf_dir):
    return _lpa_loop(_edges(spark, sf_dir), copartition=True).collect()


VARIANTS = [
    ("v0_shipped", v0_shipped),
    ("vA_persist", vA_persist),
    ("vB_copart", vB_copart),
]


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    only: set[str] | None = None
    if "--variants" in args:
        i = args.index("--variants")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    dirs = args or ["/root/repo/.scratch/sf1"]
    spark = get_spark("exp-lpa")
    import hostcal

    cal = hostcal.host_cal(spark)  # self-describing artifact (r8 task 8)
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    variants = [(n, f) for n, f in VARIANTS if only is None or n in only]
    for sf_dir in dirs:
        tag = os.path.basename(os.path.normpath(sf_dir))
        golden = None
        for name, fn in variants:
            rows = sorted(map(tuple, fn(spark, sf_dir)))
            if golden is None:
                golden = rows
            elif rows != golden:
                raise AssertionError(
                    f"{name} diverges from the first variant at {tag}"
                )
            secs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir)
                secs.append(round(time.time() - t0, 3))
            results.setdefault(name, {})[tag] = {
                "min_sec": min(secs), "runs": secs, "n_rows": len(rows),
            }
            print(f"{name} @ {tag}: {secs}", file=sys.stderr, flush=True)
    payload = {
        "experiment": "label_propagation edge working set (r8)",
        "iterations": ITERATIONS,
        "protocol": "per variant per dir: 1 warm+verify + 2 timed, min recorded",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "variants": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
