"""label_propagation vote-path exchange fusion experiment (r11 opt
round): the shipped loop's vote path runs TWO shuffles per round —
`groupBy(nd, label).count()` (exchange on (nd, label)) feeding
`groupBy(nd).max(struct(c, -label))` (exchange on nd; partitioning by
(nd, label) is NOT a subset of {nd}, so Catalyst must re-exchange).
Two candidate fusions, both keyed by the minhash `_FUSE_REPS_EXCHANGE`
lesson (HashPartitioning(k) satisfies every groupBy whose keys ⊇ {k}):

  v0_shipped  operators.graph.label_propagation as shipped
  vF_repart   explode → repartition(n_part, "nd") → groupBy(nd, label)
              → groupBy(nd) argmax: ONE exchange of RAW vote rows; the
              count and the argmax both run exchange-free on top of
              it. Trades the map-side partial count (which reduces
              nothing in round 1 — distinct labels make every
              (nd, label) pair unique) for the deleted second
              exchange.
  vM_mode     groupBy(nd).agg(mode(label, true)): Spark 4's
              deterministic mode aggregate (ties → smallest value,
              exactly the min-label contract) — ONE exchange whose
              partial state is the per-nd label→count map, wire bytes
              ≈ the shipped first exchange, second exchange deleted.
              Risk probed here: ObjectHashAggregate falls back to
              sort-based past 128 distinct groups per task.

All variants must produce identical (node, label) results — verified
via a JVM-side xxhash64 fingerprint (pitfall 24: never collect
multi-million-row results on a timed path) before any timing.

Usage: python tools/exp_lpa_fusion.py OUT.json SF_DIR [SF_DIR...] \
           [--variants v0_shipped,vF_repart,vM_mode]
Protocol: per dir, interleaved reps (1 warm+verify, then 2 timed per
variant, alternating order), min-of-2 recorded, loadavg bracketed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators._iterloop import adjacency_cache, state_adjacency_join
from lrmr_spark.operators.graph import _KEEP_BCAST_MAX, label_propagation
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


def _lpa_variant(edges, mode_agg: bool, pin_n: bool = True):
    """The shipped adjacency-cache loop with the vote path fused to a
    single exchange; `mode_agg` selects vM_mode over vF_repart.
    ``pin_n=False`` repartitions by nd WITHOUT a pinned partition
    count, leaving the count to spark.sql.shuffle.partitions + AQE
    (the scale-adaptive form a 100 TB deployment wants)."""
    spark = edges.sparkSession
    adj, _ = adjacency_cache(edges.select("src", "dst"))
    labels = (
        adj.select(F.col("src").alias("node"))
        .unionAll(adj.select(F.explode("_nbrs").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    small = labels.count() <= _KEEP_BCAST_MAX
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for _ in range(ITERATIONS):
        raw = state_adjacency_join(
            adj, None, labels, "src", broadcast_state=small
        ).select(F.explode("_nbrs").alias("nd"), "label")
        if mode_agg:
            argmax = raw.groupBy(F.col("nd").alias("node")).agg(
                F.expr("mode(label, true)").cast("long").alias("_vl")
            )
        else:
            part = (
                raw.repartition(n_part, "nd") if pin_n else raw.repartition("nd")
            )
            votes = part.groupBy("nd", "label").agg(
                F.count(F.lit(1)).alias("c")
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
    adj.unpersist()
    return labels


VARIANTS = {
    "v0_shipped": lambda e: label_propagation(e, iterations=ITERATIONS),
    "vF_repart": lambda e: _lpa_variant(e, mode_agg=False),
    "vF2_noN": lambda e: _lpa_variant(e, mode_agg=False, pin_n=False),
    "vM_mode": lambda e: _lpa_variant(e, mode_agg=True),
}


def _fingerprint(df):
    h = F.hash("node", "label").cast("long")
    row = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h").alias("s")
    ).collect()[0]
    return (row["n"], row["s"])


def main() -> None:
    out_path = sys.argv[1]
    dirs = [a for a in sys.argv[2:] if not a.startswith("--")]
    names = list(VARIANTS)
    n_reps = 2
    for a in sys.argv[2:]:
        if a.startswith("--variants"):
            names = a.split("=", 1)[1].split(",")
        elif a.startswith("--reps"):
            n_reps = int(a.split("=", 1)[1])
    spark = get_spark("lrmr-exp-lpa-fusion")
    out = {"variants": names, "iterations": ITERATIONS, "dirs": {}}
    for d in dirs:
        rec = {"loadavg_start": [round(x, 2) for x in os.getloadavg()]}
        fps = {}
        for v in names:
            res = VARIANTS[v](_edges(spark, d))
            fps[v] = tuple(_fingerprint(res))
            res.unpersist()
        base = fps[names[0]]
        for v in names[1:]:
            if fps[v] != base:
                raise SystemExit(
                    f"variant {v} fingerprint {fps[v]} != {names[0]} {base} on {d}"
                )
        rec["fingerprint"] = list(base)
        times = {v: [] for v in names}
        for rep in range(n_reps):
            order = names if rep % 2 == 0 else list(reversed(names))
            for v in order:
                spark.sparkContext.setJobDescription(f"lpa_fusion:{v}:{d}")
                t0 = time.time()
                res = VARIANTS[v](_edges(spark, d))
                res.count()
                times[v].append(round(time.time() - t0, 3))
                res.unpersist()
                spark.sparkContext.setJobDescription(None)
        rec["sec"] = {v: times[v] for v in names}
        rec["min_sec"] = {v: min(times[v]) for v in names}
        rec["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        out["dirs"][d] = rec
        print(json.dumps({d: rec}), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
