"""Measure the per-round eager localCheckpoint's cost in
pagerank_ppm's SMALL (broadcast-gate) regime at the declared 3
iterations — is it load-bearing or pure job overhead there?

v0 = the shipped fast path (per-round localCheckpoint(eager) +
unpersist, exactly operators/graph.pagerank_ppm).
v1 = identical arithmetic with NO intermediate checkpoints: rounds
stay lazy (each round's broadcast materializes the chain as part of
the one final job), only the RETURNED ranks checkpoint — the plan is
3 levels deep at the declared iteration count, far from the pitfall-12
blowup regime the per-round checkpoint guards in the large/unbounded
case.

Ranks are exact integer ppm, so both arms must be bit-identical —
fingerprint (count + bit_xor over (node, rank_ppm)) asserted before
timing. Timed unit = pagerank over the pre-checkpointed edge frame
(the catalog entry's order<->part bipartite graph). Interleaved,
min-of-N.

Usage: python tools/exp_pagerank_ckpt.py OUT.json [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators._iterloop import adjacency_cache, state_adjacency_join
from lrmr_spark.operators.graph import _KEEP_BCAST_MAX, pagerank_ppm
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def v1_lazy_rounds(edges, iterations=3, damping_pct=85):
    """pagerank_ppm's fast path, arithmetic verbatim, intermediate
    checkpoints removed (final result still checkpoints)."""
    adj, n_nodes = adjacency_cache(edges)
    small = n_nodes <= _KEEP_BCAST_MAX
    teleport = 1_000_000 // max(n_nodes, 1)
    keep = 100 - damping_pct
    ranks = adj.select(F.col("src").alias("node")).withColumn(
        "rank_ppm", F.lit(teleport).cast("long")
    )
    for _ in range(iterations):
        sends = state_adjacency_join(
            adj, None, ranks, "src", broadcast_state=small
        ).select("_nbrs", F.expr("rank_ppm DIV outdeg").alias("c"))
        contribs = sends.select(F.explode("_nbrs").alias("node"), "c")
        incoming = contribs.groupBy("node").agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("_inc")
        )
        ranks = incoming.select(
            "node",
            F.expr(
                f"CAST(({keep} * {teleport} + {damping_pct} * _inc) "
                "DIV 100 AS BIGINT)"
            ).alias("rank_ppm"),
        )
    out = ranks.localCheckpoint(eager=True)
    adj.unpersist()
    return out


ARMS = {
    "v0_per_round_ckpt": lambda e: pagerank_ppm(e, iterations=3, damping_pct=85),
    "v1_lazy_rounds": v1_lazy_rounds,
}


def fingerprint(ranks):
    r = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(node, rank_ppm))").alias("s"),
    ).collect()[0]
    return (r["n"], r["s"])


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("exp-pagerank-ckpt")
    spark.range(1000).selectExpr("sum(id)").collect()
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    edges = fwd.unionAll(rev).localCheckpoint(eager=True)

    fps = {}
    for arm, fn in ARMS.items():
        r = fn(edges)
        fps[arm] = fingerprint(r)
        r.unpersist()
    if fps["v0_per_round_ckpt"] != fps["v1_lazy_rounds"]:
        raise SystemExit(f"fingerprint mismatch: {fps}")

    out = {
        "sf_dir": sf_dir,
        "fingerprint": list(fps["v1_lazy_rounds"]),
        "loadavg_start": round(os.getloadavg()[0], 2),
    }
    times = {a: [] for a in ARMS}
    for rep in range(n_reps):
        order = list(ARMS) if rep % 2 == 0 else list(reversed(ARMS))
        for arm in order:
            spark.sparkContext.setJobDescription(f"pr_ckpt:{arm}")
            t0 = time.time()
            r = ARMS[arm](edges)
            times[arm].append(round(time.time() - t0, 3))
            r.unpersist()
            spark.sparkContext.setJobDescription(None)
    out["sec"] = times
    out["min_sec"] = {a: min(t) for a, t in times.items()}
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["min_sec"]))


if __name__ == "__main__":
    main()
