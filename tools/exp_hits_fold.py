"""HITS raw-sum checkpoint experiment (r10 review finding): the scalar
L1 normalizer was collected from the UNCHECKPOINTED raw-sum frame, so
its action re-executed the half-round's full send/explode/partial-sum
pipeline, which the half-round's own materialization then executed
again — shuffle stages are not reused across separate jobs. The fix
checkpoints the node-sized raw-sum table first. Cross-host rehearsals
disagreed at sf10 (105.8 pre-fix on a 55 MB/s-disk host vs 122.3
post-fix on a 25 MB/s host), so this pairs both _fold shapes in ONE
session, interleaved, fingerprint-verified:

  vOLD   normalizer collected from the lazy raw-sum frame (each
         half-round's edge pipeline runs twice)
  vCKPT  shipped: raw-sum localCheckpoint(eager) before the scalar
         collect; checkpoint released per half-round

Usage: python tools/exp_hits_fold.py OUT.json [SF_DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators._iterloop import adjacency_cache
from lrmr_spark.operators.graph import _KEEP_BCAST_MAX, hits_ppm
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

ITERATIONS = 2


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    return li.select(o.alias("src"), p.alias("dst")).distinct()


def _hits_old(edges, iterations=ITERATIONS):
    """The pre-fix shape: lazy raw-sum, normalizer re-executes it."""
    raw = (
        edges.select("src", "dst")
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .localCheckpoint(eager=True)
    )
    adj_out, _ = adjacency_cache(raw, key="src", neighbor="dst")
    adj_in, _ = adjacency_cache(raw, key="dst", neighbor="src")
    nodes = (
        raw.select(F.col("src").alias("node"))
        .unionAll(raw.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    raw.unpersist()
    n_nodes = nodes.count()
    small = n_nodes <= _KEEP_BCAST_MAX
    tp = 1_000_000 // max(n_nodes, 1)
    scores = nodes.select(
        "node",
        F.lit(tp).cast("long").alias("auth_ppm"),
        F.lit(tp).cast("long").alias("hub_ppm"),
    ).localCheckpoint(eager=True)

    def _fold(adj, key_col, score_col, out_col, cur):
        c = F.broadcast(cur) if small else cur
        sends = adj.join(c, adj[key_col] == c.node).select(
            "_nbrs", F.col(score_col).alias("_s")
        )
        raw_scores = (
            sends.select(F.explode("_nbrs").alias("node"), "_s")
            .groupBy("node")
            .agg(F.sum("_s").alias("_raw"))
        )
        total = int(
            raw_scores.agg(
                F.coalesce(F.sum("_raw"), F.lit(0)).alias("t")
            ).collect()[0]["t"]
        )
        if small:
            raw_scores = F.broadcast(raw_scores)
        return nodes.join(raw_scores, "node", "left").select(
            "node",
            F.expr(
                f"CAST(coalesce(_raw, 0) * 1000000 DIV {max(total, 1)} "
                "AS BIGINT)"
            ).alias(out_col),
        )

    for _ in range(iterations):
        auth = _fold(
            adj_out, "src", "hub_ppm", "auth_ppm", scores
        ).localCheckpoint(eager=True)
        hub = _fold(adj_in, "dst", "auth_ppm", "hub_ppm", auth)
        new_scores = (
            auth.join(hub, "node").select("node", "auth_ppm", "hub_ppm")
        ).localCheckpoint(eager=True)
        scores.unpersist()
        auth.unpersist()
        scores = new_scores
    adj_out.unpersist()
    adj_in.unpersist()
    nodes.unpersist()
    return scores


ARMS = {
    "vOLD": lambda s, d: _hits_old(_edges(s, d)),
    "vCKPT": lambda s, d: hits_ppm(_edges(s, d), iterations=ITERATIONS),
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
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/repo/.scratch/sf10"
    spark = get_spark("exp-hits-fold")
    import hostcal

    cal = hostcal.host_cal(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    tag = os.path.basename(os.path.normpath(sf_dir))
    golden = None
    for name, fn in ARMS.items():
        fp = _fingerprint(fn(spark, sf_dir))
        print(f"{name} @ {tag}: fp={fp}", file=sys.stderr, flush=True)
        if golden is None:
            golden = fp
        elif fp != golden:
            raise AssertionError(f"{name} diverges at {tag}")
    results: dict[str, dict] = {}
    for rep in range(reps):
        for name, fn in ARMS.items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            sec = round(time.time() - t0, 3)
            rec = results.setdefault(name, {"runs": []})
            rec["runs"].append(sec)
            rec["min_sec"] = min(rec["runs"])
            print(f"{name} @ {tag} rep{rep}: {sec}", file=sys.stderr,
                  flush=True)
    payload = {
        "experiment": "HITS raw-sum checkpoint vs lazy normalizer (r10 review fix)",
        "sf_dir": sf_dir,
        "iterations": ITERATIONS,
        "protocol": (
            "1 fingerprint verify pass per arm (equality asserted, also "
            f"warms), then {reps} interleaved timed rounds; min recorded"
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "arms": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
