"""HITS per-round profile experiment (r10 VERDICT task 2): hits_ppm's
sf10 scale ratio (9.1 at 10× data, BENCH_r10_newops2.json) was the
graph family's weakest, measured on a session whose loadavg climbed
3→21 — no quiet-host anchor exists and the per-round cost (2 SMJs + 2
shuffles + 2 scalar collects + 4 localCheckpoints + 1 node join) was
never profiled the way pagerank's was. This pairs, in ONE session,
interleaved, fingerprint-verified:

  vSHIP   shipped: auth fold into nodes (ckpt), hub fold into nodes,
          then a separate auth⋈hub join checkpointed as the round's
          scores — 4 checkpoints + 5 node-sized joins per round
  vFUSE   the hub fold folds into the AUTH table instead of nodes, so
          its output IS the round's (node, auth, hub) scores — the
          separate auth⋈hub join disappears: 4 ckpt + 4 joins
  vLAZY   vFUSE with the intermediate auth table left LAZY (it derives
          from the CHECKPOINTED a_raw by one node-sized left join, so
          re-evaluating it twice — once as the hub fold's score source,
          once as its fold base — re-runs only that join, never the
          edge pipeline): 3 ckpt + 4 joins, the "drop one of the 4
          per-round checkpoints" arm
  vHYB    regime-split: auth checkpointed only under the broadcast
          gate (small graphs — there the lazy shape rebuilds a
          node-sized BROADCAST twice, the expensive part), lazy above
          it (large graphs — there the checkpoint WRITE of a
          corpus-sized table is the expensive part; the two lazy
          evaluations are plain SMJs)

Usage: python tools/exp_hits_r11.py OUT.json [SF_DIR] [--reps N]

HISTORICAL NOTE: this experiment decided the r11 ship — vFUSE won the
4-arm sf10 session (79.7 s min-of-2 vs vSHIP 125.8, lazy arms within
cross-session noise) and hits_ppm now IS the fused shape, so the
vSHIP arm no longer reproduces the r10 code: rerunning pairs the
fused shape against itself plus the (rejected) lazy variants.
EXP_HITS_R11*.json hold the decisive pre-ship runs.
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


def _hits_variant(edges, iterations=ITERATIONS, lazy_auth=False, hybrid=False):
    """The fused shape: hub fold lands on the auth table directly."""
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
    if hybrid:
        lazy_auth = not small
    tp = 1_000_000 // max(n_nodes, 1)
    scores = nodes.select(
        "node",
        F.lit(tp).cast("long").alias("auth_ppm"),
        F.lit(tp).cast("long").alias("hub_ppm"),
    ).localCheckpoint(eager=True)

    def _fold(adj, key_col, score_col, out_col, cur, base):
        c = F.broadcast(cur) if small else cur
        sends = adj.join(c, adj[key_col] == c.node).select(
            "_nbrs", F.col(score_col).alias("_s")
        )
        raw_scores = (
            sends.select(F.explode("_nbrs").alias("node"), "_s")
            .groupBy("node")
            .agg(F.sum("_s").alias("_raw"))
            .localCheckpoint(eager=True)
        )
        total = int(
            raw_scores.agg(
                F.coalesce(F.sum("_raw"), F.lit(0)).alias("t")
            ).collect()[0]["t"]
        )
        rs = F.broadcast(raw_scores) if small else raw_scores
        keep = [c2 for c2 in base.columns if c2 != out_col]
        folded = base.join(rs, "node", "left").select(
            *keep,
            F.expr(
                f"CAST(coalesce(_raw, 0) * 1000000 DIV {max(total, 1)} "
                "AS BIGINT)"
            ).alias(out_col),
        )
        return folded, raw_scores

    for _ in range(iterations):
        auth_l, a_raw = _fold(
            adj_out, "src", "hub_ppm", "auth_ppm", scores, nodes
        )
        auth = auth_l if lazy_auth else auth_l.localCheckpoint(eager=True)
        # fused: fold hubs into the auth table — its output IS the
        # round's scores, no separate auth⋈hub join
        hub_l, h_raw = _fold(adj_in, "dst", "auth_ppm", "hub_ppm", auth, auth)
        new_scores = hub_l.select(
            "node", "auth_ppm", "hub_ppm"
        ).localCheckpoint(eager=True)
        a_raw.unpersist()
        h_raw.unpersist()
        scores.unpersist()
        if not lazy_auth:
            auth.unpersist()
        scores = new_scores
    adj_out.unpersist()
    adj_in.unpersist()
    nodes.unpersist()
    return scores


ARMS = {
    "vSHIP": lambda s, d: hits_ppm(_edges(s, d), iterations=ITERATIONS),
    "vFUSE": lambda s, d: _hits_variant(_edges(s, d)),
    "vLAZY": lambda s, d: _hits_variant(_edges(s, d), lazy_auth=True),
    "vHYB": lambda s, d: _hits_variant(_edges(s, d), hybrid=True),
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
    spark = get_spark("exp-hits-r11")
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
        "experiment": (
            "HITS fused final join + dropped auth checkpoint vs shipped "
            "(r11 task 2); also the quiet-host anchor run"
        ),
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
