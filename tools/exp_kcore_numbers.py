"""kcore_numbers sweep-schedule experiment (r7 verdict task 5): the
per-level peel re-keys the edge list once per sweep, and at the shipped
k_max=4 / rounds_per_k=2 schedule roughly half of the 8 sweeps are pure
CONFIRMATIONS (a level's last sweep, plus every level whose threshold
removes nothing). Variants:

  v0_r7       frozen replica of the r7-shipped loop: keep-set semi-joins
              every sweep, fixed point detected AFTER materializing the
              identical edge frame (the 195 s sf10 baseline)
  v1_precheck v0 + identity-sweep precheck: keep.count() on the
              checkpointed node-sized degree table proves "no node below
              threshold" == "no edge removed", so confirmation sweeps
              cost a node agg instead of an edge-frame materialization
  v2_removedpref v1 + removed-set PREFERENCE: whenever the removed side
              is smaller (and under _KEEP_BCAST_MAX), filter both
              endpoints with a broadcast ANTI-join against it instead
              of broadcasting the larger keep set. MEASURED AND
              REJECTED as the under-gate strategy: sf10 improved
              112.6 → 103.7 s (the anti replaces two full edge
              shuffles once keep exceeds the gate) but sf1 regressed
              20.2 → 56.2 s on stable back-to-back runs — under the
              gate the keep semi-join is the faster plan even when
              removed is smaller.
  v3_hybrid   the r8-SHIPPED gating (imported from operators.graph):
              keep-semi broadcast while prev_nodes <= gate (the sf1
              regime), removed-anti broadcast only when keep exceeds
              the gate but removed does not (the sf10 regime), shuffle
              semi otherwise — dominates both columns.

All variants return identical rows (asserted per dir before timing).

Usage: python tools/exp_kcore_numbers.py OUT.json SF_DIR [SF_DIR...] \
           [--variants v0_r7,v3_hybrid]
Protocol: per variant per dir, 1 warm + 2 timed runs, min recorded
(the bench_scale discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lrmr_spark.operators.graph import _KEEP_BCAST_MAX, kcore_numbers
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

K_MAX, ROUNDS_PER_K = 4, 2
_LVL = StorageLevel.MEMORY_AND_DISK


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    return fwd.unionAll(rev)


def _core_loop(edges, precheck: bool, removed_pref: bool = False):
    """v0 (precheck=False) / v1 (precheck=True): the r7 loop shape with
    keep-set semi-joins; v1 adds only the identity-sweep precheck;
    removed_pref=True is v2 (prefer the removed-side anti-join whenever
    removed is the smaller broadcastable side)."""
    e = edges.select("src", "dst").persist(_LVL)
    cores = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("core", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )

    def _deg(edge_df):
        return (
            edge_df.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .localCheckpoint(eager=True)
        )

    deg = _deg(e)
    seed = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
    ).collect()[0]
    prev_nodes, prev_edges = int(seed["n"]), int(seed["m"])
    for k in range(1, K_MAX + 1):
        for _ in range(ROUNDS_PER_K):
            keep = deg.filter(F.col("_d") >= k).select("src")
            keep_cnt = keep.count() if precheck else None
            if precheck and keep_cnt == prev_nodes:
                break
            if (
                removed_pref
                and keep_cnt is not None
                and (removed := prev_nodes - keep_cnt) <= _KEEP_BCAST_MAX
                and removed <= keep_cnt
            ):
                rem = F.broadcast(deg.filter(F.col("_d") < k).select("src"))
                e_new = (
                    e.join(rem, "src", "left_anti")
                    .join(
                        rem.select(F.col("src").alias("dst")), "dst", "left_anti"
                    )
                    .select("src", "dst")
                    .persist(_LVL)
                )
            else:
                if prev_nodes <= _KEEP_BCAST_MAX:
                    keep = F.broadcast(keep)
                e_new = (
                    e.join(keep, "src", "left_semi")
                    .join(
                        keep.select(F.col("src").alias("dst")), "dst", "left_semi"
                    )
                    .select("src", "dst")
                    .persist(_LVL)
                )
            deg_new = _deg(e_new)
            st = deg_new.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
            ).collect()[0]
            n_nodes, n_edges = int(st["n"]), int(st["m"])
            e.unpersist()
            deg.unpersist()
            e, deg = e_new, deg_new
            if not precheck and n_edges == prev_edges:
                prev_nodes = n_nodes
                break
            prev_nodes, prev_edges = n_nodes, n_edges
        survivors = deg.select(F.col("src").alias("node")).withColumn(
            "_k", F.lit(int(k))
        )
        cores_new = (
            cores.join(survivors, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_k"), F.col("core")).cast("int").alias("core"),
            )
            .localCheckpoint(eager=True)
        )
        cores.unpersist()
        cores = cores_new
    e.unpersist()
    deg.unpersist()
    return cores


def v0_r7(spark, sf_dir):
    return _core_loop(_edges(spark, sf_dir), precheck=False).collect()


def v1_precheck(spark, sf_dir):
    return _core_loop(_edges(spark, sf_dir), precheck=True).collect()


def v2_removedpref(spark, sf_dir):
    return _core_loop(
        _edges(spark, sf_dir), precheck=True, removed_pref=True
    ).collect()


def v3_hybrid(spark, sf_dir):
    return kcore_numbers(
        _edges(spark, sf_dir), k_max=K_MAX, rounds_per_k=ROUNDS_PER_K
    ).collect()


VARIANTS = [
    ("v0_r7", v0_r7),
    ("v1_precheck", v1_precheck),
    ("v2_removedpref", v2_removedpref),
    ("v3_hybrid", v3_hybrid),
]


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    only: set[str] | None = None
    if "--variants" in args:
        i = args.index("--variants")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    dirs = args or ["/root/testdata/sf1"]
    spark = get_spark("exp-kcore-numbers")
    import hostcal

    cal = hostcal.host_cal(spark)  # self-describing artifact (r8 task 8)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    results: dict[str, dict] = {}
    variants = [(n, f) for n, f in VARIANTS if only is None or n in only]
    for sf_dir in dirs:
        tag = os.path.basename(os.path.normpath(sf_dir))
        golden = None
        for name, fn in variants:
            rows = sorted(map(tuple, fn(spark, sf_dir)))  # warm + verify
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
        "experiment": "kcore_numbers sweep schedule (r8)",
        "k_max": K_MAX,
        "rounds_per_k": ROUNDS_PER_K,
        "protocol": "per variant per dir: 1 warm+verify run + 2 timed, min recorded",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "variants": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
