"""k-core disk-cliff experiment (r6 verdict task 4): measure three
variants of the per-round working-set materialization against the
shipped kcore_peel at sf1/sf10.

  v0  shipped: localCheckpoint(e[src,dst]) + localCheckpoint(deg)
  vA  packed:  edges packed to ONE bigint (src<<32 | dst) before the
               checkpoint — halves the edge checkpoint bytes; unpack
               is a projection at read
  vB  persist: persist(MEMORY_AND_DISK) + unpersist instead of
               localCheckpoint — the cached COLUMNAR format compresses
               (RLE/dict) far below row-serialized checkpoint blocks,
               so the working set may stay under the page-cache cliff
  vC  keeponly: checkpoint only the FILTERED keep set (deg >= k) —
               smaller probe-side blocks for the two semi-joins; round
               stats come from one extra agg over the e checkpoint

Usage: python tools/exp_kcore.py OUT.json SF_DIR [SF_DIR...]
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

from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

K, ROUNDS = 3, 3


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    return fwd.unionAll(rev)


def v0_shipped(spark, sf_dir):
    from lrmr_spark.operators.graph import kcore_peel

    return kcore_peel(_edges(spark, sf_dir), k=K, rounds=ROUNDS).collect()


def vA_packed(spark, sf_dir):
    # pack (src, dst) into one bigint; node ids here are < 2^31
    pack = (F.col("src") * F.lit(1 << 32) + F.col("dst")).alias("e")
    unpack = lambda df: df.select(  # noqa: E731
        F.expr("e DIV 4294967296").alias("src"),
        (F.col("e") % F.lit(1 << 32)).alias("dst"),
    )
    e = _edges(spark, sf_dir).select(pack).localCheckpoint(eager=True)

    def _deg(packed):
        return (
            unpack(packed)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .localCheckpoint(eager=True)
        )

    def _stats(deg_df):
        row = deg_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
        ).collect()[0]
        return int(row["n"]), int(row["m"])

    out = []
    deg = _deg(e)
    prev_edges = _stats(deg)[1]
    for r in range(1, ROUNDS + 1):
        keep = deg.filter(F.col("_d") >= K).select("src")
        e_new = (
            unpack(e)
            .join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select(pack)
            .localCheckpoint(eager=True)
        )
        deg_new = _deg(e_new)
        e.unpersist()
        deg.unpersist()
        e, deg = e_new, deg_new
        n_nodes, n_edges = _stats(deg)
        out.append((r, n_nodes, n_edges))
        if n_edges == prev_edges:
            out.extend(
                (rr, n_nodes, n_edges) for rr in range(r + 1, ROUNDS + 1)
            )
            break
        prev_edges = n_edges
    e.unpersist()
    deg.unpersist()
    return out


def vB_persist(spark, sf_dir):
    lvl = StorageLevel.MEMORY_AND_DISK
    e = _edges(spark, sf_dir).persist(lvl)

    def _deg(edge_df):
        return (
            edge_df.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .persist(lvl)
        )

    def _stats(deg_df):
        row = deg_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
        ).collect()[0]
        return int(row["n"]), int(row["m"])

    out = []
    deg = _deg(e)
    prev_edges = _stats(deg)[1]
    for r in range(1, ROUNDS + 1):
        keep = deg.filter(F.col("_d") >= K).select("src")
        e_new = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .persist(lvl)
        )
        deg_new = _deg(e_new)
        n, m = (
            deg_new.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
            ).collect()[0]
        )
        n_nodes, n_edges = int(n), int(m)
        e.unpersist()
        deg.unpersist()
        e, deg = e_new, deg_new
        out.append((r, n_nodes, n_edges))
        if n_edges == prev_edges:
            out.extend(
                (rr, n_nodes, n_edges) for rr in range(r + 1, ROUNDS + 1)
            )
            break
        prev_edges = n_edges
    e.unpersist()
    deg.unpersist()
    return out


def vC_keeponly(spark, sf_dir):
    e = _edges(spark, sf_dir).select("src", "dst").localCheckpoint(eager=True)

    def _deg_and_keep(edge_df):
        deg = edge_df.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        row = deg.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
        ).collect()[0]
        keep = (
            deg.filter(F.col("_d") >= K)
            .select("src")
            .localCheckpoint(eager=True)
        )
        return keep, int(row["n"]), int(row["m"])

    out = []
    keep, _, prev_edges = _deg_and_keep(e)
    for r in range(1, ROUNDS + 1):
        e_new = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        keep_new, n_nodes, n_edges = _deg_and_keep(e_new)
        e.unpersist()
        keep.unpersist()
        e, keep = e_new, keep_new
        out.append((r, n_nodes, n_edges))
        if n_edges == prev_edges:
            out.extend(
                (rr, n_nodes, n_edges) for rr in range(r + 1, ROUNDS + 1)
            )
            break
        prev_edges = n_edges
    e.unpersist()
    keep.unpersist()
    return out


_ALL_VARIANTS = {
    "v0_shipped": v0_shipped,
    "vA_packed": vA_packed,
    "vB_persist": vB_persist,
    "vC_keeponly": vC_keeponly,
}
_SEL = os.environ.get("KCORE_VARIANTS", ",".join(_ALL_VARIANTS))
# vD registers below; unknown names here are re-resolved after it
VARIANTS = {k: _ALL_VARIANTS[k] for k in _SEL.split(",") if k in _ALL_VARIANTS}


def main():
    out_path = sys.argv[1]
    dirs = sys.argv[2:]
    spark = get_spark("kcore-exp")
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict = {"protocol": "1 warm + 2 timed, min; one session", "dirs": {}}
    answers: dict = {}
    for d in dirs:
        tag = os.path.basename(os.path.normpath(d))
        results["dirs"][tag] = {}
        for name, fn in VARIANTS.items():
            secs = []
            ans = None
            for i in range(3):
                t0 = time.time()
                ans = fn(spark, d)
                dt = round(time.time() - t0, 3)
                if i > 0:
                    secs.append(dt)
                print(f"{tag} {name} run{i}: {dt}s", file=sys.stderr, flush=True)
            # answer equality across variants is part of the experiment
            key = tuple(tuple(x) if not isinstance(x, tuple) else x for x in
                        [tuple(r) for r in ans])
            if tag in answers and answers[tag] != key:
                raise AssertionError(f"variant {name} answer drift at {tag}")
            answers[tag] = key
            results["dirs"][tag][name] = min(secs)
    for name in VARIANTS:
        tags = list(results["dirs"])
        if len(tags) >= 2:
            a, b = tags[0], tags[-1]
            results.setdefault("ratio", {})[name] = round(
                results["dirs"][b][name] / results["dirs"][a][name], 2
            )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))




def vD_hybrid_bcast(spark, sf_dir):
    # hybrid (persist edges, checkpoint degrees) + size-gated explicit
    # broadcast of the keep set: checkpointed frames carry no stats,
    # so Catalyst won't broadcast them — but the node count is already
    # a driver scalar each round, making the gate free
    from pyspark.storagelevel import StorageLevel

    lvl = StorageLevel.MEMORY_AND_DISK
    BCAST_MAX = 2_000_000
    e = _edges(spark, sf_dir).select("src", "dst").persist(lvl)

    def _deg(edge_df):
        return (
            edge_df.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .localCheckpoint(eager=True)
        )

    def _stats(deg_df):
        row = deg_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("_d"), F.lit(0)).alias("m"),
        ).collect()[0]
        return int(row["n"]), int(row["m"])

    out = []
    deg = _deg(e)
    prev_nodes, prev_edges = _stats(deg)
    for r in range(1, ROUNDS + 1):
        keep = deg.filter(F.col("_d") >= K).select("src")
        if prev_nodes <= BCAST_MAX:
            keep = F.broadcast(keep)
        e_new = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .persist(lvl)
        )
        deg_new = _deg(e_new)
        e.unpersist()
        deg.unpersist()
        e, deg = e_new, deg_new
        n_nodes, n_edges = _stats(deg)
        out.append((r, n_nodes, n_edges))
        if n_edges == prev_edges:
            out.extend((rr, n_nodes, n_edges) for rr in range(r + 1, ROUNDS + 1))
            break
        prev_nodes, prev_edges = n_nodes, n_edges
    e.unpersist()
    deg.unpersist()
    return out


_ALL_VARIANTS["vD_hybrid_bcast"] = vD_hybrid_bcast
_SEL2 = os.environ.get("KCORE_VARIANTS", ",".join(_ALL_VARIANTS))
VARIANTS.clear()
VARIANTS.update({k: _ALL_VARIANTS[k] for k in _SEL2.split(",")})


if __name__ == "__main__":
    main()
