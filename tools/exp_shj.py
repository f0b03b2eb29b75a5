"""Iterative-loop join-strategy experiment (r8 extension): above the
broadcast gate every per-round edges⋈nodes join in the iterative graph
family plans as a SortMergeJoin, and the SMJ SORTS THE EDGE SIDE EVERY
ROUND — the columnar cache satisfies the join's distribution
requirement (hash by src) but not its ordering requirement, so a
120 M-edge sort repeats O(rounds) times on a frame that never changes.
Two candidate fixes, measured per operator:

  v0_shipped  the operator as shipped (copartitioned columnar cache,
              SortMergeJoin: per-round edge sort)
  vSHJ        hint('SHUFFLE_HASH') on the node-sized side: per round a
              ShuffledHashJoin streams the cached edges with NO sort
              and builds a hash table on the node-table slice — the
              same per-partition slice the SMJ would hold sorted, so
              memory is not worse; the edge-side sort disappears
  vSORT       sortWithinPartitions('src') before caching: the
              InMemoryRelation's outputOrdering satisfies the SMJ, so
              only the node-sized side sorts per round (keeps the
              SMJ's no-build-table memory profile; pays one upfront
              edge sort)

Covers label_propagation, pagerank_ppm, and connected_components
(hashmin) — whose shipped cache is not even partitioned by the join
key (dst), so its per-round join re-exchanges the edge frame too.

All variants of an operator must return identical rows (verified
before timing; every loop is deterministic by construction).

Usage: python tools/exp_shj.py OUT.json SF_DIR [SF_DIR...] \
           [--ops lpa,pagerank,hashmin] [--variants v0_shipped,vSHJ] \
           [--reps N]
Protocol: per dir, 1 verify pass per variant (result equality via a
JVM-side hash fingerprint — sum/xor of hash(row) + count — so a 17 M-row
sf10 result never crosses into Python), then N interleaved timed rounds
(variant order A,B,C,A,B,C… so host drift hits all variants equally),
timing a count() action; min recorded. The fingerprint-equality check is
exact for these operators: all variants are deterministic and the
fingerprint is order-independent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lrmr_spark.operators.dedup import connected_components
from lrmr_spark.operators.graph import (
    _KEEP_BCAST_MAX,
    label_propagation,
    pagerank_ppm,
)
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

ITERATIONS = 3
_LVL = StorageLevel.MEMORY_AND_DISK


def _edges(spark, sf_dir):
    """The exp_lpa bipartite order↔part graph (both directions)."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    return fwd.unionAll(rev)


def _pairs(spark, sf_dir):
    """Directed half of the same graph, as a near-dup pair list."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    return li.select(o.alias("id_a"), p.alias("id_b")).distinct()


def _cache_edges(edges, key: str, mode: str):
    """Copartitioned columnar cache, optionally sorted within
    partitions so the InMemoryRelation's outputOrdering satisfies a
    downstream SMJ."""
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = edges.repartition(n_part, key)
    if mode == "vSORT":
        out = out.sortWithinPartitions(key)
    out = out.persist(_LVL)
    out.count()
    return out


def _lpa_loop(edges, mode: str):
    edges = _cache_edges(edges.select("src", "dst"), "src", mode)
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
        if mode == "vSHJ" and not small:
            lbl = lbl.hint("SHUFFLE_HASH")
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
        elif mode == "vSHJ":
            argmax = argmax.hint("SHUFFLE_HASH")
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


def _pagerank_loop(edges, mode: str):
    raw = edges.localCheckpoint(eager=True)
    deg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pre = raw.join(deg, "src").select("src", "dst", "outdeg")
    nodes = pre.select(F.col("src").alias("node")).distinct()
    edges_c = _cache_edges(pre, "src", mode)
    n_nodes = nodes.count()
    raw.unpersist()
    small = n_nodes <= _KEEP_BCAST_MAX
    teleport = 1_000_000 // max(n_nodes, 1)
    ranks = (
        edges_c.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("rank_ppm", F.lit(teleport).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(ITERATIONS):
        r = F.broadcast(ranks) if small else ranks
        if mode == "vSHJ" and not small:
            r = r.hint("SHUFFLE_HASH")
        contribs = edges_c.join(r, edges_c.src == r.node).select(
            F.col("dst").alias("node"),
            F.expr("rank_ppm DIV outdeg").alias("c"),
        )
        new_ranks = (
            contribs.groupBy("node")
            .agg(
                F.expr(
                    f"CAST((15 * {teleport} + 85 * sum(c)) DIV 100 AS BIGINT)"
                ).alias("rank_ppm")
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks
    edges_c.unpersist()
    return ranks


def _hashmin_loop(pairs, mode: str, max_iter: int = 25):
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # the join key is dst (labels arrive keyed by id == dst)
    both = _cache_edges(both, "dst", mode)
    labels = (
        both.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        lbl = labels.hint("SHUFFLE_HASH") if mode == "vSHJ" else labels
        nbr_min = both.join(lbl, both.dst == lbl.id).select(
            F.col("src").alias("id"), "comp"
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
    both.unpersist()
    return labels


OPS = {
    "lpa": {
        "v0_shipped": lambda s, d: label_propagation(
            _edges(s, d), iterations=ITERATIONS
        ),
        "vSHJ": lambda s, d: _lpa_loop(_edges(s, d), "vSHJ"),
        "vSORT": lambda s, d: _lpa_loop(_edges(s, d), "vSORT"),
    },
    "pagerank": {
        "v0_shipped": lambda s, d: pagerank_ppm(
            _edges(s, d), iterations=ITERATIONS
        ),
        # pre-r8-extension shape (plain copartitioned cache, no hint):
        # the baseline arm once v0_shipped carries the hint
        "vNOHINT": lambda s, d: _pagerank_loop(_edges(s, d), "vNOHINT"),
        "vSHJ": lambda s, d: _pagerank_loop(_edges(s, d), "vSHJ"),
        "vSORT": lambda s, d: _pagerank_loop(_edges(s, d), "vSORT"),
    },
    "hashmin": {
        "v0_shipped": lambda s, d: connected_components(_pairs(s, d)),
        "vSHJ": lambda s, d: _hashmin_loop(_pairs(s, d), "vSHJ"),
        "vSORT": lambda s, d: _hashmin_loop(_pairs(s, d), "vSORT"),
    },
}


def _fingerprint(df):
    """Order-independent exact fingerprint of a result frame, computed
    JVM-side: (row count, sum of row hashes, xor of row hashes)."""
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
    # count + sum + xor of 32-bit murmur hashes widened to long: an
    # order-independent equality check between deterministic variants
    return (int(row["n"]), int(row["s"]), int(row["x"]))


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    only_ops, only_variants, reps = None, None, 2
    if "--ops" in args:
        i = args.index("--ops")
        only_ops = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--variants" in args:
        i = args.index("--variants")
        only_variants = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    bcast = None
    if "--bcast-threshold" in args:
        i = args.index("--bcast-threshold")
        bcast = args[i + 1]
        args = args[:i] + args[i + 2:]
    dirs = args or ["/root/repo/.scratch/sf1"]
    spark = get_spark("exp-shj")
    import hostcal

    cal = hostcal.host_cal(spark)  # self-describing artifact (r8 task 8)
    if bcast is not None:
        # model the 100×-scale regime at a small SF: above the gate no
        # node-sized table is broadcastable, but a mid-SF node table can
        # sit under the session's 64 MB auto-broadcast threshold and
        # silently flip v0 into the broadcast regime the experiment is
        # NOT asking about
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    for op, variants in OPS.items():
        if only_ops is not None and op not in only_ops:
            continue
        picked = [
            (n, f)
            for n, f in variants.items()
            if only_variants is None or n in only_variants
        ]
        for sf_dir in dirs:
            tag = os.path.basename(os.path.normpath(sf_dir))
            golden = None
            for name, fn in picked:  # verify pass (untimed, warms too)
                fp = _fingerprint(fn(spark, sf_dir))
                print(f"{op}/{name} @ {tag}: fp={fp}", file=sys.stderr, flush=True)
                if golden is None:
                    golden = fp
                elif fp != golden:
                    raise AssertionError(f"{op}/{name} diverges at {tag}: {fp} != {golden}")
            for rep in range(reps):  # interleaved timed rounds
                for name, fn in picked:
                    t0 = time.time()
                    n = fn(spark, sf_dir).count()
                    sec = round(time.time() - t0, 3)
                    rec = results.setdefault(op, {}).setdefault(name, {}).setdefault(
                        tag, {"runs": [], "n_rows": n}
                    )
                    rec["runs"].append(sec)
                    rec["min_sec"] = min(rec["runs"])
                    print(
                        f"{op}/{name} @ {tag} rep{rep}: {sec}",
                        file=sys.stderr,
                        flush=True,
                    )
    payload = {
        "experiment": "per-round join strategy above the broadcast gate (r8 ext)",
        "iterations": ITERATIONS,
        "protocol": (
            "per dir: 1 hash-fingerprint verify pass per variant (also warms), "
            f"then {reps} interleaved timed rounds (A,B,C,A,B,C,...) timing a "
            "count() action; min recorded"
        ),
        "autoBroadcastJoinThreshold": bcast or "session default (64 MB)",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "ops": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
