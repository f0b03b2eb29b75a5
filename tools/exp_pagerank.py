"""pagerank_ppm working-set experiment (r9 verdict task 2): at sf10
the shipped operator is the graph family's most expensive op (160.9 s,
ratio 11.5× at 10× data — BENCH_r8_pagerank.json) after the r8 fixes
took LPA to 7.9× and kcore to 8.16×. Per round the shipped loop
SortMergeJoins the 3-column copartitioned edge cache (src, dst,
outdeg) against the node-sized rank table: the cache satisfies the
join's DISTRIBUTION requirement but not its ORDERING requirement, so
every round re-sorts the full edge frame (the EXP_SHJ finding; the
SHUFFLE_HASH answer to it won at sf3 and inverted at sf10, so the
hint was reverted and the sort remained). Variants:

  v0_shipped  pagerank_ppm as shipped (unsorted 3-col copartitioned
              cache; per-round edge sort)
  vSORT3      identical loop, cache built with
              sortWithinPartitions('src'): the InMemoryRelation's
              outputOrdering satisfies the SMJ, so the edge frame is
              only SCANNED per round and the one sort moves to cache
              fill (probe-verified: the per-round plan has no Sort
              over the edge-side InMemoryTableScan)
  vADJ        adjacency-list working set: ONE pass
              groupBy(src).agg(count, collect_list(dst)) builds
              (src, outdeg, dsts[]) — node-count rows — sorted and
              cached. Setup drops the raw-edge localCheckpoint, the
              separate degree table AND the deg⋈edges pre-join (the
              agg's exchange is the only edge-sized shuffle); per
              round the SMJ streams node-count rows on both sides,
              the per-src send (rank DIV outdeg) is computed once per
              node before explode, and the explode re-expands to
              edge-count rows only INSIDE the map stage feeding the
              partial aggregation. Caveat for 100 TB: a hub node's
              adjacency array is one row (unbounded row size) — if
              this arm wins it ships with that trade documented, the
              bipartite corpus graphs this family serves have bounded
              degree.

Rejected without an arm, by structure (r9 verdict's suggestions (a)
and (b)): packing (dst, send) into one BIGINT cannot shrink the
aggregation exchange because Spark's hash aggregate already emits
(group-key, partial-sum) pairs — the packed column would be unpacked
in the SAME stage it is packed, nothing packed ever crosses the wire.
Map-side pre-aggregation by dst is likewise already present: the
per-round plan shows HashAggregate(partial) between the join and the
Exchange (the combiner), so an explicit pre-agg would duplicate it.

All variants return identical rows (exact-ppm integer arithmetic;
verified via an order-independent JVM-side fingerprint before
timing). Usage:
  python tools/exp_pagerank.py OUT.json SF_DIR [SF_DIR...] \
      [--variants v0_shipped,vSORT3,vADJ] [--reps N] [--bcast-threshold B]
Protocol: per dir, 1 fingerprint verify pass per variant (also
warms), then N interleaved timed rounds (A,B,C,A,B,C,…) timing a
count() action; min recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lrmr_spark.operators.graph import _KEEP_BCAST_MAX, pagerank_ppm
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

ITERATIONS = 3
_LVL = StorageLevel.MEMORY_AND_DISK


def _edges(spark, sf_dir):
    """The exp_shj/exp_lpa bipartite order↔part graph (both
    directions), the graph_pagerank_parts shape."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    return fwd.unionAll(rev)


def _sorted_loop(edges, iterations=ITERATIONS):
    """The shipped loop with the cache sorted within partitions —
    byte-for-byte the pagerank_ppm fast path otherwise."""
    spark = edges.sparkSession
    raw = edges.localCheckpoint(eager=True)
    deg = (
        raw.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n_nodes = deg.count()
    teleport = 1_000_000 // max(n_nodes, 1)
    ranks = (
        deg.select(F.col("src").alias("node"))
        .withColumn("rank_ppm", F.lit(teleport).cast("long"))
        .localCheckpoint(eager=True)
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_c = (
        raw.join(deg, "src")
        .select("src", "dst", "outdeg")
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist(_LVL)
    )
    edges_c.count()
    raw.unpersist()
    deg.unpersist()
    for _ in range(iterations):
        contribs = edges_c.join(ranks, edges_c.src == ranks.node).select(
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


def _adj_loop(edges, iterations=ITERATIONS):
    """Adjacency-list working set: one edge-sized exchange at setup,
    node-count rows per round on both SMJ sides."""
    adj = (
        edges.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("outdeg"),
            F.collect_list("dst").alias("dsts"),
        )
        .sortWithinPartitions("src")
        .persist(_LVL)
    )
    n_nodes = adj.count()
    teleport = 1_000_000 // max(n_nodes, 1)
    ranks = (
        adj.select(F.col("src").alias("node"))
        .withColumn("rank_ppm", F.lit(teleport).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        sends = adj.join(ranks, adj.src == ranks.node).select(
            "dsts", F.expr("rank_ppm DIV outdeg").alias("c")
        )
        contribs = sends.select(F.explode("dsts").alias("node"), "c")
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
    adj.unpersist()
    return ranks


VARIANTS = {
    "v0_shipped": lambda s, d: pagerank_ppm(_edges(s, d), iterations=ITERATIONS),
    "vSORT3": lambda s, d: _sorted_loop(_edges(s, d)),
    "vADJ": lambda s, d: _adj_loop(_edges(s, d)),
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
    return (int(row["n"]), int(row["s"]), int(row["x"]))


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    only_variants, reps, bcast = None, 2, None
    if "--variants" in args:
        i = args.index("--variants")
        only_variants = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--bcast-threshold" in args:
        i = args.index("--bcast-threshold")
        bcast = args[i + 1]
        args = args[:i] + args[i + 2:]
    dirs = args or ["/root/repo/.scratch/sf3"]
    spark = get_spark("exp-pagerank")
    import hostcal

    cal = hostcal.host_cal(spark)
    if bcast is not None:
        # model the 100×-scale regime at a small SF (the EXP_SHJ
        # protocol): keep a mid-SF node table from silently flipping
        # into the broadcast regime the experiment is not asking about
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    spark.range(1000).selectExpr("sum(id)").collect()
    picked = [
        (n, f)
        for n, f in VARIANTS.items()
        if only_variants is None or n in only_variants
    ]
    results: dict[str, dict] = {}
    for sf_dir in dirs:
        tag = os.path.basename(os.path.normpath(sf_dir))
        golden = None
        for name, fn in picked:  # verify pass (untimed, warms too)
            fp = _fingerprint(fn(spark, sf_dir))
            print(f"{name} @ {tag}: fp={fp}", file=sys.stderr, flush=True)
            if golden is None:
                golden = fp
            elif fp != golden:
                raise AssertionError(
                    f"{name} diverges at {tag}: {fp} != {golden}"
                )
        for rep in range(reps):
            for name, fn in picked:
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                sec = round(time.time() - t0, 3)
                rec = results.setdefault(name, {}).setdefault(
                    tag, {"runs": [], "n_rows": n}
                )
                rec["runs"].append(sec)
                rec["min_sec"] = min(rec["runs"])
                print(f"{name} @ {tag} rep{rep}: {sec}", file=sys.stderr,
                      flush=True)
    payload = {
        "experiment": "pagerank_ppm per-round working set: shipped vs sorted cache vs adjacency list (r9)",
        "iterations": ITERATIONS,
        "protocol": (
            "per dir: 1 fingerprint verify pass per variant (also warms), "
            f"then {reps} interleaved timed rounds timing a count() action; "
            "min recorded"
        ),
        "autoBroadcastJoinThreshold": bcast or "session default (64 MB)",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "variants": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
