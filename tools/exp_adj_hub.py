"""Planted out-degree-hub experiment for adjacency_cache (r10, VERDICT
r9 task 3): operators/_iterloop.py documents the single-row layout's
caveat — one adjacency row per node bounds row size by the graph's max
OUT-degree (~80 MB at a 10M-out-edge hub) — and names chunked
adjacency as the unshipped alternative. This plants a hub of varying
out-degree into the sf1 pagerank rehearsal graph and measures where
the single-row layout actually degrades, so the docstring's caveat
becomes a measured threshold and the chunked variant ships only if
the numbers demand it.

Layouts (both run the same 3-iteration exact-ppm pagerank loop,
fingerprint-verified identical):

  vSINGLE  shipped adjacency_cache: (src, outdeg, nbrs[]) one row per
           node. The hub is ONE giant array row: built by one
           aggregation buffer, exploded by one task — the skew risk
           under test.
  vCHUNK   chunked adjacency: a degree pass (the pre-join the single
           layout exists to delete), then
           groupBy(src, pmod(xxhash64(dst), n_ch)) with
           n_ch = ceil(outdeg / CAP) — the hub becomes ⌈d/CAP⌉ rows
           in DIFFERENT partitions. Per round the rank row is
           REPLICATED per chunk (explode(sequence(0, n_ch-1)) off a
           node-sized chunk table — the skew-join salting shape) and
           the SMJ runs on (src, _ch), so the cached side keeps the
           zero-exchange property AND the hub's send work spreads
           across ⌈d/CAP⌉ tasks. Without the chunk id in the join key
           a chunked cache is pointless: a src-keyed join would
           re-exchange every chunk back into one partition.

Graph: the sf1 bipartite order↔part graph (both directions, ~12M
directed edges, ~1.9M nodes) plus a planted hub H with d symmetric
edges H↔t (targets t = 0,2,4,… — symmetric so the fast-path contract
holds: no danglers, every node has an out-edge). d = 0 measures the
chunk machinery's overhead when no hub exists.

Usage: python tools/exp_adj_hub.py OUT.json [SF_DIR]
           [--degrees 0,1000000,4000000,10000000] [--reps N] [--cap C]
Protocol: per degree, 1 fingerprint verify pass per layout (also
warms), then N interleaved timed rounds timing a count() action over
the full operator (adjacency build + 3 iterations); min recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from lrmr_spark.operators._iterloop import adjacency_cache
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

ITERATIONS = 3
BCAST_MAX = 2_000_000
HUB_ID = -1


def _edges_with_hub(spark, sf_dir, hub_deg: int):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    base = fwd.unionAll(rev)
    if hub_deg == 0:
        return base
    t = spark.range(hub_deg).select((F.col("id") * 2).alias("t"))
    hub = t.select(
        F.lit(HUB_ID).cast("long").alias("src"), F.col("t").alias("dst")
    ).unionAll(
        t.select(F.col("t").alias("src"), F.lit(HUB_ID).cast("long").alias("dst"))
    )
    return base.unionAll(hub)


def _pr_single(edges, iterations=ITERATIONS):
    """The shipped pagerank_ppm fast path, inlined (single-row
    adjacency_cache)."""
    adj, n_nodes = adjacency_cache(edges)
    small = n_nodes <= BCAST_MAX
    teleport = 1_000_000 // max(n_nodes, 1)
    ranks = (
        adj.select(F.col("src").alias("node"))
        .withColumn("rank_ppm", F.lit(teleport).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        r = F.broadcast(ranks) if small else ranks
        sends = adj.join(r, adj.src == r.node).select(
            "_nbrs", F.expr("rank_ppm DIV outdeg").alias("c")
        )
        contribs = sends.select(F.explode("_nbrs").alias("node"), "c")
        new_ranks = (
            contribs.groupBy("node")
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_inc"))
            .select(
                "node",
                F.expr(
                    f"CAST((15 * {teleport} + 85 * _inc) DIV 100 AS BIGINT)"
                ).alias("rank_ppm"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks
    adj.unpersist()
    return ranks


def _pr_chunk(edges, cap: int, iterations=ITERATIONS):
    """Chunked adjacency + chunk-replicated rank join on (src, _ch)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_ch = F.greatest(F.ceil(F.col("outdeg") / cap), F.lit(1)).cast("long")
    adj = (
        edges.join(deg, "src")
        .groupBy(
            "src", F.pmod(F.xxhash64("dst"), n_ch).alias("_ch")
        )
        .agg(
            F.first("outdeg").alias("outdeg"),
            F.collect_list("dst").alias("_nbrs"),
        )
        .sortWithinPartitions("src", "_ch")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    # node-sized chunk table: how many replicas each rank row needs
    chunks = (
        deg.select(
            F.col("src").alias("node"),
            F.greatest(F.ceil(F.col("outdeg") / cap), F.lit(1))
            .cast("long")
            .alias("_n_ch"),
        )
        .localCheckpoint(eager=True)
    )
    n_nodes = chunks.count()
    small = n_nodes <= BCAST_MAX
    teleport = 1_000_000 // max(n_nodes, 1)
    ranks = chunks.select("node").withColumn(
        "rank_ppm", F.lit(teleport).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        repl = (
            ranks.join(chunks, "node")
            .select(
                "node",
                "rank_ppm",
                F.explode(
                    F.sequence(F.lit(0).cast("long"), F.col("_n_ch") - 1)
                ).alias("_ch"),
            )
        )
        r = (F.broadcast(repl) if small else repl).alias("r")
        a = adj.alias("a")
        sends = a.join(
            r,
            (F.col("a.src") == F.col("r.node"))
            & (F.col("a._ch") == F.col("r._ch")),
        ).select("a._nbrs", F.expr("rank_ppm DIV outdeg").alias("c"))
        contribs = sends.select(F.explode("_nbrs").alias("node"), "c")
        new_ranks = (
            contribs.groupBy("node")
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_inc"))
            .select(
                "node",
                F.expr(
                    f"CAST((15 * {teleport} + 85 * _inc) DIV 100 AS BIGINT)"
                ).alias("rank_ppm"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks
    adj.unpersist()
    chunks.unpersist()
    return ranks


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
    degrees, reps, cap = [0, 1_000_000, 4_000_000, 10_000_000], 2, 131_072
    if "--degrees" in args:
        i = args.index("--degrees")
        degrees = [int(x) for x in args[i + 1].split(",")]
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--cap" in args:
        i = args.index("--cap")
        cap = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/repo/.scratch/sf1"
    spark = get_spark("exp-adj-hub")
    import hostcal

    cal = hostcal.host_cal(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    layouts = {
        "vSINGLE": lambda e: _pr_single(e),
        "vCHUNK": lambda e: _pr_chunk(e, cap),
    }
    results: dict[str, dict] = {}
    for d in degrees:
        tag = f"hub{d}"
        golden = None
        for name, fn in layouts.items():
            fp = _fingerprint(fn(_edges_with_hub(spark, sf_dir, d)))
            print(f"{name} @ {tag}: fp={fp}", file=sys.stderr, flush=True)
            if golden is None:
                golden = fp
            elif fp != golden:
                raise AssertionError(f"{name} diverges at {tag}")
        for rep in range(reps):
            for name, fn in layouts.items():
                t0 = time.time()
                fn(_edges_with_hub(spark, sf_dir, d)).count()
                sec = round(time.time() - t0, 3)
                rec = results.setdefault(name, {}).setdefault(
                    tag, {"runs": []}
                )
                rec["runs"].append(sec)
                rec["min_sec"] = min(rec["runs"])
                print(f"{name} @ {tag} rep{rep}: {sec}", file=sys.stderr,
                      flush=True)
    payload = {
        "experiment": "planted out-degree hub: single-row adjacency vs chunked adjacency + chunk-replicated rank join (r10)",
        "sf_dir": sf_dir,
        "iterations": ITERATIONS,
        "chunk_cap": cap,
        "protocol": (
            "per hub degree: 1 fingerprint verify pass per layout "
            f"(equality asserted, also warms), then {reps} interleaved "
            "timed rounds timing a count() over the full operator "
            "(adjacency build + iterations); min recorded"
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "layouts": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
