"""Star connected-components working-set experiment (r10, VERDICT r9
task 2): after HashMin's r9 adjacency rebuild (sf10 116.0 s,
EXP_ADJ_FAMILY.json), star is the slow sibling at 174.2 s
(BENCH_r9_cc.json) — but star is the algorithm that wins at true
100 TB diameter (O(log n) rounds), so it shouldn't stay slow. The
static adjacency_cache does NOT apply (the edge set is rewritten
every round); the candidates are per-round shapes:

  v0_shipped  _connected_components_star as shipped: per round
              2× (groupBy-min + edge⋈node join + distinct) for the
              two star steps, then TWO exceptAll counts for
              convergence — ~8-10 edge-sized shuffles/round.
  vCONV       shipped star steps, but convergence = edge-count
              equality precheck gating ONE left-anti join (both
              frames are distinct sets, so |A|=|B| ∧ A∖B=∅ ⟹ A=B);
              counts differ in every non-final round, so the usual
              round pays ZERO convergence shuffles. Isolates the
              convergence cost from the step shape.
  vWINDOW     each star step as ONE window pass (min(v) + row_number
              over partitionBy(u) orderBy(v) — one exchange+sort,
              no node-sized join, no per-step distinct; duplicates
              ride into the next step's window and die in the final
              per-round distinct) + vCONV's convergence. Sorting is
              per-node-degree and spillable — no giant array rows.
  vREGROUP    each star step as ONE groupBy(u).collect_set(v)
              (the dedup folds INTO the regroup shuffle), m and the
              emitted links computed from the packed array + vCONV's
              convergence. CAVEAT measured here on purpose: at the
              fixed point the component min's set holds the WHOLE
              component (a 16.7M-node component is a ~130 MB array
              row) — the adjacency_cache max-degree caveat made
              unconditional, so this arm must WIN CLEARLY to ship.

All arms converge to the same fixed point (same algorithm, different
plumbing) — verified via an order-independent JVM-side fingerprint of
the final (id, comp) labels before timing.

Usage: python tools/exp_cc_star.py OUT.json SF_DIR [SF_DIR...]
           [--arms v0_shipped,vCONV,...] [--reps N]
Protocol: per dir, 1 fingerprint verify pass per arm (also warms),
then N interleaved timed rounds (A,B,C,D,A,...) timing a count()
action; min recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lrmr_spark.operators.dedup import connected_components
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

MAX_ITER = 25


def _pairs(spark, sf_dir):
    """Directed half of the bipartite order↔part graph (the bench_cc
    shape: 16.7M nodes / ~120M directed edges at sf10)."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    return li.select(o.alias("id_a"), p.alias("id_b")).distinct()


def _init_edges(pairs):
    """Shipped normalization: directed large→small, distinct."""
    edges = (
        pairs.select(
            F.col("id_a").cast("long").alias("u"),
            F.col("id_b").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return edges


def _labels(edges):
    """Fixed point → (id, comp): same extraction as shipped."""
    comp = edges.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    roots = (
        edges.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    return comp.union(roots).groupBy("id").agg(F.min("comp").alias("comp"))


def _stable_cheap(new_edges, edges, n_new, n_prev):
    """|A|=|B| ∧ A∖B=∅ ⟹ A=B for distinct sets; the count precheck
    makes the usual (count-changing) round pay zero convergence
    shuffles."""
    if n_new != n_prev:
        return False
    return new_edges.join(edges, ["u", "v"], "left_anti").count() == 0


def _steps_shipped(edges):
    """One shipped round: large-star then small-star, each = groupBy
    min + edge⋈node join + distinct."""
    nbrs = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("_mn", F.col("u")).alias("m"))
    )
    ls = (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(
            m.filter(F.col("u") != F.col("m")).select("u", F.col("m").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m2 = ls.groupBy("u").agg(F.min("v").alias("m"))
    return (
        ls.join(m2, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(
            m2.filter(F.col("u") != F.col("m")).select("u", F.col("m").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _steps_window(edges):
    """One round where each star step is ONE window exchange+sort:
    min(v) and row_number share the ordered spec, the self-link (u→m)
    is emitted on the rn=1 row, no node-sized join, no per-step
    distinct (cross-row duplicates die in the final distinct)."""
    w = Window.partitionBy("u").orderBy("v")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nbrs = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    t = nbrs.select(
        "u",
        "v",
        F.least(F.min("v").over(wf), F.col("u")).alias("m"),
        F.row_number().over(w).alias("rn"),
    )
    ls = t.filter(F.col("v") > F.col("u")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    ).union(
        t.filter((F.col("rn") == 1) & (F.col("u") != F.col("m"))).select(
            "u", F.col("m").alias("v")
        )
    )
    # small-star input is all v < u, so m = group min of v
    t2 = ls.select(
        "u",
        "v",
        F.min("v").over(wf).alias("m"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        t2.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(
            t2.filter((F.col("rn") == 1) & (F.col("u") != F.col("m"))).select(
                "u", F.col("m").alias("v")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _steps_regroup(edges):
    """One round where each star step is ONE groupBy.collect_set —
    dedup folds into the regroup shuffle; m and the links come off the
    packed array. Unconditional max-degree caveat: the converged
    component min's set holds the whole component."""
    nbrs = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj_l = nbrs.groupBy("u").agg(F.collect_set("v").alias("S")).select(
        "u", "S", F.least(F.col("u"), F.array_min("S")).alias("m")
    )
    # emit each node's links as ONE array and explode once (no Union —
    # a Union here also trips Catalyst's constraint rewrite on the
    # dropped lambda-filter attribute): larger neighbors → m, plus the
    # u → m self-link when u isn't the min
    pair = lambda x: F.struct(x.alias("u"), F.col("m").alias("v"))  # noqa: E731
    links_l = F.transform(
        F.filter("S", lambda x: x > F.col("u")), lambda x: pair(x)
    )
    ls = adj_l.select(
        F.explode(
            F.when(
                F.col("u") != F.col("m"),
                F.concat(links_l, F.array(pair(F.col("u")))),
            ).otherwise(links_l)
        ).alias("e")
    ).select("e.u", "e.v")
    adj_s = ls.groupBy("u").agg(F.collect_set("v").alias("S")).select(
        "u", "S", F.array_min("S").alias("m")
    )
    links_s = F.transform(
        F.filter("S", lambda x: x != F.col("m")), lambda x: pair(x)
    )
    return (
        adj_s.select(
            F.explode(F.concat(links_s, F.array(pair(F.col("u"))))).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )


def _star(pairs, steps, cheap_conv=True):
    edges = _init_edges(pairs)
    n_prev = edges.count()
    for _ in range(MAX_ITER):
        new_edges = steps(edges)
        if cheap_conv:
            n_new = new_edges.count()
            stable = _stable_cheap(new_edges, edges, n_new, n_prev)
            n_prev = n_new
        else:
            stable = (
                new_edges.exceptAll(edges).count() == 0
                and edges.exceptAll(new_edges).count() == 0
            )
        edges.unpersist()
        edges = new_edges
        if stable:
            break
    return _labels(edges)


ARMS = {
    # v0_shipped calls the OPERATOR — after the r10 rewrite ships it
    # aliases the winning arm; vOLD is the r9 shape pinned in this
    # file (old steps + two-exceptAll convergence), kept for honest
    # reruns against the pre-rewrite baseline.
    "v0_shipped": lambda s, d: connected_components(
        _pairs(s, d), algorithm="star"
    ),
    "vOLD": lambda s, d: _star(_pairs(s, d), _steps_shipped, cheap_conv=False),
    "vCONV": lambda s, d: _star(_pairs(s, d), _steps_shipped),
    "vWINDOW": lambda s, d: _star(_pairs(s, d), _steps_window),
    "vREGROUP": lambda s, d: _star(_pairs(s, d), _steps_regroup),
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
    arms, reps = list(ARMS), 2
    if "--arms" in args:
        i = args.index("--arms")
        arms = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    verify = True
    if "--no-verify" in args:
        # for follow-up timing rounds after equality is established
        verify = False
        args.remove("--no-verify")
    dirs = args or ["/root/repo/.scratch/sf1"]
    spark = get_spark("exp-cc-star")
    import hostcal

    cal = hostcal.host_cal(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    for sf_dir in dirs:
        tag = os.path.basename(os.path.normpath(sf_dir))
        golden = None
        for name in arms if verify else arms[:1]:
            fp = _fingerprint(ARMS[name](spark, sf_dir))
            print(f"{name} @ {tag}: fp={fp}", file=sys.stderr, flush=True)
            if golden is None:
                golden = fp
            elif fp != golden:
                raise AssertionError(f"{name} diverges at {tag}")
        for rep in range(reps):
            for name in arms:
                t0 = time.time()
                ARMS[name](spark, sf_dir).count()
                sec = round(time.time() - t0, 3)
                rec = results.setdefault(name, {}).setdefault(
                    tag, {"runs": []}
                )
                rec["runs"].append(sec)
                rec["min_sec"] = min(rec["runs"])
                print(f"{name} @ {tag} rep{rep}: {sec}", file=sys.stderr,
                      flush=True)
    payload = {
        "experiment": "star CC per-round working set: shipped vs cheap-convergence vs window-step vs collect_set-regroup (r10)",
        "max_iter": MAX_ITER,
        "protocol": (
            "per dir: 1 fingerprint verify pass per arm (label equality "
            f"asserted, also warms), then {reps} interleaved timed rounds "
            "timing a count() action; min recorded"
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
