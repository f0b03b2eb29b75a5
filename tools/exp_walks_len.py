"""random_walks walk-length experiment (r10 VERDICT watch item / r11
task 4): the shipped shape rewrites the FULL path array every step, so
the per-step checkpoint carries O(walks × t) bytes at step t and total
checkpoint traffic is O(walks × walk_len²). Fine at the gate's
walk_len=4; DeepWalk/node2vec run 40-80 steps (Perozzi KDD'14 uses 40),
multiplying that traffic 100-400×. This pairs, in ONE session,
interleaved, fingerprint-verified at each length:

  vPACK  shipped: state = (start, w, path[], _cur); path rewritten and
         checkpointed every step
  vROWS  state = (start, w, _cur) only — constant walk-count bytes per
         step; each step contributes a (start, w, t, node) row frame
         (a projection of that step's checkpoint, no extra
         materialization); ONE end pack (groupBy(start, w),
         sort_array(collect_list(struct(t, node)))) rebuilds the path.
         Dead walkers drop from the state via the inner join (their
         emitted prefix rows remain — identical stop semantics).

Usage: python tools/exp_walks_len.py OUT.json [SF_DIR] [--reps N]
       [--lens 4,40,80]

HISTORICAL NOTE: this experiment decided the r11 ship — vROWS won
(L=40 74.1 vs 87.4 min-of-2, ties at 4/80) and random_walks now IS
the step-rows shape, so the vPACK arm no longer reproduces the old
code: rerunning pairs two equivalent shapes. EXP_WALKS_LEN.json holds
the decisive pre-ship run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators.graph import (
    _KEEP_BCAST_MAX,
    _WALK_A,
    _WALK_B,
    _WALK_C,
    _WALK_BCAST_EDGE_MAX,
    _WALK_P,
    random_walks,
)
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def _edges(spark, sf_dir, starts_mod=97):
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    starts = (
        li.select(o.alias("node"))
        .filter(F.expr(f"(node DIV 2) % {starts_mod} = 1"))
        .distinct()
    )
    return fwd.unionAll(rev), starts


def _walks_rows(edges, starts, walk_len, walks_per_node=1):
    """The step-rows arm: per-step state carries only the cursor."""
    e = edges.where(F.col("dst").isNotNull() & F.col("src").isNotNull())
    adj = (
        e.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("outdeg"),
            F.sort_array(F.collect_list("dst")).alias("_nbrs"),
        )
        .sortWithinPartitions("src")
        .persist()
    )
    stats = adj.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("outdeg"), F.lit(0)).alias("m"),
    ).collect()[0]
    small = (
        int(stats["n"]) <= _KEEP_BCAST_MAX
        and int(stats["m"]) <= _WALK_BCAST_EDGE_MAX
    )
    if starts is None:
        starts = adj.select(F.col("src").alias("node"))
    else:
        starts = starts.where(F.col("node").isNotNull()).distinct()
    state = starts.select(
        F.col("node").alias("start"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(walks_per_node - 1))
        ).alias("w"),
        F.col("node").alias("_cur"),
    ).localCheckpoint(eager=True)
    kept = [state]
    steps = [
        state.select(
            "start", "w", F.lit(0).cast("int").alias("t"),
            F.col("_cur").alias("node"),
        )
    ]
    for t in range(1, walk_len):
        st = state.alias("s")
        a = (F.broadcast(adj) if small else adj).alias("a")
        h = (
            (F.pmod(F.col("s._cur"), _WALK_P) * _WALK_A) % _WALK_P
            + (F.col("s.w") * _WALK_B) % _WALK_P
            + F.lit((t * _WALK_C) % _WALK_P)
        ) % _WALK_P
        nxt = F.element_at(
            "a._nbrs", (F.pmod(h, F.col("a.outdeg")) + 1).cast("int")
        )
        state = (
            st.join(a, F.col("s._cur") == F.col("a.src"))
            .select("s.start", "s.w", nxt.alias("_cur"))
            .localCheckpoint(eager=True)
        )
        kept.append(state)
        steps.append(
            state.select(
                "start", "w", F.lit(t).cast("int").alias("t"),
                F.col("_cur").alias("node"),
            )
        )
    packed = (
        reduce(lambda x, y: x.unionAll(y), steps)
        .groupBy("start", "w")
        .agg(F.sort_array(F.collect_list(F.struct("t", "node"))).alias("_ps"))
        .select(
            "start",
            "w",
            F.size("_ps").alias("n_steps"),
            F.expr("transform(_ps, x -> x.node)").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    for s in kept:
        s.unpersist()
    adj.unpersist()
    return packed


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
    lens = [4, 40, 80]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--lens" in args:
        i = args.index("--lens")
        lens = [int(x) for x in args[i + 1].split(",")]
        args = args[:i] + args[i + 2:]
    starts_mod = 7  # DeepWalk walks from (nearly) every node — the
    # gate's every-97th starts are too sparse to stress per-step bytes
    if "--starts-mod" in args:
        i = args.index("--starts-mod")
        starts_mod = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/repo/.scratch/sf1"
    spark = get_spark("exp-walks-len")
    import hostcal

    cal = hostcal.host_cal(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    def vpack(s, d, L):
        e, st = _edges(s, d, starts_mod)
        return random_walks(e, starts=st, walk_len=L, walks_per_node=1)

    def vrows(s, d, L):
        e, st = _edges(s, d, starts_mod)
        return _walks_rows(e, st, L)

    arms = {"vPACK": vpack, "vROWS": vrows}
    tag = os.path.basename(os.path.normpath(sf_dir))
    results: dict[str, dict] = {}
    for L in lens:
        golden = None
        for name, fn in arms.items():
            # fingerprint over the SORTED-equivalent projection: path
            # joined to a string so array hashing differences can't hide
            df = fn(spark, sf_dir, L).select(
                "start", "w", "n_steps",
                F.expr("array_join(transform(path, x -> cast(x as string)), ' ')").alias("p"),
            )
            fp = _fingerprint(df)
            print(f"{name} L={L}: fp={fp}", file=sys.stderr, flush=True)
            if golden is None:
                golden = fp
            elif fp != golden:
                raise AssertionError(f"{name} diverges at L={L}")
        for rep in range(reps):
            for name, fn in arms.items():
                t0 = time.time()
                fn(spark, sf_dir, L).count()
                sec = round(time.time() - t0, 3)
                rec = results.setdefault(f"{name}_L{L}", {"runs": []})
                rec["runs"].append(sec)
                rec["min_sec"] = min(rec["runs"])
                print(
                    f"{name} L={L} @ {tag} rep{rep}: {sec}",
                    file=sys.stderr,
                    flush=True,
                )
    payload = {
        "experiment": (
            "random_walks per-step full-path rewrite (O(walks*L^2) "
            "checkpoint bytes) vs step-rows + one end pack, at DeepWalk "
            "walk lengths (r11 task 4)"
        ),
        "sf_dir": sf_dir,
        "lens": lens,
        "starts_mod": starts_mod,
        "protocol": (
            "per length: 1 fingerprint verify pass per arm (equality "
            f"asserted, also warms), then {reps} interleaved timed "
            "rounds; min recorded"
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
