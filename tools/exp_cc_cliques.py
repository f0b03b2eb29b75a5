"""connected_components default-algorithm experiment on the CONTRACT
shape (r10 VERDICT task 6): the r10-rebuilt star variant beats HashMin
on the deep bipartite rehearsal at both scales (BENCH_r10_cc.json:
15.4/86.1 vs 29.1/128.1), but HashMin stayed the default on a docstring
argument — "shallow near-dup cliques converge in 2-3 rounds" — that was
never measured on that shape. This measures it: a synthetic pure
clique-family graph (N nodes in cliques of K — the LSH near-dup
cluster shape the operator's contract names), all-pairs edges within
each clique, interleaved paired arms, fingerprint-verified:

  hashmin  connected_components(pairs)                — the default
  star     connected_components(pairs, algorithm="star")

Usage: python tools/exp_cc_cliques.py OUT.json [--nodes N] [--k K]
       [--reps R]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators.dedup import connected_components
from lrmr_spark.session import get_spark


def _clique_pairs(spark, n_nodes, k):
    """All intra-clique pairs (a < b) for cliques {0..k-1}, {k..2k-1},
    ... — the near-dup cluster family, as one self-join on clique id.
    Checkpointed so both arms consume the identical materialized frame
    and neither pays the build inside its timing."""
    ids = spark.range(n_nodes).select(
        F.col("id").alias("a"), F.expr("id DIV {}".format(k)).alias("cq")
    )
    rhs = ids.select(F.col("a").alias("b"), "cq")
    return (
        ids.join(rhs, "cq")
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .localCheckpoint(eager=True)
    )


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

    def _opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = int(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    n_nodes = _opt("--nodes", 10_000_000)
    k = _opt("--k", 5)
    reps = _opt("--reps", 2)
    spark = get_spark("exp-cc-cliques")
    import hostcal

    cal = hostcal.host_cal(spark)
    pairs = _clique_pairs(spark, n_nodes, k)
    n_pairs = pairs.count()
    arms = {
        "hashmin": lambda: connected_components(pairs),
        "star": lambda: connected_components(pairs, algorithm="star"),
    }
    golden = None
    for name, fn in arms.items():
        fp = _fingerprint(fn())
        print(f"{name}: fp={fp}", file=sys.stderr, flush=True)
        if golden is None:
            golden = fp
        elif fp != golden:
            raise AssertionError(f"{name} diverges")
    results: dict[str, dict] = {}
    for rep in range(reps):
        for name, fn in arms.items():
            t0 = time.time()
            fn().count()
            sec = round(time.time() - t0, 3)
            rec = results.setdefault(name, {"runs": []})
            rec["runs"].append(sec)
            rec["min_sec"] = min(rec["runs"])
            print(f"{name} rep{rep}: {sec}", file=sys.stderr, flush=True)
    payload = {
        "experiment": (
            "connected_components hashmin vs star on the contract shape "
            "(shallow near-dup cliques) — settles the default (r11 task 6)"
        ),
        "n_nodes": n_nodes,
        "clique_size": k,
        "n_pairs": n_pairs,
        "protocol": (
            "pairs frame checkpointed once and shared; 1 fingerprint "
            f"verify pass per arm (also warms), then {reps} interleaved "
            "timed rounds; min recorded"
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
