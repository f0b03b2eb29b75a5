"""Core-scaling sample at a REAL data size (r12 verdict item 6).

The driver's sf0.1 bench shows 8-vs-32-core ratios ≈1 for every query
because per-query fixed cost (driver planning, index-write jobs, small
shuffles) dominates at ~600k rows — the bench at that SF cannot
demonstrate parallel speedup. This tool times a shuffle-heavy subset at
sf1 (10× the bench SF, data in .scratch/sf1) inside ONE process at
local[$SPARK_GRAFT_CPUS]; run it once per core count and merge:

  SPARK_GRAFT_CPUS=32 python tools/scaling_cores.py /root/repo/.scratch/sf1 > /tmp/s32.json
  SPARK_GRAFT_CPUS=8  python tools/scaling_cores.py /root/repo/.scratch/sf1 > /tmp/s8.json
  python tools/scaling_cores.py --merge /tmp/s8.json /tmp/s32.json > SCALING_CORES_r12.json

Per query: one warm-up, then min of TIMED_RUNS (the repeatable cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# shuffle/compute-heavy entries where parallelism should show at sf1
DEFAULT_QUERIES = [
    "dedup_minhash_lsh_fast",
    "graph_label_propagation",
    "join_multiway_region_revenue",
    "events_sessionization",
    "window_topk_per_customer",
    "text_line_dedup_index",
]

TIMED_RUNS = 2


def merge(paths: list[str]) -> None:
    runs = [json.load(open(p)) for p in paths]
    runs.sort(key=lambda r: r["cpus"])
    lo, hi = runs[0], runs[-1]
    ratios = {
        q: round(lo["per_query_min"][q] / hi["per_query_min"][q], 2)
        for q in hi["per_query_min"]
        if q in lo["per_query_min"] and hi["per_query_min"][q] > 0
    }
    print(
        json.dumps(
            {
                "cpus_low": lo["cpus"],
                "cpus_high": hi["cpus"],
                "sf_dir": hi["sf_dir"],
                "low": lo["per_query_min"],
                "high": hi["per_query_min"],
                "ratio_low_over_high": ratios,
                "loadavg": {"low": lo["loadavg"], "high": hi["loadavg"]},
            },
            indent=1,
        )
    )


def main() -> None:
    if sys.argv[1:2] == ["--merge"]:
        merge(sys.argv[2:])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    from lrmr_spark.catalog import queries
    from lrmr_spark.session import get_spark

    spark = get_spark("scaling-cores")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count())
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"scaling {name}")
        qs[name](spark, sf_dir).count()  # warm-up
        best = None
        for _ in range(TIMED_RUNS):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}@{cpus}: {out[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "sf_dir": sf_dir,
                "per_query_min": out,
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
