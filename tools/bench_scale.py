"""Reproducible scale rehearsal: time catalog queries at two (or more)
SF directories in ONE session and report per-query ratios.

Usage:
  python tools/bench_scale.py OUT.json SF_DIR_A SF_DIR_B [query ...]

Per query, per SF dir: one warm-up run, then TIMED_RUNS timed runs —
the MINIMUM is recorded (the repeatable cost; max-of-mins still catches
super-linear blowups while shielding the ratio from GC/compaction
noise, which single-shot timing does not — r3's ad-hoc sf1 numbers for
the MinHash family were ~5x inflated by exactly that). The ratio
reported for dirs (A, B) is sec_B / sec_A per query.

Dirs are benched in order, all queries at dir A before dir B, so page
cache and JVM state are comparable within a dir. Default query set =
the 17-query rehearsal list from BENCH_sf1.json (r3), kept stable so
ratios stay comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrmr_spark.session import get_spark

DEFAULT_QUERIES = [
    "flagship_event_counts",
    "tpch_q1",
    "tpch_q6_forecast_revenue",
    "join_multiway_region_revenue",
    "window_topk_per_customer",
    "events_sessionization",
    "asof_last_purchase",
    "dedup_tokenset",
    "dedup_minhash_lsh_fast",
    "ann_cosine_topk",
    "text_quality_features",
    "dedup_minhash_lsh",
    "skew_salted_agg",
    "skew_replicated_join",
    "dedup_components",
    "events_funnel_conversion",
    "orders_abc_pareto",
]

TIMED_RUNS = 2


def main() -> None:
    out_path = sys.argv[1]
    dirs = []
    names = []
    for a in sys.argv[2:]:
        (dirs if os.path.isdir(a) else names).append(a)
    if len(dirs) < 2:
        raise SystemExit("need at least two SF directories")
    names = names or DEFAULT_QUERIES

    from lrmr_spark import catalog

    qs = catalog.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark = get_spark("bench-scale")
    import hostcal

    cal = hostcal.host_cal(spark)  # before the timed work (r8 task 8)
    # build/serve split (bench.py's r10 convention): the stored-index
    # lifecycle entries run their index WRITE eagerly inside the catalog
    # call and return the lazy serve query, so the call/count boundary
    # is the build/serve boundary — reported so host disk noise stays
    # attributable at rehearsal SFs too.
    from lrmr_spark.catalog import INDEX_LIFECYCLE_ENTRIES as SPLIT_BUILD_SERVE
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    splits: dict[str, dict[str, dict[str, float]]] = {}
    for d in dirs:
        tag = os.path.basename(os.path.normpath(d))
        for n in names:
            qs[n](spark, d).count()  # warm
            best, nrow, best_split = None, 0, None
            for _ in range(TIMED_RUNS):
                t0 = time.time()
                df = qs[n](spark, d)
                t1 = time.time()
                nrow = df.count()
                sec = time.time() - t0
                if best is None or sec < best:
                    best = sec
                    best_split = (round(t1 - t0, 3), round(sec - (t1 - t0), 3))
            times[n][tag] = round(best, 3)
            rows[n][tag] = nrow
            if n in SPLIT_BUILD_SERVE:
                splits.setdefault(n, {})[tag] = {
                    "build_sec": best_split[0],
                    "serve_sec": best_split[1],
                }
            print(f"{tag} {n} {times[n][tag]}s rows={nrow}", file=sys.stderr)

    tag_a = os.path.basename(os.path.normpath(dirs[0]))
    tag_b = os.path.basename(os.path.normpath(dirs[-1]))
    result = {
        "metric": f"scale_rehearsal_{tag_b}_vs_{tag_a}",
        "protocol": (
            f"per query per dir: 1 warm run + {TIMED_RUNS} timed runs, min "
            "recorded; one session, local[32]; ratio = last_dir/first_dir"
        ),
        "queries": {
            n: {
                **{f"{t}_sec": s for t, s in times[n].items()},
                **{f"{t}_rows": r for t, r in rows[n].items()},
                "ratio": (
                    round(times[n][tag_b] / times[n][tag_a], 2)
                    if times[n][tag_a] > 0
                    else None
                ),
            }
            for n in names
        },
        "total_sec": {
            t: round(sum(times[n][t] for n in names), 3)
            for t in (tag_a, tag_b)
        },
        "build_serve_split": splits,
        "host_cal": cal,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"wrote": out_path, "totals": result["total_sec"]}))
    spark.stop()


if __name__ == "__main__":
    main()
