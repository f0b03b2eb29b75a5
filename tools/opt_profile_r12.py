"""r12 optimization-round measurement harness.

For each named query (default: the bench HEADLINE list) at
$SPARK_GRAFT_SF_DIR: capture the formatted physical plan to
plans/r12/<name>_<tag>.txt and time the call/count split over N runs
(call = query construction incl. any eager index build; count = the
timed action bench.py uses). Prints one JSON line per query so A/B
diffs stay greppable.

Usage: python tools/opt_profile_r11.py [--tag before|after] [--runs 3]
                                       [--noop] [query ...]
`--noop` additionally times df.write.format("noop") per run (guide
§1.4: count() can prune; noop forces every column) — reported
separately; the bench's count() methodology is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrmr_spark.catalog import queries
from lrmr_spark.plans import physical_plan
from lrmr_spark.session import get_spark

HEADLINE = [
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
    "ann_ivfpq_topk",
    "text_line_dedup_index",
    "graph_label_propagation",
]


def main() -> None:
    args = sys.argv[1:]
    tag, runs, do_noop = "before", 3, False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--noop":
            do_noop = True
            i += 1
        else:
            names.append(a)
            i += 1
    if not names:
        names = HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lrmr-opt-profile")
    qs = queries()
    os.makedirs("plans/r12", exist_ok=True)

    # same warm-up discipline as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["flagship_event_counts"](spark, sf_dir).count()
    qs["dedup_minhash_lsh_fast"](spark, "/root/testdata/sf0.001").count()

    for name in names:
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        rows = []
        for r in range(runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            rec = {"call": round(t1 - t0, 3), "count": round(t2 - t1, 3)}
            if do_noop:
                t3 = time.time()
                df.write.format("noop").mode("overwrite").save()
                rec["noop"] = round(time.time() - t3, 3)
            rows.append(rec)
            if r == 0:
                with open(f"plans/r12/{name}_{tag}.txt", "w") as f:
                    f.write(physical_plan(df))
        spark.sparkContext.setJobDescription(None)
        best = min(range(runs), key=lambda j: rows[j]["call"] + rows[j]["count"])
        print(
            json.dumps(
                {
                    "query": name,
                    "tag": tag,
                    "runs": rows,
                    "min_total": round(
                        rows[best]["call"] + rows[best]["count"], 3
                    ),
                    "loadavg": [round(x, 2) for x in os.getloadavg()],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
