"""Skew rehearsal: measure the hot-key join strategies against a
deliberately skewed copy of events (one user holding ~60% of all rows
— the power-law shape real event logs and web corpora exhibit).

Variants, timed in ONE session (warm + 2 runs, min recorded):
  plain_aqe_off   — shuffle join with AQE skew splitting disabled:
                    the hot key's entire row block lands in a single
                    task; the straggler IS the query time.
  plain_aqe_on    — session default: AQE's skewedJoin splits the hot
                    partition at runtime (OptimizeSkewedJoin).
  replicated_join — operators.skew.replicate_join_small_side: salt the
                    big side, replicate the small side `salt` ways —
                    the engine-independent fix (works without AQE, and
                    for the aggregate-state cases AQE can't rescue).

Usage: python tools/bench_skew.py [OUT.json] [src_sf_dir]
Writes one JSON with per-variant seconds + the skew profile.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators.skew import replicate_join_small_side
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

HOT_USER = 777
TIMED_RUNS = 2


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEW_BENCH.json"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    spark = get_spark("lrmr-spark-skew-bench")

    # skewed copy: ~60% of events remapped to one hot user (deterministic
    # by event_id, partitioning-independent)
    ev = load(spark, src, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 6, F.lit(HOT_USER)).otherwise(
            F.col("user_id")
        ),
    )
    # cache key embeds the source dir — a bare "skew_events" path
    # keyed only on _SUCCESS would silently reuse a stale corpus when
    # re-run with a different src while the JSON records the new one
    path = os.path.join(
        "/root/repo/.scratch",
        f"skew_events_{os.path.basename(os.path.normpath(src))}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev.write.mode("overwrite").parquet(path)
    events = spark.read.parquet(path)
    users = (
        events.select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 7).cast("int"))
    )
    users.write.mode("overwrite").parquet(path + "_users")
    users = spark.read.parquet(path + "_users")

    total = events.count()
    hot = events.filter(F.col("user_id") == HOT_USER).count()

    def plain(aqe_skew: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        # no-broadcast hint keeps the comparison about SHUFFLE joins
        # (users is data-proportional — the 100 TB premise)
        return (
            events.join(users.hint("shuffle_hash"), "user_id")
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def replicated():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        return (
            replicate_join_small_side(events, users, ["user_id"], salt=8)
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    variants = {
        "plain_aqe_off": lambda: plain(False),
        "plain_aqe_on": lambda: plain(True),
        "replicated_join": replicated,
    }
    results = {}
    baseline_rows = None
    for name, fn in variants.items():
        fn().count()  # warm
        secs = []
        for _ in range(TIMED_RUNS):
            t0 = time.time()
            rows = {r["segment"]: r["n"] for r in fn().collect()}
            secs.append(round(time.time() - t0, 3))
        if baseline_rows is None:
            baseline_rows = rows
        assert rows == baseline_rows, f"{name} changed the answer"
        results[name] = {"sec": min(secs), "runs": secs}
        print(name, min(secs), secs, flush=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    doc = {
        "metric": "skew_join_rehearsal",
        "profile": {
            "rows": total,
            "hot_user_rows": hot,
            "hot_share": round(hot / total, 3),
            "src": src,
        },
        "protocol": "one session, warm + min-of-2 per variant, identical "
        "grouped results asserted across variants",
        "variants": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
