"""A/B the streaming entries' harness constant (r12 verdict item 7).

All 17 streaming catalog entries run 2-10 s at sf0.1 while their batch
twins run <1 s — the availableNow/processAllAvailable micro-batch
harness (state-store instances, per-batch delta commits, memory-sink
setup) dominates, constant in data size. The state-partition count for
every stateful operator is pinned from spark.sql.shuffle.partitions at
the query's FIRST batch; with 32 partitions each stateful op commits
32 HDFS-backed state deltas per micro-batch over epochs of a few
thousand rows.

Arms (semantics identical — the same query plan, watermark and state
semantics; only the state/shuffle partition count and retention-IO
configs move, and results are asserted row-identical across arms):
  A  baseline (session conf as-is, 32)
  B  spark.sql.shuffle.partitions=8 for the stream run
  C  =4 for the stream run
  D  =8 + minBatchesToRetain=2 (less checkpoint retention IO)

Usage: python tools/exp_stream_const.py [sf_dir] [reps]
Writes EXP_STREAM_CONST.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lrmr_spark import streaming as ST
from lrmr_spark.session import get_spark


def run_interval_join(spark, sf_dir: str, tag: str):
    import uuid

    name = f"exp_ivj_{tag}_{uuid.uuid4().hex[:8]}"
    ev = ST.stream_events(spark, sf_dir)
    ev2 = ST.stream_events(spark, sf_dir)
    out = ST.run_to_memory(
        ST.view_click_interval_join(ev, ev2), name
    )
    return out


def run_sessionization(spark, sf_dir: str, tag: str):
    import uuid

    name = f"exp_sess_{tag}_{uuid.uuid4().hex[:8]}"
    return ST.run_to_memory(
        ST.session_counts(ST.stream_events(spark, sf_dir)), name
    )


ENTRIES = {
    "streaming_interval_join": run_interval_join,
    "streaming_sessionization": run_sessionization,
}

ARMS = {
    "A_base": {},
    "B_sp8": {"spark.sql.shuffle.partitions": "8"},
    "C_sp4": {"spark.sql.shuffle.partitions": "4"},
    "D_sp8_retain2": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.streaming.minBatchesToRetain": "2",
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-stream-const")
    spark.range(1000).selectExpr("sum(id)").collect()
    base_sp = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict = {}
    fingerprints: dict = {}
    for ename, fn in ENTRIES.items():
        results[ename] = {}
        fingerprints[ename] = {}
        for arm, conf in ARMS.items():
            times = []
            fp = None
            for rep in range(reps):
                for k, v in conf.items():
                    spark.conf.set(k, v)
                try:
                    spark.sparkContext.setJobDescription(
                        f"{ename} {arm} rep{rep}"
                    )
                    t0 = time.time()
                    out = fn(spark, sf_dir, arm)
                    rows = sorted(map(tuple, out.collect()))
                    times.append(round(time.time() - t0, 3))
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", base_sp)
                    spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
                import hashlib

                h = hashlib.md5(repr(rows).encode()).hexdigest()[:16]
                if fp is None:
                    fp = (h, len(rows))
                elif fp[0] != h:
                    raise AssertionError(f"{ename}/{arm} fingerprint drift")
            results[ename][arm] = {
                "times": times,
                "min": min(times),
                "loadavg": round(os.getloadavg()[0], 2),
            }
            fingerprints[ename][arm] = fp
            print(f"{ename} {arm}: {times} fp={fp}", file=sys.stderr, flush=True)
        arms_fp = {v for v in fingerprints[ename].values()}
        if len(arms_fp) != 1:
            raise AssertionError(
                f"{ename}: arms disagree on results: {fingerprints[ename]}"
            )
    payload = {"sf_dir": sf_dir, "reps": reps, "results": results,
               "fingerprints": {k: v["A_base"] for k, v in fingerprints.items()}}
    with open("/root/repo/EXP_STREAM_CONST.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
