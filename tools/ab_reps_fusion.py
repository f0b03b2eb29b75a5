"""Resolve the sf10 MinHash reps-exchange-fusion A/B (VERDICT r4 #2).

The question: _minhash_reps fuses its two aggregations onto ONE
doc-keyed exchange by repartitioning the exploded token rows up front.
That trades a wider second exchange (distinct items + 16 hash columns)
for shuffling ~3x the raw token rows once. It clearly wins at sf0.1 and
sf1; the r4 sf10 measurements were contaminated by host I/O noise
(identical code measured 27-92 s across windows).

Protocol (the measurement discipline that burned r3/r4):
- REFUSES to run unless 1-minute load average < 1.0 (prints it), and
  re-checks before every timed run.
- One session, both variants interleaved is avoided: all runs of one
  variant, then the other, then the first variant ONCE more as a drift
  sentinel (if the sentinel disagrees with that variant's min by >20%,
  the host moved and the run is marked unreliable).
- min-of-N per variant (N=3) — the repeatable cost.
- Asserts both variants produce the IDENTICAL pair set first.

Usage: python tools/ab_reps_fusion.py [SF_DIR] [OUT.json]
Defaults: /root/repo/.scratch/sf10, AB_REPS_FUSION.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrmr_spark.operators import dedup as DD
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

RUNS = 3


def loadavg() -> float:
    return os.getloadavg()[0]


def require_idle(limit: float = 1.0) -> None:
    la = loadavg()
    if la >= limit:
        print(f"host not idle (load {la:.2f} >= {limit}) — waiting", flush=True)
        while loadavg() >= limit:
            time.sleep(10)
    print(f"load ok: {loadavg():.2f}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "AB_REPS_FUSION.json"
    require_idle()
    spark = get_spark("lrmr-ab-reps-fusion")
    docs = load(spark, sf_dir, "documents")

    def pairs():
        return DD.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.9,
            fast=True,
        )

    # answer equality first (cheap at any SF relative to the timings)
    DD._FUSE_REPS_EXCHANGE = True
    fused_set = {(r.id_a, r.id_b) for r in pairs().collect()}
    DD._FUSE_REPS_EXCHANGE = False
    unfused_set = {(r.id_a, r.id_b) for r in pairs().collect()}
    assert fused_set == unfused_set, (
        f"variant pair sets differ: {len(fused_set)} vs {len(unfused_set)}"
    )
    print(f"pair sets identical: {len(fused_set)} pairs", flush=True)

    def timed_runs(fuse: bool, n: int) -> list[float]:
        DD._FUSE_REPS_EXCHANGE = fuse
        secs = []
        for _ in range(n):
            require_idle()
            t0 = time.time()
            pairs().count()
            secs.append(round(time.time() - t0, 3))
            print(f"fuse={fuse}: {secs[-1]} s", flush=True)
        return secs

    fused = timed_runs(True, RUNS)
    unfused = timed_runs(False, RUNS)
    sentinel = timed_runs(True, 1)
    DD._FUSE_REPS_EXCHANGE = True  # restore the default no matter what

    drift = abs(sentinel[0] - min(fused)) / min(fused)
    result = {
        "sf_dir": sf_dir,
        "pairs": len(fused_set),
        "runs_per_variant": RUNS,
        "fused_secs": fused,
        "unfused_secs": unfused,
        "fused_min": min(fused),
        "unfused_min": min(unfused),
        "sentinel_fused_sec": sentinel[0],
        "sentinel_drift_vs_fused_min": round(drift, 3),
        "reliable": drift <= 0.2,
        "winner": "fused" if min(fused) <= min(unfused) else "unfused",
        "speedup_pct": round(
            100.0 * (min(unfused) - min(fused)) / min(unfused), 1
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
