"""r11 opt: A/B the hashed_ngram_features bucket-count formulation.

Arms (all over the same documents table, noop sink, fingerprint-verified
against the shipped form):
  v0_current   — shipped: transform(seq 0..31, j -> size(filter(bv, b==j)))
  v1_buckets   — buckets array only + aggregate-sum (isolates gram-hash cost)
  v2_aggupd    — single aggregate pass with per-element array update
  v3_explodegb — posexplode grams -> groupBy(mono_id) with 32 conditional
                 sums -> array pack (codegen'd sums, one doc-keyed shuffle)

Fingerprint: sum over docs of xxhash64(x array) — order-insensitive.
Usage: python tools/exp_qfeat_ab.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators.text import hashed_ngram_features, shingles, tokens
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

N_BUCKETS = 32


def buckets_col(col):
    toks = tokens(col)
    grams = F.concat(toks, shingles(col, 2))
    return F.transform(
        grams,
        lambda g: F.conv(
            F.substring(F.md5(F.concat(F.lit("q:"), g)), 1, 6), 16, 10
        ).cast("long")
        % N_BUCKETS,
    )


def v0(d):
    return d.select(hashed_ngram_features("text", N_BUCKETS).alias("_x"))


def v1(d):
    # buckets only: forces tokenization+md5 but not the 32-pass count
    return d.select(
        F.aggregate(
            buckets_col("text"), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("_s")
    )


def v2(d):
    bv = buckets_col("text")
    counts = F.aggregate(
        bv,
        F.array_repeat(F.lit(0).cast("long"), N_BUCKETS),
        lambda acc, b: F.transform(
            acc, lambda v, i: F.when(i.cast("long") == b, v + 1).otherwise(v)
        ),
    )
    return d.select(counts.alias("_x"))


def v3(d):
    rows = d.select(
        F.monotonically_increasing_id().alias("_rid"), F.col("text")
    ).select("_rid", F.explode_outer(buckets_col("text")).alias("_b"))
    return (
        rows.groupBy("_rid")
        .agg(
            *[
                F.sum(
                    F.when(F.col("_b") == j, 1).otherwise(0)
                ).cast("long").alias(f"c{j}")
                for j in range(N_BUCKETS)
            ]
        )
        .select(
            F.array(*[F.col(f"c{j}") for j in range(N_BUCKETS)]).alias("_x")
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("lrmr-exp-qfeat")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load(spark, sf_dir, "documents")

    # fingerprints (v1 is a different shape on purpose — no fp check)
    fps = {}
    for name, fn in [("v0_current", v0), ("v2_aggupd", v2), ("v3_explodegb", v3)]:
        fps[name] = fn(d).agg(
            F.sum(F.xxhash64(F.col("_x")).cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    base = fps["v0_current"]
    for name, row in fps.items():
        assert (row["s"], row["n"]) == (base["s"], base["n"]), (
            f"{name} fingerprint mismatch: {row} vs {base}"
        )
    print(f"fingerprints equal: s={base['s']} n={base['n']}", flush=True)

    out: dict[str, list[float]] = {}
    arms = [("v0_current", v0), ("v1_buckets", v1), ("v2_aggupd", v2),
            ("v3_explodegb", v3)]
    for r in range(reps):
        for name, fn in arms if r % 2 == 0 else list(reversed(arms)):
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            out.setdefault(name, []).append(dt)
            print(f"{name}: {dt}", flush=True)
    with open("EXP_QFEAT_AB.json", "w") as f:
        json.dump(
            {"sf_dir": sf_dir,
             "loadavg": [round(v, 2) for v in os.getloadavg()],
             "fingerprint": {"s": int(base["s"]), "n": int(base["n"])},
             "times": out},
            f, indent=2,
        )
    print(json.dumps({k: min(v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
