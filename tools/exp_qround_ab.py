"""r11 opt: A/B the perceptron round aggregation construction —
Column-API (shipped _train_rounds body) vs one parsed SQL string
(the PQ/IVF lesson: py4j Column construction is serial driver cost).
Equality of the returned 32 gradient scalars is asserted each rep.

Usage: python tools/exp_qround_ab.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.catalog.corpus_ops import _QC_TEACHER
from lrmr_spark.operators import text as TX
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def round_api(base, w, dim):
    w_lit = F.array(*[F.lit(int(wi)).cast("bigint") for wi in w])
    z = F.aggregate(
        F.zip_with(F.col("_x"), w_lit, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    mis = (F.col("_y") * z) <= 0
    row = base.agg(
        *[
            F.sum(
                F.when(mis, F.col("_y") * F.element_at("_x", j + 1)).otherwise(0)
            ).alias(f"g{j}")
            for j in range(dim)
        ]
    ).collect()[0]
    return [int(row[f"g{j}"]) for j in range(dim)]


def round_sql(base, w, dim):
    w_arr = "array(" + ", ".join(f"{int(wi)}L" for wi in w) + ")"
    z = (
        f"aggregate(zip_with(_x, {w_arr}, (a, b) -> a * b), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    mis = f"(_y * ({z})) <= 0"
    sums = [
        f"sum(CASE WHEN {mis} THEN _y * element_at(_x, {j + 1}) "
        f"ELSE 0 END) AS g{j}"
        for j in range(dim)
    ]
    row = base.agg(*[F.expr(s) for s in sums]).collect()[0]
    return [int(row[f"g{j}"]) for j in range(dim)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("lrmr-exp-qround")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load(spark, sf_dir, "documents")
    teacher = _QC_TEACHER
    dim = len(teacher)
    x = TX.hashed_ngram_features("text", dim)
    t_lit = F.array(*[F.lit(int(t)).cast("bigint") for t in teacher])
    tdot = F.aggregate(
        F.zip_with(x, t_lit, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    base = d.select(
        x.alias("_x"),
        F.when(tdot > 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint").alias("_y"),
    ).localCheckpoint(eager=True)

    # a realistic non-zero w (one API round from w=0)
    w1 = round_api(base, [0] * dim, dim)

    out: dict[str, list[float]] = {}
    arms = [("api", round_api), ("sql", round_sql)]
    results = {}
    for r in range(reps):
        for name, fn in arms if r % 2 == 0 else list(reversed(arms)):
            t0 = time.time()
            g = fn(base, w1, dim)
            dt = round(time.time() - t0, 3)
            out.setdefault(name, []).append(dt)
            results.setdefault(name, g)
            assert g == results["api" if "api" in results else name], (
                f"gradient mismatch {name}"
            )
            print(f"{name}: {dt}", flush=True)
    assert results["api"] == results["sql"], "api vs sql gradients differ"
    print("gradients equal:", results["api"][:4], "...")
    with open("EXP_QROUND_AB.json", "w") as f:
        json.dump(
            {"sf_dir": sf_dir,
             "loadavg": [round(v, 2) for v in os.getloadavg()],
             "times": out},
            f, indent=2,
        )
    print(json.dumps({k: min(v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
