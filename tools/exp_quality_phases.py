"""r11 opt: phase-split the quality-model family's shared training path
(train_hashed_ngram_weights) and the write/load/serve lifecycle of
docs_quality_model_score. Guide §1: measure before changing.

Phases timed (2 reps each where meaningful):
  feat_ckpt   — features localCheckpoint (the tokenize+md5+bucket-count pass)
  round       — one perceptron round agg (collect of 32 scalars)
  weights_wr  — createDataFrame(list) + parquet write (suspect: Python boot)
  weights_wr_jvm — same rows via pure-JVM spark.range construction
  meta_wr     — the _meta JSON write
  load        — load_quality_model (meta read + weights collect)
  score_noop  — scoring pass from loaded weights, noop sink

Usage: python tools/exp_quality_phases.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.catalog.corpus_ops import _QC_TEACHER
from lrmr_spark.tables import load
from lrmr_spark.operators import text as TX
from lrmr_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("lrmr-exp-quality")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load(spark, sf_dir, "documents")
    teacher = _QC_TEACHER
    dim = len(teacher)
    out: dict[str, list[float]] = {}

    def rec(k: str, s: float) -> None:
        out.setdefault(k, []).append(round(s, 3))
        print(f"{k}: {s:.3f}", flush=True)

    for _ in range(2):
        # --- feature checkpoint (what train_hashed_ngram_weights does)
        x = TX.hashed_ngram_features("text", dim)
        t_lit = F.array(*[F.lit(int(t)).cast("bigint") for t in teacher])
        tdot = F.aggregate(
            F.zip_with(x, t_lit, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        t0 = time.time()
        base = d.select(
            x.alias("_x"),
            F.when(tdot > 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint").alias("_y"),
        ).localCheckpoint(eager=True)
        rec("feat_ckpt", time.time() - t0)

        # --- one round
        w = [0] * dim
        t0 = time.time()
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
        rec("round", time.time() - t0)
        w = [int(row[f"g{j}"]) for j in range(dim)]
        base.unpersist()

        path = "/tmp/lrmr_exp_qmodel"
        # --- weights write, current form (createDataFrame from list)
        t0 = time.time()
        spark.createDataFrame(
            [(j, int(wi)) for j, wi in enumerate(w)], "bucket int, weight bigint"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/weights")
        rec("weights_wr", time.time() - t0)

        # --- weights write, pure-JVM form
        wl = F.array(*[F.lit(int(wi)).cast("bigint") for wi in w])
        t0 = time.time()
        spark.range(dim).select(
            F.col("id").cast("int").alias("bucket"),
            F.element_at(wl, F.col("id").cast("int") + 1).alias("weight"),
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/weights_jvm")
        rec("weights_wr_jvm", time.time() - t0)

        # verify identical rows
        a = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/weights").collect()
        )
        b = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{path}/weights_jvm").collect()
        )
        assert a == b, "weights rows differ between construction forms"

        # --- meta write
        t0 = time.time()
        spark.range(1).select(
            F.lit(dim).cast("int").alias("n_buckets"),
            F.lit(3).cast("int").alias("iterations"),
            F.lit("uni+bigram").alias("feature"),
            F.lit("md5-q-6").alias("hash"),
            F.lit("x" * 16).alias("teacher_fp"),
        ).coalesce(1).write.mode("overwrite").json(f"{path}/_meta")
        rec("meta_wr", time.time() - t0)

        # --- load (meta read + weights collect)
        t0 = time.time()
        TX.load_quality_model(spark, path)
        rec("load", time.time() - t0)

        # --- scoring pass with frozen weights, noop sink
        t0 = time.time()
        d.select(
            "doc_id", TX.hashed_ngram_score("text", w).alias("score")
        ).withColumn("keep", F.col("score") > 0).write.format("noop").mode(
            "overwrite"
        ).save()
        rec("score_noop", time.time() - t0)

    with open("EXP_QUALITY_PHASES.json", "w") as f:
        json.dump(
            {"sf_dir": sf_dir,
             "loadavg": [round(v, 2) for v in os.getloadavg()],
             "phases": out},
            f, indent=2,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
