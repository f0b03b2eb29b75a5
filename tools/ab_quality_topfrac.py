"""Paired A/B for the top-fraction quality-curation entries (r12).

Both docs_quality_topfrac and docs_quality_topfrac_bucketed run the
md5 featurize pipeline TWICE over the corpus — once inside
train_hashed_ngram_weights (whose (_x, _y) checkpoint is discarded)
and again via hashed_ngram_score — and eagerly checkpoint twice.
hashed_ngram_classifier already owns the featurize-once shape: train
and serve share ONE materialized working set, scores are a cheap
dot-product projection of that checkpoint.

Arms (interleaved, same session, fingerprint-asserted identical):
  before: train_hashed_ngram_weights + hashed_ngram_score + 2nd ckpt
  after:  hashed_ngram_classifier(...).select(doc_id, score)

Usage: python tools/ab_quality_topfrac.py [sf_dir] [reps]
Writes EXP_QUALITY_TOPFRAC.json when EXP_OUT is set.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lrmr_spark.catalog.corpus_ops import _QC_TEACHER
from lrmr_spark.operators import text as TX
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def _threshold_window(scored, k: int):
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).alias("_c"))
    return (
        hist.withColumn(
            "_cum",
            F.sum("_c").over(
                W.orderBy(F.desc("score")).rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
        .filter(F.col("_cum") >= k)
        .agg(F.max("score").alias("_t"))
    )


def _finish(scored, th):
    return (
        scored.crossJoin(F.broadcast(th))
        .select(
            "doc_id", "score", (F.col("score") >= F.col("_t")).alias("keep")
        )
        .orderBy("doc_id")
    )


def arm_before(spark, sf_dir: str, bucketed: bool):
    d = load(spark, sf_dir, "documents")
    w = TX.train_hashed_ngram_weights(d, "text", _QC_TEACHER, iterations=3)
    scored = d.select(
        "doc_id", TX.hashed_ngram_score("text", w).alias("score")
    ).localCheckpoint(eager=True)
    k = max(1, (2 * scored.count()) // 5)
    if bucketed:
        th = TX.exact_topk_threshold_bucketed(
            scored, "score", k, bucket_width=1024
        )
    else:
        th = _threshold_window(scored, k)
    rows = _finish(scored, th).collect()
    scored.unpersist()
    return rows


def arm_after(spark, sf_dir: str, bucketed: bool):
    d = load(spark, sf_dir, "documents")
    scored = TX.hashed_ngram_classifier(
        d, "doc_id", "text", _QC_TEACHER, iterations=3
    ).select("doc_id", "score")
    k = max(1, (2 * scored.count()) // 5)
    if bucketed:
        th = TX.exact_topk_threshold_bucketed(
            scored, "score", k, bucket_width=1024
        )
    else:
        th = _threshold_window(scored, k)
    return _finish(scored, th).collect()


def fp(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(f"{r['doc_id']}|{r['score']}|{r['keep']};".encode())
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-quality-topfrac")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict = {"sf_dir": sf_dir, "reps": reps, "arms": {}}
    for bucketed in (False, True):
        tag = "bucketed" if bucketed else "window"
        bt, at, fps = [], [], set()
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"before/{tag} rep{rep}")
            t0 = time.time()
            rows_b = arm_before(spark, sf_dir, bucketed)
            bt.append(round(time.time() - t0, 3))
            fps.add(fp(rows_b))
            spark.sparkContext.setJobDescription(f"after/{tag} rep{rep}")
            t0 = time.time()
            rows_a = arm_after(spark, sf_dir, bucketed)
            at.append(round(time.time() - t0, 3))
            fps.add(fp(rows_a))
        assert len(fps) == 1, f"fingerprint drift in {tag}: {fps}"
        out["arms"][tag] = {
            "before_s": bt,
            "after_s": at,
            "min_before": min(bt),
            "min_after": min(at),
            "fingerprint": fps.pop(),
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(tag, out["arms"][tag], file=sys.stderr, flush=True)
    dest = os.environ.get("EXP_OUT")
    if dest:
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
