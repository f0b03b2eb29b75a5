"""Index-write phase profile (r11 opt round): the bench build/serve
split shows ann_ivfpq_topk's serve at ~0.1 s while its ~5.5 s build
tracks the host's (slow, ~27 MB/s) disk — but "build" bundles driver
literal construction, Catalyst analysis of the big code-expression
projection, the encode compute, and the partitioned parquet write
(incl. commit renames + _meta). This harness splits them:

  phases per rep (ann_ivfpq_topk shape, sf under test):
    centroids   _centroids() literal derivation (lru-cached after 1st)
    plan        build the encode DataFrame (analysis only, no action)
    encode      noop-sink the encode projection (compute, no write)
    write       write_ivfpq_index as shipped (encode + write + _meta)
    serve       ivfpq_adc_topk count

  and the same split for text_line_dedup_index's two epoch writes.

Also reports output file count + bytes so file-count overhead (commit
renames on a slow disk) is separable from byte volume.

Usage: python tools/exp_idx_write.py OUT.json [SF_DIR] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators import similarity as SIM
from lrmr_spark.operators import text as TX
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def _tree_stats(path):
    n, b = 0, 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            n += 1
            b += os.path.getsize(os.path.join(root, fn))
    return {"files": n, "bytes": b}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "EXP_IDX_WRITE.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("lrmr-exp-idx-write")
    spark.range(1000).selectExpr("sum(id)").collect()

    from lrmr_spark.catalog.similarity_ops import _centroids, _query_vec

    out = {"sf_dir": sf_dir, "loadavg_start": [round(x, 2) for x in os.getloadavg()], "reps": []}
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    ivf_path = os.path.join("/tmp", f"lrmr_expidx_ivfpq_{tag}")
    line_path = os.path.join("/tmp", f"lrmr_expidx_line_{tag}")

    for rep in range(reps):
        r: dict = {}
        t0 = time.time()
        coarse = [list(c) for c in _centroids()]
        pq_cents = [list(c) for c in _centroids()[:4]]
        r["ivf_centroids"] = round(time.time() - t0, 3)

        emb = load(spark, sf_dir, "embeddings")
        t0 = time.time()
        enc = SIM._ivfpq_encode(
            emb.filter(F.col("embedding").isNotNull()),
            coarse, pq_cents, 8, False, "vec_id", "embedding",
        )
        enc.schema  # force analysis
        r["ivf_plan"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("expidx: ivfpq encode noop")
        t0 = time.time()
        enc.write.format("noop").mode("overwrite").save()
        r["ivf_encode_noop"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("expidx: ivfpq write")
        t0 = time.time()
        SIM.write_ivfpq_index(emb, ivf_path, coarse, pq_cents, num_sub=8)
        r["ivf_write"] = round(time.time() - t0, 3)
        r["ivf_tree"] = _tree_stats(ivf_path)

        spark.sparkContext.setJobDescription("expidx: ivfpq serve")
        t0 = time.time()
        SIM.ivfpq_adc_topk(
            spark, ivf_path, list(_query_vec()), coarse, pq_cents, k=10, n_probe=2
        ).count()
        r["ivf_serve"] = round(time.time() - t0, 3)

        d = load(spark, sf_dir, "documents")
        spark.sparkContext.setJobDescription("expidx: line epoch writes")
        t0 = time.time()
        TX.write_line_index(
            d.filter(F.col("doc_id") % 4 == 0), line_path, "doc_id", "text",
            width=10, epoch=0,
        )
        r["line_write_e0"] = round(time.time() - t0, 3)
        t0 = time.time()
        TX.write_line_index(
            d.filter(F.col("doc_id") % 4 == 2), line_path, "doc_id", "text",
            width=10, epoch=1,
        )
        r["line_write_e1"] = round(time.time() - t0, 3)
        r["line_tree"] = _tree_stats(line_path)
        spark.sparkContext.setJobDescription("expidx: line serve")
        t0 = time.time()
        TX.line_dedup_with_index(
            d.filter(F.col("doc_id") % 2 == 1), line_path, "doc_id", "text", min_df=2
        ).count()
        r["line_serve"] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        out["reps"].append(r)
        print(json.dumps(r), flush=True)

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
