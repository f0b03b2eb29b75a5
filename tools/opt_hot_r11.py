"""r11 opt round: steady-state (2-run) call/count timing for a target
list of catalog entries at a given SF. The one-pass sweep
(time_catalog_r11.py) ranks cold, single-run wall times; this tool
separates codegen/first-run cost from the repeatable engine cost the
bench's min-of-2 measures.

Usage: python tools/opt_hot_r11.py [SF_DIR] [OUT.json] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrmr_spark.catalog import queries
from lrmr_spark.session import get_spark

DEFAULT_TARGETS = [
    # top of CATALOG_TIMES_r11.json (cold sweep), minus streaming twins
    "dedup_minhash_index_append",
    "embedding_pq_distortion",
    "dedup_minhash_fast_vs_md5",
    "dedup_pipeline_containment",
    "pq_train_codebook_iter",
    "ann_pq_append_topk",
    "text_winnowing_index_delete",
    "docs_quality_model_score",
    "dedup_minhash_stored_index",
    "docs_quality_topfrac_bucketed",
    "docs_quality_topfrac",
    "ann_lsh_pruned_topk",
    "dedup_simhash_fast_banding_lossless",
    "dedup_minhash_index_delete",
    # streaming twins (per-micro-batch overhead question)
    "streaming_interval_join",
    "streaming_quality_score",
    # headline stragglers
    "graph_label_propagation",
    "dedup_minhash_lsh_fast",
    "text_line_dedup_index",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "OPT_HOT_r11.json"
    targets = sys.argv[3:] or DEFAULT_TARGETS
    spark = get_spark("lrmr-opt-hot")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    rows = {}
    for name in targets:
        fn = qs[name]
        runs = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"hot:{name}:{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            runs.append(
                {"call": round(t1 - t0, 3), "count": round(t2 - t1, 3),
                 "total": round(t2 - t0, 3)}
            )
            spark.sparkContext.setJobDescription(None)
        rows[name] = runs
        print(json.dumps({name: runs}), flush=True)
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir,
             "loadavg": [round(x, 2) for x in os.getloadavg()],
             "runs": rows},
            f, indent=2,
        )


if __name__ == "__main__":
    main()
