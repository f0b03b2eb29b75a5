"""Paired A/B for dedup_minhash_fast_vs_md5's shared-items restructure (r12).

The entry runs the SAME corpus through minhash_lsh_pairs twice — once
per hash family — and the hash-free front half (tokenize, explode, the
fused _id exchange, per-(doc, item) dedup/count) is byte-identical
between the arms: only the item/signature hashing differs downstream.
The restructure builds that item table once (_minhash_items), persists
it (persist, NOT localCheckpoint — the cache keeps
hashpartitioning(_id) so both per-doc signature aggregations stay
exchange-free), and hashes twice.

Arms (interleaved, same session, fingerprint-asserted identical):
  before: two independent minhash_lsh_pairs calls (the pre-r12 shape)
  after:  shared _minhash_items().persist() + shared_items= in both

Usage: python tools/ab_fast_vs_md5.py [sf_dir] [reps]
Writes EXP_FAST_VS_MD5.json when EXP_OUT is set.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lrmr_spark.operators import dedup as DD
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load


def _outer(fast, md5):
    f_, m_ = fast.alias("f"), md5.alias("m")
    return (
        f_.join(
            m_,
            (F.col("f.id_a") == F.col("m.id_a"))
            & (F.col("f.id_b") == F.col("m.id_b")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("f.id_a"), F.col("m.id_a")).alias("id_a"),
            F.coalesce(F.col("f.id_b"), F.col("m.id_b")).alias("id_b"),
            F.coalesce(F.col("m.jaccard"), F.col("f.jaccard")).alias("jaccard"),
            F.col("f.id_a").isNotNull().alias("in_fast"),
            F.col("m.id_a").isNotNull().alias("in_md5"),
        )
        .orderBy("id_a", "id_b")
    )


def arm_before(spark, sf_dir: str):
    docs = load(spark, sf_dir, "documents")
    fast = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.9,
        fast=True,
    )
    md5 = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.9,
        fast=False,
    )
    return _outer(fast, md5).collect()


def arm_after(spark, sf_dir: str):
    docs = load(spark, sf_dir, "documents")
    items = DD._minhash_items(docs, "doc_id", "text", "multiset", 3).persist()
    fast = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.9,
        fast=True, shared_items=items,
    )
    md5 = DD.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.9,
        fast=False, shared_items=items,
    )
    items.unpersist()
    return _outer(fast, md5).collect()


def fp(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(
            f"{r['id_a']}|{r['id_b']}|{r['jaccard']!r}|"
            f"{r['in_fast']}|{r['in_md5']};".encode()
        )
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-fast-vs-md5")
    spark.range(1000).selectExpr("sum(id)").collect()
    bt, at, fps = [], [], set()
    for rep in range(reps):
        spark.sparkContext.setJobDescription(f"before rep{rep}")
        t0 = time.time()
        rows_b = arm_before(spark, sf_dir)
        bt.append(round(time.time() - t0, 3))
        fps.add(fp(rows_b))
        spark.sparkContext.setJobDescription(f"after rep{rep}")
        t0 = time.time()
        rows_a = arm_after(spark, sf_dir)
        at.append(round(time.time() - t0, 3))
        fps.add(fp(rows_a))
    assert len(fps) == 1, f"fingerprint drift: {fps}"
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "before_s": bt,
        "after_s": at,
        "min_before": min(bt),
        "min_after": min(at),
        "n_rows": len(rows_a),
        "fingerprint": fps.pop(),
        "loadavg": round(os.getloadavg()[0], 2),
    }
    dest = os.environ.get("EXP_OUT")
    if dest:
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
