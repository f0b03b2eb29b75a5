"""Synthesize a ~K× blow-up of an SF directory for scale rehearsal.

Usage: python tools/make_scale.py [src_sf_dir] [out_dir] [K]
Defaults: /root/testdata/sf0.1 → /root/repo/.scratch/sf1, K=10.

Each fact table is unioned K times with every entity key shifted by
copy_index × (max_key + 1), so per-entity structure (sessions, order
line groups, dup clusters) replicates at K× cardinality instead of
inflating single entities — the realistic scale-up shape. Document
text gets a per-copy suffix token so cross-copy exact/near-dup pairs
don't explode quadratically (intra-copy dup structure is preserved
verbatim). Bounded dims (nation, region) stay as-is. Events keep
their timestamp span (denser traffic, same windows) — matching how a
bigger deployment looks: more users, not a longer history.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lrmr_spark.session import get_spark
from lrmr_spark.tables import TABLES

# entity-key columns shifted per copy (column -> table whose max defines
# the shift stride); text columns salted per copy
_SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}
_STRIDE_OF = {  # which table's key defines each column's stride
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def scale_table(dfs: dict[str, DataFrame], name: str, k: int) -> DataFrame:
    df = dfs[name]
    cols = _SHIFT[name]
    if not cols:
        return df
    strides = {
        c: dfs[t].agg(F.max(key)).collect()[0][0] + 1 for c, (t, key) in
        ((c, _STRIDE_OF[c]) for c in cols)
    }
    copies = []
    for i in range(k):
        c = df
        for col in cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * strides[col]))
        if name == "documents" and i > 0:
            # Per-copy salt must push cross-copy Jaccard BELOW the 0.9
            # dedup threshold or near-dup pairs grow quadratically in K
            # (the r3 generator appended ONE token: J ≈ n/(n+2) ≈ 0.98
            # for 100-token docs, so all K copies of a doc paired with
            # each other — 201k pairs at K=10 instead of ~2.4k). Append
            # ceil(n_tokens/6) distinct salt tokens: J = n/(n + 2n/6)
            # ≈ 0.75 < 0.9, so intra-copy dup structure survives
            # verbatim and cross-copy pairs vanish — near-dup count
            # scales linearly, the realistic crawl-growth shape.
            n_salt = F.greatest(
                F.lit(1),
                F.ceil(F.size(F.split(F.col("text"), "\\s+")) / F.lit(6)),
            )
            salt = F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), n_salt),
                    lambda j: F.concat(F.lit(f"cs{i}x"), j.cast("string")),
                ),
            )
            c = c.withColumn("text", F.concat_ws(" ", F.col("text"), salt))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scale")
    from lrmr_spark.tables import load

    dfs = {t: load(spark, src, t) for t in TABLES}
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        scale_table(dfs, t, k).write.mode("overwrite").parquet(out)
        print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
