"""Similarity-search catalog entries over the embeddings table.

The query vector is the embedding of vec_id=0, read at oracle-build
time and inlined as literals on both sides so the two engines compute
the exact same arithmetic (double accumulation, round to 6).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..tables import load
from . import query

_SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@lru_cache(maxsize=None)
def _query_vec(sf_dir: str = _SF_ORACLE) -> tuple[float, ...]:
    """The designated query vector (vec_id=0), as float64 literals."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()):
        if vid == 0:
            return tuple(float(x) for x in emb)
    raise ValueError("vec_id=0 not found")


def _vec_sql_literal(vec: tuple[float, ...]) -> str:
    return "[" + ", ".join(repr(x) for x in vec) + "]::DOUBLE[]"


def _dot_sql(a: str, b: str) -> str:
    """Sequential left-to-right double accumulation — same association
    order as the Spark-side F.aggregate, so results are bit-comparable
    before rounding."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, 65), i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def _ann_topk_oracle() -> str:
    q = _vec_sql_literal(_query_vec())
    dot = _dot_sql("e.embedding", "q.qv")
    norm_e = f"sqrt({_dot_sql('e.embedding', 'e.embedding')})"
    norm_q = f"sqrt({_dot_sql('q.qv', 'q.qv')})"
    return f"""
    WITH q AS (SELECT {q} AS qv)
    SELECT e.vec_id, round({dot} / ({norm_e} * {norm_q}), 6) AS score
    FROM embeddings e, q
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
    """


@query("ann_cosine_topk", oracle=_ann_topk_oracle)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for the query vector — the exact ANN
    baseline. JVM-side zip_with/aggregate arithmetic; per-partition
    top-k then driver merge (TakeOrderedAndProject): linear,
    broadcast-query, no shuffle."""
    return SIM.cosine_topk(
        load(spark, sf_dir, "embeddings"), list(_query_vec()), k=10
    )


def _lsh_bucket_oracle() -> str:
    planes = SIM.hyperplanes(8, 64)
    bits = []
    for row in planes:
        w = "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"
        bits.append(
            f"CASE WHEN {_dot_sql('e.embedding', w)} > 0 THEN '1' ELSE '0' END"
        )
    concat = " || ".join(bits)
    return f"""
    SELECT e.vec_id, {concat} AS bucket
    FROM embeddings e
    """


@query("ann_lsh_buckets", oracle=_lsh_bucket_oracle)
def ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket assignment (8 deterministic
    md5-derived planes) — the scale path: precompute/partition by
    bucket so a query probes 1/256 of the corpus. The oracle recomputes
    the identical planes and projections in SQL."""
    planes = SIM.hyperplanes(8, 64)
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", SIM.lsh_bucket(F.col("embedding"), planes).alias("bucket")
    )


def _cos_dedup_oracle() -> str:
    dot = _dot_sql("l.embedding", "r.embedding")
    nl = f"sqrt({_dot_sql('l.embedding', 'l.embedding')})"
    nr = f"sqrt({_dot_sql('r.embedding', 'r.embedding')})"
    return f"""
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           round({dot} / ({nl} * {nr}), 6) AS score
    FROM embeddings l JOIN embeddings r
      ON l.label = r.label AND l.vec_id < r.vec_id
    WHERE round({dot} / ({nl} * {nr}), 6) >= 0.95
    """


@query("embedding_cosine_dedup", oracle=_cos_dedup_oracle)
def embedding_cosine_dedup(spark, sf_dir):
    """Embedding near-dup pairs: exact pairwise cosine within the label
    blocking key (at scale the block is an LSH bucket). Never an
    unblocked cross join."""
    return SIM.cosine_dedup_pairs(
        load(spark, sf_dir, "embeddings"), "label", threshold=0.95
    )


@query(
    "embedding_norm_stats",
    oracle=f"""
    SELECT label, count(*) AS cnt,
           round(avg(sqrt({_dot_sql("embedding", "embedding").replace('e.embedding', 'embedding')})), 4)
             AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    """Vector-norm statistics per label (sanity profile of an embedding
    corpus; one scan, JVM-side aggregate arithmetic)."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(SIM.l2_norm(F.col("embedding"))), 4).alias("avg_norm"),
    )
