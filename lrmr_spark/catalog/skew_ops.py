"""Skew-operator catalog entries: the salted two-phase aggregate and
the replicated-salt join, oracle-checked against the plain (unsalted)
formulation — salting must never change the answer, only the shuffle
distribution.

The skewed key is synthesized from lineitem (half the rows collapse
onto one hot key), so the entries run on the standard tables and stay
SQL-expressible. Aggregates stick to counts and integer-valued
quantity sums, which are exact in double regardless of the salted
plan's different addition order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import skew as SK
from ..tables import load
from . import query

def _hot_key():
    """~50% of lineitem lands on hot_key=0; the rest spread over 1..99.
    (Built lazily: Column expressions need an active SparkContext.)"""
    return F.when(F.col("l_partkey") % 100 < 50, F.lit(0).cast("long")).otherwise(
        F.col("l_partkey") % 100
    )


@query(
    "skew_salted_agg",
    oracle="""
    SELECT CASE WHEN l_partkey % 100 < 50 THEN 0 ELSE l_partkey % 100 END AS hot_key,
           count(*) AS cnt,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY 1
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation on a synthesized hot key (half the
    table on one key). Phase 1 aggregates on (key, salt) spreading the
    hot key over 16 reducers; phase 2 merges partials on the true key.
    The oracle is the plain GROUP BY — identical answer, different
    shuffle distribution (mirrors the skew case the reference's static
    partition scheduler cannot rebalance)."""
    li = load(spark, sf_dir, "lineitem").withColumn("hot_key", _hot_key())
    return SK.salted_agg(
        li,
        ["hot_key"],
        partial={"c": F.count(F.lit(1)), "s": F.sum("l_quantity")},
        aggs={"cnt": F.sum("c"), "total_qty": F.sum("s")},
        salt=16,
    )


@query(
    "skew_replicated_join",
    oracle="""
    SELECT s_nationkey, count(*) AS n_items,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def skew_replicated_join(spark, sf_dir):
    """Replicated-salt join: the no-broadcast path for a skewed join
    key when the small side is too big to broadcast. The big side's key
    is salted; every small-side row is replicated per salt so each
    (key, salt) bucket still matches — one hot key spreads over 16
    tasks. Oracle is the plain join + agg."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    su = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    j = SK.replicate_join_small_side(li, su, on=["suppkey"], salt=16)
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("total_qty"),
    )
