"""Window-function surface (SURVEY §2.5 — absent from the reference).

All windows are keyed (partitionBy) so state stays bounded per
partition at any scale; no global (partition-less) windows, which would
serialize through a single task. Orderings always include a unique
tiebreaker column so results are deterministic under value ties.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "window_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_topk_per_customer(spark, sf_dir):
    """Top-K per group via row_number — the scalable top-K pattern
    (single hash shuffle on the partition key, no global sort)."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
           AS running_total
    FROM orders
    """,
)
def window_running_total(spark, sf_dir):
    """Running sum per customer over order time."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 2)
           AS delta
    FROM orders
    """,
)
def window_lag_delta(spark, sf_dir):
    """lag(): price delta vs the customer's previous order (NULL for
    the first order — preserved identically on both engines)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta"),
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(rank() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
    FROM orders
    """,
)
def window_rank_dense(spark, sf_dir):
    """rank/dense_rank — deterministic under ties (equal values share a
    rank), so no tiebreaker needed in the ORDER BY."""
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(floor(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
                      * 1.0 / count(*) OVER w) AS BIGINT) / 100.0 AS mavg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark, sf_dir):
    """Sliding row-frame aggregate (4-order moving average), computed
    cent-exact: integer-cent sliding sum, floor-divided per frame. Pure
    float averages differ between engines in the last ulp (segment-tree
    vs re-accumulation) and round() itself differs at decimal
    boundaries (Spark rounds the shortest decimal repr, DuckDB the
    binary value), so the portable spec stays in exact integer space
    until the final division by 100."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    mavg_cents = F.floor(
        F.sum(cents).over(w) * F.lit(1.0) / F.count(F.lit(1)).over(w)
    ).cast("bigint")
    return load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", (mavg_cents / 100.0).alias("mavg")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
             AS n_similar_price
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE (value-based) frame: orders within ±10000 of the current
    price. Range frames depend only on values, so results are
    deterministic under ties without an order tiebreaker."""
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


@query(
    "window_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER w AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_value(spark, sf_dir):
    """first/last/nth_value over the full partition frame (unbounded
    both ways — the frame that makes last_value meaningful)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "unpivot_flag_metrics",
    oracle="""
    SELECT l_returnflag, 'sum_qty' AS metric,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS val
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS metric,
           round(CAST(sum(l_discount) AS DOUBLE), 2) AS val
    FROM lineitem GROUP BY l_returnflag
    """,
)
def unpivot_flag_metrics(spark, sf_dir):
    """Unpivot (wide → long) via stack(): per-flag aggregate columns
    melted into (metric, val) rows."""
    agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        )
    )
    return agg.selectExpr(
        "l_returnflag",
        "stack(2, 'sum_qty', sum_qty, 'sum_disc', sum_disc) AS (metric, val)",
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           round(CAST(percent_rank() OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice) AS DOUBLE), 6) AS pr
    FROM orders
    """,
)
def window_percent_rank(spark, sf_dir):
    """percent_rank (rank-based, tie-stable)."""
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
        )
    )
