"""Distributed EXACT global ranks and cumulative sums.

An unpartitioned window (``Window.orderBy`` with no ``partitionBy``)
compiles to ``Exchange SinglePartition`` — the whole frame funnels
through ONE task, the classic scale-killer for global ranking or
running totals over data-proportional rows (fine over bounded frames
like a 64-row bucket table or the day spine; fatal over customers or
events at 100 TB).

These helpers compute the SAME exact results with the two-phase
pattern MPP engines use for global ordering:

1. bucket every row by a coarse ORDER-ALIGNED key — a monotone
   function of the leading sort key, e.g. integer bit-width for
   positive values — so all rows of one bucket sort entirely before
   all rows of the next;
2. aggregate per-bucket counts/sums (a BOUNDED table: ≤64 log2
   buckets) and compute each bucket's running offset with a window
   over that bounded table only;
3. rank/cumsum within each bucket under a hash-partitioned window and
   add the bucket's offset.

Exactness requires only monotone alignment between bucket and order;
within-bucket skew degrades parallelism, never correctness — refine
the bucket (more key bits) if one value band dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bit_width_bucket",
    "with_global_cumsum",
    "with_global_cummax",
    "with_global_rank",
]


def bit_width_bucket(col: Column | str) -> Column:
    """Order-aligned coarse bucket for integers: the bit width of the
    value (≤64 buckets for any bigint). Monotone: every value of width
    w+1 exceeds every value of width w.

    Negatives collapse into bucket 0, below every non-negative bucket
    (``conv`` would otherwise reinterpret them as unsigned 64-bit and
    sort them ABOVE all positives — silently wrong ranks). Alignment
    stays exact for any input; only parallelism degrades if one sign
    dominates — refine the bucket in that case."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c < 0, F.lit(0))
        .otherwise(F.length(F.conv(c, 10, 2)))
        .cast("bigint")
    )


def _offsets(
    per_bucket: DataFrame, agg_col: str, bucket_desc: bool
) -> DataFrame:
    order = F.col("_bkt").desc() if bucket_desc else F.col("_bkt").asc()
    # bounded frame: one row per bucket — the single-partition window
    # here runs over ≤64 rows by construction, never the data
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    return per_bucket.select(
        "_bkt", F.coalesce(F.sum(agg_col).over(w), F.lit(0)).alias("_boff")
    )


def with_global_cumsum(
    df: DataFrame,
    value_col: str,
    bucket: Column,
    order_cols: list[Column],
    out_col: str = "cum",
    bucket_desc: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Exact running total of ``value_col`` in the global order given by
    ``order_cols`` — without a single-partition window over the data.
    ``bucket`` must be order-aligned with the leading sort key;
    ``bucket_desc=True`` when that key is descending.

    ``total_col``: also attach the GRAND total of ``value_col`` as a
    column of that name. It is summed over the same ≤64-row bucket
    table and rides the same broadcast join — callers needing
    cum/total shares avoid a second aggregation pass over the data."""
    b = df.withColumn("_bkt", bucket)
    per = b.groupBy("_bkt").agg(F.sum(value_col).alias("_bsum"))
    off = _offsets(per, "_bsum", bucket_desc)
    if total_col is not None:
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off = per.select(
            "_bkt",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.orderBy(
                        F.col("_bkt").desc() if bucket_desc else F.col("_bkt").asc()
                    ).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("_boff"),
            F.sum("_bsum").over(w_all).alias(total_col),
        )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off), "_bkt")  # bounded by construction (≤64 buckets)
        .withColumn(out_col, F.col("_boff") + F.sum(value_col).over(w_in))
        .drop("_bkt", "_boff")
    )


def with_global_cummax(
    df: DataFrame,
    value_col: str,
    bucket: Column,
    order_cols: list[Column],
    out_col: str = "cummax",
    bucket_desc: bool = False,
) -> DataFrame:
    """Exact running MAXIMUM (prefix max) of ``value_col`` in the
    global order given by ``order_cols`` — e.g. an event-time frontier
    over a global arrival order — without a single-partition window
    over the data. Each row's prefix max = greatest(max over all
    strictly-earlier buckets, running max within its own bucket);
    ``greatest`` ignores the NULL the first bucket sees."""
    b = df.withColumn("_bkt", bucket)
    per = b.groupBy("_bkt").agg(F.max(value_col).alias("_bmax"))
    order = F.col("_bkt").desc() if bucket_desc else F.col("_bkt").asc()
    w_off = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    off = per.select("_bkt", F.max("_bmax").over(w_off).alias("_bprev"))
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off), "_bkt")
        .withColumn(
            out_col, F.greatest(F.col("_bprev"), F.max(value_col).over(w_in))
        )
        .drop("_bkt", "_bprev")
    )


def with_global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    out_col: str = "rnk",
    bucket_desc: bool = False,
) -> DataFrame:
    """Exact global row_number in the order given by ``order_cols``
    (make it a total order — include a unique tiebreak column) without
    a single-partition window over the data."""
    b = df.withColumn("_bkt", bucket)
    per = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_bn"))
    off = _offsets(per, "_bn", bucket_desc)
    w_in = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(off), "_bkt")
        .withColumn(out_col, F.col("_boff") + F.row_number().over(w_in))
        .drop("_bkt", "_boff")
    )
