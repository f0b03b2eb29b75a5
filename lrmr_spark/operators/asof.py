"""As-of and range joins — operators Spark lacks natively, composed
from built-in DataFrame ops (SURVEY §2.5 extension; no Pandas fallback
needed).

As-of join (backward-inclusive): for each left row, the latest right
row with ``right_ts <= left_ts`` in the same key group. Implemented as
the union-and-carry plan: tag both sides, sort within key by
(ts, side), carry the last non-null right payload with an
`ignoreNulls` last() window. ONE shuffle on the key — no row
explosion, no per-left binary search; this is the standard distributed
as-of formulation (pandas merge_asof semantics, Spark-shaped).

Range join: equi-join on (key, time-bucket) with neighbor-bucket
expansion, then an exact predicate filter. Each row joins at most
2·(width/bucket)+1 buckets, bounding the cross product regardless of
data size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join, backward- or forward-inclusive.

    ``direction="backward"`` (default): every left row plus
    ``right_cols`` of the MOST RECENT right row with
    ``right_ts <= left_ts`` per ``on`` group (null when none).
    ``direction="forward"``: the EARLIEST right row with
    ``right_ts >= left_ts`` — next-event attribution (e.g. "first click
    after each purchase"). Both are the same union-and-carry plan with
    the window frame mirrored; still ONE shuffle on the key.
    ``tiebreak`` orders equal-timestamp right rows (backward: last
    wins, forward: first wins); pass a unique right column to make
    ties deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    backward = direction == "backward"
    payload = F.struct(*[F.col(c) for c in right_cols])
    # at equal ts the right row must be eligible: rights sort before
    # lefts for backward-inclusive, after lefts for forward-inclusive
    r_side, l_side = (0, 1) if backward else (1, 0)
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        payload.alias("_rv"),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).alias("_tb"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"),
    )
    r = r.withColumn("_lv", F.lit(None).cast(l.schema["_lv"].dataType))
    base = W.partitionBy(*on).orderBy("_ts", "_side", "_tb")
    if backward:
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        carry = F.last("_rv", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        carry = F.first("_rv", ignorenulls=True).over(w)
    carried = l.unionByName(r).withColumn("_last_rv", carry)
    out = carried.filter(F.col("_side") == l_side).select(
        F.col("_lv.*"),
        *[F.col("_last_rv").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Bounded time-range join: pairs (l, r) in the same ``on`` group
    with ``right_ts - left_ts`` in [lower, upper] seconds.

    Bucket width = the range span, so each left row expands to at most
    two bucket keys; the equi-join on (key, bucket) co-locates
    candidates and the exact predicate prunes. Output: all left
    columns + right columns suffixed '_r'.
    """
    on = list(on)
    # microsecond-exact arithmetic (unix_timestamp truncates to seconds
    # and would disagree with interval predicates at boundaries)
    lower_us = lower_seconds * 1_000_000
    upper_us = upper_seconds * 1_000_000
    span = max(upper_us - lower_us, 1)
    # integer division: float floor() at bucket boundaries could assign
    # a candidate to the wrong bucket and silently drop a true pair
    l_bucket = F.expr(f"(unix_micros({left_ts}) + {lower_us}) div {span}")
    l = left.withColumn("_b", F.explode(F.array(l_bucket, l_bucket + 1)))
    r = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns],
    ).withColumn("_b", F.expr(f"unix_micros({right_ts}_r) div {span}"))
    cond = [l[k] == r[f"{k}_r"] for k in on] + [l["_b"] == r["_b"]]
    dt = F.unix_micros(F.col(f"{right_ts}_r")) - F.unix_micros(F.col(left_ts))
    return (
        l.join(r, cond)
        .filter((dt >= lower_us) & (dt <= upper_us))
        .drop("_b")
    )
