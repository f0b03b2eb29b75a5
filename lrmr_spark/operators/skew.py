"""Skew-handling helpers for 100 TB-scale shuffles.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins automatically; these helpers cover the cases AQE can't: skewed
aggregations and skewed broadcast-side-too-big joins, via explicit key
salting (two-phase aggregate) and replicated-salt joins.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "replicate_join_small_side"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    partial: Mapping[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (key, random salt) spreading a hot key over ``salt`` reducers;
    phase 2 merges partials on the true key.

    ``partial`` maps intermediate name → phase-1 aggregate over input
    columns; ``aggs`` maps final name → phase-2 aggregate over the
    intermediate names. Example::

        salted_agg(df, ["k"],
                   partial={"c": F.count(F.lit(1)), "s": F.sum("v")},
                   aggs={"cnt": F.sum("c"), "total": F.sum("s")})

    Spark's hash aggregate already does map-side partials, so plain
    groupBy handles moderate skew; use this when a single key's
    *reduce-side* state explodes (e.g. collect_list / exact distinct on
    a hot key)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def replicate_join_small_side(
    big: DataFrame, small: DataFrame, on: Sequence[str], salt: int = 16
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side's key with
    a random suffix and replicate every small-side row ``salt`` times so
    each (key, salt) bucket still matches. Spreads a hot join key over
    ``salt`` tasks at the cost of duplicating the small side."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # shuffle_hash hint: this helper IS the no-broadcast path (the small
    # side is assumed too big to broadcast at scale — that's why it's
    # salted, not hinted broadcast), so keep AQE from "helpfully"
    # broadcasting it in small tests and hiding the salted plan
    return big_s.join(small_s.hint("shuffle_hash"), [*on, "_salt"]).drop("_salt")
