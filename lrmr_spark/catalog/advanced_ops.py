"""Advanced operator catalog entries: as-of join, range join, exact
percentiles, approximate sketches, the Do-transformer escape hatch, and
the array/collection scalar surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import asof as AS
from ..pipeline import Pipeline
from ..tables import load
from . import query


@query(
    "asof_last_purchase",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS r_ts, r.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (
      SELECT user_id, ts, max_by(value, event_id) AS value,
             max(event_id) AS event_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ) r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_last_purchase(spark, sf_dir):
    """As-of join (backward-inclusive): each click annotated with the
    user's most recent purchase at-or-before it. Spark lacks a native
    as-of join; the operator compiles to the union-and-carry window
    plan (one shuffle on user_id — operators.asof). The oracle uses
    DuckDB's native ASOF JOIN, so two independent formulations must
    agree.

    Tie semantics are pinned on BOTH sides: DuckDB's ASOF JOIN picks an
    arbitrary right row when several purchases share the max ts <=
    left ts, so the right side is pre-deduped to one row per
    (user_id, ts) with a deterministic max-event_id rule (max_by in
    the oracle, the same groupBy here)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("value", "event_id").alias("value"),
            F.max("event_id").alias("event_id"),
        )
    )
    return AS.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        tiebreak="event_id",
    )


@query(
    "range_join_error_context",
    oracle="""
    SELECT l.event_id, r.event_id AS event_id_r,
           l.user_id, l.ts, r.ts AS ts_r
    FROM (SELECT * FROM events WHERE event_type = 'error') l
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL '5 minutes'
     AND r.ts <= l.ts + INTERVAL '5 minutes'
    """,
)
def range_join_error_context(spark, sf_dir):
    """Bounded time-range join: clicks within ±5 minutes of each error
    by the same user. The operator co-locates candidates via
    (key, time-bucket) equi-join with neighbor-bucket expansion —
    bounded fan-out at any scale — then applies the exact predicate;
    the oracle is the naive inequality join."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = AS.range_join(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_seconds=-300, upper_seconds=300,
    )
    return out.select("event_id", "event_id_r", "user_id", "ts", "ts_r")


@query(
    "percentiles_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentiles_by_priority(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile() ≡ DuckDB
    quantile_cont — both linear interpolation). At 100 TB prefer
    approx_percentile (see approx_stats, rows-only)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@query("approx_stats")  # rows-only: sketch internals are engine-specific
def approx_stats(spark, sf_dir):
    """Approximate sketches — the 100 TB path for distincts/quantiles
    (HLL and KLL sketches; mergeable, bounded memory). No SQL oracle:
    sketch estimates are engine-specific by design, so the driver
    records the weaker rows-only check."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("approx_supps"),
        F.round(
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)), 2
        ).alias("approx_median_price"),
    )


@query(
    "do_transform_bucketize",
    oracle="""
    SELECT event_id,
           CAST(floor(value / 10) AS BIGINT) AS value_bucket,
           upper(event_type) AS event_type_up,
           CAST(length(props) AS BIGINT) AS props_len
    FROM events
    """,
)
def do_transform_bucketize(spark, sf_dir):
    """The Do/Transformer escape hatch
    (/root/reference/transformations.go:23-49) through the Pipeline
    façade: arbitrary per-batch Python over Arrow batches (mapInPandas),
    checked against a SQL respecification. Use only when expressions
    can't say it — this one could be expressions; it exists to gate the
    custom-stage machinery itself."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            yield pdf.assign(
                value_bucket=np.floor(pdf["value"] / 10).astype("int64"),
                event_type_up=pdf["event_type"].str.upper(),
                props_len=pdf["props"].str.len().astype("int64"),
            )[["event_id", "value_bucket", "event_type_up", "props_len"]]

    ev = load(spark, sf_dir, "events").select("event_id", "value", "event_type", "props")
    return (
        Pipeline(ev)
        .do(fn, schema="event_id bigint, value_bucket bigint, event_type_up string, props_len bigint")
        .df
    )


@query(
    "reduce_fold_alternating",
    oracle="""
    WITH numbered AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN rn % 2 = 1
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
             / 100.0 AS odd_total,
           count(*) AS n
    FROM numbered GROUP BY o_orderpriority
    """,
)
def reduce_fold_alternating(spark, sf_dir):
    """Arbitrary sequential per-key fold — the reference Reduce's
    general form (/root/reference/transformations.go:225-252, SURVEY
    §7.4.1): order-sensitive Python logic per group via the façade's
    applyInPandas path, with an explicit intra-group sort replacing
    lrmr's arrival-order dependence. Sums integer cents so the fold is
    exact. The oracle re-specifies the fold relationally
    (row_number + filter), proving the two formulations agree."""
    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        odd = pdf.iloc[::2]  # 1st, 3rd, ... rows of the ordered group
        cents = (odd["o_totalprice"] * 100).round().astype("int64").sum()
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "odd_total": [cents / 100.0],
                "n": [len(pdf)],
            }
        )

    return (
        Pipeline(load(spark, sf_dir, "orders"))
        .group_by_key("o_orderpriority")
        .reduce(fn=fold, schema="o_orderpriority string, odd_total double, n long")
        .df
    )


@query(
    "scalar_arrays",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_raw,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           list_sort(string_split(text, ' '))[1] AS first_token,
           list_reverse(string_split(text, ' '))[1] AS last_token,
           array_to_string(string_split(text, ' ')[1:3], '-') AS first3
    FROM documents
    """,
)
def scalar_arrays(spark, sf_dir):
    """Array/collection scalar functions (split/contains/sort/reverse/
    slice/join) — JVM-side, single projection."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_raw"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(F.array_sort(toks), 1).alias("first_token"),
        F.element_at(F.reverse(toks), 1).alias("last_token"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
    )
