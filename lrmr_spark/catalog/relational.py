"""Relational operator surface (SURVEY §2.5) — everything the reference
lacks (joins, set ops, grouping sets, scalar functions, SQL) expressed
natively so Catalyst owns the physical strategy.

Scale notes — broadcast discipline: an explicit ``F.broadcast`` hint is
only ever placed on sides whose size is bounded by construction —
fixed-cardinality dims (nation: 25 rows, region: 5) and 1-row/
bounded-key aggregates. Data-proportional tables (customer, supplier,
part, any per-user/per-part aggregate) NEVER carry a hint: at test SF
the planner's static parquet stats (or AQE's runtime stats) still pick
a broadcast-hash join, while at 100 TB the same code degrades safely to
shuffle joins instead of OOMing the driver. Fact-fact joins shuffle on
their keys with AQE skew handling; all aggregations get map-side
partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import load, register_views
from . import query


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
           round(CAST(avg(l_quantity) AS DOUBLE), 2) AS avg_qty,
           round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_price,
           round(CAST(avg(l_discount) AS DOUBLE), 2) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary. Single scan → partial/final hash agg on
    a low-cardinality key; the shipdate predicate pushes down to parquet
    row-group pruning (PushedFilters in .explain)."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "join_inner_segment_revenue",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_segment_revenue(spark, sf_dir):
    """Inner join fact→dim. customer is data-proportional, so no hint:
    the planner broadcasts it from size stats while it fits (so the
    fact table never shuffles — the dominant join pattern) and falls
    back to a shuffle join at 100 TB instead of OOMing."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "join_multiway_region_revenue",
    oracle="""
    SELECT r_name, count(*) AS n_items,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_multiway_region_revenue(spark, sf_dir):
    """TPC-H Q5-shaped 5-way join, with ONE eager aggregation pushed
    below the data-proportional join: the lineitem⋈orders output
    re-aggregates per custkey (≈10× collapse) BEFORE meeting customer,
    so the probe side of the customer join is the per-customer
    aggregate, not the raw fact rows — and the agg's exchange doubles
    as the join distribution. Legal because custkey is unique in
    customer (the join multiplies nothing → regrouping sums is exact).
    nation/region are fixed-cardinality and hint-broadcast; customer's
    broadcast stays the planner's size-stats choice.

    Deliberately NOT pre-aggregated per orderkey: measured min-of-2 at
    the sf10 rehearsal (60 M lineitem), per-orderkey pre-agg ran 13.3 s
    vs 9.9 s for the plain join — a ~15 M-group hash aggregation costs
    more than the ≈4×-row shuffle reduction saves (eager aggregation
    only pays when the collapse factor is large). The custkey variant
    is a local wash (10.1 s) while feeding the customer join 10× fewer
    rows — the posture that matters when customer can't broadcast."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        )
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum("_n").cast("bigint").alias("n_items"),
            F.round(F.sum("_rev"), 2).alias("revenue"),
        )
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS cnt
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer_order_counts(spark, sf_dir):
    """Left outer join preserving unmatched dim rows (count=0)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
)
def join_semi_big_spenders(spark, sf_dir):
    """Left-semi join (EXISTS): emits each matching left row once,
    shuffles only the join keys of the right side."""
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")


@query(
    "join_anti_no_big_orders",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
)
def join_anti_no_big_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark, sf_dir):
    """Multi-distinct aggregation (Spark expands to a single multi-phase
    plan; at scale prefer approx_count_distinct — see
    agg_approx_distinct which has no exact oracle)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "rollup_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty, count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_qty(spark, sf_dir):
    """ROLLUP hierarchy totals (absent from the reference — SURVEY §2.5)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "cube_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty, count(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_qty(spark, sf_dir):
    """CUBE over both dimensions."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "grouping_sets_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_qty(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "set_union_nations",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_union_nations(spark, sf_dir):
    """UNION (distinct) — set op surface (SURVEY §2.5)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect_nations(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except_nations(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    # subtract() is EXCEPT DISTINCT (exceptAll().distinct() would keep
    # values that appear more times on the left than the right)
    return c.subtract(s)


@query(
    "join_hint_shuffle_hash",
    oracle="""
    SELECT s_name, count(*) AS n_items,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def join_hint_shuffle_hash(spark, sf_dir):
    """Explicit join-strategy control: SHUFFLE_HASH hint (build a hash
    map per partition instead of sort-merge — wins when one side is
    much smaller but too big to broadcast). Results are
    strategy-invariant; the plan choice is pinned in test_plans."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name").hint("shuffle_hash")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "join_hint_merge",
    oracle="""
    SELECT o_orderkey, o_totalprice, count(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    """,
)
def join_hint_merge(spark, sf_dir):
    """MERGE (sort-merge) hint — the fact⋈fact default at scale; both
    sides shuffle-sort on the key and stream-merge with spill."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").hint("merge")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "set_except_all_custkeys",
    oracle="""
    SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all_custkeys(spark, sf_dir):
    """EXCEPT ALL (bag semantics: per-occurrence subtraction) —
    complements the distinct set ops."""
    o = load(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("ck"))
    done_o = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("ck"))
    return open_o.exceptAll(done_o)


@query(
    "like_regexp_filters",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%gear%'
       OR p_name LIKE 'small %'
       OR regexp_matches(p_name, '^(red|blue) w')
    """,
)
def like_regexp_filters(spark, sf_dir):
    """LIKE / RLIKE predicate surface; the LIKE patterns compile to
    StartsWith/Contains and push into the scan."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%gear%")
        | F.col("p_name").like("small %")
        | F.col("p_name").rlike("^(red|blue) w")
    ).select("p_partkey", "p_name")


@query(
    "null_handling_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           coalesce(delta, 0.0) AS delta_filled,
           CASE WHEN delta IS NULL THEN 1 ELSE 0 END AS is_first,
           nullif(o_orderstatus, 'O') AS status_or_null
    FROM (
      SELECT o_custkey, o_orderkey, o_orderstatus,
             round(CAST(o_totalprice - lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 2)
               AS delta
      FROM orders) t
    """,
)
def null_handling_funcs(spark, sf_dir):
    """NULL-handling functions (coalesce / IS NULL / nullif) over a
    window that genuinely produces nulls."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    delta = F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        delta.alias("delta"),
    ).select(
        "o_custkey",
        "o_orderkey",
        F.coalesce("delta", F.lit(0.0)).alias("delta_filled"),
        F.when(F.col("delta").isNull(), 1).otherwise(0).alias("is_first"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    )


@query(
    "pivot_status_qty",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE), 2) AS "O",
           round(CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE), 2) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_qty(spark, sf_dir):
    """Pivot with explicit value list (explicit list avoids the extra
    distinct-values job — required practice at scale)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query(
    "scalar_string_math",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_slug,
           concat(p_brand, '|', p_type) AS brand_type,
           abs(p_size - 25) AS size_dev,
           round(CAST(p_retailprice * 1.1 AS DOUBLE), 2) AS price_up,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
           p_partkey % 7 AS pk_mod
    FROM part
    """,
)
def scalar_string_math(spark, sf_dir):
    """Scalar function catalog (string/math) — all JVM-side, one
    projection inside whole-stage codegen."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_up"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_bucket"),
        (F.col("p_partkey") % 7).alias("pk_mod"),
    )


@query(
    "scalar_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
             AS days_since_95
    FROM orders
    """,
)
def scalar_dates(spark, sf_dir):
    """Date/time scalar functions."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_95"),
    )


@query(
    "case_when_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS cnt,
           round(CAST(avg(o_totalprice) AS DOUBLE), 2) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def case_when_price_buckets(spark, sf_dir):
    """Conditional expressions + aggregation."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "sql_passthrough_nation_revenue",
    oracle="""
    SELECT n_name, count(*) AS cnt,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def sql_passthrough_nation_revenue(spark, sf_dir):
    """spark.sql() passthrough over registered views — the full SQL
    surface the reference has no analogue for (SURVEY §2.5)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, count(*) AS cnt,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "join_full_outer_day_activity",
    oracle="""
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
               FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
                             AND o_orderdate <  TIMESTAMP '1999-03-01 00:00:00'
               GROUP BY 1),
    e AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
          FROM events GROUP BY 1)
    SELECT coalesce(o.d, e.d) AS d,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_events, 0) AS n_events
    FROM o FULL OUTER JOIN e ON o.d = e.d
    ORDER BY d
    """,
)
def join_full_outer_day_activity(spark, sf_dir):
    """FULL OUTER join — per-day order counts vs event counts where
    either side may be absent (order days outside the event window and
    vice versa). Both sides pre-aggregate to bounded day keys BEFORE
    the join, so the full-outer shuffle carries one row per day, not
    per record — the right shape for reconciling two 100 TB fact
    tables."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-03-01").cast("timestamp"))
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        o.join(e, "d", "full_outer")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("d")
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct,
           CAST(min(o_custkey) AS VARCHAR) AS min_val,
           CAST(max(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(round(CAST(min(o_totalprice) AS DOUBLE), 2) AS VARCHAR),
           CAST(round(CAST(max(o_totalprice) AS DOUBLE), 2) AS VARCHAR)
    FROM orders
    ORDER BY col
    """,
)
def profile_orders_columns(spark, sf_dir):
    """Data-profiling pass: per-column row/null/distinct counts and
    min/max (stringified to a uniform schema) — the quality report
    every ingestion pipeline emits before promotion. ONE scan computes
    all columns' stats simultaneously (a single multi-aggregate, not
    one pass per column); exact distincts here, swap in
    approx_count_distinct at 100 TB for one-pass sketching."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").alias("mn_custkey"),
        F.max("o_custkey").alias("mx_custkey"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("mn_status"),
        F.max("o_orderstatus").alias("mx_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").alias("mn_price"),
        F.max("o_totalprice").alias("mx_price"),
    )
    row = agg
    out = row.selectExpr(
        """stack(3,
          'o_custkey', n_rows, n_rows - nn_custkey, nd_custkey,
            CAST(mn_custkey AS STRING), CAST(mx_custkey AS STRING),
          'o_orderstatus', n_rows, n_rows - nn_status, nd_status,
            mn_status, mx_status,
          'o_totalprice', n_rows, n_rows - nn_price, nd_price,
            CAST(round(mn_price, 2) AS STRING), CAST(round(mx_price, 2) AS STRING)
        ) AS (col, n_rows, n_null, n_distinct, min_val, max_val)"""
    )
    return out.orderBy("col")


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 1000000000
                  ELSE o_orderkey END AS o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'update'
                  WHEN o_orderkey % 10 = 1 THEN 'delete'
                  ELSE 'insert' END AS action,
             'X' AS new_status
      FROM orders WHERE o_orderkey % 10 IN (0, 1, 2)),
    merged AS (
      SELECT coalesce(u.o_orderkey, s.o_orderkey) AS o_orderkey,
             CASE WHEN u.action = 'insert' THEN 'X'
                  WHEN u.action = 'update' THEN u.new_status
                  ELSE s.o_orderstatus END AS status_after,
             CASE WHEN s.o_orderkey IS NULL THEN 'inserted'
                  WHEN u.action = 'update' THEN 'updated'
                  ELSE 'kept' END AS change
      FROM orders s FULL OUTER JOIN updates u ON s.o_orderkey = u.o_orderkey
      WHERE u.action IS NULL OR u.action <> 'delete')
    SELECT change, status_after, count(*) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM merged GROUP BY change, status_after ORDER BY change, status_after
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE INTO semantics (upsert + delete) as a batch operator: apply
    a change batch (update status on key%10==0, delete key%10==1, insert
    new keys for key%10==2) to the orders snapshot via ONE full-outer
    join on the key, then audit the result by change type. This is the
    CDC-apply twin of snapshot_diff — together they round-trip a
    lakehouse MERGE without a table format.

    Scale shape: a single full-outer shuffle join on the primary key —
    the change batch is usually a small fraction of the snapshot, so AQE
    picks a broadcast/skew-aware strategy; Delta/Iceberg implement the
    same logical plan with file-level pruning (only files containing
    matched keys rewrite). No content column rides the join — just key,
    action, and the 1-byte status."""
    o = load(spark, sf_dir, "orders")
    updates = (
        o.filter(F.col("o_orderkey") % 10 < 3)
        .select(
            F.when(
                F.col("o_orderkey") % 10 == 2, F.col("o_orderkey") + 1_000_000_000
            )
            .otherwise(F.col("o_orderkey"))
            .alias("u_key"),
            F.when(F.col("o_orderkey") % 10 == 0, "update")
            .when(F.col("o_orderkey") % 10 == 1, "delete")
            .otherwise("insert")
            .alias("action"),
            F.lit("X").alias("new_status"),
        )
    )
    s = o.select(F.col("o_orderkey").alias("s_key"), "o_orderstatus")
    merged = (
        s.join(updates, s.s_key == updates.u_key, "full_outer")
        .filter(F.col("action").isNull() | (F.col("action") != "delete"))
        .select(
            F.coalesce("u_key", "s_key").alias("o_orderkey"),
            F.when(F.col("action") == "insert", "X")
            .when(F.col("action") == "update", F.col("new_status"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status_after"),
            F.when(F.col("s_key").isNull(), "inserted")
            .when(F.col("action") == "update", "updated")
            .otherwise("kept")
            .alias("change"),
        )
    )
    return (
        merged.groupBy("change", "status_after")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("change", "status_after")
    )


@query(
    "window_ntile_buckets",
    oracle="""
    SELECT o_orderpriority, quartile, count(*) AS n_orders,
           round(CAST(min(o_totalprice) AS DOUBLE), 2) AS min_price,
           round(CAST(max(o_totalprice) AS DOUBLE), 2) AS max_price
    FROM (
      SELECT o_orderpriority, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders) x
    GROUP BY o_orderpriority, quartile ORDER BY o_orderpriority, quartile
    """,
)
def window_ntile_buckets(spark, sf_dir):
    """ntile() quartile assignment per order priority + per-bucket price
    ranges — equi-depth binning for percentile-band reporting (ordering
    tie-broken by key so bucket edges are deterministic). One window
    shuffle on the priority key, bounded output."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@query(
    "scalar_maps",
    oracle="""
    SELECT o_orderkey,
           CAST(cardinality(m) AS INTEGER) AS n_entries,
           m['status'][1] AS status_v,
           m['missing'][1] AS missing_v,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
    FROM (
      SELECT o_orderkey,
             map(['status', 'priority', 'bucket'],
                 [o_orderstatus, o_orderpriority,
                  CASE WHEN o_totalprice >= 100000 THEN 'hi' ELSE 'lo' END]) AS m
      FROM orders) x
    """,
)
def scalar_maps(spark, sf_dir):
    """Map-type scalar surface: create_map / map_concat / element_at /
    map_keys / size — the semi-structured key-value column toolkit
    (feature bags, tag maps). Missing-key lookup returns NULL on both
    engines; map keys are emitted sorted so the hash comparison is
    order-independent. Pure projection, zero shuffles."""
    o = load(spark, sf_dir, "orders")
    base = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    extra = F.create_map(
        F.lit("bucket"),
        F.when(F.col("o_totalprice") >= 100000, "hi").otherwise("lo"),
    )
    m = F.map_concat(base, extra)
    return o.select(
        "o_orderkey",
        F.size(m).alias("n_entries"),
        F.element_at(m, F.lit("status")).alias("status_v"),
        F.element_at(m, F.lit("missing")).alias("missing_v"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@query(
    "schema_evolution_union",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, 1 AS schema_version
      FROM orders WHERE o_orderkey % 2 = 0),
    v2 AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             2 AS schema_version
      FROM orders WHERE o_orderkey % 2 = 1),
    u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
    SELECT schema_version,
           count(*) AS n_rows,
           count(o_orderstatus) AS n_status,
           count(o_orderpriority) AS n_priority,
           CAST(sum(coalesce(price_cents, 0)) AS BIGINT) AS total_cents
    FROM u GROUP BY schema_version ORDER BY schema_version
    """,
)
def schema_evolution_union(spark, sf_dir):
    """Schema evolution: append two snapshot generations with different
    column sets via unionByName(allowMissingColumns=True) — old rows
    get NULLs for new columns and vice versa (the lakehouse
    schema-on-read contract; DuckDB's UNION ALL BY NAME is the oracle
    twin). The audit aggregation counts non-null presence per column
    per generation. Pure narrow union — no shuffle until the bounded
    audit aggregation."""
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", F.lit(1).alias("schema_version")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.lit(2).alias("schema_version"),
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy("schema_version")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderstatus").alias("n_status"),
            F.count("o_orderpriority").alias("n_priority"),
            F.sum(F.coalesce("price_cents", F.lit(0))).alias("total_cents"),
        )
        .orderBy("schema_version")
    )


@query(
    "fuzzy_join_part_names",
    oracle="""
    WITH nm AS (SELECT DISTINCT p_name FROM part),
    blk AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS b FROM nm),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM blk a JOIN blk b ON a.b = b.b AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           levenshtein(name_a, name_b) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 2
    ORDER BY name_a, name_b
    """,
)
def fuzzy_join_part_names(spark, sf_dir):
    """Blocked fuzzy join (record linkage): harmonize near-identical
    part names by pairing names that share a token block and sit
    within Levenshtein distance 1-2 — the entity-resolution primitive
    for merging product catalogs or crawl metadata.

    Scale shape: the naive formulation is an O(n^2) cross join on
    edit distance — a non-starter. Blocking makes it tractable: each
    name emits one candidate-key row per token (explode), the
    self-join runs ONLY within equal blocks (standard multi-pass
    blocking — a pair is compared iff it shares at least one token,
    which any distance<=2 edit of a multi-token name does unless the
    edit spans both tokens), and the expensive levenshtein() runs
    only on the blocked candidates, JVM-side. Shuffle carries
    (token, name) pairs; names are deduped BEFORE blocking so the
    join fans out over distinct names, not rows. Oracle: identical
    blocking + DuckDB's levenshtein."""
    nm = load(spark, sf_dir, "part").select("p_name").distinct()
    blk = nm.select("p_name", F.explode(F.split("p_name", " ")).alias("b"))
    a, b = blk.alias("a"), blk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b")
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist").between(1, 2))
        .orderBy("name_a", "name_b")
    )


@query(
    "dq_constraint_audit",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_custkey,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
             AS n_dup_orderkey,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
           CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative_total,
           CAST(sum(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_custkey
    FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o_custkey = c_custkey
    """,
)
def dq_constraint_audit(spark, sf_dir):
    """Data-quality constraint audit (the Deequ/Great-Expectations
    shape): completeness (null FK), uniqueness (duplicate PK),
    domain (status outside its enum), range (negative totals), and
    referential integrity (orphan FK) — all emitted as ONE summary
    row, the validation report an ingest pipeline gates on.

    Scale shape: one scan of the fact table, one left join against the
    deduped dimension KEY column only (key set, not the dim payload),
    and a single multi-aggregate — every check is a conditional sum
    folded into the same partial-aggregation pass, so auditing N
    constraints costs the same shuffle as auditing one. The dimension
    side is data-proportional, so no broadcast hint: AQE picks the
    join strategy (broadcasts only while the key set is actually
    small)."""
    o = load(spark, sf_dir, "orders")
    ckeys = load(spark, sf_dir, "customer").select("c_custkey").distinct()
    j = o.join(ckeys, o["o_custkey"] == ckeys["c_custkey"], "left")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        flag(F.col("o_custkey").isNull()).alias("n_null_custkey"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n_dup_orderkey"),
        flag(~F.col("o_orderstatus").isin("O", "F", "P")).alias("n_bad_status"),
        flag(F.col("o_totalprice") < 0).alias("n_negative_total"),
        flag(
            F.col("o_custkey").isNotNull() & F.col("c_custkey").isNull()
        ).alias("n_orphan_custkey"),
    )


@query(
    "recursive_cte_user_hierarchy",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT DISTINCT user_id AS u, user_id AS cur, 0 AS depth FROM events
      UNION ALL
      SELECT u, (cur - 1) // 2 AS cur, depth + 1 AS depth
      FROM chain WHERE cur > 0)
    SELECT u AS user_id,
           CAST(max(depth) AS BIGINT) AS depth_to_root,
           CAST(sum(cur) AS BIGINT) AS ancestor_sum
    FROM chain GROUP BY u ORDER BY u
    """,
)
def recursive_cte_user_hierarchy(spark, sf_dir):
    """WITH RECURSIVE (Spark 4 recursive CTEs): walk each user up a
    deterministic binary-heap hierarchy (parent(c) = (c-1) DIV 2, root
    0) and report depth-to-root plus the sum of ids along the path —
    the org-chart / BOM-rollup traversal shape, the one query class
    pre-4.0 Spark could not express in SQL at all.

    Execution: Spark runs the recursion as iterated UnionLoop steps;
    each iteration is one narrow map over the frontier (no shuffle
    inside the loop body here), and iteration count is bounded by the
    hierarchy depth — log2(max id) ≈ 20 levels even at billions of
    users, NOT data volume. The same recursion runs verbatim in
    DuckDB; all arithmetic is integer, so the gate hash-matches.
    Cite: reference has no SQL surface (SURVEY §2.5) — this extends
    the relational family Spark-natively."""
    from ..tables import load as _load

    _load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT DISTINCT user_id AS u, user_id AS cur, 0 AS depth FROM events
          UNION ALL
          SELECT u, (cur - 1) DIV 2 AS cur, depth + 1 AS depth
          FROM chain WHERE cur > 0)
        SELECT u AS user_id,
               CAST(max(depth) AS BIGINT) AS depth_to_root,
               CAST(sum(cur) AS BIGINT) AS ancestor_sum
        FROM chain GROUP BY u ORDER BY u
        """
    )


@query(
    "lateral_topk_orders",
    oracle="""
    SELECT p.o_orderpriority, l.o_orderkey, l.cents
    FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
    LATERAL (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      WHERE o.o_orderpriority = p.o_orderpriority
      ORDER BY cents DESC, o_orderkey LIMIT 2) l
    ORDER BY p.o_orderpriority, l.cents DESC, l.o_orderkey
    """,
)
def lateral_topk_orders(spark, sf_dir):
    """LATERAL correlated subquery (per-group top-k as a join, not a
    window): for each order priority, the lateral subquery re-executes
    with the outer row bound, returning that group's top-2 orders by
    price. The SQL-standard form of "top-N per group" — and the shape
    that, unlike a window rank, lets the inner query use its own LIMIT
    pushdown (TakeOrderedAndProject per group instead of ranking every
    row when the per-group index exists).

    Spark decorrelates the lateral into a DomainJoin and plans it as
    one shuffle; exact integer cents + orderkey tiebreak keep the
    top-2 unambiguous. Identical SQL runs in DuckDB (both engines
    implement SQL:2016 LATERAL)."""
    from ..tables import load as _load

    _load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT p.o_orderpriority, l.o_orderkey, l.cents
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        LATERAL (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders o
          WHERE o.o_orderpriority = p.o_orderpriority
          ORDER BY cents DESC, o_orderkey LIMIT 2) l
        ORDER BY p.o_orderpriority, l.cents DESC, l.o_orderkey
        """
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
    supp AS (SELECT l_partkey, count(*) AS s FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS pair_support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT p.part_a, p.part_b, p.pair_support,
           p.pair_support * n.n * 1000000 // (sa.s * sb.s) AS lift_ppm
    FROM pairs p, n_orders n
    JOIN supp sa ON sa.l_partkey = p.part_a
    JOIN supp sb ON sb.l_partkey = p.part_b
    ORDER BY p.pair_support DESC, p.part_a, p.part_b
    LIMIT 50
    """,
)
def market_basket_pairs(spark, sf_dir):
    """Market-basket co-occurrence mining: part pairs bought in the
    same order, with support and exact-integer lift (observed
    co-occurrence / expected-if-independent, in ppm) — the association
    rule primitive behind 'frequently bought together'.

    Scale shape: the pair explosion is bounded by BASKET size, not
    catalog size — the self-join runs on l_orderkey (items per order
    ~O(10), so ~C(10,2) pairs per order), then aggregates on the pair
    key with map-side partials; the support filter (>= 3) prunes the
    long tail before the lift join, and the per-part support table is
    a bounded second aggregate. The naive formulation (part × part
    with a co-occurrence count) would be catalog², never run. Lift is
    cross-multiplied into integer ppm."""
    li = load(spark, sf_dir, "lineitem")
    # materialize the deduped (order, part) working set once: it is
    # referenced 5× (both self-join sides, support ×2 via sa/sb, the
    # order count) and each lazy reference re-evaluated the scan +
    # distinct — the checkpoint costs what the self-join shuffle
    # materializes anyway
    items = (
        li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(eager=True)
    )
    n_orders = items.select(
        F.count_distinct("l_orderkey").alias("n")
    )  # 1-row aggregate, cross-joined lazily (broadcast) — no driver action
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= 3)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("sb"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_support",
            F.expr("pair_support * n * 1000000 DIV (sa * sb)").alias("lift_ppm"),
        )
        .orderBy(F.col("pair_support").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "orders_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT o_custkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(cents) OVER () AS total_cents
      FROM rev),
    classed AS (
      SELECT o_custkey, cents,
             CASE WHEN cum_cents * 10 <= total_cents * 8 THEN 'A'
                  WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked)
    SELECT abc, count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS class_cents,
           min(cents) AS min_cents, max(cents) AS max_cents
    FROM classed GROUP BY abc ORDER BY abc
    """,
)
def orders_abc_pareto(spark, sf_dir):
    """ABC / Pareto classification: customers ranked by revenue,
    class A = the head covering the first 80% of cumulative revenue,
    B = to 95%, C = the tail — the inventory/CRM prioritization
    standard (the '80/20 rule' made exact).

    The class boundaries are integer CROSS-MULTIPLIED (cum·10 ≤
    total·8), so no float share ever decides a boundary row. The
    running total uses the TWO-PHASE distributed cumsum
    (operators/ranks.py): rows bucket by the bit-width of cents
    (order-aligned with cents DESC), per-bucket offsets come from a
    window over the ≤64-row bucket table, and the within-bucket cumsum
    is hash-partitioned — no Exchange SinglePartition over the
    |customers|-row frame, same exact values. Deterministic tie order
    (cents DESC, custkey)."""
    from ..operators.ranks import bit_width_bucket, with_global_cumsum

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.expr("cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)").alias(
            "cents"
        )
    )
    # total_cents rides the cumsum's own bounded bucket table — a
    # separate rev.agg() would re-evaluate the orders scan + per-
    # customer aggregation a second time
    ranked = with_global_cumsum(
        rev,
        "cents",
        bucket=bit_width_bucket("cents"),
        order_cols=[F.col("cents").desc(), F.col("o_custkey")],
        out_col="cum_cents",
        bucket_desc=True,
        total_col="total_cents",
    )
    classed = ranked.select(
        "o_custkey",
        "cents",
        F.when(F.expr("cum_cents * 10 <= total_cents * 8"), "A")
        .when(F.expr("cum_cents * 100 <= total_cents * 95"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("bigint").alias("class_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("abc")
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(CAST(o_orderdate AS DATE)) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey),
    n AS (SELECT count(*) AS n FROM per_cust),
    scored AS (
      SELECT o_custkey,
             1 + (5 * (row_number() OVER (ORDER BY last_order, o_custkey) - 1))
                 // n.n AS r_score,
             1 + (5 * (row_number() OVER (ORDER BY frequency, o_custkey) - 1))
                 // n.n AS f_score,
             1 + (5 * (row_number() OVER (ORDER BY monetary_cents, o_custkey) - 1))
                 // n.n AS m_score
      FROM per_cust, n)
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           count(*) AS n_customers
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation: every customer scored 1-5 on Recency (last
    order date), Frequency (order count), and Monetary (revenue
    cents) via equi-depth quintiles, then counted per (R,F,M) cell —
    the marketing-segmentation standard.

    Quintiles are the RANK-THRESHOLD form 1 + (5·(rank−1)) DIV n —
    same equi-depth cells as ntile up to remainder-row placement,
    chosen because a rank is computable with the TWO-PHASE distributed
    pattern (operators/ranks.py): order-aligned coarse buckets
    (64-day grid for recency, bit-width for frequency/monetary),
    per-bucket offsets from a ≤bounded bucket table, hash-partitioned
    within-bucket row_number — no Exchange SinglePartition over the
    |customers|-row frame. Ties pinned with the custkey tie-break in
    every ordering, so ranks are a total order and the result is
    engine-exact."""
    from ..operators.ranks import bit_width_bucket, with_global_rank

    o = load(spark, sf_dir, "orders")
    # materialize the per-customer aggregate once: each chained
    # with_global_rank references its input twice (bucket agg + join),
    # so three chained ranks re-evaluated the orders scan 2³+1 = 9
    # times (18 planned scans). Checkpoints linearize the chain — one
    # orders scan, each rank's work done once.
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.expr(
                "cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)"
            ).alias("monetary_cents"),
        )
        .localCheckpoint(eager=True)
    )
    n = per_cust.agg(F.count(F.lit(1)).alias("n"))
    ranked = with_global_rank(
        per_cust,
        bucket=F.expr("datediff(last_order, date'1990-01-01') div 64").cast("bigint"),
        order_cols=[F.col("last_order"), F.col("o_custkey")],
        out_col="r_rnk",
    ).localCheckpoint(eager=True)
    ranked = with_global_rank(
        ranked,
        bucket=bit_width_bucket("frequency"),
        order_cols=[F.col("frequency"), F.col("o_custkey")],
        out_col="f_rnk",
    ).localCheckpoint(eager=True)
    ranked = with_global_rank(
        ranked,
        bucket=bit_width_bucket("monetary_cents"),
        order_cols=[F.col("monetary_cents"), F.col("o_custkey")],
        out_col="m_rnk",
    )
    scored = ranked.crossJoin(F.broadcast(n)).select(
        "o_custkey",
        F.expr("1 + (5 * (r_rnk - 1)) div n").alias("r_score"),
        F.expr("1 + (5 * (f_rnk - 1)) div n").alias("f_score"),
        F.expr("1 + (5 * (m_rnk - 1)) div n").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )
