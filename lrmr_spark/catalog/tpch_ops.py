"""TPC-H-shaped query suite adapted to the testdata's star schema
(Q1 lives in relational.py). These pin the classic OLAP plan shapes:
selective fact filters, fact⋈fact shuffles with broadcast dims,
EXISTS-rewrites, conditional aggregation, top-k over aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3: unshipped-order revenue for one market segment. The segment
    filter broadcasts a pre-shrunk customer dim; only lineitem⋈orders
    shuffles; top-10 via TakeOrderedAndProject."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """Q4: EXISTS → left-semi join; the quarter filter pushes to the
    orders scan before the shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan+filter+agg — every predicate must reach the
    parquet scan (row-group pruning does the work at 100 TB)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q12_shipmode_like",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_shipmode_like(spark, sf_dir):
    """Q12 shape: conditional aggregation over a fact⋈fact join."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4)
             AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def tpch_q14_promo_share(spark, sf_dir):
    """Q14: promo revenue share — part is data-proportional so no
    broadcast hint (planner stats pick BHJ while it fits); single
    global agg."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """Q16 shape: distinct-count grouped by dim attributes; the dim
    filter shrinks the broadcast side before the join."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """Q5: local-supplier volume — the classic snowflake join (6 tables)
    with the extra c_nationkey = s_nationkey residual linking two
    branches of the star. Dims (nation, region) broadcast; the
    fact⋈fact chain shuffles on its keys; the date filter pushes to the
    orders scan."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
           round(CAST(c_acctbal AS DOUBLE), 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: top-20 customers by returned-item revenue in a quarter —
    selective fact filters, customer-side agg, TakeOrderedAndProject
    for the top-k (deterministic c_custkey tiebreak pins the cut)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: large-volume orders — aggregate-then-semi-join (the IN
    subquery becomes a semi join against a pre-aggregated key set).
    customer grows linearly with SF, so no broadcast hint — AQE decides
    (it will broadcast at small SF and shuffle at 100 TB)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(l_extendedprice) / 7.0 AS DOUBLE), 2) AS avg_yearly,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """Q17: small-quantity-order revenue — the correlated scalar
    subquery decorrelated into an aggregate-then-join (per-part avg
    joined back to the fact), the standard Catalyst/TPC-H rewrite. The
    filtered brand dim broadcasts into both the per-part agg and the
    final join, so the avg is computed over only the brand's parts."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(p, li.l_partkey == p.p_partkey)
    avgs = li_b.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("_qty_cut")
    )
    return (
        li_b.join(avgs, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q19_bracketed_revenue",
    oracle="""
    SELECT round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
    """,
)
def tpch_q19_bracketed_revenue(spark, sf_dir):
    """Q19 shape: disjunctive multi-bracket predicate spanning both
    join sides — Catalyst evaluates the residual disjunction post-join
    (part un-hinted: planner stats choose the join strategy)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    return j.filter(b1 | b2).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# --- Round-2 completion of the 22-query suite. The testdata has no
# partsupp table and lineitem carries only l_shipdate (no commit /
# receipt dates), so q2/q9/q11/q20/q21 are ADAPTED: each keeps its
# defining plan shape (correlated min, scalar-subquery threshold,
# exists/not-exists self-joins, nested semi-join chain) re-grounded on
# the columns that exist. Cross-engine float discipline: wherever the
# oracle comparison involves a ratio, equality, or threshold on an
# aggregated value, the aggregate is computed in EXACT integer cents
# (round(price*100) etc.) on both sides so sum order can't flip a
# rounding boundary (ARCHITECTURE.md "integer-exact math before
# rounding").


def _vol4(price_col: str = "l_extendedprice", disc_col: str = "l_discount"):
    """Revenue line volume in exact 1e-4-dollar integer units:
    round(price*100) * round((1-disc)*100)."""
    return F.round(F.col(price_col) * 100).cast("long") * F.round(
        (1 - F.col(disc_col)) * 100
    ).cast("long")


_VOL4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * CAST(round((1 - l_discount) * 100) AS BIGINT)"
)


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH eligible AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    costs AS (
      SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
             min(l_extendedprice) AS cost
      FROM lineitem JOIN part ON p_partkey = l_partkey
      JOIN eligible ON s_suppkey = l_suppkey
      WHERE p_size = 19 AND p_type = 'LARGE'
      GROUP BY 1, 2)
    SELECT s_acctbal, s_name, n_name, p_partkey
    FROM costs JOIN eligible USING (s_suppkey)
    WHERE cost = (SELECT min(c2.cost) FROM costs c2
                  WHERE c2.p_partkey = costs.p_partkey)
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 adapted (no partsupp): per part, the EUROPE supplier offering
    the minimum observed sale price in lineitem. The correlated min
    subquery is decorrelated as a window-min over the (part, supplier)
    cost table — one shuffle on p_partkey serves both the min and the
    equality filter. min() is order-insensitive, so the cross-engine
    comparison is exact without integer tricks."""
    from pyspark.sql import Window

    eligible = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    parts = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 19) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    costs = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(eligible.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("_min", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("_min"))
        .join(eligible, "s_suppkey")
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: bilateral trade volume between two nations by year. Both
    nation dims broadcast (25 rows, schema-bounded); the disjunctive
    nation-pair predicate is applied after both nation joins, exactly
    as the spec demands. Only lineitem⋈orders⋈customer shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH flat AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT) AS vol4,
             n1.n_name AS supp_nation
      FROM lineitem JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol4 ELSE 0 END)
                      AS DOUBLE) / CAST(sum(vol4) AS DOUBLE), 6) AS mkt_share
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: one nation's share of PROMO-part revenue sold into ASIA, by
    order year. The share is a ratio of two sums — computed over exact
    integer 1e-4-dollar units so Spark's and DuckDB's accumulation
    order can't produce different doubles before the final divide.
    Conditional aggregation (sum CASE WHEN) does the numerator in the
    same single shuffle as the denominator."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _vol4().alias("vol4")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol4")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("vol4").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    WITH flat AS (
      SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)
             - CAST(round(p_retailprice * 100) AS BIGINT)
               * CAST(round(l_quantity) AS BIGINT) * 10 AS amount4
      FROM lineitem JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%')
    SELECT nation, o_year,
           round(CAST(sum(amount4) AS DOUBLE) / 10000.0, 2) AS sum_profit
    FROM flat GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 adapted (no partsupp.ps_supplycost): profit per supplier
    nation per year over parts matching a name pattern, with cost
    proxied as 10% of p_retailprice × quantity. Amounts are exact
    integer 1e-4-dollar units (sum order can't drift), divided and
    rounded only at the end."""
    amount4 = _vol4() - (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
        * 10
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("l_shipdate").cast("int"))
        .withColumn("amount4", amount4)
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("amount4").cast("double") / 10000.0, 2).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS p_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS value_c
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY 1)
    SELECT p_partkey, round(CAST(value_c AS DOUBLE) / 100.0, 2) AS part_value
    FROM v
    WHERE CAST(value_c AS DOUBLE) > (SELECT 0.001 * CAST(sum(value_c) AS DOUBLE)
                                     FROM v)
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 adapted (no partsupp): per-part traded value through one
    nation's suppliers, kept only where it exceeds a fraction of the
    GLOBAL total — the scalar-subquery-threshold shape. The global sum
    is a 1-row cross-joined aggregate (Catalyst broadcasts it); values
    are exact integer cents so the threshold comparison is
    deterministic across engines."""
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.round(F.col("l_quantity")).cast("long")
        ).alias("value_c"),
    )
    v = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("value_c").alias("value_c"))
    )
    total = v.agg((F.sum("value_c").cast("double") * 0.001).alias("_cut"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value_c").cast("double") > F.col("_cut"))
        .select(
            "p_partkey",
            F.round(F.col("value_c").cast("double") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "tpch_q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13 adapted (priority filter instead of o_comment regex):
    customers-per-order-count histogram. The defining trap is the
    filter living in the LEFT JOIN's ON clause (a WHERE would drop
    zero-order customers); count(o_orderkey) counts only matched rows.
    Two shuffles: custkey join+agg, then the tiny histogram agg."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    cond = (cust.c_custkey == orders.o_custkey) & (
        orders.o_orderpriority != "1-URGENT"
    )
    return (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS total4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1)
    SELECT s_suppkey, s_name,
           round(CAST(total4 AS DOUBLE) / 10000.0, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total4 = (SELECT max(total4) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) with the maximum quarterly revenue — the
    view-plus-scalar-max shape. Revenue accumulates in exact integer
    units so the max-equality filter can't miss by a ulp; the 1-row
    max broadcasts back over the revenue table."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol4()).alias("total4"))
    )
    mx = rev.agg(F.max("total4").alias("_mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total4") == F.col("_mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total4").cast("double") / 10000.0, 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    WITH pq AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(round(l_quantity) AS BIGINT)) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, sum(qty) AS part_qty FROM pq GROUP BY 1)
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT pq.l_suppkey FROM pq JOIN tot USING (l_partkey)
        WHERE CAST(pq.qty AS DOUBLE) > 0.15 * CAST(tot.part_qty AS DOUBLE))
    ORDER BY s_suppkey
    """,
)
def tpch_q20_potential_promotion(spark, sf_dir):
    """Q20 adapted (no partsupp.ps_availqty): suppliers in one nation
    who shipped >15% of the total moved quantity of any 'small%' part —
    the nested semi-join chain (parts → per-supplier share → supplier
    semi-join) that defines q20. Quantities are exact integers; the
    share threshold is deterministic."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.round("l_quantity").cast("long").alias("q")
    )
    pq = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("q").alias("qty"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    qualified = (
        pq.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty").cast("double") > 0.15 * F.col("part_qty").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey, l_linenumber
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """Q21 adapted (late = shipped >90 days after order date, since
    lineitem has no commit/receipt dates): suppliers in one nation who
    were the SOLE late shipper on a multi-supplier finalized order.
    The exists/not-exists pair become a left-semi against all other
    suppliers' lines and a left-anti against other suppliers' LATE
    lines — both shuffling only (orderkey, suppkey) pairs."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linenumber", "l_shipdate"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "l_linenumber")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    l1 = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key")),
            "left_anti",
        )
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        l1.join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_acctbal,
             CAST(c_nationkey % 10 AS INT) AS cntrycode
      FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)),
    cutoff AS (SELECT avg(c_acctbal) AS cut FROM eligible
               WHERE c_acctbal > 0.0)
    SELECT cntrycode, count(*) AS numcust,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS totacctbal
    FROM eligible, cutoff
    WHERE c_acctbal > cut
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """Q22 adapted (cntrycode = c_nationkey mod 10, no c_phone in the
    schema; "no orders" re-scoped to "no orders since 1999" because the
    synthetic data gives every customer at least one order) —
    scalar-subquery cutoff + anti-join. The cutoff is one broadcast
    row; the anti-join ships only custkeys of recent orders."""
    eligible = (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9))
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("c_nationkey") % 10).cast("int").alias("cntrycode"),
        )
    )
    cutoff = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(orders, eligible.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
