"""Core pipeline-parity queries (SURVEY §2.1-2.4, §2.6).

Each query re-expresses one reference operator/user-op through the
Pipeline façade so the correctness gate exercises the façade itself,
not just raw DataFrames. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..pipeline import Pipeline
from ..tables import load
from . import query


@query(
    "flagship_event_counts",
    oracle="""
    SELECT event_type AS key, count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def flagship_event_counts(spark, sf_dir):
    """The reference's flagship pipeline shape — source → group_by_key →
    reduce(Count) → collect (/root/reference/test/group_by.go:9-14,
    Count reducer /root/reference/test/counter.go:16-32) — over the
    events table. Scale: partial aggregation map-side, single hash
    shuffle on the grouping key; no driver materialization."""
    return (
        Pipeline(load(spark, sf_dir, "events").select(F.col("event_type").alias("key")))
        .group_by_key("key")
        .reduce({"cnt": F.count(F.lit(1))})
        .df
    )


@query(
    "map_multiply",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity * 8 AS v
    FROM lineitem
    """,
)
def map_multiply(spark, sf_dir):
    """Chained Map(×2)×3 (/root/reference/test/map.go:14-42): the façade
    fast path compiles to a single projection — narrow, zero shuffle,
    whole-stage codegen."""
    p = Pipeline(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", F.col("l_quantity").alias("v")
        )
    )
    for _ in range(3):
        p = p.map(cols={"v": F.col("v") * 2})
    return p.df


@query(
    "flatmap_double",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity * 2 AS v FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity * 2 AS v FROM lineitem
    """,
)
def flatmap_double(spark, sf_dir):
    """FlatMap emitting two rows of value×2 per input
    (/root/reference/test/flatmap.go:12-37) via the explode fast path —
    JVM-side generator, no Python."""
    return (
        Pipeline(
            load(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_linenumber", F.col("l_quantity").alias("value")
            )
        )
        .flat_map(explode=F.array(F.col("value") * 2, F.col("value") * 2), alias="value")
        .df.select("l_orderkey", "l_linenumber", F.col("value").alias("v"))
    )


@query(
    "filter_highqty",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 25
    """,
)
def filter_highqty(spark, sf_dir):
    """Native filter (the reference's Filter iface is vestigial —
    /root/reference/transformations.go:68-70). The predicate pushes down
    to the parquet scan (PushedFilters) — at 100 TB this skips row
    groups entirely."""
    return (
        Pipeline(load(spark, sf_dir, "lineitem"))
        .filter(F.col("l_quantity") > 25)
        .df.select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "reduce_count_by_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS cnt,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def reduce_count_by_priority(spark, sf_dir):
    """Reduce fast path → groupBy().agg(): Spark supplies the map-side
    combine the reference declared but never wired
    (/root/reference/transformations.go:209-213)."""
    return (
        Pipeline(load(spark, sf_dir, "orders"))
        .group_by_key("o_orderpriority")
        .reduce(
            {
                "cnt": F.count(F.lit(1)),
                "total": F.round(F.sum("o_totalprice"), 2),
            }
        )
        .df
    )


@query(
    "sort_concat_fold",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS concat_names
    FROM nation GROUP BY n_regionkey
    """,
)
def sort_concat_fold(spark, sf_dir):
    """Order-sensitive fold: Sort → Reduce(Concat)
    (/root/reference/test/sort.go:30-64, SURVEY §7.4.1). Arrival-order
    dependence is made deterministic with an explicit intra-group sort
    (array_sort) — JVM-side, no applyInPandas needed."""
    return (
        Pipeline(load(spark, sf_dir, "nation"))
        .group_by_key("n_regionkey")
        .reduce(
            {"concat_names": F.array_join(F.array_sort(F.collect_list("n_name")), "|")}
        )
        .df
    )


@query(
    "group_by_known_keys",
    oracle="""
    SELECT event_type AS key, count(*) AS cnt
    FROM events WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY event_type
    """,
)
def group_by_known_keys(spark, sf_dir):
    """Finite-key grouping with the reference's silent drop-unknown-keys
    semantics (/root/reference/partitions/partitioner.go:86-92): filter
    runs before the shuffle, so dropped rows never move — at scale the
    isin-predicate also pushes into the scan."""
    return (
        Pipeline(load(spark, sf_dir, "events").select(F.col("event_type").alias("key")))
        .group_by_known_keys(["click", "view", "purchase"], "key")
        .reduce({"cnt": F.count(F.lit(1))})
        .df
    )


@query(
    "distinct_flags",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(spark, sf_dir):
    """DISTINCT — absent from the reference (SURVEY §2.5), native here;
    executes as partial+final hash aggregate (no full-row shuffle of
    duplicates)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def topk_orders(spark, sf_dir):
    """Global top-K — absent from the reference (SURVEY §2.5). Spark
    executes orderBy+limit as TakeOrderedAndProject: per-partition top-K
    then driver merge of K·P candidates — no global sort at any scale."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "parallelize_kv_counts",
    oracle="""
    SELECT * FROM (VALUES ('bar', CAST(1 AS BIGINT)), ('foo', CAST(2 AS BIGINT)))
      AS t(key, cnt)
    """,
)
def parallelize_kv_counts(spark, sf_dir):
    """Parallelize + GroupByKey + Count over the F2 fixture
    ({foo:[goo,hoo], bar:[baz]} —
    /root/reference/test/group_by.go:23-31; golden counts
    /root/reference/test/group_by_test.go:112-134)."""
    return (
        Pipeline.parallelize(
            spark,
            [("foo", "goo"), ("foo", "hoo"), ("bar", "baz")],
            schema="key string, value string",
        )
        .group_by_key("key")
        .reduce({"cnt": F.count(F.lit(1))})
        .df
    )


@query(
    "shuffle_repartition_stable",
    oracle="""
    SELECT l_returnflag, count(*) AS cnt,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS total_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def shuffle_repartition_stable(spark, sf_dir):
    """Shuffle()/Repartition(n) (round-robin + count —
    /root/reference/partitions/partitioner.go:110-127) followed by an
    aggregation: results are partitioning-invariant. AQE coalesces the
    extra exchange's output at runtime."""
    return (
        Pipeline(load(spark, sf_dir, "lineitem"))
        .shuffle(8)
        .repartition(16, "l_returnflag")
        .group_by_key("l_returnflag")
        .reduce(
            {
                "cnt": F.count(F.lit(1)),
                "total_price": F.round(F.sum("l_extendedprice"), 2),
            }
        )
        .df
    )


@query(
    "python_datasource_feeder",
    oracle="""
    SELECT chr(97 + CAST(i % 5 AS INTEGER)) AS key,
           count(*) AS cnt,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS total_value
    FROM range(0, 10000) t(i)
    GROUP BY 1 ORDER BY 1
    """,
)
def python_datasource_feeder(spark, sf_dir):
    """Custom pluggable source: the reference's ``Feeder`` interface
    (/root/reference/input/feeder.go:9-11 — anything that writes rows
    into an output) implemented on Spark 4's Python DataSource API
    (sources/pyds.py). The source declares schema + range partitions,
    emits Arrow RecordBatches per partition on executors (never
    through the driver), and narrows its [lo, hi) range in
    pushFilters when the planner offers id predicates.

    The deterministic row formula (key = chr(97 + id MOD 5), value =
    Knuth hash MOD 1000) means the oracle regenerates the exact same
    rows from DuckDB's range() — the gate checks the full
    source → shuffle → aggregate path, not just plumbing."""
    from ..sources import pyds

    return (
        pyds.read_feeder(spark, n=10000, parts=8)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("total_value"),
        )
        .orderBy("key")
    )


@query(
    "feeder_route_do_pipeline",
    oracle="""
    SELECT CAST((i * 2654435761) % 7 AS BIGINT) AS part_id,
           count(*) AS cnt,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS total_value,
           CAST(sum(((i * 2654435761) % 1000) // 250) AS BIGINT) AS total_vbucket
    FROM range(0, 10000) t(i)
    GROUP BY 1 ORDER BY 1
    """,
)
def feeder_route_do_pipeline(spark, sf_dir):
    """The reference's full "arbitrary user code" surface in ONE
    pipeline: pluggable Feeder source (input/feeder.go:9-11) →
    opaque Python partitioner (partitions/partitioner.go:16-19, the
    DeterminePartition contract test/custom_partitioner.go:25-39) →
    Transformer over Arrow batches (transformations.go:23-49) →
    keyed reduce.

    The do() stage stamps each row with its PHYSICAL partition id
    (TaskContext), and the oracle recomputes the router formula
    ((id·Knuth) MOD 7) in SQL — so the gate proves the opaque router
    actually routed every row where it promised, not just that a
    partitioning happened. The routed stage is the parity escape
    hatch (one Python pass); everything around it stays JVM-side."""
    from ..sources import pyds

    knuth = 2654435761

    def route(row):
        return (row.id * knuth) % 7

    def tag_batches(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for pdf in batches:
            out = pdf.assign(part_id=pid, vbucket=pdf["value"] // 250)
            yield out[["id", "value", "part_id", "vbucket"]]

    return (
        Pipeline(pyds.read_feeder(spark, n=10000, parts=8))
        .partitioned_by_fn(7, route)
        .do(
            tag_batches,
            schema="id bigint, value bigint, part_id bigint, vbucket bigint",
        )
        .group_by_key("part_id")
        .reduce(
            {
                "cnt": F.count(F.lit(1)),
                "total_value": F.sum("value"),
                "total_vbucket": F.sum("vbucket"),
            }
        )
        .df.orderBy("part_id")
    )
