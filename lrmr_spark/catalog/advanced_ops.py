"""Advanced operator catalog entries: as-of join, range join, exact
percentiles, approximate sketches, the Do-transformer escape hatch, and
the array/collection scalar surface.
"""

from __future__ import annotations

from pyspark.sql import Window as W
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


@query(
    "graph_pagerank_parts",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR) AS src,
                      'p:' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR),
                      'o:' || CAST(l_orderkey AS VARCHAR)
      FROM lineitem),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    n AS (SELECT 1000000 // count(*) AS tp FROM nodes),
    r0 AS (SELECT node, (SELECT tp FROM n) AS rank_ppm FROM nodes),
    r1 AS (
      SELECT e.dst AS node,
             (15 * (SELECT tp FROM n) + 85 * sum(r.rank_ppm // d.outdeg)) // 100
               AS rank_ppm
      FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst),
    r2 AS (
      SELECT e.dst AS node,
             (15 * (SELECT tp FROM n) + 85 * sum(r.rank_ppm // d.outdeg)) // 100
               AS rank_ppm
      FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst),
    r3 AS (
      SELECT e.dst AS node,
             (15 * (SELECT tp FROM n) + 85 * sum(r.rank_ppm // d.outdeg)) // 100
               AS rank_ppm
      FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst)
    SELECT node, CAST(rank_ppm AS BIGINT) AS rank_ppm
    FROM r3 ORDER BY rank_ppm DESC, node LIMIT 30
    """,
)
def graph_pagerank_parts(spark, sf_dir):
    """PageRank (3 fixed iterations, damping 0.85) over the undirected
    order↔part bipartite graph from lineitem — authority scoring of the
    kind corpus pipelines run on source/domain/link graphs to weight
    training data. Top-30 nodes by rank.

    Ranks are exact integer ppm (operators.graph.pagerank_ppm): every
    step is integer division, so the fixed-point result is bit-identical
    across engines/partitionings — which is what lets an ITERATIVE
    distributed algorithm be oracle-checked at all (float PageRank
    differs in the last ulp with sum order). The oracle is the same
    recurrence as three chained SQL CTEs."""
    li = load(spark, sf_dir, "lineitem")
    # iterate over LONG node ids (orders even, parts odd) — string ids
    # would ride every per-iteration shuffle (measured 34 s → 9 s at
    # sf0.1); the 'o:'/'p:' labels the oracle uses are formatted only
    # on the final 30 rows
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    from ..operators.graph import pagerank_ppm

    ranks = pagerank_ppm(fwd.unionAll(rev), iterations=3, damping_pct=85)
    # integer DIV, not float division: float round-trip is only exact
    # below 2^53 — the id path stays integer-exact for any bigint key
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("o:"), F.expr("node DIV 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("p:"), F.expr("(node - 1) DIV 2").cast("string"))
    )
    return (
        ranks.select(
            label.alias("node"),
            F.col("rank_ppm").cast("bigint").alias("rank_ppm"),
        )
        .orderBy(F.desc("rank_ppm"), F.asc("node"))
        .limit(30)
    )


def _hits_round(prev_h: str, rnd: int) -> str:
    """One HITS round as DuckDB CTEs: a_raw from the previous hubs,
    L1-normalized to ppm over the FULL node set (left join keeps
    no-in-edge nodes at 0), then h_raw from the NEW authorities —
    hits_ppm's exact BIGINT recurrence (Kleinberg update order)."""
    return f"""
    a{rnd}raw AS (
      SELECT e.dst AS node, sum(h.hub) AS raw
      FROM e JOIN {prev_h} h ON e.src = h.node GROUP BY e.dst),
    a{rnd} AS (
      SELECT n.node,
             CAST(coalesce(r.raw, 0) * 1000000 //
                  greatest((SELECT sum(raw) FROM a{rnd}raw), 1) AS BIGINT)
               AS auth
      FROM nodes n LEFT JOIN a{rnd}raw r ON n.node = r.node),
    h{rnd}raw AS (
      SELECT e.src AS node, sum(a.auth) AS raw
      FROM e JOIN a{rnd} a ON e.dst = a.node GROUP BY e.src),
    h{rnd} AS (
      SELECT n.node,
             CAST(coalesce(r.raw, 0) * 1000000 //
                  greatest((SELECT sum(raw) FROM h{rnd}raw), 1) AS BIGINT)
               AS hub
      FROM nodes n LEFT JOIN h{rnd}raw r ON n.node = r.node)"""


@query(
    "graph_hits_authorities",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR) AS src,
                      'p:' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem),
    nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e),
    n AS (SELECT 1000000 // count(*) AS tp FROM nodes),
    h0 AS (SELECT node, (SELECT tp FROM n) AS hub FROM nodes),
    {_hits_round('h0', 1)},
    {_hits_round('h1', 2)}
    SELECT a2.node, a2.auth AS auth_ppm, h2.hub AS hub_ppm
    FROM a2 JOIN h2 ON a2.node = h2.node
    ORDER BY auth_ppm DESC, a2.node ASC LIMIT 30
    """,
)
def graph_hits_authorities(spark, sf_dir):
    """HITS hubs & authorities (2 fixed Kleinberg iterations, exact
    integer ppm, L1 normalization) over the DIRECTED order→part graph
    — orders are pure hubs (they only cite), parts pure authorities
    (only cited), the cleanest bipartite exercise of both score
    vectors. Corpus-curation reading: authority ranks the
    heavily-cited pages to keep; a high-hub/low-authority profile
    flags link-list/directory boilerplate PageRank alone can't
    separate. Top-30 nodes by authority.

    Same determinism contract as graph_pagerank_parts: every step is
    BIGINT arithmetic (sums + one ppm-scaling integer division per
    half-round), so a fixed iteration count is bit-identical across
    engines and the oracle is the literal recurrence as chained CTEs.
    Long node ids ride the per-iteration shuffles (orders even, parts
    odd); labels format only on the final 30 rows. See
    operators/graph.py hits_ppm for the two-adjacency-cache scale
    shape (per round: two node-count SMJs + two partial-sum shuffles,
    no edge-sized exchange after setup)."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    e = li.select(o.alias("src"), p.alias("dst")).distinct()
    from ..operators.graph import hits_ppm

    scores = hits_ppm(e, iterations=2)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("o:"), F.expr("node DIV 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("p:"), F.expr("(node - 1) DIV 2").cast("string"))
    )
    return (
        scores.select(
            label.alias("node"),
            F.col("auth_ppm").cast("bigint").alias("auth_ppm"),
            F.col("hub_ppm").cast("bigint").alias("hub_ppm"),
        )
        .orderBy(F.desc("auth_ppm"), F.asc("node"))
        .limit(30)
    )


def _walk_step(
    prev: str, prev_col: str, rnd: int, w: int = 0, w_sql: str | None = None
) -> str:
    """One deterministic-walk step as a DuckDB rank join: neighbor
    index = random_walks' mod-2^31-1 LCG over (node, walk, step) into
    the dst-sorted adjacency ranks (every product reduced before
    multiplying — overflow-free BIGINT in both engines). ``prev`` /
    ``prev_col`` name the prior step's CTE and node column; ``w`` is
    the walk index (the (w·12345) % P hash term — 0 for the
    single-walk entry below); ``w_sql`` instead names a per-row walk
    column for multi-walk entries, where the term varies by row (the
    graph_random_walks_multi gate pins it against DuckDB — r10
    VERDICT: walks_per_node=1 made the w term identically 0 in the
    only oracle-checked path)."""
    p = 2_147_483_647
    tw = f"({w_sql} * 12345) % {p}" if w_sql else str((w * 12_345) % p)
    tc = (rnd * 1_013_904_223) % p
    return f"""
    s{rnd} AS (
      SELECT s.*, a.dst AS n{rnd}
      FROM {prev} s JOIN a
        ON a.src = s.{prev_col}
       AND a.rk = ((s.{prev_col} % {p}) * 1103515245
                   % {p} + {tw} + {tc}) % {p} % a.deg)"""


@query(
    "graph_random_walks",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 + 1,
                      CAST(l_orderkey AS BIGINT) * 2
      FROM lineitem),
    a AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk,
             count(*) OVER (PARTITION BY src) AS deg
      FROM e),
    s0 AS (
      SELECT DISTINCT src AS n0 FROM e
      WHERE src % 2 = 0 AND (src // 2) % 97 = 1),
    {_walk_step('s0', 'n0', 1)},
    {_walk_step('s1', 'n1', 2)},
    {_walk_step('s2', 'n2', 3)}
    SELECT 'o:' || CAST(n0 // 2 AS VARCHAR) AS start,
           CAST(4 AS BIGINT) AS n_steps,
           'o:' || CAST(n0 // 2 AS VARCHAR)
             || ' p:' || CAST((n1 - 1) // 2 AS VARCHAR)
             || ' o:' || CAST(n2 // 2 AS VARCHAR)
             || ' p:' || CAST((n3 - 1) // 2 AS VARCHAR) AS path
    FROM s3 ORDER BY start
    """,
)
def graph_random_walks(spark, sf_dir):
    """Deterministic DeepWalk-style corpus generation (4-step walks,
    1 walk per start) over the undirected order↔part graph, starting
    from every 97th order — the graph→sequence primitive embedding
    pipelines train on, made oracle-checkable by replacing RNG with
    the operator's mod-2^31-1 LCG over (node, step) into SORTED
    neighbor ranks (operators/graph.py random_walks; the oracle
    replays each step as a rank join). On the symmetric bipartite
    graph walks alternate o→p→o→p and never die, so n_steps is
    uniformly 4 here; the dead-end (prefix-keeping) path is pinned by
    the closed-form pytest. Per step the walk-count state table SMJs
    the packed sorted adjacency and element_at indexes ONE array slot
    — no explode anywhere, per-step wire cost is walk-count rows."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    from ..operators.graph import random_walks

    starts = (
        li.select(o.alias("node"))
        .filter(F.expr("(node DIV 2) % 97 = 1"))
        .distinct()
    )
    walks = random_walks(
        fwd.unionAll(rev), starts=starts, walk_len=4, walks_per_node=1
    )
    def lab(col: str) -> str:
        return (
            f"CASE WHEN {col} % 2 = 0 THEN 'o:' || CAST({col} DIV 2 AS STRING) "
            f"ELSE 'p:' || CAST(({col} - 1) DIV 2 AS STRING) END"
        )

    return (
        walks.select(
            F.expr(lab("start")).alias("start"),
            F.col("n_steps").cast("bigint").alias("n_steps"),
            F.expr(f"array_join(transform(path, x -> {lab('x')}), ' ')").alias(
                "path"
            ),
        )
        .orderBy("start")
    )


@query(
    "graph_random_walks_multi",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 + 1,
                      CAST(l_orderkey AS BIGINT) * 2
      FROM lineitem),
    a AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk,
             count(*) OVER (PARTITION BY src) AS deg
      FROM e),
    s0 AS (
      SELECT n0, CAST(w AS BIGINT) AS w
      FROM (SELECT DISTINCT src AS n0 FROM e
            WHERE src % 2 = 0 AND (src // 2) % 97 = 1)
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS w)),
    {_walk_step('s0', 'n0', 1, w_sql='s.w')},
    {_walk_step('s1', 'n1', 2, w_sql='s.w')}
    SELECT 'o:' || CAST(n0 // 2 AS VARCHAR) AS start,
           w,
           CAST(3 AS BIGINT) AS n_steps,
           'o:' || CAST(n0 // 2 AS VARCHAR)
             || ' p:' || CAST((n1 - 1) // 2 AS VARCHAR)
             || ' o:' || CAST(n2 // 2 AS VARCHAR) AS path
    FROM s2 ORDER BY start, w
    """,
)
def graph_random_walks_multi(spark, sf_dir):
    """Multi-walk variant of graph_random_walks (walks_per_node=3,
    3-step walks): pins the LCG's (w·12345) % P term against DuckDB —
    in the single-walk sibling that term is identically 0, so only the
    property test covered it (r10 VERDICT missing-item 2). The w
    column rides the output; the oracle replays every (start, w) pair
    as rank joins with the per-row w term in SQL. Same scale shape as
    the sibling (walk-count rows per step, packed sorted adjacency,
    element_at — no explode)."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    from ..operators.graph import random_walks

    starts = (
        li.select(o.alias("node"))
        .filter(F.expr("(node DIV 2) % 97 = 1"))
        .distinct()
    )
    walks = random_walks(
        fwd.unionAll(rev), starts=starts, walk_len=3, walks_per_node=3
    )

    def lab(col: str) -> str:
        return (
            f"CASE WHEN {col} % 2 = 0 THEN 'o:' || CAST({col} DIV 2 AS STRING) "
            f"ELSE 'p:' || CAST(({col} - 1) DIV 2 AS STRING) END"
        )

    return (
        walks.select(
            F.expr(lab("start")).alias("start"),
            F.col("w").cast("bigint").alias("w"),
            F.col("n_steps").cast("bigint").alias("n_steps"),
            F.expr(f"array_join(transform(path, x -> {lab('x')}), ' ')").alias(
                "path"
            ),
        )
        .orderBy("start", "w")
    )


def _wwalk_step(prev: str, prev_col: str, rnd: int, w_sql: str) -> str:
    """One WEIGHTED deterministic-walk step as a DuckDB range join:
    the shared LCG hash mod W(u) lands in exactly one neighbor's
    cumulative-weight range [lo, hi) (operators/graph.py
    weighted_random_walks — windowed running sums in the adjacency
    CTE ``a``)."""
    p = 2_147_483_647
    tw = f"({w_sql} * 12345) % {p}"
    tc = (rnd * 1_013_904_223) % p
    hh = (
        f"((s.{prev_col} % {p}) * 1103515245 % {p} + {tw} + {tc}) % {p}"
    )
    return f"""
    s{rnd} AS (
      SELECT s.*, a.dst AS n{rnd}
      FROM {prev} s JOIN a
        ON a.src = s.{prev_col}
       AND {hh} % a.W >= a.lo
       AND {hh} % a.W < a.hi)"""


@query(
    "graph_random_walks_weighted",
    oracle=f"""
    WITH b AS (
      SELECT CAST(l_orderkey AS BIGINT) * 2 AS src,
             CAST(l_partkey AS BIGINT) * 2 + 1 AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT CAST(l_partkey AS BIGINT) * 2 + 1,
             CAST(l_orderkey AS BIGINT) * 2,
             CAST(count(*) AS BIGINT)
      FROM lineitem GROUP BY 1, 2),
    a AS (
      SELECT src, dst,
             sum(w) OVER (PARTITION BY src ORDER BY dst) - w AS lo,
             sum(w) OVER (PARTITION BY src ORDER BY dst) AS hi,
             sum(w) OVER (PARTITION BY src) AS W
      FROM b),
    s0 AS (
      SELECT n0, CAST(w AS BIGINT) AS w
      FROM (SELECT DISTINCT src AS n0 FROM b
            WHERE src % 2 = 0 AND (src // 2) % 97 = 1)
      CROSS JOIN (SELECT unnest([0, 1]) AS w)),
    {_wwalk_step('s0', 'n0', 1, 's.w')},
    {_wwalk_step('s1', 'n1', 2, 's.w')}
    SELECT 'o:' || CAST(n0 // 2 AS VARCHAR) AS start,
           w,
           CAST(3 AS BIGINT) AS n_steps,
           'o:' || CAST(n0 // 2 AS VARCHAR)
             || ' p:' || CAST((n1 - 1) // 2 AS VARCHAR)
             || ' o:' || CAST(n2 // 2 AS VARCHAR) AS path
    FROM s2 ORDER BY start, w
    """,
)
def graph_random_walks_weighted(spark, sf_dir):
    """Weighted deterministic walks (2 walks × 3 steps from every
    97th order) over the order↔part graph with LINEITEM MULTIPLICITY
    as the edge weight — a part ordered in 3 lineitems of an order is
    3× as likely per step, the weighted co-occurrence regime
    production DeepWalk corpora train on (operators/graph.py
    weighted_random_walks). The oracle replays every step as a range
    join of the LCG hash mod W(u) into windowed cumulative-weight
    ranges — exact BIGINT arithmetic both sides. Scale shape: the
    shared step-rows loop (constant walk-count checkpoint bytes per
    step) over the packed (dst, cum)-struct adjacency; the pick costs
    O(out-degree) filter work per walker-step, JVM-side."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.groupBy(o.alias("src"), p.alias("dst")).agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    rev = li.groupBy(p.alias("src"), o.alias("dst")).agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    from ..operators.graph import weighted_random_walks

    starts = (
        li.select(o.alias("node"))
        .filter(F.expr("(node DIV 2) % 97 = 1"))
        .distinct()
    )
    walks = weighted_random_walks(
        fwd.unionAll(rev), starts=starts, walk_len=3, walks_per_node=2
    )

    def lab(col: str) -> str:
        return (
            f"CASE WHEN {col} % 2 = 0 THEN 'o:' || CAST({col} DIV 2 AS STRING) "
            f"ELSE 'p:' || CAST(({col} - 1) DIV 2 AS STRING) END"
        )

    return (
        walks.select(
            F.expr(lab("start")).alias("start"),
            F.col("w").cast("bigint").alias("w"),
            F.col("n_steps").cast("bigint").alias("n_steps"),
            F.expr(f"array_join(transform(path, x -> {lab('x')}), ' ')").alias(
                "path"
            ),
        )
        .orderBy("start", "w")
    )


def _bfs_round(prev: str, rnd: int) -> str:
    """One multi-source-BFS round as a DuckDB CTE: the frontier-free
    unroll — relax every edge from the labeled set and min-fold the
    (dist, root) BIGINT encoding (enc = dist·2^42 + root, min(enc) ≡
    lexicographic min — operators/graph.py bfs_levels). The unroll
    re-sends settled nodes (fine at oracle scale); the operator sends
    only the frontier."""
    return f"""
    l{rnd} AS (
      SELECT node, min(enc) AS enc FROM (
        SELECT node, enc FROM l{rnd - 1}
        UNION ALL
        SELECT e.dst AS node, l.enc + 4398046511104 AS enc
        FROM e JOIN l{rnd - 1} l ON e.src = l.node
      ) GROUP BY node)"""


@query(
    "graph_bfs_levels",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 + 1,
                      CAST(l_orderkey AS BIGINT) * 2
      FROM lineitem),
    l0 AS (
      SELECT node, node AS enc FROM (
        SELECT DISTINCT src AS node FROM e
        WHERE src % 2 = 0 AND (src // 2) % 997 = 1)),
    {_bfs_round('l0', 1)},
    {_bfs_round('l1', 2)},
    {_bfs_round('l2', 3)},
    d AS (
      SELECT node, enc // 4398046511104 AS dist,
             enc % 4398046511104 AS root
      FROM l3)
    SELECT 'o:' || CAST(root // 2 AS VARCHAR) AS root,
           CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS sum_node
    FROM d GROUP BY 1, 2 ORDER BY root, dist
    """,
)
def graph_bfs_levels(spark, sf_dir):
    """Multi-source BFS distance labeling (3 hops) over the undirected
    order↔part graph from every 997th order — the distance-to-trusted-
    seed feature of TrustRank-style corpus curation
    (operators/graph.py bfs_levels): every reached node labeled with
    (hop distance, smallest nearest seed), ties dist-then-id. The
    result is aggregated per (root, dist) into node count + id sum —
    compact rows that still pin every node's label through the exact
    BIGINT sum. The oracle unrolls the identical rounds as chained
    CTEs over the same (dist, root) single-BIGINT min encoding —
    exact integer arithmetic, bit-identical across engines. Scale
    shape: per round only the FRONTIER joins the sorted adjacency
    cache (total sends bounded by edge count across all rounds); one
    full-outer min-fold updates labels and yields the next frontier."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    from ..operators.graph import bfs_levels

    seeds = (
        li.select(o.alias("node"))
        .filter(F.expr("(node DIV 2) % 997 = 1"))
        .distinct()
    )
    res = bfs_levels(fwd.unionAll(rev), seeds, max_depth=3)
    return (
        res.groupBy(
            F.concat(F.lit("o:"), F.expr("root DIV 2").cast("string")).alias(
                "root"
            ),
            F.col("dist").cast("bigint").alias("dist"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("sum_node"),
        )
        .orderBy("root", "dist")
    )


def _pagerank_dangling_round(prev: str, rnd: int) -> str:
    """One dangling-PageRank round as DuckDB CTEs: the held mass of
    out-edge-less nodes (one scalar) redistributed uniformly into the
    teleport term, votes folded into the FULL node table by left join —
    the exact recurrence of pagerank_ppm(dangling=True)."""
    return f"""
    d{rnd} AS (
      SELECT coalesce(sum(r.rank_ppm), 0) // (SELECT cnt FROM n) AS share
      FROM {prev} r LEFT JOIN deg d ON r.node = d.src
      WHERE d.src IS NULL),
    i{rnd} AS (
      SELECT e.dst AS node, sum(r.rank_ppm // d.outdeg) AS inc
      FROM e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst),
    r{rnd} AS (
      SELECT nd.node,
             (15 * (SELECT tp FROM n)
              + 85 * (coalesce(i.inc, 0) + (SELECT share FROM d{rnd}))) // 100
               AS rank_ppm
      FROM nodes nd LEFT JOIN i{rnd} i ON nd.node = i.node)"""


@query(
    "graph_pagerank_dangling",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
    n AS (SELECT count(*) AS cnt, 1000000 // count(*) AS tp FROM nodes),
    r0 AS (SELECT node, (SELECT tp FROM n) AS rank_ppm FROM nodes),
    {_pagerank_dangling_round("r0", 1)},
    {_pagerank_dangling_round("r1", 2)},
    {_pagerank_dangling_round("r2", 3)}
    SELECT CASE WHEN node % 2 = 0 THEN 'o:' || CAST(node // 2 AS VARCHAR)
                ELSE 'p:' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
           CAST(rank_ppm AS BIGINT) AS rank_ppm
    FROM r3 ORDER BY rank_ppm DESC, node LIMIT 30
    """,
)
def graph_pagerank_dangling(spark, sf_dir):
    """PageRank (3 iterations, damping 0.85, DANGLING-MASS mode) over
    the DIRECTED order→part graph from lineitem — the real-web-graph
    shape graph_pagerank_parts contracts away: here every part node is
    a dangler (no out-edges) and every order node has no in-edges, so
    the fast path's every-node-has-both-edges contract fails maximally.
    pagerank_ppm(dangling=True) redistributes the danglers' held mass
    uniformly each round (one scalar aggregate crosses the driver) and
    folds votes into the full node table by left join, so orderless
    nodes keep teleport + share instead of vanishing. Top-30 by rank.

    The oracle unrolls the identical integer-ppm recurrence as chained
    CTEs — exact BIGINT arithmetic, bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    from ..operators.graph import pagerank_ppm

    ranks = pagerank_ppm(fwd, iterations=3, damping_pct=85, dangling=True)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("o:"), F.expr("node DIV 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("p:"), F.expr("(node - 1) DIV 2").cast("string"))
    )
    return (
        ranks.select(
            label.alias("node"),
            F.col("rank_ppm").cast("bigint").alias("rank_ppm"),
        )
        .orderBy(F.desc("rank_ppm"), F.asc("node"))
        .limit(30)
    )


def _ppr_round(prev: str, rnd: int) -> str:
    """One personalized-PageRank round as DuckDB CTEs: dangling mass
    returns to the SEEDS (the standard PPR convention), teleport only
    to seeds — the exact recurrence of personalized_pagerank_ppm."""
    return f"""
    d{rnd} AS (
      SELECT coalesce(sum(r.rank_ppm), 0) // (SELECT cnt FROM s) AS share
      FROM {prev} r LEFT JOIN deg d ON r.node = d.src
      WHERE d.src IS NULL),
    i{rnd} AS (
      SELECT e.dst AS node, sum(r.rank_ppm // d.outdeg) AS inc
      FROM e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst),
    r{rnd} AS (
      SELECT nd.node,
             (15 * CASE WHEN sd.node IS NOT NULL
                        THEN (SELECT tp FROM s) ELSE 0 END
              + 85 * (coalesce(i.inc, 0)
                      + CASE WHEN sd.node IS NOT NULL
                             THEN (SELECT share FROM d{rnd}) ELSE 0 END))
               // 100 AS rank_ppm
      FROM nodes nd LEFT JOIN i{rnd} i ON nd.node = i.node
                    LEFT JOIN seeds sd ON nd.node = sd.node)"""


@query(
    "graph_pagerank_personalized",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
    seeds AS (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT 20),
    s AS (SELECT count(*) AS cnt, 1000000 // count(*) AS tp FROM seeds),
    r0 AS (
      SELECT nd.node,
             CASE WHEN sd.node IS NOT NULL THEN (SELECT tp FROM s)
                  ELSE 0 END AS rank_ppm
      FROM nodes nd LEFT JOIN seeds sd ON nd.node = sd.node),
    {_ppr_round("r0", 1)},
    {_ppr_round("r1", 2)},
    {_ppr_round("r2", 3)}
    SELECT CASE WHEN node % 2 = 0 THEN 'o:' || CAST(node // 2 AS VARCHAR)
                ELSE 'p:' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
           CAST(rank_ppm AS BIGINT) AS rank_ppm
    FROM r3 WHERE rank_ppm > 0 ORDER BY rank_ppm DESC, node LIMIT 30
    """,
)
def graph_pagerank_personalized(spark, sf_dir):
    """Personalized (topic-sensitive) PageRank — Haveliwala WWW'02 —
    over the directed order→part graph, seeded with the 20 smallest
    order nodes: rank measures link proximity to the seed list, the
    corpus-pipeline primitive for trusted-source influence scoring
    ("weight documents by how close their domain sits to a vetted
    seed set"). Teleport mass goes only to seeds; every part node
    dangles and its held mass returns to the SEEDS each round (the
    standard PPR convention), so the seed neighborhood keeps all the
    probability. Top-30 positive-rank nodes (zero-rank nodes — nodes
    unreachable from the seeds — are excluded so the result is the
    seeds' actual influence frontier).

    Exact integer ppm on the r9 adjacency loop; the oracle unrolls
    the identical recurrence as chained BIGINT CTEs — bit-identical
    across engines."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    seeds = (
        fwd.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(20)
    )
    from ..operators.graph import personalized_pagerank_ppm

    ranks = personalized_pagerank_ppm(
        fwd, seeds, iterations=3, damping_pct=85
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("o:"), F.expr("node DIV 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("p:"), F.expr("(node - 1) DIV 2").cast("string"))
    )
    return (
        ranks.filter(F.col("rank_ppm") > 0)
        .select(
            label.alias("node"),
            F.col("rank_ppm").cast("bigint").alias("rank_ppm"),
        )
        .orderBy(F.desc("rank_ppm"), F.asc("node"))
        .limit(30)
    )


@query(
    "robust_trimmed_mean",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_total,
           count(*) AS n_kept,
           CAST(sum(cents) AS BIGINT) // count(*) AS trimmed_mean_cents
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - (n // 10)
    GROUP BY event_type ORDER BY event_type
    """,
)
def robust_trimmed_mean(spark, sf_dir):
    """Robust statistics: 10%-trimmed mean of event value per type —
    drop the bottom and top deciles BY RANK (not by float quantile
    thresholds, which sit on engine-dependent interpolation), then
    average the middle in exact integer cents. The outlier-resistant
    aggregate monitoring pipelines prefer over plain avg.

    One window pass (rank + count over the type key) + one bounded-key
    aggregation; everything integer, so the result is partitioning- and
    engine-independent."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = W.partitionBy("event_type").orderBy("cents", "event_id")
    w_n = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "event_id", cents.alias("cents")
    ).select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return (
        ranked.filter(
            (F.col("rn") > F.expr("n DIV 10"))
            & (F.col("rn") <= F.col("n") - F.expr("n DIV 10"))
        )
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.expr("CAST(sum(cents) AS BIGINT) DIV count(1)").alias(
                "trimmed_mean_cents"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "asof_next_click",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS r_ts, r.value AS r_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (
      SELECT user_id, ts, min_by(value, event_id) AS value,
             min(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ) r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def asof_next_click(spark, sf_dir):
    """FORWARD as-of join: each purchase annotated with the user's
    earliest click at-or-after it — next-event attribution (post-
    purchase engagement). Same union-and-carry plan as the backward
    variant with the window frame mirrored (first() over the following
    frame); one shuffle on user_id. Verified against DuckDB's native
    forward ASOF JOIN (l.ts <= r.ts), with the right side pre-deduped
    to one row per (user_id, ts) by min event_id so tie semantics are
    pinned on both engines."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.min_by("value", "event_id").alias("value"),
            F.min("event_id").alias("event_id"),
        )
    )
    return AS.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        direction="forward",
    )


@query(
    "cogroup_click_purchase_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS n_clicks, min(event_id) AS first_click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id),
    p AS (
      SELECT user_id, count(*) AS n_purchases,
             min(event_id) AS first_purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(n_clicks, 0) AS n_clicks,
           coalesce(n_purchases, 0) AS n_purchases,
           coalesce(first_click_id, -1) AS first_click_id,
           coalesce(first_purchase_id, -1) AS first_purchase_id,
           coalesce(n_purchases, 0) * 1000000
             // greatest(coalesce(n_clicks, 0) + coalesce(n_purchases, 0), 1)
             AS purchase_share_ppm
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    ORDER BY 1
    """,
)
def cogroup_click_purchase_profile(spark, sf_dir):
    """Cogroup (the two-sided grouped-map operator): click events and
    purchase events are grouped on user_id independently, then each
    user's two groups are handed to ONE Python function together —
    the escape hatch for per-key logic that needs both sides at once
    (custom sessionized attribution, per-user train/label alignment)
    and can't be written as a join + window.

    Spark shape: ``dfA.groupBy(k).cogroup(dfB.groupBy(k))
    .applyInPandas(fn)`` — both sides hash-shuffle on user_id once,
    co-partitioned, then Arrow-batched pandas per key. Per-key state
    is bounded by that user's events; no driver collect. All outputs
    are exact integers (counts, min ids, ppm share). Oracle: the
    cogroup degenerates to FULL OUTER join of two aggregates — two
    independent formulations must agree. The reference's Reduce gets
    one grouped stream (transformation.go); cogroup is the two-input
    generalization Spark offers.

    SELF-cogroup sharp edge (r12, found by the catalog sweep's
    ``count()``): deriving BOTH sides from one scan gives them the
    same attribute exprIds, and under any downstream projection
    (``count()``, a column subset) Spark 4.1's column pruning then
    strips the right side's non-key columns — the pandas function
    received a purchases frame holding only ``user_id`` (rows intact,
    values gone): a worker crash under count-only consumption and a
    silent-wrong-value hazard under partial projection. The sides are
    therefore built from two INDEPENDENT scans (fresh exprIds — the
    two filter branches each scanned the table anyway), and the
    function raises loudly if a needed column ever goes missing again
    instead of fabricating -1s."""
    import pandas as pd

    clicks = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("user_id", "event_id")
    purchases = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "event_id")

    def profile(key, cdf: "pd.DataFrame", pdf: "pd.DataFrame") -> "pd.DataFrame":
        for side, frame in (("clicks", cdf), ("purchases", pdf)):
            if len(frame) and "event_id" not in frame.columns:
                raise RuntimeError(
                    f"cogroup {side} side arrived without event_id "
                    f"(got {list(frame.columns)}): column pruning "
                    "reached into the cogroup child again"
                )
        nc, np_ = len(cdf), len(pdf)
        return pd.DataFrame(
            [
                {
                    "user_id": int(key[0]),
                    "n_clicks": nc,
                    "n_purchases": np_,
                    "first_click_id": int(cdf.event_id.min()) if nc else -1,
                    "first_purchase_id": int(pdf.event_id.min()) if np_ else -1,
                    "purchase_share_ppm": np_ * 1_000_000 // max(nc + np_, 1),
                }
            ]
        )

    out = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            profile,
            schema="user_id bigint, n_clicks bigint, n_purchases bigint, "
            "first_click_id bigint, first_purchase_id bigint, "
            "purchase_share_ppm bigint",
        )
    )
    return out.orderBy("user_id")


@query(
    "sketch_distinct_mincount",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM events),
    b AS (
      SELECT event_type, h % 16 AS bucket, min(h // 16) AS mn
      FROM h GROUP BY event_type, bucket),
    est AS (
      SELECT event_type,
             CAST(sum(268435456 // (mn + 1)) AS BIGINT) AS est_distinct
      FROM b GROUP BY event_type),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type)
    SELECT ex.event_type, ex.n_exact, est.est_distinct,
           abs(est.est_distinct - ex.n_exact) * 1000000 // ex.n_exact
             AS err_ppm
    FROM ex JOIN est USING (event_type) ORDER BY event_type
    """,
)
def sketch_distinct_mincount(spark, sf_dir):
    """Portable approximate-distinct sketch (MinCount / Flajolet-Martin
    with stochastic averaging): hash each user id to 32 bits, split the
    hash space into 16 buckets (h MOD 16), keep only the MINIMUM
    remaining hash value per bucket, and estimate each bucket's
    distinct count as M/(min+1) (minimum of n uniform draws on [0, M)
    concentrates at M/(n+1)); the per-bucket estimates sum to the
    total because the buckets partition the distinct set.

    Why this exists next to approx_count_distinct: Spark's HLL sketch
    is engine-internal (not oracle-checkable, not portable across
    systems), while this sketch is 16 integers with EXACT integer
    arithmetic — the same md5-derived values fall out of DuckDB, so
    the driver hash-matches it like any other query (`approx_stats`
    stays rows-only for exactly this reason). Scale shape: the whole
    sketch is a min() aggregate — map-side combinable, mergeable
    across days/partitions like the bitmap rollup, 16 rows per group
    on the wire. The exact count is computed alongside only to report
    err_ppm; a production rollup ships the 16 mins alone."""
    ev = load(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    b = (
        ev.select("event_type", h.alias("h"))
        .groupBy("event_type", F.expr("h % 16").alias("bucket"))
        .agg(F.expr("min(h DIV 16)").alias("mn"))
    )
    est = b.groupBy("event_type").agg(
        F.expr("cast(sum(268435456 DIV (mn + 1)) as bigint)").alias("est_distinct")
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return (
        ex.join(est, "event_type")
        .select(
            "event_type",
            "n_exact",
            "est_distinct",
            F.expr(
                "abs(est_distinct - n_exact) * 1000000 DIV n_exact"
            ).alias("err_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "events_outliers_mad",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c),
    med AS (
      SELECT event_type, cents AS med_cents FROM r WHERE rn = (n + 1) // 2),
    d AS (
      SELECT c.event_type, abs(c.cents - m.med_cents) AS dev, m.med_cents
      FROM c JOIN med m USING (event_type)),
    rd AS (
      SELECT event_type, dev, med_cents,
             row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    mad AS (
      SELECT event_type, med_cents, dev AS mad_cents
      FROM rd WHERE rn = (n + 1) // 2)
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           mad.med_cents, mad.mad_cents,
           CAST(sum(CASE WHEN d.dev * 10000 > 14826 * mad.mad_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type, mad.med_cents, mad.mad_cents
    ORDER BY d.event_type
    """,
)
def events_outliers_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: flag
    values whose deviation from the per-group median exceeds
    1.4826×MAD (the normal-consistency constant) — the
    breakdown-point-0.5 alternative to z-scores, which a single
    extreme value can't poison (events_outliers_zscore is the moment-
    based twin).

    Exactness discipline: 'median' is pinned to the LOWER median (the
    value at row_number (n+1) DIV 2 ordered by cents) — with ties the
    rank assignment is arbitrary but the VALUE at a rank is not, so
    both engines agree exactly; the 1.4826 constant is cross-
    multiplied into the integer predicate dev·10000 > 14826·mad (no
    float decision boundary). Scale shape: ONE events scan and ONE
    event_type exchange — both medians are computed as chained window
    passes over the same partitioning (rank → pick the (n+1) DIV 2
    value with a partition-wide conditional max → deviations → second
    rank), instead of median tables joined back (which re-evaluated
    the scan 4×); at 100 TB swap the exact rank for the
    approx_percentile sketch and keep the identical predicate."""
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.expr("cast(round(value * 100) as bigint)").alias("cents")
    )
    wp = W.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(wp.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    r = r.withColumn(
        "med_cents",
        F.max(F.when(F.expr("rn = (n + 1) DIV 2"), F.col("cents"))).over(wp),
    )
    r = r.withColumn("dev", F.abs(F.col("cents") - F.col("med_cents")))
    r = r.withColumn("rn2", F.row_number().over(wp.orderBy("dev")))
    d = r.withColumn(
        "mad_cents",
        F.max(F.when(F.expr("rn2 = (n + 1) DIV 2"), F.col("dev"))).over(wp),
    )
    return (
        d.groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.expr("dev * 10000 > 14826 * mad_cents"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type", "n_rows", "med_cents", "mad_cents", "n_outliers"
        )
        .orderBy("event_type")
    )


@query(
    "feature_store_pit_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             CASE WHEN event_type = 'error'
                  THEN CAST(round(value * 100) AS BIGINT) END AS err_cents
      FROM events
      WHERE event_type IN ('purchase', 'click', 'error')),
    numbered AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, kind, event_id) AS rn
      FROM u),
    seq AS (
      SELECT *, sum(is_click) OVER w AS clicks_cum,
             max(CASE WHEN err_cents IS NOT NULL
                      THEN rn * 1000000 + err_cents END) OVER w AS err_code
      FROM numbered
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS UNBOUNDED PRECEDING))
    SELECT user_id, event_id AS label_id, ts AS label_ts,
           CAST(clicks_cum AS BIGINT) AS n_clicks_before,
           CAST(coalesce(err_code % 1000000, -1) AS BIGINT)
             AS last_error_cents
    FROM seq WHERE kind = 0 ORDER BY label_id
    """,
)
def feature_store_pit_join(spark, sf_dir):
    """Feature-store point-in-time join: for every training label
    (purchase), fetch feature values exactly as they stood STRICTLY
    BEFORE the label timestamp — here a running click count and the
    latest error value — the correctness rule that prevents feature
    leakage in training data (using a feature computed after the label
    is the classic offline/online skew bug).

    Scale shape: NOT one as-of join per feature table (k features = k
    shuffles). Labels and all feature events union into one stream,
    ONE window per user carries every feature forward (cumulative
    count; latest-error as a max over rn·10^6+cents — an
    order-pinned integer encoding, no IGNORE NULLS portability bets),
    and label rows are filtered out at the end: k features for one
    user-keyed shuffle. Strictly-before is enforced structurally —
    labels sort BEFORE same-timestamp feature rows (kind 0 < 1), so
    an equal-ts feature can never leak into its own label."""
    ev = load(spark, sf_dir, "events")
    u = ev.filter(
        F.col("event_type").isin("purchase", "click", "error")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
        F.when(
            F.col("event_type") == "error",
            F.expr("cast(round(value * 100) as bigint)"),
        ).alias("err_cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    numbered = u.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id").orderBy("ts", "kind", "event_id")
        ),
    )
    seq = numbered.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.sum("is_click").over(w).alias("clicks_cum"),
        F.max(
            F.when(
                F.col("err_cents").isNotNull(),
                F.col("rn") * 1000000 + F.col("err_cents"),
            )
        )
        .over(w)
        .alias("err_code"),
    )
    return (
        seq.filter(F.col("kind") == 0)
        .select(
            "user_id",
            F.col("event_id").alias("label_id"),
            F.col("ts").alias("label_ts"),
            F.col("clicks_cum").cast("bigint").alias("n_clicks_before"),
            F.coalesce(F.expr("err_code % 1000000"), F.lit(-1))
            .cast("bigint")
            .alias("last_error_cents"),
        )
        .orderBy("label_id")
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges) t
      GROUP BY node),
    directed AS (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v),
    wedges AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM directed e1 JOIN directed e2 ON e1.dst = e2.src),
    tri AS (
      SELECT count(*) AS n_triangles FROM wedges w
      WHERE EXISTS (SELECT 1 FROM directed d
                    WHERE d.src = w.a AND d.dst = w.c))
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT n_triangles FROM tri) AS n_triangles
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Exact triangle count over the part co-purchase graph (edges =
    part pairs bought together in ≥2 orders) via the degree-orientation
    algorithm — see operators/graph.py:triangle_count for why the
    orientation bounds wedge fanout by O(√m) per node and makes the
    count skew-proof without salting. The graph-topology counterpart of
    market_basket_pairs (which scores edges; this measures closure —
    the clustering signal behind 'customers also bought' bundles)."""
    from ..operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    edges = (
        items.alias("a")
        .join(items.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    return triangle_count(edges)


@query(
    "graph_label_propagation",
    oracle="""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 + 1,
                      CAST(l_orderkey AS BIGINT) * 2
      FROM lineitem),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
    l1 AS (SELECT dst AS node, label FROM (
             SELECT e.dst, r.label,
                    row_number() OVER (PARTITION BY e.dst
                                       ORDER BY count(*) DESC, r.label ASC)
                      AS rn
             FROM e JOIN l0 r ON e.src = r.node
             GROUP BY e.dst, r.label) WHERE rn = 1),
    l2 AS (SELECT dst AS node, label FROM (
             SELECT e.dst, r.label,
                    row_number() OVER (PARTITION BY e.dst
                                       ORDER BY count(*) DESC, r.label ASC)
                      AS rn
             FROM e JOIN l1 r ON e.src = r.node
             GROUP BY e.dst, r.label) WHERE rn = 1),
    l3 AS (SELECT dst AS node, label FROM (
             SELECT e.dst, r.label,
                    row_number() OVER (PARTITION BY e.dst
                                       ORDER BY count(*) DESC, r.label ASC)
                      AS rn
             FROM e JOIN l2 r ON e.src = r.node
             GROUP BY e.dst, r.label) WHERE rn = 1)
    SELECT CASE WHEN label % 2 = 0
                THEN 'o:' || CAST(label // 2 AS VARCHAR)
                ELSE 'p:' || CAST((label - 1) // 2 AS VARCHAR) END
             AS community,
           CAST(count(*) AS BIGINT) AS n_members
    FROM l3 GROUP BY label
    ORDER BY n_members DESC, community ASC LIMIT 30
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Community detection via synchronous Label Propagation (3 fixed
    rounds, min-label ties) over the undirected order↔part bipartite
    graph — the graph-side complement to dedup_components: LPA finds
    DENSE communities (co-purchase clusters / boilerplate families /
    link farms), not just connectivity, and is the standard cheap
    community pass corpus pipelines run on domain-link graphs before
    source weighting. Output: top-30 communities by size.

    Deterministic by construction (fixed rounds, synchronous updates,
    smallest-label ties, exact integer labels), so an ITERATIVE
    clustering algorithm gets a hash-exact SQL oracle — three unrolled
    CTE rounds with a row_number argmax mirroring Spark's
    max(struct(count, -label)). Long node ids ride every shuffle
    (orders even, parts odd — the pagerank_parts lesson: string ids
    measured 3.8× slower at sf0.1); labels format only on the final 30
    rows. See operators/graph.py label_propagation for the per-round
    shuffle budget."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    # Symmetrize AFTER one distinct over the base pairs (r11 opt
    # round): the former per-direction distincts shuffled 2E rows
    # through two exchanges and scanned lineitem twice; one distinct
    # (E rows, one scan) + a 2-element explode emits the identical
    # symmetric edge set from a single lineage (no Union, no reliance
    # on exchange reuse). distinct(rev) ≡ reverse(distinct(fwd))
    # because rev is the mirrored image of the same pair set.
    pairs = li.select(o.alias("src"), p.alias("dst")).distinct()
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    from ..operators.graph import label_propagation

    labels = label_propagation(sym, iterations=3)
    community = F.when(
        F.col("label") % 2 == 0,
        F.concat(F.lit("o:"), F.expr("label DIV 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("p:"), F.expr("(label - 1) DIV 2").cast("string"))
    )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .select(community.alias("community"), "n_members")
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(30)
    )


def _kcore_oracle() -> str:
    rounds = []
    for r in (1, 2, 3):
        rounds.append(
            f"d{r} AS (SELECT src, count(*) AS c FROM e{r - 1} GROUP BY src), "
            f"k{r} AS (SELECT src AS node FROM d{r} WHERE c >= 3), "
            f"e{r} AS (SELECT e.src, e.dst FROM e{r - 1} e "
            f"JOIN k{r} a ON e.src = a.node JOIN k{r} b ON e.dst = b.node)"
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT CAST(count(DISTINCT src) AS BIGINT) FROM e{r}) AS n_nodes, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges"
        for r in (1, 2, 3)
    )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 + 1,
                      CAST(l_orderkey AS BIGINT) * 2
      FROM lineitem),
    {", ".join(rounds)}
    SELECT * FROM ({finals}) ORDER BY round
    """


@query("graph_kcore_peel", oracle=_kcore_oracle)
def graph_kcore_peel(spark, sf_dir):
    """3-core peeling, 3 fixed bulk-synchronous rounds, over the
    undirected order↔part bipartite graph — the graph-sanitization
    pass that strips weakly-connected fringe (orders touching < 3
    parts, parts in < 3 surviving orders) before authority scoring:
    the link-farm / spam analog of pagerank's input cleaning, and the
    third graph-family member next to graph_pagerank_parts (scoring)
    and graph_label_propagation (communities). Output: the peel
    trajectory (round, n_nodes, n_edges) — how fast the fringe
    collapses is itself the diagnostic (a graph that loses most mass
    at k=3 has no dense core to score).

    Deterministic by construction (fixed rounds, degree thresholds on
    exact counts), so the iterative peel gets a hash-exact SQL oracle
    of three unrolled CTE rounds. Long node ids on every exchange
    (orders even, parts odd — the pagerank_parts lesson); see
    operators/graph.py kcore_peel for the per-round shuffle budget."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    from ..operators.graph import kcore_peel

    return kcore_peel(fwd.unionAll(rev), k=3, rounds=3)


def _kcore_numbers_oracle() -> str:
    """Unrolled mirror of operators.graph.kcore_numbers over the
    order↔part bipartite graph: k = 1..4 levels × 2 peel sweeps each,
    chained CTEs (level k starts from level k-1's survivor edges —
    the documented sequential schedule), core = highest level
    survived, output as the (core, n_nodes) histogram."""
    k_max, rounds = 4, 2
    # AS MATERIALIZED throughout: DuckDB INLINES plain CTEs, and each
    # round references its predecessor 3× (t + both degree joins), so
    # an inlined chain re-expands ~3^8 copies of the base scan — the
    # same pitfall-15 blowup the Spark side breaks with the degree
    # checkpoint. Materialization makes the chain linear.
    parts = [
        """e_0 AS MATERIALIZED (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) * 2 AS src,
                      CAST(l_partkey AS BIGINT) * 2 + 1 AS dst
      FROM lineitem
      UNION ALL
      SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 + 1,
                      CAST(l_orderkey AS BIGINT) * 2
      FROM lineitem)"""
    ]
    cur = "e_0"
    for k in range(1, k_max + 1):
        for r in range(1, rounds + 1):
            d, e = f"d_{k}_{r}", f"e_{k}_{r}"
            parts.append(
                f"{d} AS MATERIALIZED "
                f"(SELECT src, count(*) AS c FROM {cur} GROUP BY src)"
            )
            parts.append(
                f"""{e} AS MATERIALIZED (
      SELECT t.src, t.dst FROM {cur} t
      JOIN {d} a ON a.src = t.src AND a.c >= {k}
      JOIN {d} b ON b.src = t.dst AND b.c >= {k})"""
            )
            cur = e
        parts.append(
            f"s_{k} AS MATERIALIZED "
            f"(SELECT DISTINCT src AS node FROM {cur})"
        )
    case = (
        "CASE "
        + " ".join(
            f"WHEN node IN (SELECT node FROM s_{k}) THEN {k}"
            for k in range(k_max, 0, -1)
        )
        + " ELSE 0 END"
    )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    nodes AS (SELECT DISTINCT src AS node FROM e_0)
    SELECT {case} AS core, CAST(count(*) AS BIGINT) AS n_nodes
    FROM nodes GROUP BY 1 ORDER BY core
    """


@query("graph_kcore_numbers", oracle=_kcore_numbers_oracle)
def graph_kcore_numbers(spark, sf_dir):
    """CORE-NUMBER decomposition (bounded, capped at 4) over the
    order↔part bipartite graph — the per-node refinement of
    graph_kcore_peel's trajectory: instead of "what survives a 3-core
    peel", every node gets the highest level it survived in the
    sequential 1..4 peel, the standard graph-sanitization score
    (spam/link-farm strength tiers, fringe-vs-core mass profile)
    reported as the (core, n_nodes) histogram. Deterministic by the
    bounded-schedule discipline (see operators/graph.py
    kcore_numbers), so an 8-round iterative decomposition gets a
    hash-exact SQL oracle of chained unrolled CTEs. Per-round
    columnar caching per the r7 kcore experiment."""
    li = load(spark, sf_dir, "lineitem")
    o = F.col("l_orderkey").cast("long") * 2
    p = F.col("l_partkey").cast("long") * 2 + 1
    fwd = li.select(o.alias("src"), p.alias("dst")).distinct()
    rev = li.select(p.alias("src"), o.alias("dst")).distinct()
    from ..operators.graph import kcore_numbers

    cores = kcore_numbers(fwd.unionAll(rev), k_max=4, rounds_per_k=2)
    return (
        cores.groupBy("core")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("core")
    )
