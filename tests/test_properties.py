"""Property-based tests (hypothesis): operator semantics vs plain-Python
reference implementations on generated inputs. One Spark job per
example is expensive, so examples are capped and deadlines disabled."""

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from lrmr_spark import Pipeline
from lrmr_spark.operators import dedup as DD

KV = st.lists(
    st.tuples(st.sampled_from("abcde"), st.integers(-1000, 1000)), min_size=1, max_size=40
)

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(data=KV)
@_SETTINGS
def test_group_count_matches_counter(spark, data):
    got = {
        (r["key"], r["cnt"])
        for r in Pipeline.parallelize(spark, data, "key string, v long")
        .group_by_key("key")
        .reduce({"cnt": F.count(F.lit(1))})
        .run_and_collect()
        .rows
    }
    want = set(Counter(k for k, _ in data).items())
    assert got == want


@given(data=KV)
@_SETTINGS
def test_sum_min_max_match_python(spark, data):
    rows = (
        Pipeline.parallelize(spark, data, "key string, v long")
        .group_by_key("key")
        .reduce({"s": F.sum("v"), "lo": F.min("v"), "hi": F.max("v")})
        .run_and_collect()
        .rows
    )
    byk = {}
    for k, v in data:
        byk.setdefault(k, []).append(v)
    for r in rows:
        vs = byk[r["key"]]
        assert (r["s"], r["lo"], r["hi"]) == (sum(vs), min(vs), max(vs))


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=30), min_size=1, max_size=12
    )
)
@_SETTINGS
def test_tokenset_dedup_matches_python(spark, texts):
    data = [(i, t) for i, t in enumerate(texts)]
    out = DD.tokenset_dedup(
        spark.createDataFrame(data, "doc_id long, text string"), "doc_id", "text"
    ).collect()
    # python reference: group by frozenset of tokens
    groups = {}
    for i, t in data:
        groups.setdefault(frozenset(w for w in t.split() if w), []).append(i)
    assert sorted((min(v), len(v)) for v in groups.values()) == sorted(
        (r["keep_id"], r["n_dups"]) for r in out
    )


def test_minhash_estimates_jaccard(spark):
    # deterministic: minhash agreement rate ≈ true multiset jaccard
    a = " ".join(f"t{i}" for i in range(100))
    b = " ".join(f"t{i}" for i in range(50)) + " " + " ".join(f"u{i}" for i in range(50))
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    from lrmr_spark.operators.dedup import minhash_signature, token_multiset_items

    items = token_multiset_items(df, "doc_id", "text")
    sigs = {
        r["_id"]: r["sig"]
        for r in items.select(
            "_id", minhash_signature(F.col("items"), 64).alias("sig")
        ).collect()
    }
    agree = sum(x == y for x, y in zip(sigs[1], sigs[2])) / 64
    true_j = 50 / 150  # |∩|=50, |∪|=150
    assert math.isclose(agree, true_j, abs_tol=0.15)


EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).map(
        lambda p: (min(p), max(p))
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=25,
)


@given(edges=EDGES)
@_SETTINGS
def test_connected_components_match_union_find(spark, edges):
    # distributed HashMin label propagation vs a plain-Python union-find
    # on random graphs: every node must get the min id of its component
    pairs = spark.createDataFrame(
        [(a, b) for a, b in set(edges)], "id_a long, id_b long"
    )
    got = {r["id"]: r["comp"] for r in DD.connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    want = {n: min(members) for members in comps.values() for n in members}
    assert got == want


TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=20
)


@given(texts=TEXTS)
@_SETTINGS
def test_pack_sequences_invariants(spark, texts):
    """Packing layout vs a plain-Python packer: every doc's chunk/offset
    must equal the running-sum grid position, offsets stay inside the
    chunk, and chunk ids are monotone in doc order within a shard."""
    from lrmr_spark.catalog import queries as _qs  # noqa: F401  (style parity)
    from pyspark.sql import Window

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    C = 7
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    cb = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    got = {
        r["doc_id"]: (r["chunk_id"], r["off"])
        for r in df.select(
            "doc_id",
            F.floor(cb / C).cast("bigint").alias("chunk_id"),
            (cb % C).cast("bigint").alias("off"),
        ).collect()
    }
    cum = 0
    for i, t in enumerate(texts):
        assert got[i] == (cum // C, cum % C)
        assert 0 <= got[i][1] < C
        cum += len([x for x in t.split() if x])


@given(texts=TEXTS)
@_SETTINGS
def test_ngram_decontamination_matches_python(spark, texts):
    """Window-max decontamination vs a plain-Python reference: a train
    doc is flagged iff it shares a 2-gram with any eval doc, with the
    flagged-gram count matching exactly."""
    from pyspark.sql import Window

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def grams(t, k=2):
        toks = [x for x in t.split() if x]
        if not toks:
            return set()
        if len(toks) <= k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    eval_grams = set()
    for i, t in enumerate(texts):
        if i % 3 == 0:
            eval_grams |= grams(t)
    want = {}
    for i, t in enumerate(texts):
        if i % 3 != 0:
            n = len(grams(t) & eval_grams)
            if n:
                want[i] = n

    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n = F.size(toks)
    g2 = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
    )
    gdf = df.filter(n > 0).select(
        "doc_id", F.explode(F.array_distinct(g2)).alias("g")
    )
    is_eval = (F.col("doc_id") % 3 == 0).cast("int")
    has_eval = F.max(is_eval).over(Window.partitionBy("g"))
    got = {
        r["doc_id"]: r["n"]
        for r in gdf.withColumn("_ev", is_eval)
        .withColumn("_hit", has_eval)
        .filter((F.col("_hit") == 1) & (F.col("_ev") == 0))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.sampled_from("abcdef"), st.sampled_from("abcdef")).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=15,
    )
)
@_SETTINGS
def test_pagerank_ppm_matches_python(spark, edges):
    # symmetrize so every node has both in- and out-edges (operator
    # contract); integer ppm arithmetic must match Python EXACTLY
    from lrmr_spark.operators.graph import pagerank_ppm

    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    df = spark.createDataFrame(sorted(sym), "src string, dst string")
    got = {r["node"]: r["rank_ppm"] for r in pagerank_ppm(df, 3).collect()}

    nodes = sorted({a for a, _ in sym})
    deg = Counter(a for a, _ in sym)
    tp = 1_000_000 // len(nodes)
    rank = {v: tp for v in nodes}
    for _ in range(3):
        inc = {v: 0 for v in nodes}
        for a, b in sym:
            inc[b] += rank[a] // deg[a]
        rank = {v: (15 * tp + 85 * inc[v]) // 100 for v in nodes}
    assert got == rank


@given(cents=st.lists(st.integers(0, 10_000), min_size=1, max_size=12))
@_SETTINGS
def test_ewma_div_fold_matches_python(spark, cents):
    # the streaming/batch EWMA recurrence acc' = acc DIV 2 + x, folded
    # JVM-side over an array literal, must equal the Python loop
    arr = "array(" + ", ".join(f"CAST({c} AS BIGINT)" for c in cents) + ")"
    got = spark.range(1).select(
        F.expr(f"aggregate({arr}, CAST(0 AS BIGINT), (a, x) -> a DIV 2 + x)").alias("e")
    ).collect()[0]["e"]
    acc = 0
    for c in cents:
        acc = acc // 2 + c
    assert got == acc


@given(vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=30))
@_SETTINGS
def test_trimmed_mean_matches_python(spark, vals):
    from pyspark.sql import Window as W

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx long, cents long")
    w = W.orderBy("cents", "idx")
    w_n = W.partitionBy()
    got = (
        df.select(
            "cents",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
        .filter(
            (F.col("rn") > F.expr("n DIV 10"))
            & (F.col("rn") <= F.col("n") - F.expr("n DIV 10"))
        )
        .agg(F.expr("CAST(sum(cents) AS BIGINT) DIV count(1)").alias("m"))
        .collect()[0]["m"]
    )
    s = sorted(vals)
    k = len(s) // 10
    kept = s[k : len(s) - k]
    assert got == sum(kept) // len(kept)


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
    min_size=0,
    max_size=40,
)


@given(toks=_WORDS)
@_SETTINGS
def test_winnowing_postings_match_python_selection(spark, toks):
    # windowed-min selection vs a plain-python winnowing reference
    # (k=3, w=4, md5-prefix hashes; clamped single window when short)
    import hashlib

    from lrmr_spark.operators import text as TX

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        r["fp"] for r in TX.winnowing_postings(df, "doc_id", "text").collect()
    )

    k, w = 3, 4
    n = len(toks)
    grams = [
        " ".join(toks[i : i + k]) for i in range(max(n - k, 0) + 1)
    ]  # shingles() semantics: >= 1 gram always (empty doc -> one "" gram)
    hashes = [hashlib.md5(("w:" + g).encode()).hexdigest()[:8] for g in grams]
    n_win = max(len(hashes) - w + 1, 1)
    want = sorted({min(hashes[i : i + w]) for i in range(n_win)})
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=30), min_size=2, max_size=10
    ),
    k=st.integers(1, 5),
)
@_SETTINGS
def test_simhash_hamming_banding_lossless(spark, texts, k):
    # pigeonhole banding must find EVERY rep pair within Hamming k —
    # compare against the brute all-pairs scan over simhash16 strings
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in DD.simhash_hamming_pairs(df, "doc_id", "text", k=k).collect()
    }
    sigs = {}
    for r in df.select("doc_id", DD.simhash16("text").alias("sig")).collect():
        s = r["sig"]
        if s not in sigs or r["doc_id"] < sigs[s]:
            sigs[s] = r["doc_id"]
    reps = sorted((i, s) for s, i in sigs.items())
    want = set()
    for x in range(len(reps)):
        for y in range(x + 1, len(reps)):
            (ia, sa), (ib, sb) = reps[x], reps[y]
            d = sum(a != b for a, b in zip(sa, sb))
            if d <= k:
                want.add((ia, ib, d))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=15,
    )
)
@_SETTINGS
def test_random_walks_match_python_and_partitioning(spark, edges):
    # walks must equal the pure-Python LCG unroll EXACTLY (including
    # dead-end prefix truncation) and be partitioning-independent —
    # the property that separates deterministic walks from RNG ones
    from lrmr_spark.operators.graph import random_walks

    from test_operators import _walks_python

    dedup = sorted(set(edges))
    df = spark.createDataFrame(dedup, "src long, dst long")
    want = _walks_python(dedup, 4, 2)
    for frame in (df, df.repartition(7, "dst")):
        got = sorted(
            (r["start"], r["w"], r["n_steps"], tuple(r["path"]))
            for r in random_walks(frame, walk_len=4, walks_per_node=2).collect()
        )
        assert got == want


@given(
    wedges=st.lists(
        st.tuples(
            st.integers(0, 9), st.integers(0, 9), st.integers(1, 5)
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=15,
    )
)
@_SETTINGS
def test_weighted_walks_match_python_and_partitioning(spark, wedges):
    # the weighted pick (hash mod W into cumulative ranges) must equal
    # the Python unroll exactly — including parallel-edge weight
    # summing — and be partitioning-independent
    from lrmr_spark.operators.graph import weighted_random_walks

    from test_operators import _weighted_walks_python

    df = spark.createDataFrame(wedges, "src long, dst long, weight long")
    want = _weighted_walks_python(wedges, 4, 2)
    for frame in (df, df.repartition(7, "dst")):
        got = sorted(
            (r["start"], r["w"], r["n_steps"], tuple(r["path"]))
            for r in weighted_random_walks(
                frame, walk_len=4, walks_per_node=2
            ).collect()
        )
        assert got == want
