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
