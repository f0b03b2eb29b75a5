"""Empty-input robustness: every operator family must return an empty
(or correct degenerate) result on empty/degenerate inputs rather than
raising — the failure mode that bites at 3 a.m. when one partition of
100 TB is empty."""

from pyspark.sql import functions as F

from lrmr_spark import Pipeline
from lrmr_spark.operators import asof as AS
from lrmr_spark.operators import dedup as DD
from lrmr_spark.operators import similarity as SIM
from lrmr_spark.operators import text as TX


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty(spark):
    e = _empty_docs(spark)
    assert DD.exact_dedup(e, "doc_id", "text").count() == 0
    assert DD.tokenset_dedup(e, "doc_id", "text").count() == 0
    assert DD.minhash_lsh_pairs(e, "doc_id", "text").count() == 0
    assert DD.simhash_clusters(e, "doc_id", "text").count() == 0
    assert DD.jaccard_pairs(e, "doc_id", "text").count() == 0


def test_text_ops_on_empty_and_blank(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    rows = df.select(
        TX.token_count("text").alias("n"),
        TX.fingerprint("text").alias("fp"),
        TX.language_id("text").alias("lang"),
    ).collect()
    assert [r["n"] for r in rows] == [0, 0]
    assert rows[0]["fp"] == rows[1]["fp"]  # both normalize to ""
    assert all(r["lang"] == "unknown" for r in rows)


def test_similarity_on_empty(spark):
    e = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert SIM.cosine_topk(e, [1.0] * 64, k=5).count() == 0
    assert SIM.cosine_dedup_pairs(e, "label").count() == 0


def test_asof_on_empty_right(spark):
    import datetime as dt

    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame([], "k string, ts timestamp, v double")
    out = AS.asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert len(out) == 1 and out[0]["r_v"] is None


def test_pipeline_on_empty(spark):
    p = (
        Pipeline(spark.createDataFrame([], "key string, v long"))
        .group_by_key("key")
        .reduce({"cnt": F.count(F.lit(1))})
    )
    res = p.run_and_collect()
    assert res.rows == []


def test_pagerank_on_empty_edges(spark):
    from lrmr_spark.operators.graph import pagerank_ppm

    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank_ppm(e, 2).count() == 0


def test_adjacency_loops_on_empty_and_selfloop(spark):
    """The r9 adjacency working set must keep the degenerate-input
    contracts of the loops it replaced: empty edge frames return
    empty tables, and a single self-loop node is its own fixed point
    (rank = full teleport mass, label = itself, comp = itself)."""
    from lrmr_spark.operators.dedup import connected_components
    from lrmr_spark.operators.graph import label_propagation, pagerank_ppm

    e = spark.createDataFrame([], "src long, dst long")
    assert label_propagation(e, 2).count() == 0
    p = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(p).count() == 0

    loop = spark.createDataFrame([(7, 7)], "src long, dst long")
    got = pagerank_ppm(loop, 2).collect()
    assert [(r["node"], r["rank_ppm"]) for r in got] == [(7, 1_000_000)]
    got = label_propagation(loop, 2).collect()
    assert [(r["node"], r["label"]) for r in got] == [(7, 7)]
    got = connected_components(
        spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    ).collect()
    assert [(r["id"], r["comp"]) for r in got] == [(7, 7)]


def test_ewma_fold_single_and_empty_history(spark):
    # the EWMA DIV fold is total on any non-empty window; single event
    # (window of itself) must return its own cents
    df = spark.createDataFrame([(1, 1, 250)], "user_id long, event_id long, cents long")
    got = df.select(
        F.expr(
            "aggregate(array(cents), CAST(0 AS BIGINT), (a, x) -> a DIV 2 + x)"
        ).alias("e")
    ).collect()
    assert got[0]["e"] == 250


def test_repetition_signals_on_blank_docs(spark, sf_dir):
    # blank text → zero tokens; the operator must survive (greatest
    # guards) rather than divide by zero. Run the same plan shape on a
    # tiny degenerate frame via the operator's building blocks.
    from lrmr_spark.operators import text as TX

    df = spark.createDataFrame([(1, ""), (2, "x")], "doc_id long, text string")
    rows = df.select(
        TX.token_count("text").alias("n"),
        F.size(TX.shingles("text", 2)).alias("g2"),
    ).collect()
    # shingles() clamps to at least one (possibly short) gram per doc
    assert [r["n"] for r in rows] == [0, 1]
    assert all(r["g2"] >= 1 for r in rows)


def test_pyds_feeder_degenerate_sizes(spark):
    from lrmr_spark.sources import pyds

    assert pyds.read_feeder(spark, n=0, parts=4).count() == 0
    assert pyds.read_feeder(spark, n=1, parts=8).count() == 1
    # filter that empties the pushed-down range entirely
    assert pyds.read_feeder(spark, n=100).filter("id > 1000").count() == 0
