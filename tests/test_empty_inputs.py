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
