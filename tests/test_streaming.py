"""Structured Streaming tests: bounded file source driven to completion
through a memory sink; streaming results cross-checked against the
equivalent batch computation."""

import pytest
from pyspark.sql import functions as F

from lrmr_spark import streaming as ST
from lrmr_spark.tables import load


@pytest.fixture()
def events_stream(spark, sf_dir):
    return ST.stream_events(spark, sf_dir)


def test_tumbling_counts_match_batch(spark, sf_dir, events_stream):
    got = ST.run_to_memory(
        ST.tumbling_counts(events_stream), "t_tumbling", output_mode="append"
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "event_type", "cnt")
    )
    got_set = {(r["w_start"], r["event_type"], r["cnt"]) for r in got.collect()}
    batch_set = {(r["w_start"], r["event_type"], r["cnt"]) for r in batch.collect()}
    # append mode emits only watermark-closed windows: subset of batch,
    # and every emitted window must agree exactly
    assert got_set <= batch_set
    assert len(got_set) > 0


def test_session_window_runs(events_stream):
    got = ST.run_to_memory(ST.session_counts(events_stream), "t_sessions")
    rows = got.collect()
    assert all(r["sess_start"] <= r["sess_end"] for r in rows)


def test_foreach_batch_parquet_sink(spark, tmp_path, events_stream):
    # the exactly-once sink pattern: idempotent per-epoch writes
    out = str(tmp_path / "sink")

    def write_epoch(df, epoch_id):
        df.write.mode("append").parquet(out)

    agg = ST.tumbling_counts(events_stream)
    q = agg.writeStream.outputMode("append").foreachBatch(write_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() > 0


def test_stateful_seen_filter_dedups(spark, sf_dir, events_stream):
    got = ST.run_to_memory(ST.stateful_seen_filter(events_stream), "t_seen")
    n_events = load(spark, sf_dir, "events").count()
    out = got.collect()
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids))  # no duplicates emitted
    assert len(ids) == n_events  # event_ids are unique in the source


def test_stateful_seen_filter_state_ttl_eviction(spark, tmp_path):
    # four micro-batches (one file each, mtime-ordered). Timeouts fire
    # only for groups with NO data in a batch, so eviction needs its own
    # batch between the watermark advance and the duplicate:
    #   f1: users 1,2 see events at t0 (state created, TTL = +1h)
    #   f2: user 9 far in the future — advances watermark past t0 + TTL
    #   f3: user 8 only — user 1 has no data, its timeout fires, state
    #       evicted
    #   f4: DUPLICATE (user 1, event 100) — re-emits: seen-set was
    #       dropped
    import os
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next(
            p for p in os.listdir(str(tmp_path / name)) if p.endswith(".parquet")
        )
        dst = os.path.join(src, name + ".parquet")
        os.rename(os.path.join(str(tmp_path / name), part), dst)
        os.utime(dst, (mtime, mtime))

    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, 0, 0, tzinfo=timezone.utc)
    t_far = datetime(2024, 3, 1, 0, 0, tzinfo=timezone.utc)  # >> t0 + 1h TTL
    # the duplicate must carry ts STRICTLY ABOVE the watermark (== t_far
    # after f2/f3) or the stateful operator drops it as late data
    t_dup = datetime(2024, 3, 2, 0, 0, tzinfo=timezone.utc)
    now = time.time()
    write_file("f1", [(1, 100, t0), (2, 200, t0)], now - 400)
    write_file("f2", [(9, 900, t_far)], now - 300)
    write_file("f3", [(8, 800, t_far)], now - 200)
    write_file("f4", [(1, 100, t_dup)], now - 100)

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = ST.run_to_memory(
        ST.stateful_seen_filter(stream, watermark="0 seconds", ttl_ms=3_600_000),
        "t_seen_ttl",
    )
    rows = sorted(
        ((r["user_id"], r["event_id"], r["ts"]) for r in got.collect()),
    )
    # event 100 emitted TWICE (state evicted at f3, dup re-emitted at
    # f4); every other event exactly once
    emitted_100 = [r for r in rows if r[1] == 100]
    assert len(emitted_100) == 2, rows
    assert len(rows) == 5, rows


def test_stateful_ewma_matches_batch_fold(spark, sf_dir, events_stream):
    got = ST.run_to_memory(ST.stateful_ewma(events_stream), "t_ewma")
    # batch twin: fold acc' = acc DIV 2 + cents over each user's full
    # ordered history (JVM aggregate over a windowed collect_list)
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    batch = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("hist", F.collect_list("cents").over(w))
        .select(
            "user_id",
            "event_id",
            F.expr(
                "aggregate(hist, CAST(0 AS BIGINT), (a, x) -> a DIV 2 + x)"
            ).alias("ewma_cents"),
        )
    )
    got_set = {tuple(r) for r in got.collect()}
    batch_set = {tuple(r) for r in batch.collect()}
    assert got_set == batch_set
    assert len(got_set) > 0


def test_static_enrich_matches_batch(spark, sf_dir, events_stream):
    got = ST.run_to_memory(
        ST.static_enrich_counts(events_stream, load(spark, sf_dir, "customer")),
        "t_enrich",
        output_mode="append",
    )
    seg = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    batch = (
        load(spark, sf_dir, "events")
        .join(seg, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "segment", "cnt", "total_value")
    )
    got_set = {tuple(r) for r in got.collect()}
    batch_set = {tuple(r) for r in batch.collect()}
    # append mode emits only watermark-closed windows: subset of batch,
    # every emitted window exact
    assert got_set <= batch_set
    assert len(got_set) > 0


def test_interval_join_matches_batch(spark, sf_dir):
    got = ST.run_to_memory(
        ST.view_click_interval_join(
            ST.stream_events(spark, sf_dir), ST.stream_events(spark, sf_dir)
        ),
        "t_ssjoin",
    )
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    batch = (
        views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            (F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")).alias("delta_s"),
        )
    )
    got_set = {tuple(r) for r in got.collect()}
    batch_set = {tuple(r) for r in batch.collect()}
    # the bounded source arrives in one micro-batch, so the inner
    # interval join must emit exactly the batch result
    assert got_set == batch_set
    assert len(got_set) > 0


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Fault tolerance: a file-source → parquet-sink query with a
    checkpointLocation, stopped and RESTARTED with new input — the
    restarted query resumes from committed offsets, so every input row
    lands in the sink exactly once (no reprocessing of file 1, no loss
    of file 2)."""
    import os

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_file(name, ids):
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        os.rename(os.path.join(stage, part), os.path.join(src, name + ".parquet"))

    def run_once():
        q = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_file("f1", [1, 2, 3])
    run_once()
    write_file("f2", [4, 5])
    run_once()  # restart from the SAME checkpoint

    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]  # each row exactly once across restarts


def test_dropdup_watermark_matches_batch(spark, sf_dir, events_stream):
    got = ST.run_to_memory(
        ST.dedup_within_watermark(events_stream), "t_dropdup"
    )
    batch = (
        load(spark, sf_dir, "events")
        .dropDuplicates(["user_id", "event_id"])
        .count()
    )
    # single-file bounded source: every key is seen inside its watermark
    # window, so the streaming dedup must equal batch dropDuplicates
    assert got.count() == batch
    # and the output must itself be duplicate-free on the dedup key
    assert (
        got.groupBy("user_id", "event_id").count().filter("count > 1").count()
        == 0
    )


def test_python_datasource_stream_feeder(spark):
    from lrmr_spark.sources import pyds

    got = ST.run_to_memory(
        pyds.read_feeder_stream(spark, n=3000, batch=1000), "t_pyds_stream"
    )
    assert got.count() == 3000
    # micro-batch replay is deterministic: same formula rows as batch
    assert (
        got.selectExpr("sum(value) v").collect()[0]["v"]
        == pyds.read_feeder(spark, n=3000).selectExpr("sum(value) v").collect()[0]["v"]
    )


def test_mincount_sketch_matches_batch(spark, sf_dir, events_stream):
    got = ST.run_to_memory(
        ST.mincount_sketch_state(events_stream), "t_mincount"
    )
    batch = (
        load(spark, sf_dir, "events")
        .select(
            F.window("ts", "1 hour").start.alias("w_start"),
            "event_type",
            F.expr(
                "conv(substring(md5(concat('kmv:', cast(user_id as string))), 1, 8)"
                ", 16, 10)"
            ).cast("bigint").alias("h"),
        )
        .groupBy("w_start", "event_type", F.expr("h % 16").alias("bucket"))
        .agg(F.expr("min(h DIV 16)").alias("mn"))
    )
    got_set = {tuple(r) for r in got.collect()}
    batch_set = {tuple(r) for r in batch.collect()}
    # append mode emits only watermark-closed windows — subset, exact
    assert got_set <= batch_set
    assert len(got_set) > 0


def test_available_now_matches_continuous(spark, sf_dir, events_stream):
    # Trigger.AvailableNow is the backfill run mode: drain the source in
    # rate-limited micro-batches, then terminate on its own. On the same
    # bounded source it must emit exactly the rows the continuous
    # (processAllAvailable) run does.
    backfill = ST.run_available_now(
        ST.tumbling_counts(events_stream), "t_backfill", output_mode="append"
    )
    continuous = ST.run_to_memory(
        ST.tumbling_counts(ST.stream_events(spark, sf_dir)),
        "t_continuous",
        output_mode="append",
    )
    got = {tuple(r) for r in backfill.collect()}
    want = {tuple(r) for r in continuous.collect()}
    assert got == want
    assert len(got) > 0


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    # The operational core of incremental pipelines at scale: a stopped
    # query restarted with the SAME checkpointLocation resumes from its
    # committed source offsets — already-processed files are never
    # re-emitted, new files are picked up exactly once.
    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.mode(
        "append"
    ).parquet(src)

    def drain():
        q = (
            spark.readStream.schema("id bigint, v bigint")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    drain()
    first = spark.read.parquet(sink).count()
    assert first == 100

    # second batch of source files; restart from the same checkpoint
    spark.range(1000, 1050).selectExpr("id", "id * 2 AS v").write.mode(
        "append"
    ).parquet(src)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 150  # no re-processing of batch 1
    assert out.where("id >= 1000").count() == 50


def test_left_outer_interval_join(spark, sf_dir):
    inner = ST.run_to_memory(
        ST.view_click_interval_join(
            ST.stream_events(spark, sf_dir), ST.stream_events(spark, sf_dir)
        ),
        "t_ij_inner",
    ).collect()
    outer = ST.run_to_memory(
        ST.view_click_left_outer_join(
            ST.stream_events(spark, sf_dir), ST.stream_events(spark, sf_dir)
        ),
        "t_ij_outer",
    ).collect()
    inner_set = {(r["view_id"], r["click_id"]) for r in inner}
    matched = {(r["view_id"], r["click_id"]) for r in outer if r["click_id"] is not None}
    nulls = [r for r in outer if r["click_id"] is None]
    # every inner match appears identically in the outer result...
    assert matched == inner_set
    # ...plus null-extended rows for views the watermark proved unmatched
    assert len(nulls) > 0
    assert all(r["delta_s"] is None for r in nulls)
    # a view emits either matched rows or one null row, never both
    matched_views = {v for v, _ in matched}
    assert all(r["view_id"] not in matched_views for r in nulls)


def test_minhash_index_match_stream_equals_batch(spark, sf_dir, tmp_path):
    # the foreachBatch streaming matcher must emit exactly the batch
    # matcher's pairs (the stream is bounded: one file micro-batch)
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.operators import dedup as DD
    from lrmr_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    index = str(tmp_path / "idx")
    DD.write_minhash_index(
        docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", index,
        num_hashes=16, bands=4,
    )
    got = {
        (r["new_id"], r["base_id"], r["jaccard"])
        for r in ST.run_minhash_index_match_stream(
            ST.stream_documents(spark, sf_dir).filter(F.col("doc_id") % 5 == 0),
            index,
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        ).collect()
    }
    want = {
        (r["new_id"], r["base_id"], r["jaccard"])
        for r in DD.match_minhash_index(
            docs.filter(F.col("doc_id") % 5 == 0), index, "doc_id", "text"
        ).collect()
    }
    assert got == want and want


def test_minhash_index_match_stream_zero_matches_is_empty_df(
    spark, sf_dir, tmp_path
):
    # a stream whose micro-batches all produce ZERO matches writes no
    # parquet files; the read-back must return an empty DF with the
    # (new_id, base_id, jaccard) schema, not raise unable-to-infer
    # (r5 advice fix)
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.operators import dedup as DD
    from lrmr_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    index = str(tmp_path / "idx0")
    DD.write_minhash_index(
        docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", index,
        num_hashes=16, bands=4,
    )
    out = ST.run_minhash_index_match_stream(
        ST.stream_documents(spark, sf_dir).filter(F.col("doc_id") < 0),
        index,
        str(tmp_path / "out0"),
        str(tmp_path / "ck0"),
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["new_id", "base_id", "jaccard"]


def test_pq_index_append_stream_equals_batch_rebuild(spark, sf_dir, tmp_path):
    # the foreachBatch append stream must leave the codes table exactly
    # equal to a one-shot build over the full corpus (codes are
    # deterministic in (vector, codebook); anti-join absorbs the base
    # rows the stream re-delivers)
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.operators import similarity as SIM
    from lrmr_spark.tables import load

    cents = [[float((i * 13 + j) % 7) for j in range(64)] for i in range(4)]
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    SIM.write_pq_codes(
        emb.filter(F.col("vec_id") % 5 != 0), path, cents, num_sub=8
    )
    got = sorted(
        tuple(r)
        for r in ST.run_pq_index_append_stream(
            ST.stream_embeddings(spark, sf_dir), path, str(tmp_path / "ck"), cents
        ).collect()
    )
    rebuilt = str(tmp_path / "reb")
    SIM.write_pq_codes(emb, rebuilt, cents, num_sub=8)
    want = sorted(
        tuple(r) for r in spark.read.parquet(f"{rebuilt}/codes").collect()
    )
    assert got == want and len(want) == emb.count()


def test_quality_score_stream_equals_batch(spark, sf_dir, tmp_path):
    # frozen-weight scoring is a stateless integer projection, so the
    # streamed rows must equal the batch projection exactly
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.catalog.corpus_ops import _QC_TEACHER
    from lrmr_spark.operators import text as TX
    from lrmr_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    w = TX.train_hashed_ngram_weights(docs, "text", _QC_TEACHER, iterations=2)
    got = {
        (r["doc_id"], r["score"], r["keep"])
        for r in ST.run_quality_score_stream(
            ST.stream_documents(spark, sf_dir),
            w,
            str(tmp_path / "qout"),
            str(tmp_path / "qck"),
        ).collect()
    }
    want = {
        (r["doc_id"], r["score"], r["keep"])
        for r in docs.select(
            "doc_id",
            TX.hashed_ngram_score("text", w).alias("score"),
        )
        .withColumn("keep", F.col("score") > 0)
        .collect()
    }
    assert got == want and want


def test_winnowing_index_match_stream_equals_batch(spark, sf_dir, tmp_path):
    # the MOSS-style foreachBatch matcher must emit exactly the batch
    # matcher's (new_id, base_id, n_shared) rows — and the zero-match
    # stream must return the empty typed DF, not raise
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.operators import text as TX
    from lrmr_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    index = str(tmp_path / "widx")
    TX.write_winnowing_index(
        docs.filter(F.col("doc_id") % 2 == 0), index, "doc_id", "text"
    )
    got = {
        (r["new_id"], r["base_id"], r["n_shared"])
        for r in ST.run_winnowing_index_match_stream(
            ST.stream_documents(spark, sf_dir).filter(F.col("doc_id") % 2 == 1),
            index,
            str(tmp_path / "wout"),
            str(tmp_path / "wck"),
            min_shared=2,
        ).collect()
    }
    want = {
        (r["new_id"], r["base_id"], r["n_shared"])
        for r in TX.match_winnowing_index(
            docs.filter(F.col("doc_id") % 2 == 1), index, "doc_id", "text",
            min_shared=2,
        ).collect()
    }
    assert got == want and want
    empty = ST.run_winnowing_index_match_stream(
        ST.stream_documents(spark, sf_dir).filter(F.col("doc_id") < 0),
        index,
        str(tmp_path / "wout0"),
        str(tmp_path / "wck0"),
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "new_id", "base_id", "n_shared",
    ]


def test_phash_index_match_stream_equals_batch(spark, sf_dir, tmp_path):
    # the media-dedup foreachBatch matcher must emit exactly the batch
    # matcher's (new_id, base_id, hamming) rows — and the zero-match
    # stream must return the empty typed DF, not raise
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.operators import multimodal as MM
    from lrmr_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    index = str(tmp_path / "pidx")
    MM.write_phash_index(
        MM.attach_binary_payload(
            docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text"
        ),
        index,
    )
    got = {
        (r["new_id"], r["base_id"], r["hamming"])
        for r in ST.run_phash_index_match_stream(
            ST.stream_documents(spark, sf_dir).filter(F.col("doc_id") % 5 == 0),
            index,
            str(tmp_path / "pout"),
            str(tmp_path / "pck"),
        ).collect()
    }
    want = {
        (r["new_id"], r["base_id"], r["hamming"])
        for r in MM.match_phash_index(
            MM.attach_binary_payload(
                docs.filter(F.col("doc_id") % 5 == 0), "doc_id", "text"
            ),
            index,
            k=1,
        ).collect()
    }
    assert got == want and want
    empty = ST.run_phash_index_match_stream(
        ST.stream_documents(spark, sf_dir).filter(F.col("doc_id") < 0),
        index,
        str(tmp_path / "pout0"),
        str(tmp_path / "pck0"),
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "new_id", "base_id", "hamming",
    ]


def _py_line_dedup_stream(batches, width, min_df):
    """Plain-python model of the prefix-causal streaming clean: each
    batch is judged against accumulated PRIOR counts + within-batch
    counts, then its counts fold into the index."""
    from collections import Counter

    index = Counter()
    cleaned = {}
    for batch in batches:
        segs = {}
        for d, t in batch.items():
            ts = t.split()
            segs[d] = [
                " ".join(ts[i : i + width]) for i in range(0, len(ts), width)
            ]
        bcount = Counter(s for ss in segs.values() for s in ss)
        for d, ss in segs.items():
            if not ss:
                continue
            kept = [s for s in ss if index[s] + bcount[s] < min_df]
            cleaned[d] = (len(ss), len(ss) - len(kept), " ".join(kept))
        index.update(bcount)
    return cleaned, index


def test_line_dedup_stream_is_prefix_causal_and_index_converges(
    spark, tmp_path
):
    from collections import Counter

    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.operators import text as TX

    header = "h1 h2 h3"  # 3-token boilerplate at width=3
    b1 = {1: header + " a1 a2 a3", 2: "c1 c2 c3 c4 c5 c6"}
    b2 = {3: header + " b1 b2 b3", 4: header + " d1 d2 d3"}
    # write each batch as its own parquet file: one file = one
    # micro-batch under maxFilesPerTrigger=1
    src = tmp_path / "src"
    src.mkdir()
    for i, b in enumerate((b1, b2)):
        spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in b.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(str(src / f"batch{i}"))
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    index = str(tmp_path / "idx")
    got = {
        r["doc_id"]: (r["n_segs"], r["n_dropped"], r["text_out"])
        for r in ST.run_line_dedup_stream(
            stream, index, str(tmp_path / "out"), str(tmp_path / "ck"),
            width=3, min_df=2,
        ).collect()
    }
    # micro-batch order follows file order; accept either order by
    # matching whichever python-model ordering reproduces the output
    want_a, idx_a = _py_line_dedup_stream([b1, b2], 3, 2)
    want_b, idx_b = _py_line_dedup_stream([b2, b1], 3, 2)
    assert got in (want_a, want_b)
    # prefix-causality, stated concretely per observed batch order:
    if got == want_a:
        # b1 first: doc 1's header copy SURVIVES (nothing prior knows
        # it); b2's two copies both drop (intra-batch pair + stored)
        assert got[1] == (2, 0, b1[1])
        assert got[3][1] == 1 and got[4][1] == 1
        assert header not in got[3][2] and header not in got[4][2]
    else:
        # b2 first: its two header copies drop against each other;
        # b1's doc 1 then drops against the stored counts
        assert got[3][1] == 1 and got[4][1] == 1
        assert got[1][1] == 1 and header not in got[1][2]
    # index convergence: summed epoch counts == one-shot corpus counts
    stored = (
        spark.read.parquet(f"{index}/counts")
        .groupBy("h")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    all_docs = {**b1, **b2}
    one_shot = Counter()
    for d, t in all_docs.items():
        ts = t.split()
        one_shot.update(
            " ".join(ts[i : i + 3]) for i in range(0, len(ts), 3)
        )
    # map python segments through the same md5-16 key
    import hashlib

    want_counts = {
        hashlib.md5(f"ld:{s}".encode()).hexdigest()[:16]: c
        for s, c in one_shot.items()
    }
    assert {r["h"]: r["df"] for r in stored} == want_counts


def test_sliding_counts_match_batch(spark, sf_dir, events_stream):
    got = ST.run_to_memory(
        ST.sliding_counts(events_stream), "t_sliding", output_mode="append"
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "cnt")
    )
    got_set = {(r["w_start"], r["cnt"]) for r in got.collect()}
    batch_set = {(r["w_start"], r["cnt"]) for r in batch.collect()}
    # append mode emits only watermark-closed windows: subset of batch,
    # and every emitted (overlapping) window must agree exactly
    assert got_set <= batch_set
    assert len(got_set) > 0


# ------------------------- RunInBackground over a streaming query (r8)
def test_streaming_job_handle_lifecycle(spark, tmp_path):
    """SURVEY §7.4.4: a Structured Streaming query attached to a
    JobHandle — status/metrics/wait by job id, cross-process view via
    the same checkpoint file (the reference's detached continuous job,
    /root/reference/running_job.go:33-77)."""
    from lrmr_spark import job as J

    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.parquet(src)
    writer = (
        spark.readStream.schema("id bigint, v bigint")
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    h = J.start_background_stream("sbg-life", writer)
    assert J.get_job("sbg-life") is h
    h.wait(120)
    assert h.status == "succeeded" and h.error is None
    m = h.metrics()
    assert m["input_rows_total"] == 100 and m["n_batches"] >= 1
    # cross-process attach: the checkpoint-file view sees final state
    view = J.DetachedJobView("sbg-life")
    assert view.status == "succeeded"
    assert view.metrics()["input_rows_total"] == 100
    assert spark.read.parquet(sink).count() == 100


def test_streaming_job_abort_then_checkpoint_resume(spark, tmp_path):
    """abort() on a live stream is the cooperative cancel (stop lets
    the in-flight micro-batch commit); a restart from the SAME
    checkpointLocation resumes exactly-once — no lost, no duplicated
    rows across the abort."""
    import time as _t

    from lrmr_spark import job as J

    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    # 50 single-row files, one per micro-batch, so the stream is
    # long-lived enough to abort mid-run
    spark.range(0, 50).repartition(50).write.parquet(src)

    def writer():
        return (
            spark.readStream.schema("id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        )

    h = J.start_background_stream("sbg-abort", writer().trigger(availableNow=True))
    deadline = _t.time() + 120
    while _t.time() < deadline and h.metrics().get("n_batches", 0) < 2:
        if h.status != "running":
            break  # drained faster than we could abort — still valid
        _t.sleep(0.05)
    h.abort()
    h.wait(60)
    assert h.status in ("aborted", "succeeded")
    # resume from the same checkpoint: committed batches are never
    # re-emitted, the remainder lands exactly once
    h2 = J.start_background_stream("sbg-resume", writer().trigger(availableNow=True))
    h2.wait(180)
    assert h2.status == "succeeded"
    out = spark.read.parquet(sink)
    assert out.count() == 50
    assert out.select("id").distinct().count() == 50


def test_streaming_job_failure_surfaces(spark, tmp_path):
    from lrmr_spark import job as J

    src = str(tmp_path / "in")
    spark.range(0, 5).write.parquet(src)

    def _boom(batch_df, epoch_id):
        raise RuntimeError("planted streaming failure")

    writer = (
        spark.readStream.schema("id bigint")
        .parquet(src)
        .writeStream.foreachBatch(_boom)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
    )
    h = J.start_background_stream("sbg-fail", writer)
    h.wait(120)
    assert h.status == "failed"
    assert h.error is not None


def test_quality_score_stream_from_stored_model(spark, sf_dir, tmp_path):
    # the registry wiring: a serving stream started against the stored
    # model dir must score exactly like batch serving from the same
    # artifact — and refuse to start on a geometry-drifted model
    from pyspark.sql import functions as F

    from lrmr_spark import streaming as ST
    from lrmr_spark.catalog.corpus_ops import _QC_TEACHER
    from lrmr_spark.operators import text as TX
    from lrmr_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    model = str(tmp_path / "model")
    TX.write_quality_model(docs, model, "text", _QC_TEACHER, iterations=2)
    got = {
        (r["doc_id"], r["score"], r["keep"])
        for r in ST.run_quality_score_stream_from_model(
            ST.stream_documents(spark, sf_dir),
            model,
            str(tmp_path / "qmout"),
            str(tmp_path / "qmck"),
        ).collect()
    }
    want = {
        (r["doc_id"], r["score"], r["keep"])
        for r in TX.score_with_quality_model(docs, model).collect()
    }
    assert got == want and got
    # drift guard applies at stream START, before any micro-batch runs
    spark.range(1).select(
        F.lit(len(_QC_TEACHER)).cast("int").alias("n_buckets"),
        F.lit(2).cast("int").alias("iterations"),
        F.lit("uni-only").alias("feature"),
        F.lit("md5-q-6").alias("hash"),
        F.lit("deadbeef").alias("teacher_fp"),
    ).coalesce(1).write.mode("overwrite").json(f"{model}/_meta")
    with pytest.raises(ValueError, match="drift"):
        ST.run_quality_score_stream_from_model(
            ST.stream_documents(spark, sf_dir),
            model,
            str(tmp_path / "qmout2"),
            str(tmp_path / "qmck2"),
        )
