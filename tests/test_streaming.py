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
