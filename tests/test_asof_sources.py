"""As-of/range join edge cases + source/sink roundtrips."""

import datetime as dt

from pyspark.sql import functions as F

from lrmr_spark.operators import asof as AS
from lrmr_spark import sources as SRC


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(1)), (3, "v", _ts(10))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 100.0), ("u", _ts(9), 200.0), ("w", _ts(1), 9.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r["id"]: r["r_v"]
        for r in AS.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"]
        ).collect()
    }
    assert out[1] == 200.0  # latest at-or-before 00:10 is 00:09
    assert out[2] is None  # left earlier than any right
    assert out[3] is None  # key with no rights


def test_asof_inclusive_boundary(spark):
    left = spark.createDataFrame([(1, "u", _ts(5))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(5), 7.0)], "k string, ts timestamp, v double")
    out = AS.asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert out[0]["r_v"] == 7.0  # equal timestamps match (backward-inclusive)


def test_range_join_window_boundaries(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "u", _ts(5)), (11, "u", _ts(9, 59)), (12, "u", _ts(15)), (13, "u", _ts(15, 1)),
         (14, "v", _ts(10))],
        "id long, k string, ts timestamp",
    )
    out = AS.range_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        lower_seconds=-300, upper_seconds=300,
    )
    ids = sorted(r["id_r"] for r in out.collect())
    # ±5 min window around 00:10 → 00:05 (inclusive), 00:09:59, 00:15
    # (inclusive); 00:15:01 out; other key out
    assert ids == [10, 11, 12]


def test_csv_roundtrip_flagship(spark, tmp_path):
    """The reference's true flagship shape: local CSV files → path
    listing → parse → group_by_key → count
    (/root/reference/test/group_by.go:9-14)."""
    for i, rows in enumerate([("a", 3), ("b", 2)]):
        key, n = rows
        p = tmp_path / f"part{i}.csv"
        p.write_text("appID,country\n" + "\n".join(f"{key},kr" for _ in range(n)))
    paths = SRC.local_file_paths(spark, str(tmp_path))
    assert paths.count() == 2
    df = SRC.decode_csv_paths(paths, "appID string, country string", key_col="appID")
    got = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == {("a", 3), ("b", 2)}


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(100)], "id long, part string"
    )
    out = str(tmp_path / "t")
    SRC.write_parquet(df, out, partition_by=["part"])
    back = SRC.read_parquet(spark, out).filter(F.col("part") == "x")
    assert back.count() == 50
    # partition pruning: only the part=x directory is scanned
    plan = back._sc._jvm.PythonSQLUtils.explainString(back._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "part#" in plan


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "j")
    df.write.mode("overwrite").json(out)
    back = SRC.read_json(spark, out, schema="id long, s string")
    assert {(r["id"], r["s"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], "id long, v double")
    out = str(tmp_path / "o")
    df.write.mode("overwrite").orc(out)
    assert SRC.read_orc(spark, out).collect()[0]["v"] == 2.5


def test_text_reader_lines_and_wholetext(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line1\nline2\n")
    (tmp_path / "b.txt").write_text("solo\n")
    lines = SRC.read_text(spark, str(tmp_path))
    assert sorted(r["value"] for r in lines.collect()) == ["line1", "line2", "solo"]
    whole = SRC.read_text(spark, str(tmp_path), wholetext=True)
    assert whole.count() == 2  # one row per file
    assert any("line1\nline2" in r["value"] for r in whole.collect())


def test_binary_files_reader_metadata_and_glob(spark, tmp_path):
    (tmp_path / "img0.fake").write_bytes(b"\x89IMG" + bytes(range(16)))
    (tmp_path / "img1.fake").write_bytes(b"\x89IMG" + bytes(range(8)))
    (tmp_path / "notes.txt").write_bytes(b"skip me")
    df = SRC.read_binary_files(spark, str(tmp_path), glob="*.fake")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"img0.fake", "img1.fake"}
    assert rows["img0.fake"]["length"] == 20
    assert bytes(rows["img0.fake"]["content"])[:4] == b"\x89IMG"
    # metadata-only predicates prune on the listing, before content io
    assert df.filter(F.col("length") > 15).count() == 1


def test_compact_parquet_reduces_files(spark, tmp_path):
    out = str(tmp_path / "frag")
    # fragment: 40 tiny files
    spark.createDataFrame([(i,) for i in range(400)], "id long").repartition(
        40
    ).write.parquet(out)
    import os

    n_before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_before >= 30
    n_after = SRC.compact_parquet(spark, out, 4, sort_within=["id"])
    assert n_after == 4
    # data survives byte-for-byte
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(400))


def test_corpus_shuffle_layout(spark, tmp_path, sf_dir):
    # the physical layout behind corpus_shuffle_shards: partition by
    # hash shard, sort by content-hash key within each shard — a
    # deterministic global training order with no global sort
    from lrmr_spark.tables import load

    d = load(spark, sf_dir, "documents")
    sortkey = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    shard = F.conv(F.substring(sortkey, 1, 4), 16, 10).cast("int") % 16
    out = str(tmp_path / "shuffled")
    (
        d.select("doc_id", sortkey.alias("sortkey"), shard.alias("shard"))
        .repartition("shard")
        # sort by (shard, sortkey): the partitioned writer requires its
        # partition columns sorted and would otherwise INSERT its own
        # sort on shard alone, destroying the sortkey order — a
        # prefix-satisfied ordering passes through untouched
        .sortWithinPartitions("shard", "sortkey")
        .write.partitionBy("shard")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    # partition pruning: reading one shard touches one directory
    one = back.filter(F.col("shard") == 3)
    from lrmr_spark.plans import physical_plan
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", physical_plan(one))
    assert m and "shard" in m.group(1)
    # within a shard file, rows are sorted by the shuffle key
    import pyarrow.parquet as pq
    import os, glob

    files = glob.glob(os.path.join(out, "shard=3", "*.parquet"))
    assert files
    keys = pq.read_table(files[0], columns=["sortkey"])["sortkey"].to_pylist()
    assert keys == sorted(keys)


def test_python_datasource_feeder_partitions_and_pushdown(spark):
    from lrmr_spark.sources import pyds

    df = pyds.read_feeder(spark, n=10000, parts=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 10000
    # source-side range pruning: handled id predicates narrow [lo, hi)
    assert df.filter("id >= 9000 AND id < 9100").count() == 100
    assert df.filter("id = 4242").count() == 1
    assert df.filter("id < 0").count() == 0
    # unhandled predicates still evaluate correctly post-scan
    assert df.filter("key = 'a'").count() == 2000
    # deterministic formula: same rows on re-read
    row = df.filter("id = 123").collect()[0]
    assert row["key"] == chr(97 + 123 % 5)
    assert row["value"] == (123 * 2654435761) % 1000


def test_python_datasource_writer_commit_protocol(spark, tmp_path):
    from lrmr_spark.sources import pyds

    out = str(tmp_path / "sink")
    df = pyds.read_feeder(spark, n=1000, parts=4)
    df.write.format(pyds.FORMAT_NAME).mode("append").save(out)

    manifest = pyds.read_manifest(out)
    assert manifest["rows"] == 1000
    assert len(manifest["files"]) == 4
    # the manifest lists exactly the published files; reading through
    # it reproduces the dataset
    back = spark.read.json([f"{out}/{f}" for f in manifest["files"]])
    assert back.count() == 1000
    assert back.selectExpr("sum(value) v").collect()[0]["v"] == (
        df.selectExpr("sum(value) v").collect()[0]["v"]
    )


def test_python_datasource_writer_time_travel(spark, tmp_path):
    from lrmr_spark.sources import pyds

    out = str(tmp_path / "sink_tt")
    # v1: overwrite lineage root
    pyds.read_feeder(spark, n=1000, parts=4).write.format(pyds.FORMAT_NAME).mode(
        "overwrite"
    ).save(out)
    # v2: append extends the v1 snapshot
    pyds.read_feeder(spark, n=500, parts=2).write.format(pyds.FORMAT_NAME).mode(
        "append"
    ).save(out)
    assert pyds.list_versions(out) == [1, 2]
    m1, m2 = pyds.read_manifest(out, 1), pyds.read_manifest(out, 2)
    assert (m1["rows"], m2["rows"]) == (1000, 1500)
    assert m2["parent"] == 1 and m1["parent"] is None
    # latest pointer == newest snapshot
    assert pyds.read_manifest(out) == m2
    # time-travel reads resolve exactly each snapshot's file set
    assert pyds.read_versioned(spark, out, 1).count() == 1000
    assert pyds.read_versioned(spark, out).count() == 1500
    # v3: overwrite starts a new lineage; old snapshots stay readable
    pyds.read_feeder(spark, n=200, parts=1).write.format(pyds.FORMAT_NAME).mode(
        "overwrite"
    ).save(out)
    assert pyds.list_versions(out) == [1, 2, 3]
    m3 = pyds.read_manifest(out, 3)
    assert m3["rows"] == 200 and m3["parent"] is None
    assert pyds.read_versioned(spark, out, 2).count() == 1500


def test_write_parquet_max_records_per_file(spark, tmp_path):
    import glob

    from lrmr_spark.sources import write_parquet

    out = str(tmp_path / "sized")
    df = spark.range(10_000).coalesce(1)
    write_parquet(df, out, max_records_per_file=1_000)
    files = glob.glob(f"{out}/*.parquet")
    # one writing task, but the cap splits output into ≥10 scan units
    assert len(files) >= 10
    assert spark.read.parquet(out).count() == 10_000
