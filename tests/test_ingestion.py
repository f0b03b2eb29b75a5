"""Multi-file gzip-CSV ingestion e2e — the reference's flagship
dataset shape (19 gzip'd CSVs → DecodeCSV → GroupByKey → Count with
Files/Events metric goldens: /root/reference/test/group_by_test.go:29-34,
/root/reference/test/testdata/info.go:5-8). The reference's actual blob
is absent from the snapshot, so the fixture is generated locally with
the same structure: 19 .csv.gz files, a key column, exact per-key
counts and exact Files/Events metrics."""

import csv
import gzip

from pyspark.sql import functions as F

from lrmr_spark import sources as SRC
from lrmr_spark.pipeline import Pipeline

N_FILES = 19
ROWS_PER_FILE = 100


def _make_fixture(root):
    src = root / "gz"
    src.mkdir()
    expect: dict[str, int] = {}
    for i in range(N_FILES):
        with gzip.open(src / f"part-{i:02d}.csv.gz", "wt", newline="") as g:
            w = csv.writer(g)
            w.writerow(["appID", "value"])
            for r in range(ROWS_PER_FILE):
                k = f"app{(i + r) % 4}"
                w.writerow([k, r])
                expect[k] = expect.get(k, 0) + 1
    return str(src), expect


def test_gzip_csv_multifile_ingestion_metrics(spark, tmp_path):
    src, expect = _make_fixture(tmp_path)

    # FromLocalFile mirror: one row per file path
    paths = SRC.local_file_paths(spark, src)
    assert paths.count() == N_FILES

    # DecodeCSV mirror: fan the path list out to the native gzip-aware
    # CSV reader (splittable scan; .gz is decompressed per file)
    df = SRC.decode_csv_paths(paths, "appID string, value int", key_col="appID")
    # input_file_name() is nondeterministic and must be projected as a
    # real column before it can feed an observe() aggregate
    df = df.withColumn("_file", F.input_file_name())

    p = (
        Pipeline(df)
        .with_metric("Events")  # count(1): the reference's Events metric
        # observe() forbids exact DISTINCT aggregates, so Files rides an
        # HLL sketch; the default 5% rsd can miss by one even at 19
        # distinct paths (hash-dependent — the tmp dir name is part of
        # the hashed path, so some runs collide). rsd=0.005 keeps the
        # sketch in sparse mode, which is exact at this cardinality.
        .with_metric(
            "Files",
            F.approx_count_distinct(F.col("_file"), 0.005).alias("Files"),
        )
        .group_by_key("key")
        .reduce({"cnt": F.count(F.lit(1))})
    )
    res = p.run_and_collect()

    # the reference's metric golden shape: Files=19, Events=total rows
    assert res.metrics["Files"] == N_FILES
    assert res.metrics["Events"] == N_FILES * ROWS_PER_FILE
    assert {(r["key"], r["cnt"]) for r in res.rows} == set(expect.items())
