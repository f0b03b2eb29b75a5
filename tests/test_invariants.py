"""Cross-operator invariants on the real testdata: identities that must
hold regardless of data (balance equations, sketch-vs-exact bounds,
monotonicity) — a second correctness net independent of the DuckDB
oracle."""

from pyspark.sql import functions as F

from lrmr_spark.catalog import queries
from lrmr_spark.tables import load


def test_growth_accounting_balances(spark, sf_dir):
    rows = queries()["events_growth_accounting"](spark, sf_dir).collect()
    assert rows, "no activity days"
    for r in rows:
        # the decomposition must partition the actives exactly
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"], r
    # every user is new exactly once: sum of news == total distinct users
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_new"] for r in rows) == n_users


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    got = {
        (r["day"], r["daily_users"])
        for r in queries()["events_bitmap_distinct_rollup"](spark, sf_dir).collect()
    }
    exact = {
        (r["day"], r["n"])
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact  # bitmaps are EXACT distinct, not estimates


def test_bitmap_weekly_bounds_daily(spark, sf_dir):
    for r in queries()["events_bitmap_distinct_rollup"](spark, sf_dir).collect():
        assert r["daily_users"] <= r["weekly_users"]


def test_interval_union_bounds(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in queries()["events_active_time_union"](spark, sf_dir).collect():
        n = per_user[r["user_id"]]
        # merged intervals: between 1 and n; covered time between one
        # interval (full overlap) and n disjoint 5-minute intervals
        assert 1 <= r["n_intervals"] <= n
        assert 300 <= r["active_seconds"] <= 300 * n


def test_mincount_sketch_is_mergeable_and_bounded(spark, sf_dir):
    rows = queries()["sketch_distinct_mincount"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_distinct"] >= 1
        # 16-bucket MinCount at these cardinalities: sanity band only
        # (exactness is the oracle's job; this pins gross regressions)
        assert r["est_distinct"] <= 50 * max(r["n_exact"], 1)


def test_lttb_one_point_per_interior_bucket(spark, sf_dir):
    rows = queries()["events_lttb_downsample"](spark, sf_dir).collect()
    by_series: dict[str, dict[int, int]] = {}
    for r in rows:
        by_series.setdefault(r["event_type"], {}).setdefault(r["bucket"], 0)
        by_series[r["event_type"]][r["bucket"]] += 1
    for series, buckets in by_series.items():
        for b in range(1, 19):
            assert buckets.get(b, 0) == 1, (series, b)
        # endpoints ride along in buckets 0 and 19
        assert buckets.get(0, 0) >= 1 and buckets.get(19, 0) >= 1


def test_funnel_is_monotone(spark, sf_dir):
    for r in queries()["events_funnel_conversion"](spark, sf_dir).collect():
        assert r["n_signup"] >= r["n_click"] >= r["n_purchase"] >= 0
        assert 0 <= r["conv_ppm"] <= 1_000_000


def test_mad_outliers_bounded(spark, sf_dir):
    for r in queries()["events_outliers_mad"](spark, sf_dir).collect():
        assert 0 <= r["n_outliers"] <= r["n_rows"]
        assert r["mad_cents"] >= 0


def test_checksum_reconcile_finds_only_planted_shards(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    planted = (
        o.filter(F.expr("o_orderkey % 1000 = 7"))
        .select(F.expr("o_orderkey DIV 500").alias("shard"))
        .distinct()
    )
    want = {r["shard"] for r in planted.collect()}
    got = {
        r["shard"]
        for r in queries()["table_checksum_reconcile"](spark, sf_dir).collect()
    }
    assert got == want


def test_cogroup_profile_survives_count_and_column_pruning(spark, sf_dir):
    """The self-cogroup sharp edge (r12): with both sides derived from
    ONE scan, Spark 4.1's column pruning stripped the right side's
    non-key columns under any downstream projection — count() crashed
    the pandas worker and a column subset could silently fabricate
    -1s. The entry now builds its sides from independent scans; pin
    the two previously-broken consumption modes and subset==full
    value equality."""
    from pyspark.sql import functions as F

    q = queries()["cogroup_click_purchase_profile"]
    out = q(spark, sf_dir)
    n = out.count()  # crashed before the fix
    assert n > 0
    full = {r["user_id"]: r["first_purchase_id"] for r in out.collect()}
    sub = {
        r["user_id"]: r["first_purchase_id"]
        for r in out.select("user_id", "first_purchase_id").collect()
    }
    assert sub == full and len(full) == n
    # a partial aggregate (values consumed, schema pruned) agrees with
    # the full-collect values
    s = out.agg(F.sum("first_purchase_id")).collect()[0][0]
    assert s == sum(full.values())
