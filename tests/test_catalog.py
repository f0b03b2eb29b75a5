"""Catalog-registry contracts: the driver's correctness gate hashes
only the FIRST 50 entries of queries(), so ordering is load-bearing —
every operator family (catalog module) must land at least one entry in
the gate window, and every priority name must actually exist."""

from lrmr_spark import catalog


def test_priority_names_all_registered():
    names = set(catalog.queries())
    missing = [n for n in catalog._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY references unregistered queries: {missing}"


def test_gate_window_covers_every_family():
    qs = catalog.queries()
    gate = list(qs)[:50]
    by_module: dict[str, list[str]] = {}
    for name, fn in qs.items():
        by_module.setdefault(fn.__module__.rsplit(".", 1)[-1], []).append(name)
    uncovered = {
        mod: names
        for mod, names in by_module.items()
        if not any(n in gate for n in names)
    }
    assert not uncovered, f"families with no entry in the first-50 gate: {uncovered}"


def test_every_query_has_oracle_or_is_documented_rows_only():
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    rows_only = set(qs) - set(oracles)
    # the only legitimate rows-only entries: non-SQL-expressible ops
    assert rows_only <= {
        "approx_stats",  # sketch internals engine-specific
        "streaming_tumbling_counts",  # incremental/watermark semantics
        "streaming_stateful_dedup",  # cross-batch custom state
        "streaming_interval_join",  # stream-stream join state semantics
        "streaming_static_enrich",  # incremental/watermark semantics
        "streaming_sessionization",  # session_window state semantics
        "streaming_ewma",  # cross-batch numeric state
        "streaming_dropdup_watermark",  # bounded-state dedup semantics
        "streaming_mincount_sketch",  # incremental sketch-state semantics
        "streaming_backfill_available_now",  # trigger/run-mode semantics
        "streaming_interval_join_left_outer",  # watermark-gated null emission

        "dedup_minhash_lsh_fast",  # xxhash64 not reproducible in SQL
    }, rows_only
