"""Query catalog: every operator from SURVEY §2 (plus the LLM-data
operators) registered as a named (spark_fn, oracle_sql) pair.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin wrappers over
this registry. Each spark_fn takes (spark, sf_dir) and returns a
DataFrame; each oracle is ANSI SQL DuckDB runs on the same parquet
tables (views: region nation customer supplier part orders lineitem
events documents embeddings). Column names are aliased identically on
both sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str | Callable[[], str]] = {}


def query(name: str, oracle: str | Callable[[], str] | None = None):
    """Register a catalog query. ``oracle=None`` → driver runs the weaker
    rows-only check (for non-SQL-expressible ops)."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate hashes only the FIRST 50 entries of
# queries() (round-1 lesson: registration order cut off the entire
# LLM-data family). This explicit priority list guarantees the first 50
# cover at least one query per operator family — LLM-data, as-of,
# streaming, TPC-H and this round's new operators first; redundant
# window/scalar variants after the cut (they remain fully covered by
# tools/check_oracle.py, which runs all entries).
# ROTATION (r4): 13 load-bearing keeps (flagship, bench headline
# queries, one per dedup algorithm, stratified_sample_by_lang until
# its post-HUGEINT-fix green row lands, one pin per operator family)
# + 37 first-time entries from the never-gated backlog, led by the 7
# HUGEINT-cast-fixed oracles, the new stored-index dedup query, and
# the two ops new this round (semdedup_prune, bm25_topk — dedup_exact
# and ann_cosine_topk rotate out to make room: both green r2+r3,
# their families stay pinned by other window entries, and both stay
# covered by check_oracle; ann_cosine_topk also runs in the bench
# headline).
# r5 rotation candidates (added late in r4, deliberately OUTSIDE the
# already-frozen-and-verified window; all green in check_oracle at
# sf0.01 AND sf0.1): dedup_containment, lang_mismatch_audit,
# embedding_pq_codes, ann_pq_adc_topk, dedup_pipeline_containment,
# text_winnowing_fingerprints — rotate them in first, then continue the never-gated backlog.
# Rotated out this round (green official rows in r1-r3; still
# fully covered by tools/check_oracle.py): dedup_minhash_shingles,
# dedup_incremental, snapshot_diff, ann_lsh_buckets, ann_ivf_topk,
# ann_ivf_pruned_topk, embedding_kmeans_iter,
# decontaminate_ngram_overlap, sample_split_hash, text_tfidf_top_terms,
# text_pii_redaction, pack_sequences, text_repetition_signals,
# corpus_curation_pipeline, multimodal_binary_meta,
# range_join_error_context, percentiles_by_priority, approx_stats,
# streaming_tumbling_counts, streaming_stateful_dedup,
# skew_replicated_join, bucketed_join_orders, tpch_q3/q6,
# parallelize_kv_counts, python_datasource_feeder,
# feeder_route_do_pipeline, orders_abc_pareto, customer_rfm_segments,
# recursive_cte_user_hierarchy, lateral_topk_orders,
# udtf_token_positions, graph_pagerank_parts, events_gapfill_daily,
# events_watermark_lateness_audit.
_PRIORITY = [
    # ROTATION (r5): 4 load-bearing keeps (flagship; the production
    # MinHash bench headliner and its rows-only contract; one events
    # bench headliner; the streaming stateful pin) + 46 FIRST-TIME
    # entries from the never-gated backlog — the r4 verdict's top
    # task. All 46 verified green by tools/check_oracle.py at sf0.01
    # AND sf0.1 before freezing the window. Everything rotated out is
    # green in r1-r4 official rows and stays covered by check_oracle.
    "flagship_event_counts",
    "dedup_minhash_lsh_fast",
    "events_sessionization",
    "streaming_sessionization",
    # family pins (test_gate_window_covers_every_family: every catalog
    # module keeps >= 1 window entry) — all green in prior rounds
    "window_topk_per_customer",
    "multimodal_frame_sample",
    "skew_salted_agg",
    # --- the six ops queued at the end of r4 (built after the r4
    # window froze), first in line per VERDICT r4 task 1
    "dedup_containment",
    "dedup_pipeline_containment",
    "lang_mismatch_audit",
    "embedding_pq_codes",
    "ann_pq_adc_topk",
    "text_winnowing_fingerprints",
    # --- new in r5: winnowing consumer, simhash near-match, stored-PQ
    # read path, fast-vs-md5 pair-set equality made value-checked
    "text_winnowing_matches",
    "dedup_simhash_hamming",
    "ann_pq_stored_topk",
    "dedup_minhash_fast_vs_md5",
    # --- TPC-H: the 15 queries never officially gated (q1/q3-q7/q18
    # et al. green in prior rounds)
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_like",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_bracketed_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    # --- corpus / text backlog
    "inverted_index_postings",
    "source_mixture_weights",
    "docs_chunk_windows",
    "docs_lm_familiarity",
    # --- storage backlog
    "zorder_locality_index",
    "incremental_agg_maintenance",
    "table_checksum_reconcile",
    # --- relational / SQL-surface backlog
    "join_full_outer_day_activity",
    "profile_orders_columns",
    "window_ntile_buckets",
    "scalar_maps",
    "scalar_arrays",
    "schema_evolution_union",
    "fuzzy_join_part_names",
    "dq_constraint_audit",
    # --- events backlog (first 2; the rest are r6 candidates)
    "events_scd2_intervals",
    "events_time_weighted_avg",
    # --- streaming backlog (rows-only per the no-oracle contract)
    "streaming_ewma",
]
# r6 rotation candidates (the still-never-gated entries):
# dedup_simhash_hamming_fast, ann_ivfpq_topk, ann_ivfpq_residual_topk,
# dedup_minhash_index_append, streaming_minhash_index_match,
# text_winnowing_matches_capped (added after the r5 window froze),
# events_growth_accounting, events_time_pruned_rollup,
# streaming_interval_join,
# events_json_props, events_value_moments, events_outliers_zscore,
# events_outliers_mad, events_heatmap_dow_hour,
# events_rolling_weekly_active, events_value_histogram_log2,
# events_multi_grain_rollup, events_variant_shredding,
# events_error_spike, events_histogram_quantiles, events_entry_paths,
# events_drift_report, cogroup_click_purchase_profile,
# feature_store_pit_join, streaming_static_enrich,
# streaming_dropdup_watermark, streaming_mincount_sketch,
# streaming_backfill_available_now, streaming_interval_join_left_outer


def _ordered(names: list[str]) -> list[str]:
    pri = [n for n in _PRIORITY if n in names]
    rest = [n for n in names if n not in set(_PRIORITY)]
    return pri + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {n: _QUERIES[n] for n in _ordered(list(_QUERIES))}


def oracle_sql() -> dict[str, str]:
    _load()
    return {
        n: (_ORACLES[n]() if callable(_ORACLES[n]) else _ORACLES[n])
        for n in _ordered(list(_ORACLES))
    }


_loaded = False


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    from . import core  # noqa: F401
    from . import relational  # noqa: F401
    from . import window_ops  # noqa: F401
    from . import events_ops  # noqa: F401
    from . import text_ops  # noqa: F401
    from . import dedup_ops  # noqa: F401
    from . import similarity_ops  # noqa: F401
    from . import multimodal_ops  # noqa: F401
    from . import advanced_ops  # noqa: F401
    from . import tpch_ops  # noqa: F401
    from . import streaming_ops  # noqa: F401
    from . import skew_ops  # noqa: F401
    from . import storage_ops  # noqa: F401
    from . import corpus_ops  # noqa: F401
