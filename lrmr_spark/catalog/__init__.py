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
# ROTATION (r3): the first ~30 slots are the load-bearing one-per-
# family/algorithm set and stay put; the tail rotates each round so
# queries that never had an official driver row accumulate them (142
# catalog entries had none after r2 — this window gives 20 of them
# their first official row). Rotated out (all with 2 rounds of green
# official rows; still fully covered by tools/check_oracle.py):
# map_multiply, flatmap_double, filter_highqty, sort_concat_fold,
# group_by_known_keys, shuffle_repartition_stable,
# do_transform_bucketize, reduce_fold_alternating, topk_orders,
# set_except_all_custkeys, pivot_status_qty, sql_passthrough_*,
# tpch_q18_large_orders, dedup_tokenset, dedup_simhash,
# ann_lsh_pruned_topk, embedding_cosine_dedup, text_token_stats,
# text_langid, text_bpe_tokens, multimodal_fake_decode.
_PRIORITY = [
    "flagship_event_counts",
    # dedup family (distinct algorithms)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_components",
    "dedup_minhash_shingles",
    "dedup_incremental",
    "snapshot_diff",
    # similarity / ANN
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "ann_ivf_topk",
    "ann_ivf_pruned_topk",
    "embedding_kmeans_iter",
    # text analysis / curation
    "text_quality_features",
    "decontaminate_ngram_overlap",
    "sample_split_hash",
    "text_tfidf_top_terms",
    "text_pii_redaction",
    "stratified_sample_by_lang",
    "pack_sequences",
    # corpus statistics
    "text_repetition_signals",
    "corpus_curation_pipeline",
    # multimodal plumbing
    "multimodal_binary_meta",
    # as-of / range joins, percentiles/sketches
    "asof_last_purchase",
    "range_join_error_context",
    "percentiles_by_priority",
    "approx_stats",
    # streaming
    "streaming_tumbling_counts",
    "streaming_stateful_dedup",
    # skew + bucketed-storage operators
    "skew_salted_agg",
    "skew_replicated_join",
    "bucketed_join_orders",
    # TPC-H
    "tpch_q1",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    # pipeline core + custom source (arbitrary-user-code surface)
    "parallelize_kv_counts",
    "python_datasource_feeder",
    "feeder_route_do_pipeline",
    # relational / SQL-surface
    "join_multiway_region_revenue",
    "orders_abc_pareto",
    "customer_rfm_segments",
    "recursive_cte_user_hierarchy",
    "lateral_topk_orders",
    "udtf_token_positions",
    "graph_pagerank_parts",
    # window + events
    "window_topk_per_customer",
    "events_sessionization",
    "events_funnel_conversion",
    "events_gapfill_daily",
    "events_watermark_lateness_audit",
]


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
