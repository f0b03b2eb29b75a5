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
    "flagship_event_counts",
    # dedup family: algorithm keeps + never-gated variants (dedup_exact
    # rotated out r4 — green r2+r3, family amply covered below)
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_components",
    "dedup_components_star",
    "dedup_minhash_incremental",
    "dedup_minhash_stored_index",
    "dedup_ngram_jaccard",
    "cross_doc_ngram_exposure",
    "golden_record_merge",
    # similarity / ANN (incl. this round's SemDeDup + BM25 retrieval;
    # ann_cosine_topk rotated out r4 — green r2+r3 and bench headline)
    "semdedup_prune",
    "bm25_topk",
    "embedding_norm_stats",
    "text_sparse_dot_topk",
    # text analysis / curation (incl. the HUGEINT-fixed oracles)
    "text_quality_features",
    "stratified_sample_by_lang",
    "quality_filter_funnel",
    "text_fingerprint",
    "text_top_terms",
    "docs_length_histogram",
    "stratum_topk_sample",
    "text_bpe_pair_counts",
    # corpus statistics (incl. HUGEINT-fixed mixture sample)
    "mixture_weighted_sample",
    "corpus_vocab_coverage",
    "corpus_shuffle_shards",
    # events (keeps + the 4 HUGEINT-fixed + never-gated)
    "events_sessionization",
    "events_funnel_conversion",
    "events_ewma_value",
    "events_bitmap_distinct_rollup",
    "events_active_time_union",
    "events_transition_matrix",
    "events_lttb_downsample",
    "events_attribution_last_touch",
    # as-of both directions, robust stats, sketches, graph
    "asof_last_purchase",
    "asof_next_click",
    "robust_trimmed_mean",
    "sketch_distinct_mincount",
    "graph_triangle_count",
    # multimodal plumbing
    "multimodal_frame_sample",
    # TPC-H
    "tpch_q1",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    # relational / SQL-surface
    "join_multiway_region_revenue",
    "merge_upsert_orders",
    "market_basket_pairs",
    # window + storage + skew + streaming family pins
    "window_topk_per_customer",
    "shard_minmax_skipping",
    "skew_salted_agg",
    "streaming_sessionization",
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
