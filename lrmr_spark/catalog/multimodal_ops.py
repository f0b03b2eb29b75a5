"""Multimodal-column catalog entries: binary payload plumbing with
typed metadata, plus the Arrow-batched fake-decode path.
"""

from __future__ import annotations

from ..operators import multimodal as MM
from ..tables import load
from . import query


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS media_id, 'text/utf-8' AS codec,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark, sf_dir):
    """Opaque binary payload + typed metadata: JVM-only pass (length,
    leading byte, content hash) over the blob column — the pattern that
    lets filters prune 100 TB of media without touching bytes."""
    media = MM.attach_binary_payload(load(spark, sf_dir, "documents"), "doc_id", "text")
    return MM.binary_metadata(media)


@query(
    "multimodal_fake_decode",
    oracle="""
    WITH b AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)))
               AS bytes_list
      FROM documents
    )
    SELECT media_id, n_bytes,
           CASE WHEN len(bytes_list) = 0 THEN 0.0
                ELSE floor(list_sum(bytes_list) * 10000.0 / len(bytes_list)) / 10000
           END AS feat_mean,
           CAST(coalesce(list_min(bytes_list), 0) AS BIGINT) AS feat_min,
           CAST(coalesce(list_max(bytes_list), 0) AS BIGINT) AS feat_max
    FROM b
    """,
)
def multimodal_fake_decode(spark, sf_dir):
    """The mapInPandas decode path with the deterministic byte-stats
    stub (real codecs are stubbed behind NotImplementedError — see
    operators.multimodal.decode_media). Verifies the Arrow batch
    plumbing end-to-end: schema, batching, per-payload features.

    Oracle caveat: the SQL recomputes byte stats via ascii(), valid
    because the corpus is pure ASCII; the Spark path operates on raw
    bytes and handles arbitrary binary."""
    media = MM.attach_binary_payload(load(spark, sf_dir, "documents"), "doc_id", "text")
    return MM.decode_media(media, fake=True)
