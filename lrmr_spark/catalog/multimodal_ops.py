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


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id AS media_id, text,
             CAST(ceil(length(text) / 32.0) AS BIGINT) AS total
      FROM documents),
    f AS (
      SELECT media_id, text, total, i * greatest(total // 4, 1) AS frame_no
      FROM b, unnest(range(0, 4)) AS t(i)
      WHERE i * greatest(total // 4, 1) < total)
    SELECT media_id, frame_no,
           CAST(length(substr(text, frame_no * 32 + 1, 32)) AS BIGINT) AS frame_bytes,
           md5(substr(text, frame_no * 32 + 1, 32)) AS frame_md5
    FROM f ORDER BY media_id, frame_no
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Uniform-stride frame sampling through the Arrow-batched
    mapInPandas path (operators.multimodal.sample_frames; real ffmpeg
    seek stubbed per environment). 32-byte frames, ≤4 samples per
    payload at uniform stride; only frame digests leave the task. The
    oracle recomputes frames via substr — valid because the corpus is
    ASCII (1 char = 1 byte); the Spark path slices raw bytes."""
    media = MM.attach_binary_payload(load(spark, sf_dir, "documents"), "doc_id", "text")
    return MM.sample_frames(media, fake=True).orderBy("media_id", "frame_no")


@query(
    "multimodal_phash_dedup",
    oracle="""
    WITH b AS (
      SELECT doc_id AS media_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS L,
             CAST(list_sum(list_transform(range(1, length(text) + 1),
               j -> ascii(substr(text, j, 1)))) AS BIGINT) AS tot,
             CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS bs
      FROM documents),
    h AS (
      SELECT media_id,
             CASE WHEN L = 0 THEN 0 ELSE CAST(list_sum(
               list_transform(range(0, 16), i -> CASE WHEN
                 least((i + 1) * bs, L) - i * bs > 0 AND
                 coalesce(list_sum(list_transform(
                   range(i * bs + 1, least((i + 1) * bs, L) + 1),
                   j -> ascii(substr(text, j, 1)))), 0) * L
                   >= tot * (least((i + 1) * bs, L) - i * bs)
                 THEN 1 << i ELSE 0 END)) AS BIGINT) END AS phash
      FROM b),
    reps AS (SELECT phash, min(media_id) AS media_id FROM h GROUP BY phash)
    SELECT l.media_id AS media_id_a, r.media_id AS media_id_b,
           CAST(bit_count(xor(l.phash, r.phash)) AS BIGINT) AS hamming
    FROM reps l JOIN reps r ON l.media_id < r.media_id
    WHERE bit_count(xor(l.phash, r.phash)) <= 1
    """,
)
def multimodal_phash_dedup(spark, sf_dir):
    """Perceptual-hash near-duplicate detection for media blobs: the
    image-dedup pipeline a multimodal training corpus runs — decode →
    16-bit average-hash (aHash; the open pHash family) → banded
    Hamming-≤1 pair join. The decode is the deterministic byte-stats
    fake (real codecs env-gated, the decode_media contract); the hash
    construction (block-mean bits via exact integer
    cross-multiplication), the Arrow batch plumbing, the identical-
    hash rep collapse, the integer block-key banding, and the
    xor+bit_count verify are all real and value-checked.

    Oracle: brute-force all-pairs over the collapsed hash table in
    SQL (banding is lossless for ≤ k, so banded == brute force — the
    same claim dedup_simhash_fast_banding_lossless pins for 64-bit
    simhash), byte stats via ascii() (valid: the corpus is pure
    ASCII; the Spark path reads raw bytes). Scale: payloads are
    touched once in the decode pass; the join ships only 8-byte
    hashes + ids, candidate fanout bounded by hash entropy per
    block."""
    media = MM.attach_binary_payload(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return MM.phash_hamming_pairs(MM.phash_media(media), k=1)
