"""Text-analysis operators for training-data pipelines.

All column-expression builders (JVM-side, whole-stage codegen; zero
Python in the hot path): tokenization, quality scoring, language-ID
heuristic, fingerprinting, shingling. Every function returns Columns so
operators compose inside a single projection — one scan, no shuffles.

The portable hash primitive is md5 (identical output in Spark, DuckDB,
and Python's hashlib), which makes every operator oracle-checkable; the
non-portable fast path (xxhash64) is offered where noted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "distinct_tokens",
    "quality_features",
    "language_scores",
    "language_id",
    "fingerprint",
    "shingles",
    "STOPWORDS",
    "winnowing_fingerprints",
]

# deterministic English stopword marker set used by quality scoring and
# the language-ID heuristic (the heuristic's *spec* is this list — the
# oracle SQL embeds the same list)
STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty strings filtered (so leading/
    trailing/double spaces don't produce ghost tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_tokens(col: Column | str) -> Column:
    return F.array_sort(F.array_distinct(tokens(col)))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, stopword ratio,
    punctuation ratio. Use for filtering low-quality training docs."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "avg_token_len": F.round(
            (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1)), 4
        ),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
    }


def language_scores(col: Column | str) -> Column:
    """Stopword-marker score: fraction of tokens that are English
    stopword markers. A real deployment plugs per-language marker sets
    or an n-gram model in the same shape."""
    toks = tokens(col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def language_id(col: Column | str, threshold: float = 0.03) -> Column:
    """Heuristic language-ID: 'en' when the stopword-marker ratio clears
    ``threshold``, else 'unknown'. Deterministic spec, oracle-checkable."""
    return F.when(language_scores(col) >= threshold, "en").otherwise("unknown")


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the lowercased,
    whitespace-collapsed, trimmed text. Survives formatting noise;
    identical in DuckDB/Python md5."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def shingles(col: Column | str, k: int = 3) -> Column:
    """k-token shingles (n-grams of the token stream) as strings —
    the input units for MinHash / Jaccard near-dup detection. Built with
    a JVM-side transform over the token array (no explode, no Python)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )


def winnowing_fingerprints(col: Column | str, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03): hash every k-gram, slide a window of ``w`` consecutive
    gram hashes, keep each window's MINIMUM — the selected set is a
    position-robust fingerprint with guaranteed density (any match of
    length ≥ w+k−1 shares a fingerprint), the standard primitive for
    plagiarism / substring-dup detection at corpus scale.

    Hashes are md5-hex prefixes so the min ordering is engine-portable
    (the same trick the MinHash oracle uses — min over uniform hex
    strings is a valid min-hash). Pure per-row JVM transforms, zero
    shuffles; returns the SORTED DISTINCT fingerprint array. At scale
    the exploded (fingerprint, doc) postings feed an inverted index —
    exactly the inverted_index_postings / cross_doc_ngram_exposure
    join shape.
    """
    grams = shingles(col, k)
    hashes = F.transform(
        grams, lambda g: F.substring(F.md5(F.concat(F.lit("w:"), g)), 1, 8)
    )
    n_windows = F.greatest(F.size(hashes) - w + 1, F.lit(1))
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda i: F.array_min(F.slice(hashes, i, w)),
            )
        )
    )
