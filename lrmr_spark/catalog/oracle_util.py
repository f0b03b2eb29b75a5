"""Version-stable DuckDB SQL builders shared by oracle strings.

The r2 gate showed one oracle (text_repetition_signals) hashing
differently under the driver's DuckDB while matching exactly under the
local one — the suspect constructs were list *bracket slices*
(``toks[i:i+k-1]``, inclusive-bound semantics that have shifted across
DuckDB releases) inside the k-gram builders. These helpers rebuild the
same grams from explicit element indexing + concatenation, which has a
single documented meaning in every DuckDB version: ``toks[i]`` is
1-based and out-of-range access is NULL.

Semantics mirrored from ``operators.text.shingles`` (clamped slices,
min one gram): for a token list of length n and gram size k, gram i
(i = 1 .. max(n - k, 0) + 1) is the space-join of tokens i .. i+k-1
clamped to the list end — so a document shorter than k tokens yields
exactly one gram holding all its tokens ('' when empty).
"""

from __future__ import annotations

__all__ = ["grams_expr"]


def _gram_at(toks: str, k: int) -> str:
    """CASE expression for the gram starting at 1-based index ``i``,
    clamping at the list end (only reachable when the doc is shorter
    than ``k`` — in-range starts always take the full-width branch)."""
    branches = []
    for width in range(k, 1, -1):
        join = " || ' ' || ".join(
            f"{toks}[i]" if j == 0 else f"{toks}[i + {j}]"
            for j in range(width)
        )
        branches.append(f"WHEN i + {width - 1} <= len({toks}) THEN {join}")
    return (
        "CASE " + " ".join(branches) + f" ELSE coalesce({toks}[i], '') END"
    )


def grams_expr(toks: str, k: int) -> str:
    """DuckDB expression: list of k-gram strings over token list
    ``toks`` (an SQL expression/column name), bracket-slice-free."""
    return (
        f"list_transform(range(1, greatest(len({toks}) - {k}, 0) + 2), "
        f"i -> {_gram_at(toks, k)})"
    )
