"""Text transforms matching the reference's semantics, as Column expressions.

Reference semantics (cited for parity):
- sanitize: ``sanitizeString`` regex-replaces every run of non-word chars or
  ``_`` with one space, then lowercases (WordCountV2.java:76-79). Java's
  ``\\w``/``\\s`` are ASCII-only there; Spark's regexp_replace uses the same
  Java regex dialect, so the expression below is semantically identical.
- tokenize: whitespace tokenization via StringTokenizer (WordCountV2.java:83)
  == split on ``\\s+`` dropping empty tokens.
- bigrams: sliding pair window within one record, joined with ``+``
  (WordCountV2.java:88-94); windows never cross records.

Everything here is a pure Column expression — no UDFs — so the whole
pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java-regex for a run of non-word characters or underscores, identical to
#: the reference's ``([^\s\w]|_)+`` (WordCountV2.java:77).
SANITIZE_PATTERN = r"([^\s\w]|_)+"


def sanitize(col: Column | str) -> Column:
    """Collapse punctuation/symbol runs to single spaces and lowercase."""
    return F.lower(F.regexp_replace(col, SANITIZE_PATTERN, " "))


def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization; drops empty tokens (StringTokenizer parity)."""
    return F.filter(F.split(col, pattern), lambda t: t != F.lit(""))


def ngrams(tokens: Column, n: int = 2, sep: str = "+") -> Column:
    """Sliding n-gram window over a token array, joined with ``sep``.

    Returns an array column of ``size(tokens) - n + 1`` strings; empty array
    when the record has fewer than ``n`` tokens (the caller usually filters
    those first — reference filter at WordCountV2.java:85-86).

    Two formulations, same output: n expanded ``element_at`` terms per
    gram for small n (the original; its plan is pinned by the verified
    bigram/trigram/shingle queries), and ``array_join(slice(...))`` for
    n >= 5 — the expanded tree grows with n and falls off the fast
    evaluation path (measured 72.7 s vs 6.5 s for the 13-gram stage of
    curation_decontaminate_13gram at sf0.1).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    size = F.size(tokens)
    # sequence(0, size-n) is ascending only when size >= n; guard with a
    # conditional empty array so short records yield [] instead of a
    # descending sequence. (The guard also protects the slice branch:
    # rows can reach the expression before the caller's length filter
    # under predicate pushdown, and slice rejects start 0.)
    idx = F.when(size >= n, F.sequence(F.lit(0), size - n)).otherwise(
        F.array().cast("array<int>")
    )
    if n >= 5:
        return F.transform(
            idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), sep)
        )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(tokens, i + j + 1) for j in range(n)]
        ),
    )


def bigrams(tokens: Column, sep: str = "+") -> Column:
    """Adjacent token pairs joined with ``sep`` (reference bigram emit)."""
    return ngrams(tokens, n=2, sep=sep)
