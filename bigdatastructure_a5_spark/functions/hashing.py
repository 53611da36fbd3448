"""Text normalization, shingling, and stable fingerprints.

Building blocks for the dedup/text-analysis operators.  Everything here is a
built-in-function composition (split/transform/md5/...), never a Python UDF,
so the hot path stays JVM-side at scale.

``md5`` is used as the stable cross-engine hash: Spark's ``F.md5`` and
DuckDB's ``md5()`` produce identical hex strings, which lets even hash-based
operators (fingerprinting, minhash) be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace runs, trim — canonical form for dedup."""
    c = _as_col(col)
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    return F.split(normalized_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count of normalized text, 0 for empty documents.

    ``split('', ' ')`` yields ``['']`` in BOTH Spark and DuckDB, so a bare
    ``size(tokens(...))`` counts an empty-after-trim document as ONE
    token — it would pack an empty slice into a training chunk and its
    cumsum shift would silently move every later slice.  Pin the sane
    semantics (empty document = zero tokens) on both engines; the DuckDB
    twin is ``CASE WHEN trimmed = '' THEN 0 ELSE LEN(STRING_SPLIT(...))``.
    NULL text stays NULL (dropped by any ``> 0`` filter downstream).
    """
    t = normalized_text(col)
    return (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, " ")))
        .cast("bigint")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for minhash/jaccard.

    Implemented with ``transform`` over token positions + ``slice`` — pure
    Catalyst expressions, no UDF.
    """
    toks = tokens(col)
    count = F.size(toks) - F.lit(n - 1)
    # sequence(1, 0) would count DOWN; guard short documents explicitly.
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Shingles from an already-materialized token-array COLUMN.

    Use this (not ``word_shingles``) in hot paths: when the lambda inside
    ``transform`` closes over a nested expression like ``split(...)``,
    Catalyst re-evaluates that whole subtree per element — O(tokens²) work
    per document (measured 9x slower at sf0.1).  Binding the token array to
    a real column first makes each element O(n).
    """
    t = _as_col(toks)
    count = F.size(t) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def md5_fingerprint(col: Column | str) -> Column:
    """Stable content fingerprint of the normalized text."""
    return F.md5(normalized_text(col))


def md5_hash60(col: Column | str) -> Column:
    """Cross-engine-deterministic 60-bit hash: the first 15 hex chars of the
    md5 digest parsed as a BIGINT.

    Spark ``conv(substring(md5(x), 1, 15), 16, 10)`` and DuckDB
    ``CAST('0x' || SUBSTR(MD5(x), 1, 15) AS BIGINT)`` produce the same
    non-negative 60-bit value (15 hex chars < 2^60 < 2^63, no sign issues),
    so hash-derived operators (simhash fingerprints, sketch cells) can be
    checked against a SQL oracle bit-for-bit.  Same trick as
    ``operators/sketches.py`` (32-bit variant), widened for fingerprint use.
    """
    c = _as_col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
