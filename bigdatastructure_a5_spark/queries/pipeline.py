"""LLM-training-data pipeline queries over documents/embeddings fixtures.

These are the extensions BASELINE.json asks for beyond the reference's own
surface: deduplication, text analysis, fingerprinting, similarity search.
Batch 1 here is the oracle-checkable core; hash-family dedup (minhash/simhash)
and ANN variants live in operators.dedup / operators.similarity.

Everything stays JVM-side (split/transform/md5 built-ins) — at 100 TB these
run at scan speed with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.functions.hashing import (
    md5_fingerprint,
    normalized_text,
    tokens,
)
from bigdatastructure_a5_spark.registry import query

#: DuckDB equivalent of functions.hashing.normalized_text (note the 'g' flag —
#: DuckDB replaces only the first match without it; Spark replaces all).
_NORM_SQL = "TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))"


@query(
    "dedup_exact",
    oracle=f"""
    SELECT MD5({_NORM_SQL}) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*)    AS n_copies
    FROM documents
    GROUP BY MD5({_NORM_SQL})
    """,
    tags=("ext:dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-content fingerprint, keep
    the lowest doc_id per group.  The shuffle key is the 32-char md5, so the
    exchange carries fingerprints, not documents — this is the O(n) dedup that
    works at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(md5_fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, MD5({_NORM_SQL}) AS fingerprint
    FROM documents
    """,
    tags=("ext:text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable per-document content fingerprint (md5 of normalized text) —
    identical hex on every engine, so even the hash itself is oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", md5_fingerprint("text").alias("fingerprint"))


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           LEN(STRING_SPLIT({_NORM_SQL}, ' ')) AS n_tokens,
           LEN(LIST_DISTINCT(STRING_SPLIT({_NORM_SQL}, ' '))) AS n_distinct_tokens
    FROM documents
    """,
    tags=("ext:text",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — the quality-scoring raw features."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
