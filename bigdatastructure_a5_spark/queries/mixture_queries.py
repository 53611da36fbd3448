"""Gate queries for the mixture and packing operators (extension scope:
the training-data pipeline charter, like queries/pipeline.py).

Both operators are pure Catalyst arithmetic over cross-engine-identical
primitives (the md5-prefix hash of functions/hashing.py:78; integer
window cumsums), so the DuckDB oracles replay them bit-for-bit — the
same hard signal the dedup/decontam/quantization families carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.operators.mixture import mix_domains
from bigdatastructure_a5_spark.operators.packing import concat_and_chunk
from bigdatastructure_a5_spark.registry import query

#: The gate mixture spec — every regime in one run: upsample with a
#: fractional tail (2.5), integer pass-through (1.0), keep-sample (0.25),
#: explicit drop (0.0), and the catch-all default (0.5) for the 16
#: unlisted sources.  All weights are exact binary fractions, so
#: ``w - floor(w)`` is the same double in both engines and the
#: ``u < frac`` gate cannot straddle a rounding difference.
MIX_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.25, "src3": 0.0}
MIX_DEFAULT = 0.5

#: DuckDB twin of operators/mixture.py: u = md5_hash60('mix:' || key) /
#: 2^60 (one exact-power-of-two IEEE division — bit-identical in both
#: engines), n = floor(w) + (u < w - floor(w)).
_MIX_ORACLE = """
    WITH m AS (
      SELECT doc_id, source, n_chars,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                         WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.0
                         ELSE 0.5 END AS w,
             CAST(CAST('0x' || SUBSTR(
                    MD5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
      FROM documents
    ),
    k AS (
      SELECT doc_id, source, n_chars,
             CAST(FLOOR(w) AS BIGINT)
               + (CASE WHEN u < w - FLOOR(w) THEN 1 ELSE 0 END) AS n
      FROM m
    )
    SELECT doc_id, source, n_chars,
           UNNEST(GENERATE_SERIES(0, n - 1)) AS copy_id
    FROM k WHERE n > 0
    """


@query("pipeline_mixture", oracle=_MIX_ORACLE, tags=("ext:mixture",))
def pipeline_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain mixture over documents
    (operators/mixture.py): src0 upsampled 2.5x, src1 passed through,
    src2 keep-sampled at 0.25, src3 dropped, everything else at the 0.5
    default.  Each kept copy is a row with its ``copy_id``; the whole
    mixer is a projection + explode — ZERO exchanges at any corpus size
    (the 100 TB mixer is a map-side pass over the ingest scan).  The
    hash gate is the cross-engine md5-prefix uniform, so the oracle
    reproduces every kept row and copy count exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return mix_domains(
        docs, MIX_WEIGHTS, domain_col="source", default_weight=MIX_DEFAULT
    )


#: DuckDB twin of operators/packing.py over whitespace tokens of the
#: normalized text (the engine-wide tokenizer, same as text_quality's
#: oracle): one cumsum window per shard, chunk span by integer division.
#: The CASE guard mirrors functions/hashing.token_count — STRING_SPLIT('')
#: is [''] (n=1) in both engines, but an empty document must count ZERO
#: tokens or it packs a phantom slice and shifts every later cumsum.
_PACK_ORACLE = """
    WITH t0 AS (
      SELECT doc_id, doc_id % 8 AS shard,
             TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS txt
      FROM documents
    ),
    t AS (
      SELECT doc_id, shard,
             CASE WHEN txt = '' THEN CAST(0 AS BIGINT)
                  ELSE CAST(LEN(STRING_SPLIT(txt, ' ')) AS BIGINT)
             END AS n
      FROM t0
    ),
    p AS (
      SELECT shard, doc_id, n,
             SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS e
      FROM t WHERE n > 0
    ),
    x AS (
      SELECT shard, doc_id, e - n AS s, e,
             UNNEST(GENERATE_SERIES(
               CAST(FLOOR((e - n) / 512.0) AS BIGINT),
               CAST(FLOOR((e - 1) / 512.0) AS BIGINT))) AS chunk_id
      FROM p
    )
    SELECT shard, chunk_id, doc_id,
           GREATEST(s, chunk_id * 512) - s AS slice_start,
           LEAST(e, (chunk_id + 1) * 512)
             - GREATEST(s, chunk_id * 512) AS slice_len,
           GREATEST(s, chunk_id * 512) - chunk_id * 512 AS chunk_offset
    FROM x
    """


@query("pack_chunks", oracle=_PACK_ORACLE, tags=("ext:packing",))
def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.py):
    documents sharded by ``doc_id % 8``, each shard's token stream (the
    engine-wide whitespace tokenizer) concatenated in doc_id order and
    sliced into 512-token chunks; rows are (shard, chunk_id, doc_id,
    slice geometry).  One shuffle total (the per-shard cumsum window) +
    an output-sized explode, zero Python — and chunk boundaries never
    cross shards, which is what makes the 100 TB packer embarrassingly
    parallel and re-pack-stable per shard.  ``doc_id`` is unique in the
    documents table, so the per-shard order key is tie-free; token counts
    come from ``token_count`` (empty documents count 0 and drop)."""
    from bigdatastructure_a5_spark.functions.hashing import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        token_count("text").alias("n_tokens"),
    )
    return concat_and_chunk(
        docs, 512, n_tokens_col="n_tokens", shard_col="shard"
    )
