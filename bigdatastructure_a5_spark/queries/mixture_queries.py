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
from bigdatastructure_a5_spark.operators.mixture import assign_split, mix_domains
from bigdatastructure_a5_spark.operators.packing import (
    assemble_chunks,
    concat_and_chunk,
)
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


#: The gate split spec — all cut points are exact binary fractions
#: (0.75, 0.75 + 0.125 = 0.875), so the Python-side cumulative float adds
#: and the oracle's literal cuts are the same doubles and the ``u < cut``
#: gates cannot straddle a rounding difference.
SPLIT_FRACTIONS = {"train": 0.75, "val": 0.125, "test": 0.125}

#: DuckDB twin of operators/mixture.assign_split: the same md5-prefix
#: uniform (salt 'split' — independent of the mixer's 'mix' draw), carved
#: by first-match-wins cut points.  No NULL doc_ids exist in the fixture
#: (and the engine routes NULL to 'train' explicitly — pytest-pinned).
#: Public: consumed by the r13 rotation net
#: tests/test_tools.py::test_pipeline_split_matches_duckdb.
PIPELINE_SPLIT_ORACLE = """
    SELECT doc_id, source,
           CASE WHEN u < 0.75  THEN 'train'
                WHEN u < 0.875 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, source,
             CAST(CAST('0x' || SUBSTR(
                    MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
      FROM documents
    )
    """


def pipeline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/mixture.py
    ``assign_split``): 75/12.5/12.5 by cut points on the md5-prefix
    uniform.  Exhaustive + disjoint by construction, stable under corpus
    growth (a doc's label depends only on its key), and a pure map-side
    projection — ZERO exchanges at any corpus size.  The salt makes the
    split draw independent of the mixture draw on the same keys.

    Rotated OUT of the driver registry in r13 (slot balance for
    ``dedup_retraction``; registry pinned at the driver's 50-row
    snapshot — VERDICT r12 item 1): the md5-prefix-uniform machinery it
    shares with the mixer stays driver-gated via ``pipeline_mixture``
    (same hash, same cross-engine-exact cut-point comparison), and the
    splitter keeps its engine-vs-DuckDB twin in
    tests/test_tools.py::test_pipeline_split_matches_duckdb plus the
    NULL-routing/property tests in tests/test_mixture.py."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_split(docs, SPLIT_FRACTIONS)


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
           CAST(GREATEST(s, chunk_id * 512) - s AS BIGINT) AS slice_start,
           CAST(LEAST(e, (chunk_id + 1) * 512)
             - GREATEST(s, chunk_id * 512) AS BIGINT) AS slice_len,
           CAST(GREATEST(s, chunk_id * 512) - chunk_id * 512
             AS BIGINT) AS chunk_offset
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


#: DuckDB twin of operators/packing.assemble_chunks: the same geometry
#: CTEs as _PACK_ORACLE, then LIST_SLICE each document's tokens by its
#: slice and STRING_AGG the pieces in chunk_offset order — the assembled
#: chunk text replays bit-for-bit.
_ASSEMBLY_ORACLE = """
    WITH t0 AS (
      SELECT doc_id, doc_id % 8 AS shard,
             TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS txt
      FROM documents
    ),
    t AS (
      SELECT doc_id, shard, STRING_SPLIT(txt, ' ') AS toks,
             CASE WHEN txt = '' THEN CAST(0 AS BIGINT)
                  ELSE CAST(LEN(STRING_SPLIT(txt, ' ')) AS BIGINT)
             END AS n
      FROM t0
    ),
    p AS (
      SELECT shard, doc_id, toks, n,
             SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS e
      FROM t WHERE n > 0
    ),
    x AS (
      SELECT shard, doc_id, toks, e - n AS s, e,
             UNNEST(GENERATE_SERIES(
               CAST(FLOOR((e - n) / 512.0) AS BIGINT),
               CAST(FLOOR((e - 1) / 512.0) AS BIGINT))) AS chunk_id
      FROM p
    ),
    sl AS (
      SELECT shard, chunk_id, doc_id, toks,
             GREATEST(s, chunk_id * 512) - s AS slice_start,
             LEAST(e, (chunk_id + 1) * 512)
               - GREATEST(s, chunk_id * 512) AS slice_len,
             GREATEST(s, chunk_id * 512) - chunk_id * 512 AS chunk_offset
      FROM x
    )
    SELECT shard, chunk_id,
           STRING_AGG(
             ARRAY_TO_STRING(
               LIST_SLICE(toks, slice_start + 1, slice_start + slice_len),
               ' '),
             ' ' ORDER BY chunk_offset) AS text,
           CAST(SUM(slice_len) AS BIGINT) AS n_tokens
    FROM sl
    GROUP BY shard, chunk_id
    """


def pack_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer-shaped packed examples (operators/packing.py
    ``assemble_chunks``): the pack_chunks geometry joined back to each
    document's token array, sliced, ordered by chunk_offset, flattened —
    one row per (shard, chunk_id) with the chunk's space-joined text and
    its token count (== 512 for every chunk but each shard's last,
    pytest-pinned).  Pure Catalyst (slice/sort_array/flatten), zero
    Python; the join and the chunk aggregation are the only exchanges
    beyond the geometry window.

    Rotated OUT of the driver registry in r12: its slot went to
    ``pack_assembly_incremental``, which runs the same assembly as a
    REAL streaming ingest and gates a strict superset of this query's
    rows (every complete chunk; only each shard's unfilled last chunk —
    the streaming tail, which never emits by design — is exclusive to
    this batch variant).  The engine-vs-DuckDB twin lives in
    tests/test_tools.py::test_pack_assembly_matches_duckdb, so the
    batch assembler keeps its cross-engine check."""
    from bigdatastructure_a5_spark.functions.hashing import token_count, tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        tokens("text").alias("toks"),
        token_count("text").alias("n_tokens"),
    )
    geo = concat_and_chunk(
        docs.select("doc_id", "shard", "n_tokens"),
        512,
        n_tokens_col="n_tokens",
        shard_col="shard",
    )
    asm = assemble_chunks(
        geo, docs.select("doc_id", "toks"), shard_col="shard"
    )
    return asm.select(
        "shard",
        "chunk_id",
        F.array_join("toks", " ").alias("text"),
        "n_tokens",
    )


#: DuckDB twin of the INCREMENTAL assembler's output: the same assembly
#: CTEs as _ASSEMBLY_ORACLE, restricted to COMPLETE chunks (n_tokens ==
#: 512) — the streaming assembler's contract is to emit exactly the
#: chunks that COMPLETED (each shard's unfilled last chunk stays in the
#: tail store), so batch-complete == streamed-emitted, row for row.
_ASSEMBLY_INCREMENTAL_ORACLE = """
    WITH t0 AS (
      SELECT doc_id, doc_id % 8 AS shard,
             TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS txt
      FROM documents
    ),
    t AS (
      SELECT doc_id, shard, STRING_SPLIT(txt, ' ') AS toks,
             CASE WHEN txt = '' THEN CAST(0 AS BIGINT)
                  ELSE CAST(LEN(STRING_SPLIT(txt, ' ')) AS BIGINT)
             END AS n
      FROM t0
    ),
    p AS (
      SELECT shard, doc_id, toks, n,
             SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS e
      FROM t WHERE n > 0
    ),
    x AS (
      SELECT shard, doc_id, toks, e - n AS s, e,
             UNNEST(GENERATE_SERIES(
               CAST(FLOOR((e - n) / 512.0) AS BIGINT),
               CAST(FLOOR((e - 1) / 512.0) AS BIGINT))) AS chunk_id
      FROM p
    ),
    sl AS (
      SELECT shard, chunk_id, doc_id, toks,
             GREATEST(s, chunk_id * 512) - s AS slice_start,
             LEAST(e, (chunk_id + 1) * 512)
               - GREATEST(s, chunk_id * 512) AS slice_len,
             GREATEST(s, chunk_id * 512) - chunk_id * 512 AS chunk_offset
      FROM x
    )
    SELECT shard, chunk_id,
           STRING_AGG(
             ARRAY_TO_STRING(
               LIST_SLICE(toks, slice_start + 1, slice_start + slice_len),
               ' '),
             ' ' ORDER BY chunk_offset) AS text,
           CAST(SUM(slice_len) AS BIGINT) AS n_tokens
    FROM sl
    GROUP BY shard, chunk_id
    HAVING CAST(SUM(slice_len) AS BIGINT) = 512
    """


@query(
    "pack_assembly_incremental",
    oracle=_ASSEMBLY_INCREMENTAL_ORACLE,
    tags=("ext:packing", "ext:streaming"),
)
def pack_assembly_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-ingest ASSEMBLY as a REAL Structured Streaming run in the
    correctness gate (VERDICT r11 item 1): the documents fixture is
    split into three id-range ingest batches, streamed through
    ``streaming_assembly_writer`` (streaming/packing.py) under
    Trigger.AvailableNow with ``exactly_once=True``, and the emitted
    complete chunks are hash-matched against the batch assembly SQL
    restricted to complete chunks — stream == batch is the operator's
    own contract, here driver-gated end-to-end: incremental packing
    geometry, the carry and tail state stores, cross-batch chunk
    completion, and the per-batch-directory exactly-once output mode
    all sit on the gated path.

    Harness scaffolding vs operator: the ntile split + per-split
    temp-file write + forced mtimes exist only to make a finite fixture
    arrive as ordered microbatches (the same trick the pytest streaming
    runs use); the gated operator is the foreachBatch body.  Empty
    documents are dropped up front (token_count = 0 — the same rule the
    batch packer applies inside concat_and_chunk).  TWO ingest batches
    since r13 (VERDICT r12 item 4's second lever): the oracle is
    batch-count independent (it checks the union of COMPLETE chunks)
    and two batches already put every cross-batch mechanism on the
    gated path — carry read-back, tail re-pack, strictly-earlier retry
    state, per-batch exactly-once dirs; the 3-batch and bucketed splits
    stay pytest-pinned (test_streaming_packing.py).

    The ingest SPLITS are staged ONCE per (fixture dir, file
    fingerprint, harness version) under a fixed temp root and reused
    across invocations (VERDICT r12 item 4: per-rep corpus staging
    dominated the row's wall); each invocation clears and reuses the
    SAME per-scope run dir for state/checkpoint/output, so repeated
    gate and multi-rep bench runs overwrite rather than accumulate
    orphaned temp roots (ADVICE r12 low).  The streaming run itself —
    real AvailableNow microbatches through the state stores — happens
    fresh every invocation; only the batch-invariant ingest files are
    cached."""
    import hashlib
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import Window

    from bigdatastructure_a5_spark.catalog import table_fingerprint
    from bigdatastructure_a5_spark.functions.hashing import token_count, tokens
    from bigdatastructure_a5_spark.queries.scratch import (
        pid_run_dir,
        staged_dir,
    )
    from bigdatastructure_a5_spark.streaming.packing import (
        streaming_assembly_writer,
    )

    scope_h = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), "bds_a5_pack_asm", scope_h)
    # fingerprint-named staging via queries/scratch.staged_dir (shared
    # cross-process-safe machinery): fixture file stats + harness
    # version — r12's 3-split geometry invalidates via the splits token,
    # and ANY change to stage()'s content (shard derivation, mtime
    # scheme, projection) must bump the impl token, same convention as
    # _minhash_pairs_shared's cache (ADVICE r13 low)
    # impl token derived from the staging code's own source bytes (this
    # module defines stage()) + the tokenizer module it calls — any edit
    # rotates the token and rebuilds the splits (VERDICT r14 item 3: no
    # more hand-bumped |impl=rN| tokens)
    import sys as _sys

    from bigdatastructure_a5_spark.functions import hashing as _hashing
    from bigdatastructure_a5_spark.queries.scratch import impl_token

    fprint = hashlib.md5(
        (
            table_fingerprint(sf_dir, "documents")
            + "|splits=2|impl="
            + impl_token(_sys.modules[__name__], _hashing)
        ).encode()
    ).hexdigest()[:12]

    def stage(build_dir: str) -> None:
        docs = (
            load_table(spark, sf_dir, "documents")
            .filter(token_count("text") > 0)
            .select(
                "doc_id", (F.col("doc_id") % 8).alias("shard"), "text"
            )
        )
        # id-range cut points from a SLIM ntile (ids only): running the
        # window over the document frame itself would drag every text
        # through a single-partition sort — once per split write
        cuts = (
            docs.select("doc_id")
            .withColumn("__b", F.ntile(2).over(Window.orderBy("doc_id")))
            .groupBy("__b")
            .agg(F.max("doc_id").alias("hi"))
            .collect()
        )
        hi = {int(r["__b"]): int(r.hi) for r in cuts}
        base_t = _time.time() - 100
        lo = None
        for i in (1, 2):
            p = os.path.join(build_dir, f"split_{i}.parquet")
            part = docs.filter(F.col("doc_id") <= hi[i])
            if lo is not None:
                part = part.filter(F.col("doc_id") > lo)
            lo = hi[i]
            part.coalesce(1).write.mode("overwrite").parquet(p)
            for f in sorted(
                os.path.join(dp, fn)
                for dp, _, fns in os.walk(p)
                for fn in fns
            ):
                os.utime(f, (base_t + i, base_t + i))
        # marker LAST: staged_dir treats its presence as completeness
        with open(os.path.join(build_dir, "_STAGED_OK"), "w") as fh:
            fh.write(fprint)

    src = staged_dir(root, "src", fprint, "_STAGED_OK", stage)
    # per-invocation scratch, PID-scoped (queries/scratch.pid_run_dir):
    # cleared up front each invocation — the previous invocation's
    # output has been consumed by then (the driver collects before
    # calling the next query) and a crashed run's state/checkpoint must
    # not leak into a fresh stream
    run = pid_run_dir(root)
    # The per-batch windows/joins key on 8 shards — a 32/200-partition
    # shuffle default is pure task overhead — but setting the override on
    # the SHARED session would leak into any registry row the gate runs
    # concurrently (dedup_retraction deliberately depends on the
    # 32-partition default; ADVICE r13 low).  spark.newSession() gives an
    # isolated SQLConf over the same SparkContext: the override lives and
    # dies with the stream's session, no restore bookkeeping, no leak.
    stream_sess = spark.newSession()
    stream_sess.conf.set("spark.sql.shuffle.partitions", "8")
    # splits carry TEXT (small at rest); tokenization happens inside the
    # stream projection, once per document, exactly like a real ingest
    stream = (
        stream_sess.readStream.schema("doc_id bigint, shard bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .select("doc_id", "shard", tokens("text").alias("toks"))
    )
    out = os.path.join(run, "out")
    q = (
        streaming_assembly_writer(
            stream,
            os.path.join(run, "state"),
            out,
            os.path.join(run, "ckpt"),
            512,
            exactly_once=True,
        )
        .trigger(availableNow=True)
        .start()
    )
    # a False return is a HUNG stream, not success: stop it and
    # raise BEFORE any cleanup runs — deleting its state/checkpoint
    # out from under a live query turns a timeout into a confusing
    # partial-output gate failure (ADVICE r12 low)
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(
            "pack_assembly_incremental: AvailableNow stream did not "
            "terminate within 600s — stopped it; state/checkpoint "
            f"left under {run} for diagnosis (cleared on next run)"
        )
    # only the output outlives the run (the returned frame reads it
    # lazily); the state stores and checkpoint are scaffolding — drop
    # them now, and the next invocation clears out/ itself
    for sub in ("state", "ckpt"):
        shutil.rmtree(os.path.join(run, sub), ignore_errors=True)
    # exactly_once wrote per-batch dirs (partition-discovered `batch`
    # column, dropped here); chunk text joins exactly like the batch row
    return spark.read.parquet(out).select(
        "shard",
        "chunk_id",
        F.array_join("toks", " ").alias("text"),
        "n_tokens",
    )
