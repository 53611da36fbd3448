"""Packing operator (operators/packing.py) + its gate query: slice
geometry invariants, shard independence, the one-shuffle plan shape, and
the engine-vs-oracle match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.operators.packing import concat_and_chunk

SF_SMALL = "/root/testdata/sf0.001"
L = 16


def _docs(spark, counts, shards=None):
    rows = [
        (i, n) if shards is None else (i, n, shards[i])
        for i, n in enumerate(counts)
    ]
    schema = "doc_id bigint, n_tokens bigint" + (
        "" if shards is None else ", shard bigint"
    )
    return spark.createDataFrame(rows, schema)


def test_packing_is_lossless_and_exact(spark):
    """Every token lands in exactly one chunk: per-doc slices tile
    [0, n_tokens), per-chunk slices tile [0, L) (except the tail), and
    total packed length == total corpus tokens."""
    counts = [5, 3, 40, 1, 16, 7, 2, 31]
    rows = concat_and_chunk(_docs(spark, counts), L).collect()
    # per-doc coverage: slices are disjoint and tile the doc
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.slice_start)
        assert rs[0].slice_start == 0
        for a, b in zip(rs, rs[1:]):
            assert a.slice_start + a.slice_len == b.slice_start
        assert sum(r.slice_len for r in rs) == counts[doc_id]
    # per-chunk coverage: full chunks carry exactly L tokens
    by_chunk: dict[int, int] = {}
    last_chunk = max(r.chunk_id for r in rows)
    for r in rows:
        by_chunk[r.chunk_id] = by_chunk.get(r.chunk_id, 0) + r.slice_len
    for cid, tot in by_chunk.items():
        assert tot == L or cid == last_chunk
    assert sum(by_chunk.values()) == sum(counts)


def test_chunk_offsets_are_consistent(spark):
    """chunk_offset is the slice's position inside the chunk: offsets +
    lengths within a chunk tile [0, L) in doc order."""
    rows = concat_and_chunk(_docs(spark, [7, 7, 7, 7, 7]), L).collect()
    by_chunk: dict[int, list] = {}
    for r in rows:
        by_chunk.setdefault(r.chunk_id, []).append(r)
    for rs in by_chunk.values():
        rs.sort(key=lambda r: r.chunk_offset)
        assert rs[0].chunk_offset == 0
        for a, b in zip(rs, rs[1:]):
            assert a.chunk_offset + a.slice_len == b.chunk_offset


def test_long_document_splits(spark):
    """A document longer than L spans ceil(n/L) chunks."""
    rows = concat_and_chunk(_docs(spark, [40]), L).collect()
    assert [(r.chunk_id, r.slice_start, r.slice_len) for r in sorted(rows, key=lambda r: r.chunk_id)] == [
        (0, 0, 16),
        (1, 16, 16),
        (2, 32, 8),
    ]


def test_zero_token_documents_drop(spark):
    rows = concat_and_chunk(_docs(spark, [4, 0, 4]), L).collect()
    assert {r.doc_id for r in rows} == {0, 2}


def test_null_and_negative_token_counts_drop(spark):
    """NULL and negative token counts fail the n > 0 filter like zeros —
    a malformed stats column drops rows, it never corrupts offsets."""
    df = spark.createDataFrame(
        [(0, 4), (1, None), (2, -7), (3, 4)], "doc_id bigint, n_tokens bigint"
    )
    rows = concat_and_chunk(df, L).collect()
    assert {r.doc_id for r in rows} == {0, 3}
    assert sum(r.slice_len for r in rows) == 8


def test_shards_pack_independently(spark):
    """Chunk ids restart per shard and never mix shards — re-packing one
    shard leaves the others' chunks untouched (the 100 TB parallelism
    claim, checked semantically: each shard packs exactly like a solo
    run over its own docs)."""
    counts = [5, 9, 3, 20, 6, 2]
    shards = [0, 1, 0, 1, 0, 1]
    both = concat_and_chunk(
        _docs(spark, counts, shards), L, shard_col="shard"
    ).collect()
    for s in (0, 1):
        solo_counts = [n for n, sh in zip(counts, shards) if sh == s]
        solo_ids = [i for i, sh in enumerate(shards) if sh == s]
        solo = concat_and_chunk(
            _docs(spark, solo_counts), L
        ).collect()
        # map solo doc ids (dense) back to original ids
        want = sorted(
            (solo_ids[r.doc_id], r.chunk_id, r.slice_start, r.slice_len, r.chunk_offset)
            for r in solo
        )
        got = sorted(
            (r.doc_id, r.chunk_id, r.slice_start, r.slice_len, r.chunk_offset)
            for r in both
            if r.shard == s
        )
        assert got == want


def test_packing_by_hash_order_keeps_invariants(spark):
    """Randomized training order: packing by a hash-derived key (the
    docstring's shuffled-order recipe) still tiles every doc and fills
    every non-tail chunk to exactly L."""
    from bigdatastructure_a5_spark.operators.mixture import mix_uniform

    counts = [5, 3, 40, 1, 16, 7, 2, 31]
    df = _docs(spark, counts).withColumn("rk", mix_uniform("doc_id"))
    rows = concat_and_chunk(df, L, id_col="rk").collect()
    per_doc = {}
    for r in rows:
        per_doc[r.rk] = per_doc.get(r.rk, 0) + r.slice_len
    assert sorted(per_doc.values()) == sorted(counts)
    by_chunk = {}
    for r in rows:
        by_chunk[r.chunk_id] = by_chunk.get(r.chunk_id, 0) + r.slice_len
    last = max(by_chunk)
    assert all(tot == L for cid, tot in by_chunk.items() if cid != last)


def test_invalid_chunk_tokens_raises(spark):
    with pytest.raises(ValueError):
        concat_and_chunk(_docs(spark, [3]), 0)


def test_packing_plan_shape(spark):
    """One shuffle (the per-shard window), zero Python."""
    df = _docs(spark, [5, 9, 3, 20, 6, 2], [0, 1, 0, 1, 0, 1])
    plan = (
        concat_and_chunk(df, L, shard_col="shard")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duplicate_order_keys_pack_with_tiebreak(spark):
    """A post-mixture frame carries duplicate doc_ids (copies distinguish
    only by copy_id).  With a composite order key the ROWS-frame cumsum
    stays tie-free: every copy tiles its own token span, chunks fill to
    exactly L, and nothing overlaps — the RANGE-frame bug (tied keys
    sharing one __end, slices double-counted) cannot reproduce."""
    rows = [
        (0, 0, 5),
        (0, 1, 5),  # duplicate doc_id 0, copies 0/1
        (1, 0, 9),
        (2, 0, 3),
        (2, 1, 3),
        (2, 2, 3),  # doc 2 upsampled 3x
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, copy_id bigint, n_tokens bigint"
    )
    out = concat_and_chunk(df, L, id_col=["doc_id", "copy_id"]).collect()
    # every (doc, copy) tiles its own n_tokens
    per_copy: dict[tuple, int] = {}
    for r in out:
        per_copy[(r.doc_id, r.copy_id)] = (
            per_copy.get((r.doc_id, r.copy_id), 0) + r.slice_len
        )
    assert per_copy == {(d, c): n for d, c, n in rows}
    # chunks tile [0, L) with no overlap: offsets+lens partition the chunk
    by_chunk: dict[int, list] = {}
    for r in out:
        by_chunk.setdefault(r.chunk_id, []).append(r)
    last = max(by_chunk)
    for cid, rs in by_chunk.items():
        rs.sort(key=lambda r: r.chunk_offset)
        assert rs[0].chunk_offset == 0
        for a, b in zip(rs, rs[1:]):
            assert a.chunk_offset + a.slice_len == b.chunk_offset
        if cid != last:
            assert sum(r.slice_len for r in rs) == L
    # total stream length is the full corpus
    assert sum(r.slice_len for r in out) == sum(n for _, _, n in rows)


def test_packing_duplicate_keys_match_duckdb_rows_frame(spark):
    """The composite-key packer replays bit-for-bit in DuckDB with ROWS
    UNBOUNDED PRECEDING — the engine's pinned frame and the oracle's are
    textually the same semantics even under duplicate doc_ids."""
    import duckdb

    rows = [(i % 4, c, (i * 7) % 11 + 1) for i in range(24) for c in range(2)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, copy_id bigint, n_tokens bigint"
    )
    got = sorted(
        tuple(r)
        for r in concat_and_chunk(df, L, id_col=["doc_id", "copy_id"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, copy_id BIGINT, n BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.sql(
            f"""
            WITH p AS (
              SELECT doc_id, copy_id, n,
                     SUM(n) OVER (ORDER BY doc_id, copy_id
                                  ROWS UNBOUNDED PRECEDING) AS e
              FROM t WHERE n > 0
            ),
            x AS (
              SELECT doc_id, copy_id, e - n AS s, e,
                     UNNEST(GENERATE_SERIES(
                       CAST(FLOOR((e - n) / {L}.0) AS BIGINT),
                       CAST(FLOOR((e - 1) / {L}.0) AS BIGINT))) AS chunk_id
              FROM p
            )
            SELECT chunk_id, doc_id, copy_id,
                   GREATEST(s, chunk_id * {L}) - s AS slice_start,
                   LEAST(e, (chunk_id + 1) * {L})
                     - GREATEST(s, chunk_id * {L}) AS slice_len,
                   GREATEST(s, chunk_id * {L}) - chunk_id * {L} AS chunk_offset
            FROM x
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_empty_document_token_semantics_cross_engine(spark):
    """token_count counts 0 for empty/whitespace-only text in BOTH
    engines (split('', ' ') is [''] — a bare size() would count 1), NULL
    for NULL text; such documents drop out of the packer entirely."""
    import duckdb

    from bigdatastructure_a5_spark.functions.hashing import token_count

    texts = [(0, ""), (1, "   "), (2, None), (3, "a  b\tc"), (4, "\n\n")]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {
        r.doc_id: r.n
        for r in df.select("doc_id", token_count("text").alias("n")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", texts)
    want = {
        r[0]: r[1]
        for r in con.sql(
            r"""
            SELECT doc_id,
                   CASE WHEN txt = '' THEN CAST(0 AS BIGINT)
                        ELSE CAST(LEN(STRING_SPLIT(txt, ' ')) AS BIGINT)
                   END AS n
            FROM (SELECT doc_id,
                         TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS txt
                  FROM d)
            """
        ).fetchall()
    }
    assert got == want == {0: 0, 1: 0, 2: None, 3: 3, 4: 0}
    # and the packer drops them: only doc 3 packs
    packed = concat_and_chunk(
        df.select("doc_id", token_count("text").alias("n_tokens")), L
    ).collect()
    assert {r.doc_id for r in packed} == {3}


def test_gate_query_matches_duckdb_oracle(spark):
    """The registry entry vs its oracle at sf0.001."""
    import duckdb

    from bigdatastructure_a5_spark.queries.mixture_queries import (
        _PACK_ORACLE,
        pack_chunks,
    )

    got = sorted(tuple(r) for r in pack_chunks(spark, SF_SMALL).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(_PACK_ORACLE).fetchall())
    assert got == want and len(got) > 0


def _tok_docs(spark, token_lists, shards=None):
    rows = [
        (i, toks, len(toks)) if shards is None else (i, toks, len(toks), shards[i])
        for i, toks in enumerate(token_lists)
    ]
    schema = "doc_id bigint, toks array<string>, n_tokens bigint" + (
        "" if shards is None else ", shard bigint"
    )
    return spark.createDataFrame(rows, schema)


def test_assemble_chunks_materializes_exact_stream(spark):
    """Assembled chunks ARE the concatenated document stream: every
    non-final chunk holds exactly L tokens, and reading the chunks in
    chunk_id order reproduces the shard's token stream in doc order."""
    from bigdatastructure_a5_spark.operators.packing import assemble_chunks

    token_lists = [
        [f"d{i}t{j}" for j in range(n)] for i, n in enumerate([5, 3, 40, 1, 16, 7])
    ]
    docs = _tok_docs(spark, token_lists)
    packed = concat_and_chunk(docs, L)
    out = assemble_chunks(packed, docs.select("doc_id", "toks")).collect()
    by_chunk = {r.chunk_id: r for r in out}
    last = max(by_chunk)
    stream = [t for toks in token_lists for t in toks]
    got_stream = [
        t for cid in sorted(by_chunk) for t in by_chunk[cid].toks
    ]
    assert got_stream == stream
    for cid, r in by_chunk.items():
        assert r.n_tokens == len(r.toks)
        if cid != last:
            assert r.n_tokens == L


def test_assemble_chunks_sharded_and_zero_python(spark):
    """Sharded assembly keeps chunk streams per shard; the plan has no
    Python stages (pure slice/sort_array/flatten expressions)."""
    from bigdatastructure_a5_spark.operators.packing import assemble_chunks

    token_lists = [[f"d{i}t{j}" for j in range(n)] for i, n in enumerate([9, 20, 6, 2, 17, 5])]
    shards = [0, 1, 0, 1, 0, 1]
    docs = _tok_docs(spark, token_lists, shards)
    packed = concat_and_chunk(docs, L, shard_col="shard")
    asm = assemble_chunks(
        packed, docs.select("doc_id", "toks"), shard_col="shard"
    )
    plan = asm._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    out = asm.collect()
    for s in (0, 1):
        stream = [
            t
            for i, toks in enumerate(token_lists)
            if shards[i] == s
            for t in toks
        ]
        rows = sorted(
            (r for r in out if r.shard == s), key=lambda r: r.chunk_id
        )
        assert [t for r in rows for t in r.toks] == stream
        for r in rows[:-1]:
            assert r.n_tokens == L


def test_assembly_after_mixture_with_composite_keys(spark):
    """The full trainer path: mixture (duplicate doc_ids distinguished
    by copy_id) -> composite-key packing -> assembly.  Tokens join back
    on doc_id alone (each copy slices the same token array); the
    assembled stream must repeat upsampled documents exactly n_copies
    times and still fill every non-final chunk to L."""
    from bigdatastructure_a5_spark.operators.packing import assemble_chunks

    token_lists = {0: ["a0", "a1", "a2"], 1: ["b0", "b1"], 2: ["c0"] * 7}
    copies = {0: 2, 1: 1, 2: 3}
    mixed = spark.createDataFrame(
        [
            (d, c, len(token_lists[d]))
            for d, n in copies.items()
            for c in range(n)
        ],
        "doc_id bigint, copy_id bigint, n_tokens bigint",
    )
    toks = spark.createDataFrame(
        [(d, t) for d, t in token_lists.items()],
        "doc_id bigint, toks array<string>",
    )
    packed = concat_and_chunk(mixed, L, id_col=["doc_id", "copy_id"])
    out = assemble_chunks(packed, toks).collect()
    stream = [
        t
        for d in sorted(copies)
        for _ in range(copies[d])
        for t in token_lists[d]
    ]
    by_chunk = sorted(out, key=lambda r: r.chunk_id)
    assert [t for r in by_chunk for t in r.toks] == stream
    for r in by_chunk[:-1]:
        assert r.n_tokens == L


def test_assemble_chunks_fused_equals_join_form(spark):
    """r15: assemble_chunks_fused (one window pass over the token frame,
    geometry computed in place) must produce row-for-row the same chunks
    as concat_and_chunk -> join -> assemble_chunks, including straddling
    docs, a >1-chunk doc, a non-zero base offset, and shard isolation."""
    from pyspark.sql import functions as F

    from bigdatastructure_a5_spark.operators.packing import (
        assemble_chunks,
        assemble_chunks_fused,
        concat_and_chunk,
    )

    rows = []
    for shard in range(3):
        for i in range(12):
            toks = [f"s{shard}d{i}t{j}" for j in range((i * 7) % 23 + 1)]
            rows.append((shard, i, toks, (shard + 1) * 10))
    df = spark.createDataFrame(
        rows, "shard bigint, doc_id bigint, toks array<string>, base bigint"
    ).repartition(4)

    fused = assemble_chunks_fused(
        df, 16, id_col="doc_id", shard_col="shard", base_col="base"
    )
    geo = concat_and_chunk(
        df.withColumn("n_tokens", F.size("toks").cast("bigint")).select(
            "shard", "doc_id", "n_tokens", "base"
        ),
        16,
        id_col="doc_id",
        shard_col="shard",
        base_col="base",
    )
    joined = assemble_chunks(
        geo, df.select("shard", "doc_id", "toks"), id_cols=["shard", "doc_id"],
        shard_col="shard",
    )
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, joined.collect()))
    assert a == b and len(a) > 20
    # the fused plan must not contain a join
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
