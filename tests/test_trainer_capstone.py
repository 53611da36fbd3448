"""End-to-end trainer path: the documented composition of the whole
LLM-data-pipeline family over the real fixture, in one test —
curation -> domain mixture -> train/val/test split -> composite-key
packing -> chunk assembly.  Each stage is gated individually elsewhere
(driver oracles / pytest twins); this pins that they COMPOSE: schemas
line up, duplicate copy ids pack tie-free, holdout documents never
reach the packed training stream, and the assembled chunks tile the
mixed corpus exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.functions.hashing import token_count, tokens
from bigdatastructure_a5_spark.operators.mixture import (
    assign_split,
    mix_domains,
)
from bigdatastructure_a5_spark.operators.packing import (
    assemble_chunks,
    concat_and_chunk,
)
from bigdatastructure_a5_spark.queries.pipeline import curate_documents

SF = "/root/testdata/sf0.001"
L = 128


def test_trainer_capstone_composes(spark):
    docs = load_table(spark, SF, "documents")

    # 1. curation: quality/language gate + near-dup removal
    curated_ids = curate_documents(docs).select("doc_id")
    base = docs.join(curated_ids, "doc_id").select(
        "doc_id",
        "source",
        tokens("text").alias("toks"),
        token_count("text").alias("n_tokens"),
    )
    n_curated = base.count()
    assert 0 < n_curated < docs.count()

    # 2. mixture: upsample one source, drop another, default the rest
    mixed = mix_domains(
        base,
        {"src0": 2.0, "src1": 0.0},
        domain_col="source",
        default_weight=1.0,
    )

    # 3. split: hold out val+test by document key (copies inherit the
    # label through doc_id, so no document leaks across splits)
    labeled = assign_split(
        mixed, {"train": 0.75, "val": 0.125, "test": 0.125}
    )
    train = labeled.filter(F.col("split") == "train")

    # 4. pack the train stream with composite keys (mixture copies)
    packed = concat_and_chunk(
        train.select(
            "doc_id",
            "copy_id",
            (F.col("doc_id") % 4).alias("shard"),
            "n_tokens",
        ),
        L,
        id_col=["doc_id", "copy_id"],
        shard_col="shard",
    )

    # 5. assemble trainer-shaped examples
    assembled = assemble_chunks(
        packed, base.select("doc_id", "toks"), shard_col="shard"
    ).collect()

    # invariants across the whole composition:
    # (a) stream conservation — assembled tokens == the train mixture's
    train_rows = train.select("doc_id", "n_tokens", "copy_id").collect()
    want_total = sum(r.n_tokens for r in train_rows)
    got_total = sum(r.n_tokens for r in assembled)
    assert got_total == want_total > 0
    # (b) every non-final chunk per shard holds exactly L tokens
    by_shard: dict[int, list] = {}
    for r in assembled:
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.chunk_id)
        for r in rs[:-1]:
            assert r.n_tokens == L
        assert len(r.toks) == r.n_tokens
    # (c) no holdout leakage: every packed doc is train-labeled
    train_ids = {r.doc_id for r in train_rows}
    held_out = {
        r.doc_id
        for r in labeled.filter(F.col("split") != "train")
        .select("doc_id")
        .collect()
    }
    packed_ids = {r.doc_id for r in packed.select("doc_id").collect()}
    assert packed_ids <= train_ids
    assert packed_ids.isdisjoint(held_out - train_ids)
    # (d) the dropped domain is gone, the upsampled one multiplied
    per_source = {
        r.source: r.n
        for r in labeled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert "src1" not in per_source
    copies_src0 = (
        labeled.filter(F.col("source") == "src0")
        .groupBy("doc_id")
        .agg(F.countDistinct("copy_id").alias("c"))
        .agg(F.min("c"), F.max("c"))
        .first()
    )
    if copies_src0[0] is not None:
        assert copies_src0[0] >= 2  # weight 2.0: every kept doc >= 2 copies
