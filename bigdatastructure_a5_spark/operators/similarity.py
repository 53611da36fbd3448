"""Similarity search over embedding columns (extension scope, BASELINE.json).

Two tiers, as the brief prescribes:

- **brute force**: exact cosine against every vector — the correctness
  baseline, and at 100 TB still the right tool for one-off queries when
  fused into a single scan (no shuffle: score+topk is map+reduce).
- **LSH-bucketed ANN**: sign-random-projection (hyperplane) bucketing; only
  vectors sharing a bucket with the query are scored.  Recall < 1 by
  construction; the scale path when queries are frequent.

All vector math is Catalyst higher-order functions (functions/vectors.py) —
no UDFs.  Hyperplanes are generated from a fixed seed so results are
reproducible run-to-run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine, deterministic ties (id ascending).

    Plan shape at scale: scan -> per-row score (codegen) ->
    TakeOrderedAndProject (per-partition top-k, merge on driver) — no global
    sort, no shuffle of the corpus.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (embedding near-dup detection).

    Deliberately quadratic — the oracle/baseline.  The 100-TB path is
    ``ann_lsh_pairs`` below (bucket first, score within buckets).
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity("va", "vb").alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Fixed-seed Gaussian hyperplanes — reproducible, data-independent."""
    return np.random.RandomState(seed).randn(n_planes, dim)


def lsh_bucket(
    df: DataFrame, vec_col: str, planes: np.ndarray
) -> F.Column:
    """Sign-projection bucket id: bit p = (v . plane_p) >= 0 packed into a
    BIGINT.  Pure expressions: each dot product is a zip_with/aggregate fold
    against a literal array."""
    bucket = None
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit_plane, lambda x, w: x.cast("double") * w
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket + term
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an LSH bucket with the
    query in ANY of ``n_tables`` independent hash tables (the classic
    multi-table trade: recall 1-(1-p_match^planes)^tables).

    With p=4 planes x L=8 tables and a true neighbour at cosine ~0.4 (the
    fixtures are near-random, a worst case), expected recall is ~0.75 while
    scoring a fraction of the corpus; with realistically clustered data
    (neighbour cosine >= 0.9) the same config reaches ~1.0 recall scanning
    a few percent.  At 100 TB the bucket ids are materialized as columns at
    write time (one pass), so a query prunes on L equality predicates
    before any scoring — this function computes them on the fly for
    self-containedness.
    """
    dim = len(query_vec)
    match_any = None
    for t in range(n_tables):
        planes = _hyperplanes(n_planes, dim, seed + t)
        qbits = 0
        for p, plane in enumerate(planes):
            if float(np.dot(query_vec, plane)) >= 0:
                qbits |= 1 << p
        cond = lsh_bucket(embeddings, vec_col, planes) == F.lit(qbits)
        match_any = cond if match_any is None else (match_any | cond)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings.filter(match_any)
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
