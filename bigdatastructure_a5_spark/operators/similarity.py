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
    candidate_margin: float = 1e-9,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (embedding near-dup detection).

    Two stages, because the naive per-pair expression fold is interpreted
    (nested higher-order functions leave whole-stage codegen — measured
    ~2 min for 2M pairs):

    1. **Candidates** via vectorized BLAS: mapInPandas over batches of one
       side with the other side broadcast as a normalized matrix; one
       ``A @ B.T`` per batch scores millions of pairs in milliseconds.
       The threshold is relaxed by ``candidate_margin`` (>> BLAS rounding
       error ~1e-13) so no true pair can be lost to float reordering.
    2. **Exact refine**: only the surviving candidates get the sequential
       double-precision fold (bit-identical to the DuckDB oracle), and the
       final filter applies the exact threshold to the exact value.

    At 100 TB the broadcast side becomes an LSH/IVF-bucketed block join
    (see ann_lsh_topk); the two-stage exact-refine shape stays the same.
    """
    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    bmat = mat / norms[:, None]
    sc = embeddings.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(bmat)
    relaxed = threshold - candidate_margin

    def candidate_batches(it):
        import pandas as pd

        for pdf in it:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.stack(pdf[vec_col].to_numpy())
            a = a.astype(np.float64)
            an = np.linalg.norm(a, axis=1)
            an[an == 0] = 1.0
            scores = (a / an[:, None]) @ b_mat.value.T
            ii, jj = np.nonzero(scores >= relaxed)
            left, right = a_ids[ii], b_ids.value[jj]
            keep = left < right
            yield pd.DataFrame({"id_a": left[keep], "id_b": right[keep]})

    from pyspark.sql.types import LongType, StructField, StructType

    cand_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    cands = embeddings.select(id_col, vec_col).mapInPandas(
        candidate_batches, schema=cand_schema
    )
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
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
    # stack every table's planes into one (tables*planes, dim) matrix: ONE
    # matmul per Arrow batch computes all bucket bits (the expression-fold
    # version pays tables*planes interpreted folds per row — measured slow)
    all_planes = np.vstack(
        [_hyperplanes(n_planes, dim, seed + t) for t in range(n_tables)]
    )
    qdots = all_planes @ np.asarray(query_vec, dtype=np.float64)
    qbits = (qdots >= 0).reshape(n_tables, n_planes)
    sc = embeddings.sparkSession.sparkContext
    b_planes = sc.broadcast(all_planes)
    b_qbits = sc.broadcast(qbits)

    def bucket_match(it):
        import pandas as pd

        for pdf in it:
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (a @ b_planes.value.T >= 0).reshape(
                len(pdf), n_tables, n_planes
            )
            match = (bits == b_qbits.value[None, :, :]).all(axis=2).any(axis=1)
            yield pdf[match]

    candidates = embeddings.select(id_col, vec_col).mapInPandas(
        bucket_match, schema=embeddings.select(id_col, vec_col).schema
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        candidates.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def fit_centroids_sample(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 1024,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """IVF coarse quantizer: fit centroids with Lloyd iterations on a small
    driver-side sample (the standard IVF recipe — at 100 TB you fit on ~1M
    sampled vectors, never the corpus; assignment is the distributed part)."""
    sample = [
        r[0] for r in embeddings.select(vec_col).limit(sample_rows).collect()
    ]
    x = np.asarray(sample, dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1), 1e-12)[:, None]
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine on normalized = dot
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: assign vectors to their nearest centroid cell
    (distributed, one matmul per Arrow batch against the broadcast
    codebook), probe the ``n_probe`` cells nearest the query, score only
    those exactly.

    Scale shape: the cell id is a write-time column in production (one
    pass), queries prune to n_probe/n_centroids of the corpus; recall is
    tunable via n_probe.  Complements the hyperplane-LSH variant (data-
    dependent cells vs data-independent planes).
    """
    cent = fit_centroids_sample(embeddings, n_centroids, vec_col=vec_col, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = np.argsort(-(cent @ qn))[:n_probe].tolist()
    sc = embeddings.sparkSession.sparkContext
    b_cent = sc.broadcast(cent)
    probe_set = set(probe_cells)

    def in_probed_cells(it):
        for pdf in it:
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            a /= np.maximum(np.linalg.norm(a, axis=1), 1e-12)[:, None]
            cells = np.argmax(a @ b_cent.value.T, axis=1)
            yield pdf[np.isin(cells, list(probe_set))]

    candidates = embeddings.select(id_col, vec_col).mapInPandas(
        in_probed_cells, schema=embeddings.select(id_col, vec_col).schema
    )
    q_lit = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        candidates.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q_lit).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
