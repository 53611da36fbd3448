"""Product quantization: train / encode / ADC serve / IVF-PQ composition.

Mirrors the IVF test strategy (test_dedup_similarity.py): recall floors
against brute force on the real fixture, plan-shape pins for the
zero-Python SQL serving path, determinism, and NULL handling.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.catalog import load_table
from bigdatastructure_a5_spark.operators.quantization import (
    PQ_SQL_MAX_LUT,
    adc_lut,
    fit_pq_codebook,
    ivf_pq_topk,
    pq_adc_topk,
    with_pq_codes,
)
from bigdatastructure_a5_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .cache()
    )


@pytest.fixture(scope="module")
def pq_book(emb):
    # 64 codes (not 256): the sf fixture has ~2k distinct vectors, and 64
    # keeps >= 30 training points per code (the FAISS floor); m=16 (4-dim
    # sub-vectors) because a near-uniform unit-norm corpus is PQ's hardest
    # case — measured ADC recall@10 here: m=8 ~40%, m=16 ~50%, with the
    # exact refine tier at 100% for both
    return fit_pq_codebook(emb, m=16, n_codes=64, iters=10)


def test_pq_codebook_shape_and_determinism(emb):
    book = fit_pq_codebook(emb, m=8, n_codes=64, iters=3)
    assert book.shape == (8, 64, 8)  # dim 64 -> 8 sub-vectors of 8
    again = fit_pq_codebook(emb, m=8, n_codes=64, iters=3)
    assert (book == again).all()
    # sub-space seeds are decorrelated: two sub-quantizers of identical
    # shape must not share a codebook (the corpus is not block-symmetric)
    assert not np.allclose(book[0], book[1])
    with pytest.raises(ValueError, match="divisible"):
        fit_pq_codebook(emb, m=7)


def test_pq_encode_codes_and_nulls(spark, emb, pq_book):
    coded = with_pq_codes(emb, pq_book)
    rows = coded.select("pq_code").limit(50).collect()
    for r in rows:
        assert len(r.pq_code) == 16
        assert all(0 <= c < 64 for c in r.pq_code)
    # NULL and wrong-length vectors encode to NULL
    weird = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.pq_code
        for r in with_pq_codes(weird, pq_book).collect()
    }
    assert got[1] is None and got[2] is None


def test_adc_lut_matches_reconstruction_dot(pq_book):
    """sum_j LUT[j, code_j] must equal <q, reconstruction(code)> exactly
    — ADC's defining identity (the approximation error lives entirely in
    quantizing v, not in the table)."""
    q = [float(i % 5) / 7.0 for i in range(64)]
    lut = adc_lut(pq_book, q)
    assert lut.shape == (16, 64)
    codes = [3, 0, 17, 63, 8, 21, 42, 5, 60, 1, 33, 2, 9, 48, 11, 27]
    recon = np.concatenate([pq_book[j][c] for j, c in enumerate(codes)])
    want = float(np.asarray(q) @ recon)
    got = float(sum(lut[j, c] for j, c in enumerate(codes)))
    assert abs(got - want) < 1e-9
    with pytest.raises(ValueError, match="dim"):
        adc_lut(pq_book, [1.0, 2.0])


def test_pq_adc_recall_and_refine(emb, pq_book):
    """ADC top-k over 64x-compressed codes must stay close to exact
    brute force, and the exact refine tier must recover most of the gap
    while touching only refine_factor*k rows."""
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = [r.vec_id for r in brute_force_topk(corpus, qv, k=10).collect()]
    coded = with_pq_codes(corpus, pq_book).cache()
    try:
        adc = pq_adc_topk(coded, pq_book, qv, k=10).collect()
        assert len(adc) == 10
        recall = len({r.vec_id for r in adc} & set(exact)) / 10
        assert recall >= 0.4, (recall, exact, [r.vec_id for r in adc])
        refined = pq_adc_topk(
            coded, pq_book, qv, k=10, refine="embedding", refine_factor=8
        ).collect()
        r_recall = len({r.vec_id for r in refined} & set(exact)) / 10
        assert r_recall >= recall, (r_recall, recall)
        assert r_recall >= 0.8, (r_recall, exact)
        # refined output is exact-cosine ordered
        cos = [r.cosine for r in refined]
        assert cos == sorted(cos, reverse=True)
    finally:
        coded.unpersist()


def test_pq_adc_sql_path_has_no_python_and_matches_blas(
    spark, emb, pq_book, tmp_path
):
    """Below PQ_SQL_MAX_LUT the ADC fold must be pure Catalyst (zero
    Python stages — the serving-path promise; encoding is write-time, so
    the serve reads STORED codes like production does), and the
    Arrow/BLAS gather used above the threshold must score identically."""
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    store = str(tmp_path / "pq_codes")
    with_pq_codes(emb, pq_book).select("vec_id", "pq_code").write.parquet(
        store
    )
    coded = spark.read.parquet(store)
    assert 16 * 64 <= PQ_SQL_MAX_LUT
    sql_top = pq_adc_topk(coded, pq_book, qv, k=25)
    plan = sql_top._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # stored codes -> pure JVM serve
    import bigdatastructure_a5_spark.operators.quantization as qz

    sql_rows = [(r.vec_id, r.adc_ip) for r in sql_top.collect()]
    orig = qz.PQ_SQL_MAX_LUT
    qz.PQ_SQL_MAX_LUT = 1  # force the Arrow gather path
    try:
        blas_rows = [
            (r.vec_id, r.adc_ip)
            for r in pq_adc_topk(coded, pq_book, qv, k=25).collect()
        ]
    finally:
        qz.PQ_SQL_MAX_LUT = orig
    assert [i for i, _ in sql_rows] == [i for i, _ in blas_rows]
    for (_, a), (_, b) in zip(sql_rows, blas_rows):
        assert abs(a - b) < 1e-9


def test_sq8_encode_decode_identity(spark, emb):
    """SQ8: codes are in [0, 255], NULL vectors encode NULL, degenerate
    dimensions encode 0, and the folded serving score equals the numpy
    dequantized dot to float tolerance (the defining identity)."""
    import numpy as np

    from bigdatastructure_a5_spark.operators.quantization import (
        fit_sq8_bounds,
        sq8_dot_topk,
        with_sq8_codes,
    )

    bounds = fit_sq8_bounds(emb)
    lo, hi = bounds
    assert lo.shape == hi.shape == (64,)
    assert (lo <= hi).all()
    coded = with_sq8_codes(emb, bounds)
    rows = coded.select("vec_id", "embedding", "sq8_code").limit(20).collect()
    step = (hi - lo) / 255.0
    qv = [float(x) for x in rows[0].embedding]
    q = np.asarray(qv)
    for r in rows:
        assert len(r.sq8_code) == 64
        assert all(0 <= c <= 255 for c in r.sq8_code)
    top = sq8_dot_topk(coded, bounds, qv, k=15).collect()
    got = {r.vec_id: r.sq8_ip for r in top}
    for r in rows:
        if r.vec_id in got:
            dequant = lo + np.asarray(r.sq8_code, dtype=float) * step
            assert abs(got[r.vec_id] - float(q @ dequant)) < 1e-9
    # NULL vector -> NULL code; degenerate dim -> code 0
    weird = spark.createDataFrame(
        [(1, None), (2, [7.0, 3.0])], "vec_id long, embedding array<double>"
    )
    wb = (np.array([7.0, 0.0]), np.array([7.0, 5.0]))
    wcodes = {r.vec_id: r.sq8_code for r in with_sq8_codes(weird, wb).collect()}
    assert wcodes[1] is None
    assert wcodes[2][0] == 0  # lo == hi: degenerate dimension
    assert wcodes[2][1] == 153  # (3-0)/5*255

    with pytest.raises(ValueError, match="dim"):
        sq8_dot_topk(coded, bounds, [1.0, 2.0])


def test_sq8_recall_near_exact_and_pure_jvm(spark, emb, tmp_path):
    """The SQ8 tier's selling point: ~8x smaller than raw float64 with
    near-exact top-k (quantization error ~step/2 per dim barely perturbs
    rankings), and the whole encode+serve path is rendered expressions —
    zero Python stages on stored codes."""
    from bigdatastructure_a5_spark.operators.quantization import (
        fit_sq8_bounds,
        sq8_dot_topk,
        with_sq8_codes,
    )

    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = [r.vec_id for r in brute_force_topk(corpus, qv, k=10).collect()]
    bounds = fit_sq8_bounds(corpus)
    store = str(tmp_path / "sq8_codes")
    with_sq8_codes(corpus, bounds).select("vec_id", "sq8_code").write.parquet(
        store
    )
    stored = spark.read.parquet(store)
    top = sq8_dot_topk(stored, bounds, qv, k=10)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    got = [r.vec_id for r in top.collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.9, (recall, exact, got)


def test_ivf_pq_composition(emb, pq_book):
    """The FAISS IVFPQ shape: write-time cell + code columns, probe prunes
    rows, ADC compresses bytes; with all cells probed the result must
    equal plain ADC over the full corpus, and a real probe must return k
    rows with sane recall against it."""
    from bigdatastructure_a5_spark.operators.similarity import (
        seed_point_centroids,
        with_ivf_cells,
    )

    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    cents = seed_point_centroids(emb, 16)
    stored = with_pq_codes(
        with_ivf_cells(emb, cents, "embedding", "__cell"), pq_book
    ).cache()
    try:
        full = [
            r.vec_id
            for r in ivf_pq_topk(
                stored, cents, pq_book, qv, k=10, n_probe=16
            ).collect()
        ]
        plain = [
            r.vec_id
            for r in pq_adc_topk(stored, pq_book, qv, k=10).collect()
        ]
        assert full == plain  # all-cells probe == no IVF filter
        probed = [
            r.vec_id
            for r in ivf_pq_topk(
                stored, cents, pq_book, qv, k=10, n_probe=4
            ).collect()
        ]
        assert len(probed) == 10
        assert len(set(probed) & set(plain)) >= 5
    finally:
        stored.unpersist()


def test_pq_refine_backfills_on_null_refine_vector(spark, emb, pq_book):
    """A NULL (or short) refine vector inside the ADC top-k window must
    NOT shrink the result below k: the NULL-cosine filter runs before the
    final top-k limit, so the next-best candidate backfills (VERDICT r8
    item 2 — previously .limit(k).filter() returned < k rows)."""
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    coded = with_pq_codes(emb.filter(F.col("vec_id") != 0), pq_book)
    # find the current ADC top-3 and null out the winner's refine vector
    top3 = [r.vec_id for r in pq_adc_topk(coded, pq_book, qv, k=3).collect()]
    dirty = coded.withColumn(
        "embedding",
        F.when(F.col("vec_id") == top3[0], F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    refined = pq_adc_topk(
        dirty, pq_book, qv, k=10, refine="embedding", refine_factor=4
    ).collect()
    assert len(refined) == 10, [r.vec_id for r in refined]
    assert top3[0] not in {r.vec_id for r in refined}
    assert all(r.cosine is not None for r in refined)


def test_sq8_wrong_length_vector_encodes_null(spark):
    """ANSI-mode regression (ADVICE r8): one wrong-length vector in a
    corpus must encode NULL like PQ does — not abort the whole write-time
    job with INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    import numpy as np

    from bigdatastructure_a5_spark.operators.quantization import (
        with_sq8_codes,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.5, 0.5, 0.9]), (3, [1.0, 0.0]), (4, None)],
        "vec_id long, embedding array<double>",
    )
    bounds = (np.array([0.0, 0.0]), np.array([1.0, 1.0]))
    got = {r.vec_id: r.sq8_code for r in with_sq8_codes(df, bounds).collect()}
    assert got[1] == [0, 255] and got[3] == [255, 0]
    assert got[2] is None  # wrong length: NULL, not a job abort
    assert got[4] is None


def test_sq8_topk_rejects_mismatched_code_length(spark):
    """A stored code array whose length differs from the bounds dim must
    fail LOUDLY (ADVICE r8): silent zip_with null-padding would score the
    row NULL and quietly drop it from the top-k."""
    import numpy as np

    from bigdatastructure_a5_spark.operators.quantization import (
        sq8_dot_topk,
    )

    codes = spark.createDataFrame(
        [(1, [10, 20]), (2, [10, 20, 30])],
        "vec_id long, sq8_code array<int>",
    )
    bounds = (np.array([0.0, 0.0]), np.array([1.0, 1.0]))
    with pytest.raises(Exception, match="mismatched bounds/codes"):
        sq8_dot_topk(codes, bounds, [1.0, 1.0], k=5).collect()


def test_sq8_quantile_bounds_outlier_robust(spark):
    """fit_sq8_bounds(q=...) — the FAISS RangeStat-quantile recipe
    (VERDICT r8 item 5): one outlier per dimension stretches exact
    min/max bounds (squashing the useful 8-bit resolution for the bulk),
    while quantile bounds stay sized to the mass."""
    import numpy as np

    from bigdatastructure_a5_spark.operators.quantization import (
        fit_sq8_bounds,
    )

    rng = np.random.RandomState(7)
    base = rng.uniform(-1.0, 1.0, size=(500, 4))
    base[0] = [900.0, -900.0, 500.0, -500.0]  # the outlier row
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    lo_e, hi_e = fit_sq8_bounds(df)
    lo_q, hi_q = fit_sq8_bounds(df, q=0.99)
    # exact bounds swallow the outlier -> step ~3.5; quantile bounds hug
    # the bulk -> step ~0.008 (a ~450x resolution recovery for 99% of rows)
    assert hi_e[0] == 900.0 and lo_e[1] == -900.0
    assert hi_q[0] < 2.0 and lo_q[1] > -2.0
    step_e = (hi_e - lo_e) / 255.0
    step_q = (hi_q - lo_q) / 255.0
    assert (step_q < step_e / 100).all()
    with pytest.raises(ValueError, match="q must be"):
        fit_sq8_bounds(df, q=0.3)


def test_pq_encode_sql_twin_matches_blas(spark, emb):
    """with_pq_codes_sql (the rendered zero-Python encode that puts PQ
    under the oracle gate, queries/quant_queries.py) must produce the
    same codes as the Arrow/BLAS production encoder, keep NULL semantics,
    and show no Python stage in its plan."""
    from bigdatastructure_a5_spark.operators.quantization import (
        with_pq_codes_sql,
    )

    seeds = emb.filter(F.col("vec_id") != 0).orderBy("vec_id").limit(16).collect()
    book = np.array(
        [
            [[float(x) for x in r.embedding][j * 16 : (j + 1) * 16] for r in seeds]
            for j in range(4)
        ]
    )
    corpus = emb.filter(F.col("vec_id") != 0)
    sql_codes = {
        r.vec_id: list(r.pq_code)
        for r in with_pq_codes_sql(corpus, book).select("vec_id", "pq_code").collect()
    }
    blas_codes = {
        r.vec_id: list(r.pq_code)
        for r in with_pq_codes(corpus, book).select("vec_id", "pq_code").collect()
    }
    assert sql_codes == blas_codes
    plan = (
        with_pq_codes_sql(corpus, book)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    weird = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: r.pq_code for r in with_pq_codes_sql(weird, book).collect()}
    assert got[1] is None and got[2] is None
    with pytest.raises(ValueError, match="budget"):
        with_pq_codes_sql(corpus, np.zeros((8, 256, 8)))
