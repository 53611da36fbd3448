"""Z-order layout: Morton key correctness and multi-column pruning."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bigdatastructure_a5_spark.operators.layout import (
    morton_interleave,
    scale_to_rank,
    with_zorder_key,
    zorder_cluster,
)


def test_morton_interleave_known_bits(spark):
    """Bit-exact interleave: output bit (i*n + j) is column j's bit i."""
    df = spark.createDataFrame(
        [(3, 1), (0, 0), (2, 3)], "x long, y long"
    ).withColumn(
        "z", morton_interleave([F.col("x"), F.col("y")], bits=2)
    )
    got = {(r.x, r.y): r.z for r in df.collect()}
    # x=0b11, y=0b01 -> z bits (y1 x1 y0 x0) = 0 1 1 1 = 7
    assert got[(3, 1)] == 7
    assert got[(0, 0)] == 0
    # x=0b10, y=0b11 -> bits: x0=0, y0=1, x1=1, y1=1 -> 0b1110 = 14
    assert got[(2, 3)] == 14
    with pytest.raises(ValueError, match="64-bit"):
        morton_interleave([F.col("x")] * 5, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        morton_interleave([])


def test_scale_to_rank_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (None,)], "v double"
    )
    ranked = df.select(
        scale_to_rank(F.col("v"), 0.0, 100.0, bits=8).alias("r")
    )
    vals = [r.r for r in ranked.collect()]
    assert vals[0] == 0 and vals[2] == 255  # full range maps to [0, 2^8)
    assert 100 <= vals[1] <= 155  # midpoint lands mid-range
    assert vals[3] == 0  # NULL ranks low, never NULL
    # degenerate column: lo == hi -> constant 0, no division by zero
    flat = df.select(scale_to_rank(F.col("v"), 7.0, 7.0).alias("r"))
    assert {r.r for r in flat.collect()} == {0}


def test_zorder_key_plan_is_pure_jvm(spark):
    """The Morton key is a rendered expression — zero Python stages (the
    same serving-path rule as the IVF SQL argmax and the PQ ADC fold)."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 100).alias("b")
    )
    keyed = with_zorder_key(df, ["a", "b"], bounds={"a": (0, 99), "b": (0, 99)})
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def _boxes(path: str, cols: tuple[str, str]):
    """Per-row-group (min, max) boxes of two columns across all files."""
    boxes = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.read_metadata(f)
        idx = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sa = rg.column(idx[cols[0]]).statistics
            sb = rg.column(idx[cols[1]]).statistics
            boxes.append(((sa.min, sa.max), (sb.min, sb.max)))
    return boxes


def _intersecting(boxes, a_range, b_range) -> int:
    return sum(
        1
        for (alo, ahi), (blo, bhi) in boxes
        if not (ahi < a_range[0] or alo > a_range[1])
        and not (bhi < b_range[0] or blo > b_range[1])
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The pruning claim, on real parquet footers: a corner box covering
    1/16 of a 2-D grid intersects strictly fewer z-ordered row groups
    than single-column-sorted ones (where the unsorted dimension spans
    every file and contributes nothing)."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("a"), (F.col("id") / 256).cast("long").alias("b")
    )
    zdir, sdir = str(tmp_path / "zorder"), str(tmp_path / "sorted_a")
    # repartitionByRange picks file boundaries by reservoir sampling with a
    # per-JVM seed; at the default 100 samples/partition a boundary can
    # drift past a curve-quadrant edge and leak the corner box into one
    # extra file on some JVMs.  Sample densely so boundaries sit within
    # noise of the exact 4096-row quantiles and the assertion is stable.
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = spark.conf.get(key)
    spark.conf.set(key, "5000")
    try:
        zorder_cluster(
            grid, ["a", "b"], n_files=16, bounds={"a": (0, 255), "b": (0, 255)}
        ).write.parquet(zdir)
        grid.repartitionByRange(16, "a").sortWithinPartitions(
            "a"
        ).write.parquet(sdir)
    finally:
        spark.conf.set(key, prev)
    box = ((0, 63), (0, 63))  # 1/16 of the area, aligned to the curve
    z_hit = _intersecting(_boxes(zdir, ("a", "b")), *box)
    s_hit = _intersecting(_boxes(sdir, ("a", "b")), *box)
    z_total = len(_boxes(zdir, ("a", "b")))
    assert z_total >= 16
    # single-sort on `a`: the box's a-range covers 1/4 of files, and the
    # b-predicate prunes nothing; z-order prunes on BOTH dimensions
    assert z_hit < s_hit, (z_hit, s_hit)
    assert z_hit <= z_total // 8, (z_hit, z_total)
    # the layouts store identical data
    assert (
        spark.read.parquet(zdir).orderBy("a", "b").collect()
        == spark.read.parquet(sdir).orderBy("a", "b").collect()
    )


def test_zorder_key_date_timestamp_and_string_types(spark):
    """Non-numeric rank inputs: DATE ranks as days (unix_date), TIMESTAMP
    as micros (unix_micros) — same key as pre-converting by hand — and a
    STRING column ranks natively since r10 (prefix surrogate by default;
    string_method='error' restores the old refusal for callers that want
    to pre-rank by hand)."""
    from bigdatastructure_a5_spark.operators.layout import with_zorder_key

    df = spark.sql(
        """
        SELECT * FROM VALUES
          (DATE'2000-01-01', TIMESTAMP'2000-01-01 00:00:00', 'A', 1),
          (DATE'2000-06-15', TIMESTAMP'2000-06-15 12:00:00', 'N', 2),
          (DATE'2000-12-31', TIMESTAMP'2000-12-31 23:59:59', 'R', 3)
        AS t(d, ts, flag, x)
        """
    )
    keyed = with_zorder_key(df, ["d", "x"]).select("x", "__z").collect()
    manual = with_zorder_key(
        df.withColumn("d", F.unix_date("d")), ["d", "x"]
    ).select("x", "__z").collect()
    assert sorted(map(tuple, keyed)) == sorted(map(tuple, manual))
    ts_keyed = with_zorder_key(df, ["ts", "x"]).select("__z").collect()
    assert len({r["__z"] for r in ts_keyed}) == 3  # distinct keys, no error
    # strings rank natively now (prefix surrogate); the old refusal is
    # opt-in via string_method='error'
    s_keyed = with_zorder_key(df, ["flag", "x"]).select("__z").collect()
    assert len({r["__z"] for r in s_keyed}) == 3
    with pytest.raises(ValueError, match="string"):
        with_zorder_key(df, ["flag", "x"], string_method="error")


def test_string_surrogate_is_order_preserving(spark):
    """The prefix surrogate orders exactly like Spark's own string
    comparison on prefix-distinct values, and monotonically (ties
    allowed) everywhere — including empty strings, shared prefixes, and
    values that only differ past the 7-char fold."""
    from bigdatastructure_a5_spark.operators.layout import string_surrogate

    vals = [
        "", "a", "ab", "abc", "azz", "b", "Brand#11", "Brand#25",
        "Brand#3", "https://www.x.com", "https://www.y.com",
        "sameprefix-1", "sameprefix-2", "zzzzzzzz",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s", string_surrogate(F.col("s")).alias("k")
    ).collect()
    by_str = sorted(rows, key=lambda r: r.s)
    ks = [r.k for r in by_str]
    assert ks == sorted(ks)  # monotone in string order
    # values that differ within the 9-char fold get DISTINCT surrogates
    # (Brand#11 vs Brand#25 vs Brand#3 — the §15c categorical case);
    # values identical through 9 chars collapse (ties allowed)
    by_prefix = {}
    for r in rows:
        by_prefix.setdefault(r.s[:9], set()).add(r.k)
    for pre, kset in by_prefix.items():
        assert len(kset) == 1, (pre, kset)
    k = {r.s: r.k for r in rows}
    assert len({k["Brand#11"], k["Brand#25"], k["Brand#3"]}) == 3
    assert k["sameprefix-1"] == k["sameprefix-2"]  # differ past the fold


def test_surrogate_ranks_survive_double_ulp(spark):
    """ADVICE r10: surrogates sit near 2^62 where double ULP is 1024 —
    ranking must shift by the exact bigint minimum BEFORE the double
    cast or strings differing only in folded chars 8-9 collapse (the 25
    Brand#NN values used to map to only 10 ranks).  End-to-end through
    scale_to_rank with the agg-computed integer bounds, all 25 brands
    must hold distinct ranks."""
    from bigdatastructure_a5_spark.operators.layout import (
        scale_to_rank,
        string_surrogate,
    )

    brands = [f"Brand#{a}{b}" for a in "12345" for b in "12345"]
    df = spark.createDataFrame([(v,) for v in brands], "s string")
    keyed = df.select("s", string_surrogate(F.col("s")).alias("k"))
    agg = keyed.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).first()
    assert isinstance(agg.lo, int) and agg.lo.bit_length() >= 60
    ranks = {
        r.rank
        for r in keyed.select(
            scale_to_rank(F.col("k"), agg.lo, agg.hi).alias("rank")
        ).collect()
    }
    assert len(ranks) == 25, f"expected 25 distinct ranks, got {len(ranks)}"
    # float bounds take the legacy (lossy) path — documents the contrast
    lossy = {
        r.rank
        for r in keyed.select(
            scale_to_rank(F.col("k"), float(agg.lo), float(agg.hi)).alias(
                "rank"
            )
        ).collect()
    }
    assert len(lossy) < 25


def test_zorder_prunes_string_dimension(spark, tmp_path):
    """The VERDICT r9 item 4 case: a (brand-like string, numeric) 2-D box
    must prune on BOTH dimensions under a string Z-order key — strictly
    fewer row groups hit than a numeric-only single-column sort, for both
    string methods.  The string is high-cardinality (400 distinct) with a
    shared 'cat' prefix so the prefix fold has to spread on the suffix."""
    from bigdatastructure_a5_spark.operators.layout import zorder_cluster

    n = 256 * 256
    grid = spark.range(n).select(
        F.format_string("cat%03d", (F.col("id") % 400).cast("int")).alias(
            "brand"
        ),
        (F.col("id") / 400).cast("long").alias("v"),
    )
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = spark.conf.get(key)
    spark.conf.set(key, "5000")
    dirs = {}
    try:
        for method in ("prefix", "dict"):
            d = str(tmp_path / f"z_{method}")
            zorder_cluster(
                grid, ["brand", "v"], n_files=64, string_method=method
            ).write.parquet(d)
            dirs[method] = d
        sdir = str(tmp_path / "sorted_v")
        grid.repartitionByRange(64, "v").sortWithinPartitions(
            "v"
        ).write.parquet(sdir)
    finally:
        spark.conf.set(key, prev)

    def hit(dirname, blo, bhi, vlo, vhi):
        cnt = tot = 0
        for f in Path(dirname).glob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                cols = {
                    md.row_group(g).column(i).path_in_schema: md.row_group(
                        g
                    ).column(i).statistics
                    for i in range(md.row_group(g).num_columns)
                }
                tot += 1
                b, v = cols["brand"], cols["v"]
                if not (
                    b.max < blo or b.min > bhi or v.max < vlo or v.min > vhi
                ):
                    cnt += 1
        return cnt, tot
    # box: ~1/8 of the brand range x ~1/8 of the v range (1/64 of the
    # area — the v-sorted layout must read ~8 of 64 groups, the z-order
    # ones only the handful whose 2-D min/max box intersects)
    box = ("cat000", "cat049", 0, 19)
    s_hit, s_tot = hit(sdir, *box)
    for method, d in dirs.items():
        z_hit, z_tot = hit(d, *box)
        assert z_tot >= 64
        assert z_hit < s_hit, (method, z_hit, s_hit)
        # both layouts store identical data
        assert (
            spark.read.parquet(d).orderBy("brand", "v").collect()
            == spark.read.parquet(sdir).orderBy("brand", "v").collect()
        )


def test_surrogate_ranks_survive_sub_ulp_span(spark):
    """Bounds near 2^62 that differ by LESS than one double ULP (~1024):
    a float degeneracy test would call the column degenerate and rank
    everything 0 — the exact-integer guard must separate them instead.
    Strings sharing their first 8 chars and differing only in char 9."""
    from bigdatastructure_a5_spark.operators.layout import (
        scale_to_rank,
        string_surrogate,
    )

    vals = [f"PART0000{d}" for d in "123456789"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    keyed = df.select("s", string_surrogate(F.col("s")).alias("k"))
    agg = keyed.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).first()
    assert 0 < agg.hi - agg.lo < 1024  # sub-ULP span at this magnitude
    assert float(agg.hi) - float(agg.lo) == 0.0  # float compare is blind
    ranks = {
        r.rank
        for r in keyed.select(
            scale_to_rank(F.col("k"), agg.lo, agg.hi).alias("rank")
        ).collect()
    }
    assert len(ranks) == 9


def test_integer_bounds_over_double_column_do_not_truncate(spark):
    """Integer literals are the natural way to write bounds over a
    double column — the exact-int branch must not cast the column to
    bigint (which would collapse every value in [0,1) to rank 0)."""
    from bigdatastructure_a5_spark.operators.layout import scale_to_rank

    df = spark.createDataFrame(
        [(0.1,), (0.9,), (5.0,), (9.9,)], "v double"
    )
    ranks = [
        r.rank
        for r in df.select(
            scale_to_rank(F.col("v"), 0, 10).alias("rank")
        ).collect()
    ]
    assert len(set(ranks)) == 4  # 0.1 and 0.9 must not collapse together
    assert ranks == sorted(ranks)


def test_zorder_boolean_column_routes_to_double_path(spark):
    """ADVICE r11 low: Python bools pass isinstance(..., int), but a
    BooleanType column cannot subtract a bigint literal — boolean
    min/max bounds must take the double path (where the column is cast
    before arithmetic).  False ranks low, True ranks high, and the key
    builds without an analysis error."""
    df = spark.createDataFrame(
        [(1, False), (2, True), (3, False), (4, True)],
        "id bigint, flag boolean",
    )
    keyed = with_zorder_key(df, ["id", "flag"], key_col="zorder_key")
    rows = {r.id: r for r in keyed.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # the boolean dimension separates: among equal-id bits, True sorts
    # above False in the interleaved key for the same id rank ordering
    assert rows[1].zorder_key != rows[2].zorder_key
