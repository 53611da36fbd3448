"""Vector math over ``array<float>`` embedding columns — pure JVM expressions.

Used by the similarity-search operators (BASELINE.json extension scope).  All
of these compile to Catalyst higher-order functions (``zip_with`` /
``aggregate``), i.e. they run inside whole-stage codegen with NO Python in the
loop — at 100 TB this is the difference between a scan-speed operator and a
10-100x slower UDF path.

Determinism: ``aggregate`` folds the array left-to-right, so the accumulation
order is the array order on every engine/partition — per-row results are
bit-stable.  For cross-engine oracle comparison we still round scores, since
DuckDB's ``list_cosine_similarity`` may accumulate differently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]*b[i] in double precision, array-order accumulation."""
    prod = F.zip_with(_as_col(a), _as_col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    c = _as_col(a)
    sq = F.transform(c, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
