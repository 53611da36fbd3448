"""Document-sizing engine (reference O25) + the real-vs-modeled duality.

The reference sizes everything analytically from schemas: primitives by type
(integer/number/bool/null 8 B, string 80 B, date 20 B), a 12-byte key
overhead per object property, arrays as avg_length x element_size
(`/root/reference/main.py:42-106`; per-field overrides
`challenge/models.py:20-36`).  Those constants ARE the spec of its data
model, so they are reproduced here for parity — alongside the real
measurements (Parquet bytes, CBO stats) that supersede them in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    NullType,
    StringType,
    StructType,
    TimestampType,
)

# reference byte weights (main.py:42-52) and per-property overhead (:70-79)
PRIMITIVE_BYTES: dict[type, float] = {
    LongType: 8.0,
    IntegerType: 8.0,
    DoubleType: 8.0,
    FloatType: 8.0,
    BooleanType: 8.0,
    NullType: 8.0,
    StringType: 80.0,
    DateType: 20.0,
    TimestampType: 20.0,
}
KEY_OVERHEAD_BYTES = 12.0


def field_size_bytes(
    dt: DataType,
    path: str = "",
    avg_array_lengths: dict[str, float] | None = None,
    avg_sizes: dict[str, float] | None = None,
) -> float:
    """Modeled size of one value of ``dt`` (reference main.py:42-89):
    recursive struct sizing with key overhead, array length multipliers from
    stats, per-field avg_size overrides (challenge/loader.py:29-32)."""
    if avg_sizes and path in avg_sizes:
        return float(avg_sizes[path])
    if isinstance(dt, StructType):
        return sum(
            KEY_OVERHEAD_BYTES
            + field_size_bytes(
                f.dataType,
                f"{path}.{f.name}" if path else f.name,
                avg_array_lengths,
                avg_sizes,
            )
            for f in dt.fields
        )
    if isinstance(dt, ArrayType):
        length = (avg_array_lengths or {}).get(path, 1.0)
        return length * field_size_bytes(
            dt.elementType, path, avg_array_lengths, avg_sizes
        )
    return PRIMITIVE_BYTES.get(type(dt), 8.0)


def document_size_bytes(
    schema: StructType,
    avg_array_lengths: dict[str, float] | None = None,
    avg_sizes: dict[str, float] | None = None,
) -> float:
    """Modeled whole-document size (reference main.py:92-106)."""
    return field_size_bytes(schema, "", avg_array_lengths, avg_sizes)


def modeled_vs_real(df: DataFrame, row_count: int | None = None) -> dict[str, float]:
    """The duality the reference can't have: analytic estimate vs what Spark
    actually reads.  ``real_bytes`` from CBO plan stats (Parquet-derived)."""
    from bigdatastructure_a5_spark.plans.metrics import estimated_stats

    n = row_count if row_count is not None else df.count()
    modeled = document_size_bytes(df.schema) * n
    real = estimated_stats(df)["size_bytes"]
    return {
        "rows": float(n),
        "modeled_bytes": modeled,
        "real_bytes": real,
        "model_over_real": modeled / real if real else float("inf"),
    }
