"""User-defined function surface: vectorized pandas UDF, grouped-map UDAF
shape, and a Python UDTF.

The reference has no UDF surface at all (SURVEY.md §2.6); this module pins
down the three extension shapes Spark offers, with the scale rules applied:

- **Never** row-at-a-time Python UDFs in a hot path (10-100x slower than
  built-ins); every function here is Arrow-batched.
- A pandas UDF is still ~an order slower than a built-in expression — use
  one only when the logic genuinely needs numpy/pandas (the cosine candidate
  generator in operators/similarity.py is the canonical example).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


@pandas_udf(DoubleType())
def burstiness(values: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: per-value z-score-ish burstiness against
    the BATCH mean (demonstration of Arrow batch semantics — batch-relative
    statistics need a window/groupBy for global semantics)."""
    mu = values.mean()
    sd = values.std(ddof=0) or 1.0
    return (values - mu) / sd


def iqr_outlier_bounds(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map (applyInPandas) UDAF shape: per-group Tukey fences.
    Quartiles need the whole group in memory — exactly what applyInPandas
    provides (and why its groups must fit an executor; pre-aggregate first
    at 100 TB)."""

    def fences(pdf: pd.DataFrame) -> pd.DataFrame:
        q1 = pdf[value_col].quantile(0.25)
        q3 = pdf[value_col].quantile(0.75)
        iqr = q3 - q1
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "lo": [q1 - 1.5 * iqr],
                "hi": [q3 + 1.5 * iqr],
                "n": [len(pdf)],
            }
        )

    # the group column keeps its REAL type — hardcoding string would make
    # the Arrow conversion throw for any numeric key (int64 series into a
    # declared-string field).  Built as a StructType from the column's own
    # StructField, never a DDL string: a column name with DDL
    # metacharacters (spaces, backticks, commas) would break the parse.
    out_schema = StructType(
        [
            df.schema[group_col],
            StructField("lo", DoubleType()),
            StructField("hi", DoubleType()),
            StructField("n", LongType()),
        ]
    )
    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(fences, schema=out_schema)
    )


@udtf(returnType="piece: string, piece_no: int")
class SplitPieces:
    """Python UDTF (table function): one row per fixed-size piece of a
    string — the chunking shape used to split documents for embedding
    pipelines."""

    def eval(self, text: str, size: int):  # noqa: D102
        if text is None:
            return
        for i in range(0, len(text), size):
            yield text[i : i + size], i // size


def chunk_documents(df: DataFrame, text_col: str = "text", size: int = 100) -> DataFrame:
    """Apply the UDTF laterally: (doc columns) x chunk rows."""
    return df.lateralJoin(
        SplitPieces(F.col(text_col).outer(), F.lit(size))
    )
