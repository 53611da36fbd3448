"""Shared helpers for the parquet-backed streaming state stores
(streaming/packing.py, streaming/dedup.py).

The one subtlety both stores share: the "is this the first batch?"
probe must be a Spark-side read attempt (the state dir is an hdfs://
or s3:// path the driver's local filesystem cannot see), and it must
distinguish PATH-NOT-FOUND from every OTHER analysis failure.  A bare
``except AnalysisException`` treats a corrupt/empty/unreadable state
dir as "first batch" and silently restarts the state from zero — for
the packer that means overlapping chunk ids, for dedup a permanently
disabled cross-batch check (ADVICE r10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_path_not_found(e: Exception) -> bool:
    # PySpark 4 exposes the error class via getCondition() (getErrorClass
    # is its deprecated alias); fall back to the message for older builds
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:  # noqa: BLE001 — any probe failure → message path
            continue
        if cond is not None:
            return cond == "PATH_NOT_FOUND"
    return "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)


def read_state_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet(path)``, returning None ONLY when the path
    does not exist (the legitimate first-batch case).  Any other
    ``AnalysisException`` — empty dir ("Unable to infer schema"), schema
    drift, permission faults mapped to analysis errors — re-raises: a
    state dir that exists but cannot be read is corruption to surface,
    not a signal to silently restart state from zero."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if _is_path_not_found(e):
            return None
        raise
