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


def join_path(base: str, *parts: str) -> str:
    """URI-safe path join: ``pathlib.Path`` collapses the ``//`` in
    ``s3a://bucket/...`` to ``s3a:/bucket/...`` (an authority-less URI
    Hadoop cannot resolve), so state paths join as plain strings."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def _fs_for(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Hadoop Path) for ``path`` — driver-side
    filesystem ops that work on file:/, hdfs://, s3a://... alike,
    unlike pathlib/shutil which only see the driver's local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_for(spark, path)
    return bool(fs.exists(hpath))


def fs_delete(spark: SparkSession, path: str) -> None:
    fs, hpath = _fs_for(spark, path)
    fs.delete(hpath, True)  # recursive; False return = already gone


def fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, hsrc = _fs_for(spark, src)
    _, hdst = _fs_for(spark, dst)
    return bool(fs.rename(hsrc, hdst))
