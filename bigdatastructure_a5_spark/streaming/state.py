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


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, hpath = _fs_for(spark, path)
    fs.mkdirs(hpath)


def fs_size_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` (0 if missing) — a driver-side
    metadata listing, used to SIZE store rewrites: the partition count of
    a corpus-sized maintenance rewrite must scale with the store, not sit
    pinned at defaultParallelism (see streaming/dedup's rewrite_partitions
    note and EXPERIMENTS §22's superlinear knee)."""
    fs, hpath = _fs_for(spark, path)
    try:
        return int(fs.getContentSummary(hpath).getLength())
    except Exception:
        return 0


# ---------------------------------------------------------------------------
# Compaction machinery shared by the parquet state stores
# (streaming/packing.compact_state, streaming/dedup.compact_dedup_state).
#
# The swap protocol: write the compacted store COMPLETELY to
# ``<path>.compacting`` (a Spark write — ``_SUCCESS``-marked), delete the
# original, rename staging over it.  Crash between delete and rename
# leaves the staging dir in place; ``recover_interrupted_swap`` completes
# the rename, and until it runs ``guard_interrupted_compaction`` makes
# state READERS raise on the missing-store-with-staging shape instead of
# silently treating it as first-batch (packing from base 0 over real
# prior state = overlapping chunk ids).
#
# The LOCK protocol (VERDICT r11 item 3): the swap is not atomic against
# a concurrent append, so compaction and the foreachBatch writers
# exclude each other with two sentinel dirs under ``state_dir``:
#
#   _WRITER_ACTIVE           created by each batch body on entry,
#                            removed on exit;
#   _COMPACTION_IN_PROGRESS  created by compaction on entry, removed on
#                            exit.
#
# Each side creates ITS OWN sentinel first and only then checks for the
# other's (backing out its own on conflict) — in any interleaving of a
# racing writer and compactor at least one side sees the other's
# sentinel and raises BEFORE touching state, turning the silent-loss
# window into a loud error.  A sentinel left behind by a CRASHED batch
# blocks compaction until the operator confirms the stream is stopped
# and passes ``force=True``; a sentinel left by a crashed compaction is
# taken over by the re-run (re-running compact_state IS the documented
# repair).
# ---------------------------------------------------------------------------

COMPACTION_LOCK = "_COMPACTION_IN_PROGRESS"
WRITER_MARK = "_WRITER_ACTIVE"


def acquire_writer_mark(spark: SparkSession, state_dir: str) -> None:
    """Batch-body entry guard: mark the store as being written, then
    raise if a compaction holds the store (mark first — see the lock
    protocol note above)."""
    fs_mkdirs(spark, join_path(state_dir, WRITER_MARK))
    if fs_exists(spark, join_path(state_dir, COMPACTION_LOCK)):
        fs_delete(spark, join_path(state_dir, WRITER_MARK))
        raise RuntimeError(
            f"state store {state_dir} is being compacted "
            f"({COMPACTION_LOCK} present): a write now could land "
            "between the compaction's delete and rename and be lost "
            "silently — wait for the compaction to finish (it removes "
            "the lock), or delete the lock manually if it crashed"
        )


def release_writer_mark(spark: SparkSession, state_dir: str) -> None:
    fs_delete(spark, join_path(state_dir, WRITER_MARK))


def begin_compaction(
    spark: SparkSession, state_dir: str, force: bool = False
) -> None:
    """Compaction entry guard: take the lock, then raise if a writer is
    (or crashed while) active.  An EXISTING compaction lock is taken
    over silently — re-running compaction is the documented repair for
    a crashed one, and the writers it excludes stay excluded."""
    fs_mkdirs(spark, join_path(state_dir, COMPACTION_LOCK))
    if not force and fs_exists(spark, join_path(state_dir, WRITER_MARK)):
        fs_delete(spark, join_path(state_dir, COMPACTION_LOCK))
        raise RuntimeError(
            f"state store {state_dir} has an active writer "
            f"({WRITER_MARK} present): compacting under a live stream "
            "loses appends that land between the swap's delete and "
            "rename.  Stop the stream first; if the mark was left by a "
            "CRASHED batch (stream provably stopped), re-run with "
            "force=True"
        )


def end_compaction(spark: SparkSession, state_dir: str) -> None:
    fs_delete(spark, join_path(state_dir, COMPACTION_LOCK))


def staging_path(path: str) -> str:
    return path + ".compacting"


def recover_interrupted_swap(spark: SparkSession, path: str) -> None:
    """A previous compaction crashed between delete and rename: finish
    its rename before doing anything else.  Only a COMPLETE staging dir
    (``_SUCCESS`` present) is swapped in; an incomplete one is a crashed
    staging WRITE, deleted so the re-run starts clean."""
    stg = staging_path(path)
    if fs_exists(spark, path):
        # main store intact: any staging dir is pre-delete leftovers
        if fs_exists(spark, stg):
            fs_delete(spark, stg)
        return
    if fs_exists(spark, join_path(stg, "_SUCCESS")):
        fs_rename(spark, stg, path)


def swap_in_frame(
    spark: SparkSession,
    frame,
    path: str,
    partition_by: list[str] | None = None,
    op: str = "compaction",
) -> None:
    """Replace the store at ``path`` with ``frame``'s rows via the
    staging protocol.  The staging write fully materializes ``frame``
    BEFORE the original is deleted — callers whose frame READS ``path``
    (the compact-in-place shape) are safe as long as the frame is not
    re-evaluated after this call (do not return it).

    ``partition_by`` threads a ``partitionBy`` through the staging write
    (the bands store's bucket layout) so every state rewriter shares this
    ONE copy of the crash protocol (ADVICE r12 low: the dedup maintenance
    ops had inlined near-copies); ``op`` names the caller in the repair
    message."""
    stg = staging_path(path)
    # zstd for store rewrites (r15, guide §6): the stores are random
    # 64-bit hashes where zstd still beats snappy — measured on a 48M-row
    # bands store: 588 MB -> 475 MB (-19%) AND faster warm write
    # (7.6 -> 6.6s) and 2x faster full decode.  The top EXPERIMENTS §22
    # rung is write-bandwidth-bound, so bytes are wall there.
    # (sortWithinPartitions by the join key was measured too and REFUTED:
    # 628 MB — bigger — and slower; delta encoding needs parquet v2 pages
    # and sorted input, and lost to plain zstd as well.)
    writer = frame.write.mode("overwrite").option("compression", "zstd")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stg)
    fs_delete(spark, path)
    if not fs_rename(spark, stg, path):
        raise RuntimeError(
            f"{op}: rename {stg} -> {path} failed; the rewritten "
            "store is intact at the staging path — re-run "
            "compact_dedup_state / compact_state to complete the swap"
        )


def guard_interrupted_compaction(spark: SparkSession, path: str) -> None:
    """A missing store WITH a completed staging dir next to it is an
    interrupted compaction, not a first batch: proceeding as first-batch
    silently restarts state from zero over real prior state — raise and
    name the repair instead."""
    if fs_exists(spark, join_path(staging_path(path), "_SUCCESS")):
        raise RuntimeError(
            f"state store {path} is missing but {staging_path(path)} "
            "exists: a compaction was interrupted between delete and "
            "rename — re-run it (compact_state / compact_dedup_state) "
            "on this state_dir to complete the swap before resuming "
            "the stream"
        )


def last_committed_batch_id(
    spark: SparkSession, checkpoint_dir: str
) -> int | None:
    """Highest batch id with a commit marker in the streaming
    checkpoint's ``commits/`` log, or None when nothing has committed.
    This is the safe upper bound for state compaction: a batch WITHOUT
    a commit marker can still be redelivered, so its state rows must
    stay individually filterable by the strictly-earlier-batch_id rule
    (ADVICE r11 medium — folding a pending batch's carry into the
    sentinel row would re-base its retry by its own tokens)."""
    commits = join_path(checkpoint_dir, "commits")
    fs, hpath = _fs_for(spark, commits)
    if not fs.exists(hpath):
        return None
    best: int | None = None
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        body = name[1:] if name.startswith("-") else name
        if body.isdigit():
            v = int(name)
            if best is None or v > best:
                best = v
    return best
