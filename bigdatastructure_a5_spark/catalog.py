"""Table catalog: load the driver's parquet fixtures and register views.

The reference's ``DatabaseModel`` is a dict of collections built from JSON
schema/stats files (`/root/reference/main.py:126-134`,
`/root/reference/challenge/loader.py:149-182`).  Here a "database" is a set of
DataFrames registered as temp views; statistics come from the data itself
(Parquet footers + optional ANALYZE), not from a stats.json.

Scale note: each table is a plain ``spark.read.parquet`` — on a cluster this
is a distributed columnar scan with predicate pushdown and column pruning for
free, replacing the reference's whole-document scan cost model
(`challenge/simulator.py:69-70`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: canonical table names produced by the driver (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _read_parquet_nanos_safe(spark, table_path(sf_dir, name))
    return df


def local_table_path(sf_dir: str, name: str) -> str | None:
    """The table's path IF it is a plain local file, else None.

    Gate for driver-side metadata fetches (a query vector, a 16-row
    codebook): when the corpus sits on the driver's own filesystem, a
    pyarrow point-read costs ~10 ms where the equivalent Spark job pays
    ~300 ms of scheduling for the same handful of rows.  Any non-local
    URI (s3://, hdfs://, ...) returns None and the caller keeps the
    distributed fetch."""
    p = table_path(sf_dir, name)
    # a Spark-written table is a DIRECTORY of part files — pyarrow reads
    # those as a dataset just like a single file, so both count as local
    return p if (os.path.isfile(p) or os.path.isdir(p)) else None


def table_fingerprint(sf_dir: str, name: str) -> str:
    """Cheap data-identity token for session temp-view cache keys.

    A temp view over a parquet read freezes Spark's resolved file index
    (path, length, modification time); a view keyed only on parameters
    would keep serving that stale index after the fixture is regenerated
    mid-session — FileReadException at best, silently scoring the old
    corpus at worst.  Hashing the file stats into the key makes any
    rewrite produce a fresh view.  Non-local URIs return a constant (no
    staleness guard — a production corpus is immutable-by-convention and
    governed by Spark's own file index refresh semantics)."""
    import hashlib

    path = local_table_path(sf_dir, name)
    if path is None:
        return "remote"
    parts = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            parts.append(f"{f}|{st.st_size}|{st.st_mtime_ns}")
    else:
        st = os.stat(path)
        parts.append(f"{path}|{st.st_size}|{st.st_mtime_ns}")
    return hashlib.md5("||".join(parts).encode()).hexdigest()[:12]


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns Spark 4 rejects.

    Spark has no nanosecond timestamp type (TimestampType is microseconds);
    files with INT64 TIMESTAMP(NANOS) (e.g. the events fixture, pandas default)
    raise PARQUET_TYPE_ILLEGAL.  Fallback: read nanos as LongType via the
    legacy conf, then convert with integer division — ``ts DIV 1000`` — NOT
    double division, which silently corrupts epoch-nanos (~1.7e18 exceeds
    a double's 53-bit mantissa, drifting the result by hundreds of ns).
    Truncating division matches how DuckDB/Arrow cast ns->us.
    """
    from pyspark.sql import functions as F

    nanos_cols = _nanos_columns(path)
    if not nanos_cols:
        return spark.read.parquet(path)
    # left set for the session: execution of the (lazy) scan below re-reads
    # the conf, and it only affects nanos-typed files — which we always
    # convert right here.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def _nanos_columns(path: str) -> list[str]:
    """Columns typed timestamp[ns] in the parquet footer (cheap local read;
    checked upfront so the Spark scan never hits PARQUET_TYPE_ILLEGAL).
    Non-local URIs (s3://, hdfs://) return [] — the driver's pyarrow may
    lack the credentials/filesystem Spark has, and a production corpus is
    written micros-typed; the plain Spark read stays the behavior there."""
    import pyarrow.parquet as pq

    if not os.path.exists(path):
        return []
    p = path
    if os.path.isdir(path):
        inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not inner:
            return []
        p = os.path.join(path, inner[0])
    return [
        f.name for f in pq.read_schema(p) if str(f.type).startswith("timestamp[ns")
    ]


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load every fixture table that exists under ``sf_dir``.

    Existence is probed with ``os.path.exists`` only for LOCAL paths; a
    URI scheme (s3://, hdfs://, ...) is never a local path, so gating on
    it would silently load zero tables from a remote corpus.  Remote
    tables are read through Spark (which holds the credentials/filesystem
    the driver's os module does not), and a missing one is skipped with
    the same semantics as a missing local fixture."""
    out: dict[str, DataFrame] = {}
    remote = "://" in sf_dir
    for name in names:
        path = table_path(sf_dir, name)
        if remote:
            from pyspark.errors import AnalysisException

            try:
                out[name] = _read_parquet_nanos_safe(spark, path)
            except AnalysisException as exc:
                # Only "table absent" is skippable.  A corrupt footer,
                # unsupported type, or access failure also surfaces as an
                # AnalysisException; swallowing those would hand the caller
                # a silently-incomplete table dict on a remote corpus.
                cond = (
                    exc.getCondition()
                    if hasattr(exc, "getCondition")
                    else exc.getErrorClass()
                ) or ""
                if "PATH_NOT_FOUND" in cond:
                    continue
                raise
        elif os.path.exists(path):
            # the SAME nanos-safe reader load_table uses — a raw read would
            # crash on TIMESTAMP(NANOS) fixtures (or, with the legacy conf
            # already set session-wide, silently register ts as raw nanos)
            out[name] = _read_parquet_nanos_safe(spark, path)
    return out


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` works against the
    same names DuckDB pre-registers (driver contract in ``__spark_entry__``)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def analyze_tables(spark: SparkSession, names: tuple[str, ...] = TABLES) -> None:
    """Compute CBO statistics for saved tables (reference stats.json analogue,
    `challenge/loader.py:53-76`).  Only applies to catalog tables, not temp
    views; used by the denormalization workbench after ``saveAsTable``.

    Temp views are filtered explicitly — listTables returns them too, and
    ANALYZE on an UNCACHED temp view is an AnalysisException in Spark, so
    calling this after register_views would otherwise crash on the first
    fixture view.  One listTables call, not one per name."""
    wanted = set(names)
    for t in spark.catalog.listTables():
        if t.name in wanted and not t.isTemporary:
            spark.sql(
                f"ANALYZE TABLE {t.name} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
