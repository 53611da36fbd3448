"""Named-query registry — the driver-facing catalog of implemented operators.

The reference keeps a hardcoded registry of query specs
(`/root/reference/query_simulator/queries.py:9-125` ``default_queries``); this
is its executable analogue: every SURVEY.md §2 operator gets a named query
(builder over the driver's parquet fixtures) plus, where SQL-expressible, a
DuckDB oracle string with IDENTICAL column names/types so the driver's
row-count + schema + value-hash gate passes.

Cross-engine determinism rules used throughout (see functions/numeric.py):
- never hash a raw double SUM/AVG — exact decimal sums cast to double;
- per-row double arithmetic (a*b, 1-x) is IEEE-deterministic and safe;
- LIMIT/top-k only with a unique total order;
- md5 for content hashes (identical hex in Spark and DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    """One registered query: Spark builder + optional DuckDB oracle SQL."""

    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder.

    Builders are wrapped so the package is shipped to Python workers first
    (``session.ensure_workers_can_import``): the driver harness may create
    the SparkSession from ANY working directory, and pandas-UDF closures
    unpickle module references on the worker side."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from bigdatastructure_a5_spark.session import (
                ensure_generate_filter_exclusion,
                ensure_workers_can_import,
            )

            ensure_workers_can_import(spark)
            # the driver harness runs these on ITS OWN session: make the
            # optimizer contract (no InferFiltersFromGenerate) hold there
            # too — a dynamic conf, merged with the session's own list
            ensure_generate_filter_exclusion(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # functools convention: inspect.unwrap works
        if name in REGISTRY:
            # a silent overwrite would drop a query from the driver's gate
            # (last import wins) — collisions must be loud
            raise ValueError(f"duplicate registry query name: {name!r}")
        REGISTRY[name] = QueryDef(wrapped, oracle, (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: qd.builder for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from bigdatastructure_a5_spark.queries import (  # noqa: F401
        denorm,
        events_queries,
        mixture_queries,
        parity,
        pipeline,
        quant_queries,
        sql_surface,
    )

    _LOADED = True
