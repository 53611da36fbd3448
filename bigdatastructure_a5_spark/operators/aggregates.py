"""Aggregation operators (reference O16-O20, SURVEY.md §2.4).

The reference *models* map -> shuffle(partials) -> reduce
(`query_simulator/aggregate.py:166-274`); Spark's HashAggregate(partial) ->
Exchange -> HashAggregate(final) IS that model, executed for real.  Partial
(map-side) aggregation means the shuffle carries one row per (partition,
group), not per input row — the property the reference prices at
``groups x shards x partial_size`` (`aggregate.py:110-120`).

- O16 group-by aggregate: ``df.groupBy(keys).agg(...)``.
- O17 shuffle-free aggregation on the partition key
  (`query_simulator/aggregate.py:218-236`): groupBy on a bucketed table's
  bucket key produces no Exchange — the workbench writes such layouts and
  tests assert the plan.
- O18 group-cardinality estimation (`challenge/simulator.py:128-141`):
  Catalyst CBO AggregateEstimation (same Π NDV capped formula); we also just
  count the real result.
- O19 aggregate functions: real ``sum/avg/count/min/max`` — a capability
  upgrade over the reference, which only sizes an 8-byte placeholder
  (`query_simulator/aggregate.py:76-86`).
- O20 pre-aggregation filter (`query_simulator/aggregate.py:24-33`):
  ``df.filter(...).groupBy(...)``.

Deterministic numeric results use functions.numeric (exact decimal sums) so
the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def group_agg(
    df: DataFrame,
    keys: Sequence[str | Column],
    aggs: Sequence[Column],
    pre_filter: Column | None = None,
) -> DataFrame:
    """O16/O20: optional equality pre-filter, then group-by aggregate.

    Every agg expression must carry ``.alias(...)`` — the driver's oracle
    compare matches column names.
    """
    if pre_filter is not None:
        df = df.filter(pre_filter)
    return df.groupBy(*keys).agg(*aggs)
