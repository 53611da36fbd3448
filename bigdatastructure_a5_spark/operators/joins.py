"""Join operators (reference O8-O15, SURVEY.md §2.3).

Reference semantics reproduced as real Spark joins:

- O8 inner equi-join (`challenge/planner.py:52-112`): ``df.join(..., "inner")``.
- O9 join cost model (`challenge/simulator.py:202-247`): physical strategy is
  Catalyst's job (SortMergeJoin vs BroadcastHashJoin); the reference's
  1/max(NDV) selectivity formula IS Catalyst CBO JoinEstimation.
- O10 co-partitioned shuffle-free join (`challenge/planner.py:252-268`):
  bucketed tables -> SortMergeJoin with no Exchange; the workbench writes
  them, tests assert the plan shape.
- O11 filter-then-join (`challenge/planner.py:224-250`): Catalyst pushes
  predicates below joins automatically; helpers here just compose.
- O12 join-after-aggregate (`chapter5/planner.py:58-77`): the aggregated side
  is small -> explicitly broadcast the dimension side.
- O13 multi-way filtered join (`query_simulator/queries.py:89-123`): chained
  joins, dimension sides broadcast.
- O14/O15 join elimination via embedding (`challenge/planner.py:168-222`):
  lives in operators.denormalize (variant routing), not here.

Scale guidance baked in: ``dim_join`` broadcasts the small side explicitly so
a 100 TB fact table never shuffles to meet a 100 MB dimension; multi-way joins
order fact-first so AQE can re-plan the rest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """O8: inner equi-join on same-named key(s) (USING form, one key column)."""
    keys = [on] if isinstance(on, str) else list(on)
    return left.join(right, on=keys, how=how)


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Fact-to-dimension join with an explicit broadcast hint (O9/O13 scale
    path): at 100 TB the fact side must never shuffle for a small dimension."""
    keys = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), on=keys, how=how)


def filter_then_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_filter=None,
    right_filter=None,
    how: str = "inner",
) -> DataFrame:
    """O11: per-side filters before the join.  Catalyst would push these down
    from after the join anyway; writing them first mirrors the reference plan
    (`challenge/planner.py:224-250`) and keeps intent obvious."""
    if left_filter is not None:
        left = left.filter(left_filter)
    if right_filter is not None:
        right = right.filter(right_filter)
    return equi_join(left, right, on, how)
