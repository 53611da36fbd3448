"""Filters, projections, scan-strategy notes (reference O1-O7).

Reference semantics being reproduced (SURVEY.md §2.2):

- O1 conjunctive equality filter: `challenge/planner.py:29-49` parses
  ``WHERE f1 = v1 AND f2 = v2``; `challenge/simulator.py:42-67` estimates
  output as docs x Π(1/NDV).  Here: a real ``df.filter`` conjunction —
  Catalyst's FilterEstimation implements the very same 1/NDV model when CBO
  stats exist, and Parquet predicate pushdown makes the scan skip row groups.
- O2/O3/O4 scan-strategy selection (shard / index / full,
  `challenge/planner.py:115-124`): in Spark this is *physical design*, not a
  rule — partition pruning on ``partitionBy`` layouts covers "shard", Parquet
  min/max row-group skipping approximates "index" (no secondary indexes in
  Spark; documented deviation), full scan otherwise.  The denormalization
  workbench (operators.denormalize) writes layouts that trigger these.
- O5 projection (`challenge/simulator.py:28-39`): ``df.select`` — and unlike
  the reference's row-store model where projection never reduces scan cost,
  columnar Parquet prunes unread columns at the scan (strict improvement).
- O6 literal typing (`challenge/planner.py:36-46`): Python-typed ``F.lit``.
- O7 filter over intermediate result (`chapter5/simulator.py:102-131`):
  ordinary chained transformation.

At 100 TB: every helper here is a declarative expression, so pushdown,
column pruning and partition pruning are Catalyst's job; check with
``df.explain()`` that ``PushedFilters`` / ``ReadSchema`` reach the scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eq_filter(df: DataFrame, predicates: Mapping[str, object]) -> DataFrame:
    """Conjunctive equality filter (O1).  ``predicates`` maps column -> literal.

    Values are Python-typed (O6); nested struct paths ("product.brand") work
    because ``F.col`` resolves dotted paths.
    """
    cond: Column | None = None
    for field, value in predicates.items():
        clause = F.col(field) == F.lit(value)
        cond = clause if cond is None else (cond & clause)
    return df if cond is None else df.filter(cond)


def project(df: DataFrame, fields: Sequence[str | Column]) -> DataFrame:
    """Projection (O5). Empty list -> whole document, like the reference
    (`challenge/simulator.py:28-39`)."""
    if not fields:
        return df
    return df.select(*fields)
