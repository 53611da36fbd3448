"""bigdatastructure_a5_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `maedh45879/BigDataStructure_A5` (a distributed-document-database
query *cost simulator*), re-expressed as **real executable Spark queries**:

- equality-predicate filters, projections (reference `challenge/planner.py`,
  `challenge/simulator.py`) -> DataFrame filter/select (operators.filters)
- inner equi-joins, filter-then-join, multi-way joins, join-after-aggregate
  (reference `challenge/simulator.py:202-247`, `chapter5/simulator.py:177-240`)
  -> DataFrame joins with broadcast/co-partition strategies (operators.joins)
- group-by aggregation with partial/shuffle/final phases (reference
  `query_simulator/aggregate.py:166-274`) -> Spark HashAggregate
  (operators.aggregates)
- denormalization (embedding) + join elimination (reference
  `challenge/loader.py:109-146`, `challenge/planner.py:168-222`) -> real
  variant-table generation and routing (operators.denormalize)
- workload cost accounting + leaderboard (reference `challenge/costs.py`,
  `challenge/run.py:104-118`) -> SparkListener/plan metrics with the same
  time/carbon/price constants (plans.metrics, plans.workload)

Plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing, streaming) the reference lacks.

Everything is designed for a 1000-executor cluster reading ~100 TB even though
tests run on local[32]: declarative DataFrame plans (Catalyst pushdown/pruning),
broadcast for dimension tables, partial aggregation, no row-at-a-time Python
UDFs in hot paths, Arrow-batched pandas UDFs where Python is unavoidable.
"""

__version__ = "0.1.0"

from bigdatastructure_a5_spark.session import get_spark  # noqa: F401
from bigdatastructure_a5_spark.catalog import load_tables, register_views  # noqa: F401
