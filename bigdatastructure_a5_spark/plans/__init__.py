"""Query-plan instrumentation, cost accounting, SQL front door, workload
harness — the reference's simulator/reporting stack over real Spark metrics."""
