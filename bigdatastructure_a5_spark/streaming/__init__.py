"""Structured Streaming operators over the events fixture.

The reference has NO streaming constructs (SURVEY.md §1.1 — verified: no
watermark/window/stream anywhere); this package is extension scope.  Each
streaming op has a batch twin in queries/events_queries.py computed with the
same expressions, which is how correctness is established (stream over the
finite fixture == batch result).
"""

from bigdatastructure_a5_spark.streaming.events import (  # noqa: F401
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
)
