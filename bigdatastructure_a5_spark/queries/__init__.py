"""Named queries over the driver fixtures, grouped by scope:

- parity:          SURVEY.md §2 operator inventory (O1-O22 analogues)
- pipeline:        LLM-training-data extensions (dedup/similarity/text)
- events_queries:  event-stream analytics (batch form of streaming ops)
"""
