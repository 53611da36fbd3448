"""Source-side loaders: parquet catalog (see catalog.py) and the reference's
JSON config formats (schemas, stats, denormalizations, queries)."""
