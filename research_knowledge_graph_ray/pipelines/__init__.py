"""End-to-end pipelines (construction, queries) and the sequential test oracle."""
