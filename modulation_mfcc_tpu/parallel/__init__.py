"""Mesh-sharded batching, streaming, and prefetch (no reference counterpart —
SURVEY.md §2e: the parallelism layer the reference lacks entirely)."""
