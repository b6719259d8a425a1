"""Utilities: checkpointing, logging/observability, profiling."""
