"""Utilities: image IO, checkpointing, metrics/timing."""
