"""Utilities: image IO, configuration, logging, profiling, checkpointing."""
