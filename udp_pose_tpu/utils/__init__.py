"""Utilities: logging, checkpointing, meters."""
