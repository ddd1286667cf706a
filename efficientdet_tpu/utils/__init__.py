"""Utilities: torch checkpoint import, orbax checkpointing, visualization."""
