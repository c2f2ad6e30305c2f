"""Checkpointing: Orbax-based train-state persistence + torch converter."""
