"""Utilities: timing, seeding, schedules, checkpointing."""

from .misc import CosineTempDecay, Stopwatch, seed_all

__all__ = ["Stopwatch", "seed_all", "CosineTempDecay"]
