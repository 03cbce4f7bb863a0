"""Structured Streaming rebuild of the reference pipeline (R1–R11)
plus the generalized streaming operator surface (SURVEY.md §7.4).
"""

from . import pipeline, sink, queries  # noqa: F401
