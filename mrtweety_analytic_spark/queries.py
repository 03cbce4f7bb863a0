"""Assembled driver contract: importing this module registers every
operator (batch + streaming) into QUERIES / ORACLES.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES  # noqa: F401

# Population happens at import time.
from . import operators  # noqa: F401  (batch inventory)
from .streaming import queries as _streaming_queries  # noqa: F401
