"""Small shared runtime utilities."""

from __future__ import annotations

import atexit
from collections.abc import Callable
from typing import Any


class LastHandle:
    """Supersession holder for a per-operator resource (cached
    DataFrame, scratch/checkpoint dir): releasing the PREVIOUS
    instance when a new one replaces it bounds accumulation across
    repeated bench/verify runs, and the final instance is released at
    interpreter exit.

    `keep` > 1 retains that many generations before releasing — used
    where the previous generation's resource may still back a
    lazily-re-evaluated DataFrame held by the caller (scratch dirs).

    Release errors are swallowed: the classic failure is a stale
    handle from a stopped SparkSession (unpersist on a dead py4j
    gateway raises), which must not break the operator's first call
    in the next session.
    """

    def __init__(self, release: Callable[[Any], None], keep: int = 1):
        self._release = release
        self._keep = max(1, keep)
        self._values: list[Any] = []
        atexit.register(self.clear)

    def replace(self, value: Any) -> None:
        self._values.append(value)
        while len(self._values) > self._keep:
            self._release_one(self._values.pop(0))

    def current(self) -> Any | None:
        """The newest live value, or None — lets an operator serve a
        repeat call from its pinned resource instead of rebuilding."""
        return self._values[-1] if self._values else None

    def clear(self) -> None:
        while self._values:
            self._release_one(self._values.pop())

    def _release_one(self, value: Any) -> None:
        try:
            self._release(value)
        except Exception:
            pass
