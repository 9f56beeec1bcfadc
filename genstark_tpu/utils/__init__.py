"""Shared utilities: timed logger (the reference's tracing/profiling subsystem,
SURVEY.md section 5) and small math helpers."""

from __future__ import annotations

import math
import time
from typing import Optional


class Logger:
    """Timed step logging with nested sub-logs — behavioral equivalent of
    /root/reference/lib/utils/Logger.ts (produces the canonical output shown
    at README.md:61-89)."""

    def __init__(self, enable_sub_logs: bool = True, prefix: str = ""):
        self.enable_sub_logs = enable_sub_logs
        self.prefix = prefix
        self._starts = {}
        self._lasts = {}

    def start(self, message: Optional[str] = None, prefix: str = ""):
        now = time.monotonic()
        label = object()
        self._starts[label] = now
        self._lasts[label] = now
        if message:
            print(self.prefix + message)

        def log(message: str):
            self._log(label, prefix, message)
        log._label = label
        return log

    def sub(self, message: Optional[str] = None):
        if self.enable_sub_logs:
            return self.start(message, prefix="  ")
        return _noop_log

    def done(self, log, message: Optional[str] = None):
        if log is _noop_log:
            return
        label = getattr(log, "_label", None)
        if label is None:
            return
        if message:
            elapsed = (time.monotonic() - self._starts[label]) * 1000
            print(f"{self.prefix}{message} in {elapsed:.0f} ms")
        self._starts.pop(label, None)
        self._lasts.pop(label, None)

    def _log(self, label, prefix, message):
        now = time.monotonic()
        elapsed = (now - self._lasts[label]) * 1000
        self._lasts[label] = now
        print(f"{self.prefix}{prefix}{message} ({elapsed:.0f} ms)")


def _noop_log(message: str):
    pass


class NoopLogger(Logger):
    def __init__(self):
        super().__init__(False)

    def start(self, message=None, prefix=""):
        return _noop_log

    def sub(self, message=None):
        return _noop_log

    def done(self, log, message=None):
        pass


noop_logger = NoopLogger()


def is_power_of_2(value: int) -> bool:
    return value != 0 and (value & (value - 1)) == 0


def pow_log2(base: float, exponent: int) -> float:
    """Exact-ish security arithmetic (/root/reference/lib/utils/index.ts:23-30):
    factor powers of two out of the exponent to avoid float overflow."""
    twos = 0
    while exponent % 2 == 0:
        twos += 1
        exponent //= 2
    return (2 ** twos) * math.log2(base ** exponent)


def inline_vector(values) -> str:
    """Render ints as an AirScript vector literal
    (/root/reference/lib/utils/inliners.ts `inline.vector`)."""
    return "[" + ", ".join(str(int(v)) for v in values) + "]"


def inline_matrix(rows) -> str:
    """Render ints as an AirScript matrix literal
    (/root/reference/lib/utils/inliners.ts `inline.matrix`)."""
    return "[" + ", ".join(inline_vector(r) for r in rows) + "]"
