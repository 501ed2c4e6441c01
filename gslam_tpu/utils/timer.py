"""Named-section stopwatch registry.

Re-designs the reference's global ``Timer`` (``GSLAM/core/Timer.h``: named
sections with enter/leave, accumulating call count / mean / min / max, and a
statistics table dumped at exit) for a JAX host process.  Device work is
asynchronous under JAX, so sections that time device computation must pass
the result through ``block=...`` (we call ``jax.block_until_ready``) for the
wall time to be meaningful.
"""

from __future__ import annotations

import atexit
import math
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class _Section:
    count: int = 0
    total: float = 0.0
    min: float = math.inf
    max: float = 0.0
    _enter_t: Optional[float] = None

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class Timer:
    """Accumulating named-section timer (reference ``GSLAM/core/Timer.h``).

    Usage mirrors the reference's ``timer.enter("x")/timer.leave("x")`` plus
    a context-manager form::

        with timer.section("track"):
            out = step(...)
            timer.block(out)          # sync device before section closes
    """

    def __init__(self, dump_at_exit: bool = False):
        self._sections: Dict[str, _Section] = {}
        if dump_at_exit:
            atexit.register(self.dump)

    def enter(self, name: str) -> None:
        sec = self._sections.setdefault(name, _Section())
        sec._enter_t = time.perf_counter()

    def leave(self, name: str) -> None:
        sec = self._sections.get(name)
        if sec is None or sec._enter_t is None:
            raise KeyError(f"timer.leave({name!r}) without matching enter")
        dt = time.perf_counter() - sec._enter_t
        sec._enter_t = None
        sec.count += 1
        sec.total += dt
        sec.min = min(sec.min, dt)
        sec.max = max(sec.max, dt)

    @contextmanager
    def section(self, name: str):
        self.enter(name)
        try:
            yield self
        finally:
            self.leave(name)

    @staticmethod
    def block(tree: Any) -> Any:
        """Synchronize device work so enclosing sections time real latency."""
        import jax

        return jax.block_until_ready(tree)

    def stats(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "count": s.count,
                "total": s.total,
                "mean": s.mean,
                "min": s.min if s.count else 0.0,
                "max": s.max,
            }
            for name, s in self._sections.items()
        }

    def reset(self) -> None:
        self._sections.clear()

    def table(self) -> str:
        """Statistics table in the shape of the reference's exit dump."""
        rows = ["{:<28s} {:>8s} {:>12s} {:>12s} {:>12s} {:>12s}".format(
            "section", "count", "total(s)", "mean(ms)", "min(ms)", "max(ms)")]
        for name, s in sorted(self._sections.items()):
            rows.append(
                "{:<28s} {:>8d} {:>12.4f} {:>12.4f} {:>12.4f} {:>12.4f}".format(
                    name, s.count, s.total, s.mean * 1e3,
                    (s.min if s.count else 0.0) * 1e3, s.max * 1e3))
        return "\n".join(rows)

    def dump(self) -> None:
        if self._sections:
            print(self.table())


class TicToc:
    """Ad-hoc stopwatch (reference ``TicToc``): ``tic()`` then ``toc()``."""

    def __init__(self):
        self._t = time.perf_counter()

    def tic(self) -> None:
        self._t = time.perf_counter()

    def toc(self) -> float:
        return time.perf_counter() - self._t


#: process-global timer, like the reference's global ``timer`` object.
timer = Timer()
