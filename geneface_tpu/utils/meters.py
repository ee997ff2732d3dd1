"""Loss/metric meters and timing (capabilities of ``utils/commons/meters.py``)."""

from __future__ import annotations

import time
from collections import defaultdict

__all__ = ["AvgMeter", "MeterBank", "Timer"]


class AvgMeter:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MeterBank:
    """Named collection of AvgMeters; ``update({"loss": 0.1})`` style."""

    def __init__(self):
        self.meters: dict[str, AvgMeter] = defaultdict(AvgMeter)

    def update(self, values: dict, n: int = 1) -> None:
        for k, v in values.items():
            try:
                self.meters[k].update(float(v), n)
            except (TypeError, ValueError):
                pass

    def averages(self) -> dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self) -> None:
        self.meters.clear()


class Timer:
    """Accumulating named timer; usable as a context manager."""

    totals: dict[str, float] = defaultdict(float)

    def __init__(self, name: str = "t", enable: bool = True):
        self.name = name
        self.enable = enable

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if self.enable:
            Timer.totals[self.name] += time.time() - self.t0
