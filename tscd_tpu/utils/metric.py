"""Windowed meters + simple logging (reference: yolox/utils/metric.py:54,
101 AverageMeter/MeterBuffer and logger.py)."""

import functools
import time
from collections import defaultdict, deque
from typing import Dict


class AverageMeter:
    """Track a series of values with a window (metric.py:54)."""

    def __init__(self, window_size: int = 50):
        self._deque = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        self._deque.append(float(value))
        self._count += 1
        self._total += float(value)

    @property
    def median(self):
        if not self._deque:
            return 0.0
        d = sorted(self._deque)
        return d[len(d) // 2]

    @property
    def avg(self):
        return sum(self._deque) / max(len(self._deque), 1)

    @property
    def global_avg(self):
        return self._total / max(self._count, 1)

    @property
    def latest(self):
        return self._deque[-1] if self._deque else None

    def reset(self):
        self._deque.clear()
        self._total = 0.0
        self._count = 0


class MeterBuffer(defaultdict):
    """Dict of AverageMeters (metric.py:101)."""

    def __init__(self, window_size: int = 20):
        super().__init__(functools.partial(AverageMeter,
                                           window_size=window_size))

    def update(self, values: Dict = None, **kwargs):
        values = dict(values or {})
        values.update(kwargs)
        for k, v in values.items():
            self[k].update(v)

    def get_filtered_meter(self, filter_key: str = "time"):
        return {k: v for k, v in self.items() if filter_key in k}

    def clear_meters(self):
        for v in self.values():
            v.reset()


def gpu_mem_usage_mb() -> float:
    """Device memory in MB if the backend exposes it (metric.py:22)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1024 / 1024
    except Exception:
        return 0.0
