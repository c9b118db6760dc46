"""Section timing utility (reference tools/utils.py:64-103 `AverageTimer`):
smoothed per-section wall-clock with FPS printout, for host-side pipeline
stages. Device-side profiling should use jax.profiler traces instead."""
from __future__ import annotations

import time
from collections import OrderedDict


class AverageTimer:
    def __init__(self, smoothing: float = 0.3, newline: bool = False):
        self.smoothing = smoothing
        self.newline = newline
        self.times: "OrderedDict[str, float]" = OrderedDict()
        self.will_print: "OrderedDict[str, bool]" = OrderedDict()
        self.reset()

    def reset(self):
        self.start = time.time()
        self.last_time = self.start
        for name in self.will_print:
            self.will_print[name] = False

    def update(self, name: str = "default"):
        now = time.time()
        dt = now - self.last_time
        if name in self.times:
            dt = self.smoothing * dt + (1 - self.smoothing) * self.times[name]
        self.times[name] = dt
        self.will_print[name] = True
        self.last_time = now

    def print(self, text: str = "Timer"):
        total = 0.0
        print(f"[{text}]", end=" ")
        for key in self.times:
            if self.will_print.get(key):
                print(f"{key}={self.times[key]:.3f}", end=" ")
                total += self.times[key]
        print(f"total={total:.3f} sec {1.0 / max(total, 1e-9):.1f} FPS",
              end="\n" if self.newline else "\r", flush=True)
        self.reset()
