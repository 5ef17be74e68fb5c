"""Step timing + profiler integration.

Role of the reference's CUDA-event wall timing (ref:train.py:75-76,
113,170 'iter_time'; gui/main.py:556-558 FPS readout), TPU-native:
`jax.profiler` traces plus a host-side EMA step timer (device work is
async — callers time around block_until_ready or rely on steady-state
queue equilibrium, which is what the EMA reflects).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """EMA wall-clock per step + FPS, like the GUI readout."""

    def __init__(self, ema: float = 0.95):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else (
            self.ema * self.avg + (1 - self.ema) * dt)
        return False

    @property
    def ms(self) -> float:
        return (self.avg or 0.0) * 1e3

    @property
    def fps(self) -> float:
        return 1.0 / self.avg if self.avg else 0.0

    def __str__(self):
        return f"{self.ms:.1f} ms ({self.fps:.1f} FPS)"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/goi_tpu_trace"):
    """Capture a jax.profiler trace (view with tensorboard-plugin-profile
    or xprof)."""
    with jax.profiler.trace(log_dir):
        yield log_dir


annotate = jax.profiler.TraceAnnotation
