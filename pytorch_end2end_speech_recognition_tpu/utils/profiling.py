"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference genre has tqdm timings only; here:
- `trace()` context manager -> Perfetto/XProf trace via jax.profiler.
- `StepTimer` -> block_until_ready wall timers with percentile stats.
- `throughput_gauge` -> audio-seconds/s/chip, the headline metric
  (BASELINE.json:2).
- `roofline` -> achieved vs peak FLOP/s and bytes/s for kernel tuning
  ("speed-of-light per chip", BASELINE.json:5).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np

# per-chip peaks (approx, f32/bf16 mix) for roofline orientation
PEAKS = {
    # platform: (bf16 TFLOP/s, HBM GB/s)
    "tpu v5 lite": (197.0, 819.0),
    "tpu v5p": (459.0, 2765.0),
    "tpu v4": (275.0, 1228.0),
    "cpu": (0.5, 50.0),
}


def device_peaks() -> tuple[float, float]:
    d = jax.devices()[0]
    key = getattr(d, "device_kind", "cpu").lower()
    for name, peaks in PEAKS.items():
        if name in key:
            return peaks
    return PEAKS["cpu"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XProf/Perfetto trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timer; call `tick(result)` once per step."""

    times: list = field(default_factory=list)
    _last: float | None = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self.times.append(dt)
        return dt

    def stats(self, skip_warmup: int = 2) -> dict:
        ts = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p95_s": float(np.percentile(ts, 95)),
            "steps": int(ts.size),
        }


def throughput_gauge(audio_seconds: float, wall_seconds: float,
                     n_chips: int = 1) -> dict:
    v = audio_seconds / max(wall_seconds, 1e-9)
    return {
        "audio_s_per_s": v,
        "audio_s_per_s_per_chip": v / max(n_chips, 1),
        "rtf_inv": v,  # >1 means faster than real time
    }


def roofline(flops: float, bytes_moved: float, wall_s: float) -> dict:
    """Achieved fraction of peak compute/bandwidth for a measured kernel."""
    peak_tflops, peak_gbs = device_peaks()
    achieved_tflops = flops / wall_s / 1e12
    achieved_gbs = bytes_moved / wall_s / 1e9
    return {
        "achieved_tflops": achieved_tflops,
        "peak_tflops": peak_tflops,
        "compute_frac": achieved_tflops / peak_tflops,
        "achieved_gbs": achieved_gbs,
        "peak_gbs": peak_gbs,
        "bandwidth_frac": achieved_gbs / peak_gbs,
        "bound": "compute" if achieved_tflops / peak_tflops
                 > achieved_gbs / peak_gbs else "memory",
    }
