"""Profiling / roofline accounting (SURVEY §5: the TPU-native equivalent of
the reference's BenchmarkTools-based external benchmarking).

``trace(dir)`` wraps ``jax.profiler`` for post-hoc analysis in TensorBoard /
xprof.  ``roofline_report`` does the per-op bookkeeping BASELINE.json asks
for: bytes-from-HBM per SpMV/iteration vs measured wall time.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

__all__ = ["trace", "measure_bandwidth", "roofline_report", "RooflineReport",
           "collective_counts"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/prof'): solver(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_bandwidth(n: int = 1 << 21, dtype=np.float32, reps: int = 3) -> float:
    """Empirical streaming HBM bandwidth (bytes/s) via a differential triad
    loop (cancels dispatch latency)."""
    import jax.numpy as jnp
    from functools import partial

    v0 = jnp.ones((n,), dtype)
    c = jnp.full((n,), 0.5, dtype)

    @partial(jax.jit, static_argnames=("k",))
    def loop(v, k):
        return jax.lax.fori_loop(0, k, lambda i, v: 0.999 * v + c, v)

    def timed(k):
        r = jax.block_until_ready(loop(v0, k))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = loop(v0, k)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    per_op = (timed(400) - timed(100)) / 300
    return 3 * np.dtype(dtype).itemsize * n / per_op


@dataclass
class RooflineReport:
    bytes_per_iter: int
    measured_iter_s: float
    bandwidth_bps: float

    @property
    def roofline_iter_s(self) -> float:
        return self.bytes_per_iter / self.bandwidth_bps

    @property
    def fraction(self) -> float:
        return self.roofline_iter_s / self.measured_iter_s

    def __repr__(self):
        return (
            f"RooflineReport({self.bytes_per_iter / 1e6:.1f} MB/iter, "
            f"{self.measured_iter_s * 1e6:.1f} us/iter measured vs "
            f"{self.roofline_iter_s * 1e6:.1f} us roofline -> "
            f"{self.fraction:.1%} of speed-of-light)"
        )


def roofline_report(
    bytes_per_iter: int,
    measured_iter_s: float,
    bandwidth_bps: Optional[float] = None,
) -> RooflineReport:
    """Fraction-of-roofline accounting for a solver iteration."""
    if bandwidth_bps is None:
        bandwidth_bps = measure_bandwidth()
    return RooflineReport(int(bytes_per_iter), float(measured_iter_s), float(bandwidth_bps))


def collective_counts(hlo_text: str) -> dict:
    """Count distinct collective *instructions* in optimized HLO text (a
    start/done pair or a fused computation can mention the op several times;
    count result-assignment lines only).  Shared by the HLO-audit tests and
    the weak-scaling artifact so the counting rule cannot drift."""
    import re

    counts = {}
    for kind in ("collective-permute", "all-reduce", "all-gather",
                 "reduce-scatter", "all-to-all"):
        # lines like "%x = ... collective-permute(" or "... all-reduce-start("
        counts[kind] = len(
            re.findall(r"=\s[^=]*\b" + kind + r"(?:-start)?\(", hlo_text)
        )
    return counts
