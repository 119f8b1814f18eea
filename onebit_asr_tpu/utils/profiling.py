"""Profiling & numerics debugging — the tracing/observability subsystem.

The reference has no tracing at all (SURVEY §5: tqdm only). Here:

- `trace(dir)` context manager wraps `jax.profiler.trace` — produces a
  TensorBoard/XProf trace of XLA ops on the TPU timeline;
- `StepTimer` measures steady-state step time with correct `block_until_ready`
  handling and reports utt/sec + frames/sec (the BASELINE.md metrics);
- `debug_nans(enable)` flips `jax_debug_nans` (the jit-compatible NaN
  detector) — the TPU-native stand-in for torch's anomaly detection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/XProf trace for TensorBoard: `with trace('/tmp/tb'): …`"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    """Raise on the first NaN produced inside any jitted computation."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Steady-state throughput: call .start() after warmup, .stop(result)
    blocks on `result` and returns elapsed seconds."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.elapsed: float = 0.0
        self.count: int = 0

    def start(self) -> None:
        self.t0 = time.perf_counter()

    def stop(self, result, n: int = 1) -> float:
        jax.block_until_ready(result)
        dt = time.perf_counter() - self.t0
        self.elapsed += dt
        self.count += n
        return dt

    def per_sec(self) -> float:
        return self.count / self.elapsed if self.elapsed else 0.0


def host_rss_gb() -> float:
    """Current host resident set in GiB (VmRSS from /proc, Linux).

    Logged once per epoch by the train CLI: the round-4 capstone XL was
    OOM-killed at epoch 30 of 40 by a ~4 GB/epoch host-side leak that no
    shorter run had ever exposed — this is the observable that bounds it
    (pair with the `live_buffers` count to separate host-allocator growth
    from python-held device arrays)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:  # pragma: no cover - non-Linux
        pass
    return float("nan")


def malloc_trim() -> bool:
    """Return freed-but-retained glibc heap pages to the OS.

    Round-4's capstone XL found host RSS growing ~3.7 GB/epoch with a FLAT
    device-buffer count — allocations on the device-client transfer path
    that glibc frees but keeps in its arenas (the classic
    fragmentation-retention pattern; a CPU-backend control run was flat).
    Called once per epoch by the train CLI after eval: malloc_trim(0)
    walks every arena and releases trimmable pages, bounding RSS for
    long soaks. Costs ~ms; no-op (False) where libc lacks the symbol.
    Leak fix #2 of round 5 (pair: f16 feature transfers halve the bytes
    entering the allocator in the first place, data/librispeech.py)."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        return bool(libc.malloc_trim(0))
    except Exception:  # pragma: no cover - non-glibc platforms
        return False
