"""Per-stage tracing/profiling.

The reference exposes only wall-clock + MB/s at the CLI (bsc.cpp:103-111,
427, 680).  This build adds opt-in per-stage timing: set TBSC_TRACE=1 to
print one stderr line per pipeline stage (stage, bytes, seconds, MB/s), and
TBSC_PROFILE=<dir> to capture a jax.profiler trace of the device ops
(viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

TRACE = os.environ.get("TBSC_TRACE", "") not in ("", "0")
_PROFILE_DIR = os.environ.get("TBSC_PROFILE", "")
_profiler_started = False


@contextlib.contextmanager
def stage(name: str, nbytes: int = 0):
    """Time one pipeline stage; prints to stderr when TBSC_TRACE is set."""
    global _profiler_started
    if _PROFILE_DIR and not _profiler_started:
        try:
            import jax

            jax.profiler.start_trace(_PROFILE_DIR)
            _profiler_started = True
        except Exception:
            pass
    if not TRACE:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        rate = f" {nbytes / 1e6 / dt:.1f} MB/s" if nbytes and dt > 0 else ""
        print(f"[tbsc] {name}: {nbytes}B {dt:.4f}s{rate}", file=sys.stderr)


def stop_profiler() -> None:
    global _profiler_started
    if _profiler_started:
        try:
            import jax

            jax.profiler.stop_trace()
        except Exception:
            pass
        _profiler_started = False
