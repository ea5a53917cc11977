"""Per-thread reusable scratch buffers for the block pipeline.

This host pays heavily for fresh multi-MB mappings (page faults on every
call, never THP-promoted); the reference amortizes them through glibc's
malloc chunk cache inside bsc_compress, and the native runtime through its
huge-page arena (halloc.h).  The Python pipeline gets the same treatment
here: one grow-only buffer per (thread, slot), 2 MiB-aligned and madvised
MADV_HUGEPAGE, so every compress/decompress call after the first works in
warm huge pages.

A slot's buffer is valid until the same thread asks for the same slot
again — callers keep at most one live view per slot (the pipeline uses
distinct slot names per overlapping lifetime).
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

_MADV_HUGEPAGE = 14
_HUGE = 2 << 20

_tls = threading.local()

try:
    _libc = ctypes.CDLL(None, use_errno=True)
except Exception:  # pragma: no cover - non-POSIX
    _libc = None


def _alloc(cap: int):
    raw = np.empty(cap + _HUGE, dtype=np.uint8)
    addr = raw.ctypes.data
    off = (-addr) % _HUGE
    view = raw[off:off + cap]
    if _libc is not None:
        try:
            _libc.madvise(ctypes.c_void_p(addr + off),
                          ctypes.c_size_t(cap), _MADV_HUGEPAGE)
        except Exception:
            pass
    return raw, view


def get(slot: str, nbytes: int) -> np.ndarray:
    """uint8[nbytes] scratch for `slot`, reused across calls on this thread.

    Grow-only with 1.25x headroom so a stream of similar block sizes maps
    to one stable allocation."""
    d = getattr(_tls, "slots", None)
    if d is None:
        d = _tls.slots = {}
    ent = d.get(slot)
    if ent is None or ent[1].shape[0] < nbytes:
        cap = max(1 << 20, nbytes + (nbytes >> 2))
        ent = d[slot] = _alloc(cap)
    return ent[1][:nbytes]
