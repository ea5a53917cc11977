"""Adler-32 checksums (zlib-compatible), host and on-device flavors.

The reference (adler32/adler32.cpp:85) computes the standard zlib Adler-32.
Host path delegates to :func:`zlib.adler32` (C speed).  The device path is a
vectorized JAX formulation used when a block is already resident in HBM:

    a = (1 + sum(d))                          mod 65521
    b = (n + sum((n - i) * d[i]))             mod 65521

computed per fixed-size chunk with int32 accumulators (no overflow because
chunks are <= 2048 elements) and combined with modular arithmetic.
"""

from __future__ import annotations

import ctypes
import zlib

import numpy as np

BASE = 65521
_CHUNK = 2048  # 2048*2049/2*255 < 2**31, so int32 chunk accumulators are safe

_U8P = ctypes.POINTER(ctypes.c_uint8)
_native_fn = None  # None = untried, False = unavailable


def _native():
    global _native_fn
    if _native_fn is None:
        try:
            from .. import native as native_mod

            if native_mod.available():
                _native_fn = native_mod.load().tbsc_adler32
            else:
                _native_fn = False
        except Exception:
            _native_fn = False
    return _native_fn


def adler32(data, value: int = 1) -> int:
    """Host Adler-32 of ``bytes``/buffer, zlib-compatible.

    Uses the AVX2 path in the native runtime when built (the reference has
    a SIMD Adler-32 too, adler32/adler32.cpp:99); zlib otherwise.
    """
    fn = _native()
    if fn:
        if isinstance(data, bytes):
            ptr = ctypes.cast(ctypes.c_char_p(data), _U8P)
            return fn(ptr, len(data), value & 0xFFFFFFFF)
        if isinstance(data, np.ndarray) and data.dtype == np.uint8 \
                and data.flags["C_CONTIGUOUS"]:
            return fn(data.ctypes.data_as(_U8P), data.nbytes,
                      value & 0xFFFFFFFF)
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    return zlib.adler32(data, value) & 0xFFFFFFFF


def adler32_combine(a1: int, a2: int, len2: int) -> int:
    """Combine checksums of two concatenated streams (zlib semantics)."""
    rem = len2 % BASE
    sum1 = a1 & 0xFFFF
    sum2 = (rem * sum1) % BASE
    sum1 += (a2 & 0xFFFF) + BASE - 1
    sum2 += ((a1 >> 16) & 0xFFFF) + ((a2 >> 16) & 0xFFFF) + BASE - rem
    if sum1 >= BASE:
        sum1 -= BASE
    if sum1 >= BASE:
        sum1 -= BASE
    if sum2 >= 2 * BASE:
        sum2 -= 2 * BASE
    if sum2 >= BASE:
        sum2 -= BASE
    return (sum2 << 16) | sum1


def adler32_jax(data, n=None):
    """On-device Adler-32 of a uint8 array of static length.

    Args:
      data: uint8 array, 1-D.  If ``n`` is given, only the first ``n``
        elements (dynamic) contribute; the rest are masked out.
    Returns uint32 scalar checksum.
    """
    import jax.numpy as jnp

    d = data.astype(jnp.int32)
    size = d.shape[0]
    pad = (-size) % _CHUNK
    if pad:
        d = jnp.pad(d, (0, pad))
    total = d.shape[0]
    if n is None:
        n = size
    idx = jnp.arange(total, dtype=jnp.int32)
    d = jnp.where(idx < n, d, 0)
    dc = d.reshape(-1, _CHUNK)
    # Per-chunk partial sums. s1c = sum d; s2c = sum (CHUNK - j) * d[j]
    w = jnp.arange(_CHUNK, 0, -1, dtype=jnp.int32)
    s1c = jnp.sum(dc, axis=1) % BASE
    s2c = jnp.sum(dc * w[None, :], axis=1) % BASE
    # Elements of chunk k sit (n_chunks-1-k)*CHUNK positions before the end
    # (within the padded stream); padding contributes zero to both sums, but
    # shifts b by a multiple of s1 of the following zeros only (zero), so we
    # can combine over the padded length and the padding is inert because the
    # masked tail is all zeros and sum terms vanish.
    n_chunks = dc.shape[0]
    k = jnp.arange(n_chunks, dtype=jnp.int32)
    shift = ((total - (k + 1) * _CHUNK) % BASE).astype(jnp.int32)
    sum_d = jnp.sum(s1c) % BASE
    s1 = (1 + sum_d) % BASE
    # shift * s1c can reach 65520^2 which still fits in uint32 (< 2**32).
    cross = (shift.astype(jnp.uint32) * s1c.astype(jnp.uint32)) % BASE
    # Weighted sum with weight (total - i); convert to weight (n - i) by
    # subtracting (total - n) * sum(d), exploiting that masked bytes are 0.
    s2 = (jnp.sum(s2c).astype(jnp.uint32) + jnp.sum(cross)) % BASE
    over = jnp.asarray(total % BASE, dtype=jnp.uint32)
    over = (over + BASE - jnp.asarray(n, dtype=jnp.uint32) % BASE) % BASE
    s2 = (s2 + BASE - (over * sum_d.astype(jnp.uint32)) % BASE) % BASE
    # The initial a=1 contributes n to b.
    s2 = (s2 + jnp.asarray(n, dtype=jnp.uint32) % BASE) % BASE
    return (s2.astype(jnp.uint32) << 16) | s1.astype(jnp.uint32)
