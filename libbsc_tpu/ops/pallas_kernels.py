"""Pallas TPU kernels for the statistics stages.

The detectors (filters/detectors.cpp:70-581) and the coder's sub-block
splitter are histogram/reduction shaped; on TPU the byte histogram maps to
the MXU as a ones-vector x one-hot matmul accumulated across grid steps —
scatter-free, so it runs at matmul speed instead of serialized scatter-adds
(what jnp.bincount lowers to).  The Adler-32 kernel computes per-chunk
(sum, weighted-sum) partials sized so int32 cannot overflow (the same 2048-
byte chunking as utils/adler32.py), combined exactly on the host.

Kernels fall back to interpreter mode off-TPU so the same code path is
testable on the CPU backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIST_ROWS = 256
_LANES = 512
_HIST_TILE = _HIST_ROWS * _LANES  # 128 KiB of bytes per grid step

_ADLER_CHUNK = 2048  # 2048*2049/2*255 < 2**31: int32-safe weighted sum


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _hist_kernel(x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile = x_ref[0].astype(jnp.int32)      # [ROWS, LANES], VMEM-resident
    # compare-reduce sweep: one full-tile VPU reduction per symbol value;
    # the tile is read once from HBM and reduced 256x from VMEM.  The
    # scalar count lands in the vector accumulator via a masked add
    # (scalar stores to VMEM are not supported).
    vals = lax.broadcasted_iota(jnp.int32, (1, 256), 1)

    def body(v, acc):
        s = jnp.sum(jnp.where(tile == v, 1, 0))
        return acc + jnp.where(vals == v, s, 0)

    acc = lax.fori_loop(0, 256, body, jnp.zeros((1, 256), jnp.int32))
    out_ref[:] = out_ref[:] + acc


@jax.jit
def byte_histogram(data: jax.Array) -> jax.Array:
    """256-bin histogram of a uint8 array (padded internally)."""
    n = data.shape[0]
    n_pad = pl.cdiv(n, _HIST_TILE) * _HIST_TILE
    padded = jnp.zeros(n_pad, dtype=jnp.uint8).at[:n].set(data)
    x = padded.reshape(-1, _HIST_ROWS, _LANES)

    hist = pl.pallas_call(
        _hist_kernel,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, _HIST_ROWS, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32),
        interpret=_interpret(),
    )(x)[0]
    # remove the zero-padding contribution
    return hist.at[0].add(-(n_pad - n))


def _adler_kernel(x_ref, out_ref):
    """Per-block partials over R chunks of 2048 bytes: out[r, 0] = sum(chunk),
    out[r, 1] = sum((2048 - j) * chunk[j]) — both < 2^31."""
    tile = x_ref[0].astype(jnp.int32)      # [R, 2048]
    r, c = tile.shape
    w = (c - lax.broadcasted_iota(jnp.int32, (r, c), 1))
    s1 = jnp.sum(tile, axis=1, keepdims=True)       # [R, 1]
    s2 = jnp.sum(tile * w, axis=1, keepdims=True)   # [R, 1]
    out_ref[0] = (jnp.pad(s1, ((0, 0), (0, 127))) +
                  jnp.pad(s2, ((0, 0), (1, 126))))


_ADLER_R = 64  # chunks per grid step: 64 * 2048 = 128 KiB


@jax.jit
def _adler_partials(data: jax.Array) -> jax.Array:
    n = data.shape[0]
    step = _ADLER_R * _ADLER_CHUNK
    n_pad = pl.cdiv(n, step) * step
    padded = jnp.zeros(n_pad, dtype=jnp.uint8).at[:n].set(data)
    x = padded.reshape(-1, _ADLER_R, _ADLER_CHUNK)
    out = pl.pallas_call(
        _adler_kernel,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, _ADLER_R, _ADLER_CHUNK),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _ADLER_R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], _ADLER_R, 128), jnp.int32),
        interpret=_interpret(),
    )(x)
    return out[:, :, :2].reshape(-1, 2)  # [n_chunks, (s1, s2)]


def adler32_device(data: jax.Array, value: int = 1) -> int:
    """Adler-32 of a device-resident uint8 array via a Pallas reduction;
    matches zlib/bsc_adler32 (adler32.cpp:85).  Chunk partials are combined
    exactly on the host (Python ints), including the zero padding, which is
    weight-neutral only for s1 — so the padded length is folded out by
    composing with the true chunk offsets.
    """
    n = int(data.shape[0])
    a = value & 0xFFFF
    b = (value >> 16) & 0xFFFF
    if n == 0:
        return ((b << 16) | a) & 0xFFFFFFFF
    parts = jax.device_get(_adler_partials(data))
    remaining = n
    for s1, s2 in parts:
        k = min(_ADLER_CHUNK, remaining)
        # chunk holds k real bytes then zeros; weights in-kernel assumed a
        # full chunk, so the real bytes' weights are offset by (CHUNK - k)
        s2 = int(s2) - (_ADLER_CHUNK - k) * int(s1)
        b = (b + a * k + s2) % 65521
        a = (a + int(s1)) % 65521
        remaining -= k
        if remaining <= 0:
            break
    return ((b << 16) | a) & 0xFFFFFFFF
