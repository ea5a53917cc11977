"""Sort Transform (ST3..ST8) forward on device.

Semantics match the reference GPU path (st/st.cu:99-211 builds 8-byte
big-endian wrap-around context keys and radix-sorts them; the low key byte
carries the preceding symbol): stably sort all positions i by the k
following bytes T[i..i+k-1] (wrapping), ties broken by position, output the
preceding byte T[(i-1) mod n]; the transform index is the rank of
position 0.

TPU design: instead of packing 64-bit keys (x64 is off by default and TPU
prefers 32-bit lanes), the context is split into two uint32 words and sorted
lexicographically with a single stable `lax.sort(num_keys=2)` — XLA lowers
this to its native sort; position tie-break falls out of stability.

The inverse transform (group refinement + backward LF walk,
st/st.cpp:1014-1527) is a serial chain chase with tie bookkeeping and stays
on the host runtime (the reference likewise has no GPU ST decoder).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("k",))
def st_encode(data: jax.Array, k: int):
    """Forward ST-k of a uint8 block.

    Args:
      data: uint8[n] block (n >= 2 for a meaningful transform).
      k: context order in [3, 8].

    Returns:
      (transformed uint8[n], index int32) — index is the rank of position 0
      in the context-sorted order (what `bsc_st_decode` needs back).
    """
    if not 3 <= k <= 8:
        raise ValueError(f"ST order must be in [3, 8], got {k}")
    n = data.shape[0]
    if n <= 1:
        return data, jnp.int32(0)

    d32 = data.astype(jnp.uint32)

    def ctx_byte(j: int) -> jax.Array:
        # T[(i + j) % n] for every i, as a vector
        return jnp.roll(d32, -j)

    # big-endian packing: word order (hi, lo) compares like the k-byte string
    hi = jnp.zeros(n, dtype=jnp.uint32)
    for j in range(min(k, 4)):
        hi = (hi << 8) | ctx_byte(j)
    hi = hi << (8 * (4 - min(k, 4)))

    lo = jnp.zeros(n, dtype=jnp.uint32)
    for j in range(4, k):
        lo = (lo << 8) | ctx_byte(j)
    lo = lo << (8 * (8 - max(k, 4)))

    prev = jnp.roll(data, 1)  # T[(i-1) mod n]

    # The stable sort needs no position payload: stability IS position
    # order, and the transform index (rank of position 0) is the count of
    # strictly smaller keys — position 0 sorts first within its key group —
    # computed with one elementwise pass instead of carrying a 4th n-word
    # array through the sort and an argmax over it (25% less sort traffic).
    _, _, prev_s = lax.sort((hi, lo, prev), num_keys=2, is_stable=True)
    index = jnp.sum(((hi < hi[0]) | ((hi == hi[0]) & (lo < lo[0])))
                    .astype(jnp.int32))
    return prev_s, index


@functools.partial(jax.jit, static_argnames=("k",))
def st_encode_padded(data: jax.Array, n: jax.Array, k: int):
    """Forward ST-k of the first n bytes of a padded buffer.

    Shape-bucketed variant: the buffer shape is static (one XLA program per
    bucket) while the true length n is a traced scalar, so variable-size
    LZP outputs share compilations.  Padded positions carry a leading
    is-pad sort key and sink stably to the tail; the caller slices the
    first n output bytes.
    """
    if not 3 <= k <= 8:
        raise ValueError(f"ST order must be in [3, 8], got {k}")
    n_pad = data.shape[0]
    n = jnp.asarray(n, dtype=jnp.int32)
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    d32 = data.astype(jnp.uint32)
    # one dynamic roll shared by every wrap: roll(d32, n - j) ==
    # roll(roll(d32, n), -j), so the j-dependent part becomes a static roll
    # (a contiguous copy) — was 8 dynamic rolls for ST8
    dwrap = jnp.roll(d32, n)

    def ctx_byte(j: int) -> jax.Array:
        # T[(i + j) mod n]: a static roll covers i + j < n; positions in
        # [n - j, n) wrap to data[i + j - n] via the shared dynamic roll.
        if j == 0:
            return d32
        return jnp.where(idx < n - j, jnp.roll(d32, -j), jnp.roll(dwrap, -j))

    hi = jnp.zeros(n_pad, dtype=jnp.uint32)
    for j in range(min(k, 4)):
        hi = (hi << 8) | ctx_byte(j)
    hi = hi << (8 * (4 - min(k, 4)))

    lo = jnp.zeros(n_pad, dtype=jnp.uint32)
    for j in range(4, k):
        lo = (lo << 8) | ctx_byte(j)
    lo = lo << (8 * (8 - max(k, 4)))

    # pad keys forced to the maximum; stability (pads have positions >= n,
    # after every real tie) keeps all n real entries in the first n slots
    pad = idx >= n
    hi = jnp.where(pad, jnp.uint32(0xFFFFFFFF), hi)
    lo = jnp.where(pad, jnp.uint32(0xFFFFFFFF), lo)

    prev = jnp.roll(data, 1).at[0].set(data[n - 1])  # T[(i-1) mod n]

    # No position payload (see st_encode): stability orders equal keys by
    # position, pads sink to the tail (max key, positions >= n), and the
    # index is the count of keys strictly below position 0's — pad keys are
    # >= key0 so the sum over the padded arrays counts no pad.
    _, _, prev_s = lax.sort((hi, lo, prev), num_keys=2, is_stable=True)
    index = jnp.sum(((hi < hi[0]) | ((hi == hi[0]) & (lo < lo[0])))
                    .astype(jnp.int32))
    return prev_s, index
