"""Wide-lane binary range coder (experimental; the docs/WIDE_PROFILE.md
primitive).

Runs L independent carry-counting range coders in lockstep under `lax.scan`
— every lane implements exactly the native stream format (native/rc.h,
reference coder/common/rangecoder.h): 32-bit low + 1-bit carry, 32-bit
range, 16-bit output units, lazy carry resolution via a pending counter,
3-unit decoder warm-up.  One scan step codes one bit per lane (masked by a
per-(lane, step) opcode, since lanes have different lengths).

Emission is logged per step (at most one unit + a pending-run per step) and
assembled into per-lane byte streams on the host; the decoder reads per-lane
unit buffers with per-lane cursors (one [L] gather per renormalization).

This file is the execution substrate for the wide QLFC profile — the
adaptive model lookups slot into the same scan body.  The pure-Python
RcEncoder/RcDecoder (fallback/qlfc.py) is the reference implementation the
tests check bit-exactness against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# per-(lane, step) opcodes
OP_NOOP = 0
OP_BIT = 1      # encode/decode one bit
OP_CSHIFT = 2   # finish: shift only if range < 2^16
OP_FSHIFT = 3   # finish: unconditional shift


def _shift(state, do_shift):
    """Vectorized rc.h shift(): returns new state + emission log entries."""
    lo, carry, rng, cache, pending = state
    lo32 = lo
    emit_cond = do_shift & ((lo32 < jnp.uint32(0xFFFF0000)) | (carry == 1))
    emit_val = ((cache + carry) & jnp.uint32(0xFFFF)).astype(jnp.uint32)
    flush_cnt = jnp.where(emit_cond, pending, 0)
    flush_val = ((carry - 1) & jnp.uint32(0xFFFF)).astype(jnp.uint32)

    cache = jnp.where(emit_cond, lo32 >> 16, cache)
    pending = jnp.where(do_shift,
                        jnp.where(emit_cond, 0, pending + 1), pending)
    lo = jnp.where(do_shift, (lo32 << 16), lo)
    carry = jnp.where(do_shift, jnp.uint32(0), carry)
    rng = jnp.where(do_shift, rng << 16, rng)
    return (lo, carry, rng, cache, pending), (emit_cond, emit_val,
                                              flush_cnt, flush_val)


@jax.jit
def _encode_scan(ops, bits, probs, precs):
    """ops/bits/probs/precs: [S, L] int32/uint32 step-major arrays."""
    L = ops.shape[1]
    init = (jnp.zeros(L, jnp.uint32),            # lo
            jnp.zeros(L, jnp.uint32),            # carry
            jnp.full(L, 0xFFFFFFFF, jnp.uint32),  # range
            jnp.zeros(L, jnp.uint32),            # cache
            jnp.zeros(L, jnp.uint32))            # pending

    def step(state, xs):
        op, bit, p, prec = xs
        lo, carry, rng, cache, pending = state
        is_bit = op == OP_BIT
        need = rng < jnp.uint32(0x10000)
        do_shift = (is_bit & need) | (op == OP_FSHIFT) | ((op == OP_CSHIFT) & need)
        state, log = _shift((lo, carry, rng, cache, pending), do_shift)
        lo, carry, rng, cache, pending = state

        r = lax.shift_right_logical(rng, prec.astype(jnp.uint32)) * p.astype(jnp.uint32)
        one = is_bit & (bit == 1)
        zero = is_bit & (bit == 0)
        new_lo = lo + r
        ovf = (new_lo < lo).astype(jnp.uint32)
        lo = jnp.where(one, new_lo, lo)
        carry = jnp.where(one, carry + ovf, carry)
        rng = jnp.where(one, rng - r, jnp.where(zero, r, rng))
        return (lo, carry, rng, cache, pending), log

    _, logs = lax.scan(step, init, (ops, bits, probs, precs))
    return logs  # each [S, L]


def encode(lanes):
    """Encode per-lane (bit, prob, precision) sequences.

    lanes: list of L sequences, each a list of (bit, prob, prec) tuples.
    Returns a list of L byte strings (identical to fallback RcEncoder output
    per lane).
    """
    L = len(lanes)
    S = max((len(s) for s in lanes), default=0) + 4
    ops = np.zeros((S, L), np.int32)
    bits = np.zeros((S, L), np.uint32)
    probs = np.zeros((S, L), np.uint32)
    precs = np.full((S, L), 12, np.uint32)
    for l, seq in enumerate(lanes):
        for s, (b, p, prec) in enumerate(seq):
            ops[s, l] = OP_BIT
            bits[s, l] = b
            probs[s, l] = p
            precs[s, l] = prec
        ops[len(seq), l] = OP_CSHIFT
        ops[len(seq) + 1:len(seq) + 4, l] = OP_FSHIFT

    emit_cond, emit_val, flush_cnt, flush_val = (
        np.asarray(x) for x in _encode_scan(
            jnp.asarray(ops), jnp.asarray(bits), jnp.asarray(probs),
            jnp.asarray(precs)))

    out = []
    for l in range(L):
        units = []
        for s in range(S):
            if emit_cond[s, l]:
                units.append(int(emit_val[s, l]))
                units.extend([int(flush_val[s, l])] * int(flush_cnt[s, l]))
        out.append(np.asarray(units, dtype="<u2").tobytes())
    return out


@jax.jit
def _decode_scan(ops, probs, precs, units):
    """units: [L, U] uint32 per-lane unit buffers (zero-padded)."""
    L = ops.shape[1]
    U = units.shape[1]
    lane_idx = jnp.arange(L)

    def get(pos):
        p = jnp.minimum(pos, U - 1)
        return units[lane_idx, p]

    # warm-up: three units per lane (first is the encoder's zero cache)
    code = jnp.zeros(L, jnp.uint32)
    pos = jnp.zeros(L, jnp.int32)
    for _ in range(3):
        code = ((code << 16) | get(pos)) & jnp.uint32(0xFFFFFFFF)
        pos = pos + 1
    init = (code, jnp.full(L, 0xFFFFFFFF, jnp.uint32), pos)

    def step(state, xs):
        op, p, prec = xs
        code, rng, pos = state
        is_bit = op == OP_BIT
        need = is_bit & (rng < jnp.uint32(0x10000))
        code = jnp.where(need, ((code << 16) | get(pos)), code)
        pos = jnp.where(need, pos + 1, pos)
        rng = jnp.where(need, rng << 16, rng)

        r = lax.shift_right_logical(rng, prec.astype(jnp.uint32)) * p.astype(jnp.uint32)
        bit = (code >= r) & is_bit
        code = jnp.where(bit, code - r, code)
        rng = jnp.where(is_bit, jnp.where(bit, rng - r, r), rng)
        return (code, rng, pos), bit.astype(jnp.int32)

    _, bits = lax.scan(step, init, (ops, probs, precs))
    return bits  # [S, L]


def decode(lanes_probs, lane_streams):
    """Decode per-lane (prob, precision) sequences from per-lane streams.

    lanes_probs: list of L sequences of (prob, prec); lane_streams: list of
    L byte strings.  Returns list of L bit lists.
    """
    L = len(lanes_probs)
    S = max((len(s) for s in lanes_probs), default=0)
    ops = np.zeros((S, L), np.int32)
    probs = np.zeros((S, L), np.uint32)
    precs = np.full((S, L), 12, np.uint32)
    for l, seq in enumerate(lanes_probs):
        for s, (p, prec) in enumerate(seq):
            ops[s, l] = OP_BIT
            probs[s, l] = p
            precs[s, l] = prec
    U = max((len(b) // 2 for b in lane_streams), default=1)
    U = max(U, 1)
    units = np.zeros((L, U), np.uint32)
    for l, b in enumerate(lane_streams):
        u = np.frombuffer(b[:len(b) & ~1], dtype="<u2")
        units[l, :len(u)] = u

    bits = np.asarray(_decode_scan(jnp.asarray(ops), jnp.asarray(probs),
                                   jnp.asarray(precs), jnp.asarray(units)))
    return [[int(bits[s, l]) for s in range(len(lanes_probs[l]))]
            for l in range(L)]
