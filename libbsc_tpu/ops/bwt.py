"""Burrows-Wheeler transform on device.

Forward: suffix-array construction by **prefix doubling** — the same
algorithmic family as the reference GPU implementation (libcubwt.cu:2031-2225
iterates rank-and-segment + segmented radix sorts until fully ranked) but
expressed in XLA primitives: each doubling round is one stable
`lax.sort(num_keys=2)` over (rank[i], rank[i+k]) pairs plus a cumulative-sum
re-rank, run under `lax.while_loop` with an all-distinct early exit.

Stream convention (verified against libsais via the native runtime,
native/bwt.cc:190-225, reference bwt/bwt.cpp:178-230):
  U[0] = T[n-1]; U[1..] = T[SA[j]-1] for ranks j skipping suffix 0;
  primary index = rank(suffix 0) + 1;
  aux indexes (rate r = 2^floor(log2(n/8))): indexes[t] = rank(suffix (t+1)r).

Inverse: the serial LF chase (libsais.c:7285-7543 runs 8-16 chains from the
aux indexes) does not map to TPU — a chain step is a dependent scalar gather.
Instead the whole permutation is *list-ranked* by pointer doubling: break
the LF cycle at the head row, then log2(n) rounds of `dist += dist[pred];
pred = pred[pred]` give every row its distance from the head, and one
scatter materializes the output. O(n log n) gather traffic, fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def aux_rate(n: int) -> int:
    """Aux-index sampling rate, bit-smear formula of bwt.cpp:192-197."""
    mod = n // 8
    mod |= mod >> 1
    mod |= mod >> 2
    mod |= mod >> 4
    mod |= mod >> 8
    mod |= mod >> 16
    mod >>= 1
    return mod + 1


def _log2_ceil(n: int) -> int:
    return max(1, (n - 1).bit_length())


@jax.jit
def suffix_array(data: jax.Array):
    """Suffix array + inverse (ranks) of uint8[n] via prefix doubling.

    Bootstraps at depth 8 with one two-word lexicographic byte sort
    (saving three doubling rounds vs single-byte ranks).  Out-of-range
    bytes pad with 0, which may conflate a suffix end with real 0x00
    bytes at this depth — safe, because equal initial ranks only defer
    the decision, and the next round's rank[i+8] = -1 for exhausted
    suffixes orders them correctly.
    """
    n = data.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    d32 = data.astype(jnp.uint32)

    def pbyte(j: int) -> jax.Array:
        # data[i + j] with zero padding past the end (static shift)
        return jnp.where(idx + j < n,
                         jnp.roll(d32, -j),
                         0)

    hi = jnp.zeros(n, dtype=jnp.uint32)
    lo = jnp.zeros(n, dtype=jnp.uint32)
    for j in range(4):
        hi = (hi << 8) | pbyte(j)
        lo = (lo << 8) | pbyte(j + 4)

    # Remaining-length key (clamped to 8): when two zero-padded windows are
    # equal and BOTH suffixes end inside the window, no later round can
    # separate them (both rank[i+8] are out of range); the shorter suffix is
    # a prefix of the longer and must rank first.
    rem = jnp.minimum(n - idx, 8).astype(jnp.uint32)
    hi_s, lo_s, rem_s, pos_s = lax.sort((hi, lo, rem, idx), num_keys=3,
                                        is_stable=True)
    head = jnp.concatenate([
        jnp.zeros(1, dtype=jnp.int32),
        ((hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
         | (rem_s[1:] != rem_s[:-1])).astype(jnp.int32),
    ])
    rank_sorted = jnp.cumsum(head, dtype=jnp.int32)
    rank = jnp.zeros(n, dtype=jnp.int32).at[pos_s].set(rank_sorted)

    def round_body(state):
        rank, k, _ = state
        # rank of suffix i+k; exhausted suffixes compare smallest
        rank2 = jnp.where(idx + k < n, rank[jnp.minimum(idx + k, n - 1)], -1)
        r1s, r2s, pos_s = lax.sort((rank, rank2, idx), num_keys=2,
                                   is_stable=True)
        head = jnp.concatenate([
            jnp.zeros(1, dtype=jnp.int32),
            ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(jnp.int32),
        ])
        new_rank_sorted = jnp.cumsum(head, dtype=jnp.int32)
        new_rank = jnp.zeros(n, dtype=jnp.int32).at[pos_s].set(new_rank_sorted)
        done = new_rank_sorted[-1] == n - 1
        return new_rank, k * 2, done

    def cond(state):
        _, k, done = state
        return (~done) & (k < 2 * n)

    # `done` is data-derived so its varying-axes type matches the loop
    # output under shard_map; the depth-8 bootstrap may already be fully
    # ranked.
    rank, _, _ = lax.while_loop(
        cond, round_body,
        (rank, jnp.int32(8), rank_sorted[-1] == n - 1))
    # one extra re-rank in case the initial byte ranks were already distinct
    # is unnecessary: while_loop ran at least once unless n tiny
    sa = jnp.zeros(n, dtype=jnp.int32).at[rank].set(idx)
    return sa, rank


def bwt_encode(data: jax.Array):
    """Forward BWT of uint8[n].

    Returns (U uint8[n], primary int32, aux int32[(n-1)//r]) with the
    reference's stream convention.  The aux array length is static (shape
    depends only on n).
    """
    n = data.shape[0]
    if n <= 1:
        return data, jnp.int32(n), jnp.zeros(0, dtype=jnp.int32)
    return _bwt_encode_jit(data)


@jax.jit
def _bwt_encode_jit(data: jax.Array):
    n = data.shape[0]
    sa, isa = suffix_array(data)
    r0 = isa[0]

    # U[0] = T[n-1]; U[w>=1] = T[SA[j]-1] with j = w-1 (+1 once past r0)
    vals = data[jnp.maximum(sa - 1, 0)]
    w = jnp.arange(1, n, dtype=jnp.int32)
    j = jnp.where(w - 1 < r0, w - 1, w)
    U = jnp.concatenate([data[n - 1:n], vals[j]])

    r = aux_rate(n)
    n_aux = (n - 1) // r
    aux = isa[(jnp.arange(n_aux, dtype=jnp.int32) + 1) * r]
    return U, r0 + 1, aux


def bwt_decode(data: jax.Array, index: jax.Array):
    """Inverse BWT of uint8[n] given the primary index (1-based rank)."""
    n = data.shape[0]
    if n <= 1:
        return data
    return _bwt_decode_jit(data, jnp.asarray(index, dtype=jnp.int32))


@jax.jit
def _bwt_decode_jit(U: jax.Array, index: jax.Array):
    n = U.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sym = U.astype(jnp.int32)

    counts = jnp.bincount(sym, length=256).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts, dtype=jnp.int32)[:-1]])
    base = starts + 1  # sentinel occupies row 0 of the virtual matrix

    # occ[u] = #{v < u : U[v] == U[u]} via one stable counting sort
    _, pos_s = lax.sort((sym, idx), num_keys=1, is_stable=True)
    occ_sorted = idx - starts[U[pos_s].astype(jnp.int32)]
    occ = jnp.zeros(n, dtype=jnp.int32).at[pos_s].set(occ_sorted)

    lf = base[sym] + occ  # row index in [1, n]
    nxt = lf - (lf > index).astype(jnp.int32)  # back to u-coordinates

    # list-rank the LF chain: pred steps toward the head u=0.  The terminal
    # element is the one whose lf hits the primary row (its outgoing edge is
    # never taken in the serial walk) — drop it or its scatter would collide
    # with the interior element u = index.
    tgt = jnp.where(lf == index, n, nxt)
    pred = jnp.zeros(n, dtype=jnp.int32).at[tgt].set(idx, mode="drop")
    pred = jnp.where(idx == 0, 0, pred)
    dist = jnp.where(idx == 0, 0, 1).astype(jnp.int32)
    for _ in range(_log2_ceil(n)):
        dist = dist + dist[pred]
        pred = pred[pred]

    # chain position t(u) = dist[u]; out[n-1-t] = U[u]
    out = jnp.zeros(n, dtype=jnp.uint8).at[n - 1 - dist].set(U)
    return out
