"""Burrows-Wheeler transform on device.

Forward: suffix-array construction by **prefix doubling** — the algorithmic
family of the reference GPU implementation (libcubwt.cu:2031-2225 iterates
rank-and-segment + segmented sorts until fully ranked) — shaped for XLA/TPU:

- measured on-chip (v5e, 16M elements): `lax.sort` 0.07-0.13 s, roll 0.024 s,
  cumsum 0.027 s, but gather 0.17 s and scatter 0.14 s.  Every round is
  therefore built from sorts/rolls/scans only: `rank[i+k]` is a dynamic
  `jnp.roll` (never a gather), and the inverse permutation comes from a
  second 1-key sort (never a scatter).
- the bootstrap sorts the first 15 bytes directly (3 u32 words + one word
  packing bytes 12..14 with a remaining-length tiebreak) instead of starting
  from single-byte ranks, eliminating two doubling rounds.
- after the unresolved count drops under n/4, rounds run over a COMPACTED
  active set at a static bucket width (n/4, then n/32) inside the same
  compiled while_loop — libcubwt's unresolved-segments-only strategy
  (libcubwt.cu:1475-1702) with no per-round host sync.
- ranks use the group-start (Karkkainen-Sanders) convention, so a partial
  re-rank of one group is `group_base + local_offset` — this is what makes
  the segmented variant below possible.
- `suffix_array_fast` (host-driven) mirrors libcubwt's "sort only the
  unresolved segments" (libcubwt.cu:1475-1702): once the unresolved fraction
  drops below a threshold, each round gathers the unresolved positions into
  a padded bucket from a fixed ladder (few XLA programs), sorts just those,
  re-ranks them in place, and scatters the ranks back.  Text-like data
  resolves almost everything by depth 32, so the tail rounds are tiny.

Stream convention (verified against libsais via the native runtime,
native/bwt.cc, reference bwt/bwt.cpp:178-230):
  U[0] = T[n-1]; U[1..] = T[SA[j]-1] for ranks j skipping suffix 0;
  primary index = rank(suffix 0) + 1;
  aux indexes (rate r = 2^floor(log2(n/8))): indexes[t] = rank(suffix (t+1)r).

Inverse: the serial LF chase does not map to TPU (a chain step is a
dependent scalar gather); the permutation is list-ranked by pointer doubling
instead — O(n log n) gather traffic, fully parallel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_IMAX = 2**31 - 1  # plain int: no backend init at import time


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


# ---------------------------------------------------------------------------
# shared round pieces (all sort/roll/scan — no gathers or scatters)
# ---------------------------------------------------------------------------

_BOOT_DEPTH = 15


def _bootstrap(data: jax.Array, n_valid=None):
    """Depth-15 bootstrap: sort on 3 big-endian u32 words + a fourth word
    packing bytes 12..14 with the remaining length (4 sort keys total).

    Returns (rank, unresolved_mask) in position order, rank in group-start
    convention.  The remaining-length tiebreak resolves suffix-prefix ties (a
    shorter suffix that is a prefix of a longer one sorts first and no later
    round could separate them, as both windows run off the end).

    `n_valid` (dynamic i32 scalar, padded-bucket variant): the true input
    length; lanes in [n_valid, n) are PAD lanes and get a unique singleton
    key — their low w3 byte is 0 while every real lane's is the remaining
    length in [1,15], and their high w3 bits are the lane index (unique
    while the pad span < 2^24, guaranteed by the 1.25x bucket ladder) — so
    they resolve at the bootstrap and never mix with a real group.
    """
    n = data.shape[0]
    nv = n if n_valid is None else n_valid
    idx = jnp.arange(n, dtype=jnp.int32)
    d32 = data.astype(jnp.uint32)

    def pbyte(j: int) -> jax.Array:
        return jnp.where(idx + j < nv, jnp.roll(d32, -j), 0)

    words = []
    for w in range(3):
        acc = jnp.zeros(n, dtype=jnp.uint32)
        for j in range(4):
            acc = (acc << 8) | pbyte(4 * w + j)
        words.append(acc)
    rem = jnp.clip(nv - idx, 1, _BOOT_DEPTH).astype(jnp.uint32)
    w3 = (((pbyte(12) << 8 | pbyte(13)) << 8 | pbyte(14)) << 8) | rem
    if n_valid is not None:
        w3 = jnp.where(idx >= nv,
                       (idx.astype(jnp.uint32) & 0xFFFFFF) << 8, w3)
    words.append(w3)

    sorted_all = lax.sort(tuple(words) + (idx,), num_keys=4, is_stable=True)
    pos_s = sorted_all[-1]
    heads = jnp.zeros(n, dtype=jnp.bool_).at[0].set(True)
    for col in sorted_all[:-1]:
        heads = heads | jnp.concatenate(
            [jnp.ones(1, dtype=jnp.bool_), col[1:] != col[:-1]])
    return _rank_mask_to_position_order(heads, pos_s, n)


def _rank_mask_to_position_order(heads: jax.Array, pos_s: jax.Array, n: int):
    """From sorted-order group heads + the sorted->position permutation,
    build position-ordered (group-start ranks, unresolved mask) with one
    1-key sort (no scatter).  For n < 2^25 the (rank, mask) pair rides the
    sort as ONE packed i32 payload (gstart<<1 | unresolved) — one fewer
    n-length array through the sort."""
    pos = jnp.arange(n, dtype=jnp.int32)
    gstart = lax.cummax(jnp.where(heads, pos, -1))
    nxt_head = jnp.concatenate([heads[1:], jnp.ones(1, dtype=jnp.bool_)])
    unresolved = ~(heads & nxt_head)
    if n < (1 << 25):
        packed = (gstart << 1) | unresolved.astype(jnp.int32)
        _, pk = lax.sort((pos_s, packed), num_keys=1, is_stable=True)
        return pk >> 1, (pk & 1).astype(jnp.bool_)
    _, rank, mask = lax.sort(
        (pos_s, gstart, unresolved.astype(jnp.int32)), num_keys=1,
        is_stable=True)
    return rank, mask.astype(jnp.bool_)


def _full_round(rank: jax.Array, k: jax.Array, n: int):
    """One doubling round over all n elements (sorts + rolls only)."""
    idx = jnp.arange(n, dtype=jnp.int32)
    r2 = jnp.where(idx + k < n, jnp.roll(rank, -k), -1)
    r1s, r2s, pos_s = lax.sort((rank, r2, idx), num_keys=2, is_stable=True)
    heads = jnp.concatenate([
        jnp.ones(1, dtype=jnp.bool_),
        (r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1]),
    ])
    rank, mask = _rank_mask_to_position_order(heads, pos_s, n)
    return rank, mask, jnp.sum(mask.astype(jnp.int32))


def _full_round4(rank: jax.Array, k: jax.Array, n: int, n_valid=None):
    """One QUADRUPLING round over all n elements: sort the 4-tuple
    (r(i), r(i+k), r(i+2k), r(i+3k)), which extends a depth-D order (k
    covering D) to depth 4D — two doubling rounds' progress for ~40% more
    sort cost (keys are ~linear in `lax.sort`, rounds are log).  Sound for
    the same reason doubling is: equal rank prefixes imply the suffixes
    genuinely share that many chars (the bootstrap's remaining-length
    tiebreak keeps short suffixes in singleton groups), and the -1 fill
    orders a shorter suffix before any continuation.

    `n_valid` (padded variant): continuations past the TRUE length rank -1,
    exactly as past-the-array ones do in the exact-shape path; pad lanes are
    already singletons so their rows are inert."""
    nv = n if n_valid is None else n_valid
    idx = jnp.arange(n, dtype=jnp.int32)

    def at(off):
        return jnp.where(idx + off < nv, jnp.roll(rank, -off), -1)

    r2, r3, r4 = at(k), at(2 * k), at(3 * k)
    r1s, r2s, r3s, r4s, pos_s = lax.sort(
        (rank, r2, r3, r4, idx), num_keys=4, is_stable=True)
    one = jnp.ones(1, dtype=jnp.bool_)
    heads = jnp.concatenate([one, (r1s[1:] != r1s[:-1])
                             | (r2s[1:] != r2s[:-1])
                             | (r3s[1:] != r3s[:-1])
                             | (r4s[1:] != r4s[:-1])])
    rank, mask = _rank_mask_to_position_order(heads, pos_s, n)
    return rank, mask, jnp.sum(mask.astype(jnp.int32))


# ---------------------------------------------------------------------------
# traceable variant (usable under vmap/shard_map): full rounds, then bucketed
# rounds over a compacted active set — all inside while_loops (no host syncs)
# ---------------------------------------------------------------------------

def _bucket_round_compact(rank: jax.Array, uidx: jax.Array, k: jax.Array,
                          n: int):
    """One doubling round over the compacted active set uidx (dead slots
    hold n).  Sound because an unresolved group's members are ALL unresolved
    (a group is a maximal run of equal ranks), so every member is in the
    bucket and the (r1, r2) subgroup offsets are globally correct.

    This is libcubwt's "segmented sort of unresolved groups only"
    (libcubwt.cu:1475-1702) without the per-round host sync that made the
    round-2 host-driven variant lose to the tunnel RTT: the bucket size is
    static, so the whole tail phase stays inside one compiled while_loop.
    """
    m = uidx.shape[0]
    valid = uidx < n
    r1 = jnp.where(valid,
                   jnp.take(rank, uidx, mode="fill", fill_value=0), _IMAX)
    r2 = jnp.take(rank, uidx + k, mode="fill", fill_value=-1)
    r1s, r2s, uidx_s = lax.sort((r1, r2, uidx), num_keys=2, is_stable=True)
    pos = jnp.arange(m, dtype=jnp.int32)
    h1 = jnp.concatenate([jnp.ones(1, dtype=jnp.bool_),
                          r1s[1:] != r1s[:-1]])
    h12 = h1 | jnp.concatenate([jnp.ones(1, dtype=jnp.bool_),
                                r2s[1:] != r2s[:-1]])
    s1 = lax.cummax(jnp.where(h1, pos, -1))
    s12 = lax.cummax(jnp.where(h12, pos, -1))
    new_rank = r1s + (s12 - s1)
    nxt_h12 = jnp.concatenate([h12[1:], jnp.ones(1, dtype=jnp.bool_)])
    still = ~(h12 & nxt_h12) & (uidx_s < n)
    rank = rank.at[uidx_s].set(new_rank, mode="drop")
    uidx_new = jnp.where(still, uidx_s, n)
    return rank, uidx_new, jnp.sum(still.astype(jnp.int32))


def _bucket_round_compact4(rank: jax.Array, uidx: jax.Array, k: jax.Array,
                           n: int, n_valid=None):
    """Quadrupling variant of `_bucket_round_compact`: refine each
    unresolved group by the (r@k, r@2k, r@3k) continuation tuple in one
    sort, advancing the covered depth 4x per round (see `_full_round4`).

    `n_valid` (padded variant): `n` stays the STATIC array length (the dead
    -slot sentinel and scatter bound); continuations at or past `n_valid`
    rank -1 instead of reading a pad lane's rank."""
    nv = n if n_valid is None else n_valid
    m = uidx.shape[0]
    valid = uidx < n
    r1 = jnp.where(valid,
                   jnp.take(rank, uidx, mode="fill", fill_value=0), _IMAX)

    def cont(off):
        got = jnp.take(rank, uidx + off, mode="fill", fill_value=-1)
        if n_valid is None:
            return got
        return jnp.where(uidx + off < nv, got, -1)

    r2 = cont(k)
    r3 = cont(2 * k)
    r4 = cont(3 * k)
    r1s, r2s, r3s, r4s, uidx_s = lax.sort(
        (r1, r2, r3, r4, uidx), num_keys=4, is_stable=True)
    pos = jnp.arange(m, dtype=jnp.int32)
    one = jnp.ones(1, dtype=jnp.bool_)
    h1 = jnp.concatenate([one, r1s[1:] != r1s[:-1]])
    hall = h1 | jnp.concatenate([one, (r2s[1:] != r2s[:-1])
                                 | (r3s[1:] != r3s[:-1])
                                 | (r4s[1:] != r4s[:-1])])
    s1 = lax.cummax(jnp.where(h1, pos, -1))
    sall = lax.cummax(jnp.where(hall, pos, -1))
    new_rank = r1s + (sall - s1)
    nxt_hall = jnp.concatenate([hall[1:], one])
    still = ~(hall & nxt_hall) & (uidx_s < n)
    rank = rank.at[uidx_s].set(new_rank, mode="drop")
    uidx_new = jnp.where(still, uidx_s, n)
    return rank, uidx_new, jnp.sum(still.astype(jnp.int32))


@jax.jit
def suffix_array(data: jax.Array):
    """Suffix array + ranks (ISA) of uint8[n] via prefix doubling; fully
    traceable (vmap/shard_map-safe).

    Three phases, all compiled into one program: full rounds while the
    unresolved count exceeds the big bucket, then bucketed rounds at n/4,
    then at n/32.  Text-like data resolves almost everything by depth ~30,
    so nearly all rounds run at bucket width instead of n.  All rounds
    QUADRUPLE the covered depth (4-tuple continuation keys): ~half the
    rounds of plain doubling for ~40% more per-round sort cost."""
    n = data.shape[0]
    rank, mask = _bootstrap(data)
    cnt = jnp.sum(mask.astype(jnp.int32))
    m1 = min(n, max(4096, n // 4))
    m2 = min(n, max(4096, n // 32))

    def body_full(state):
        rank, mask, k, _ = state
        rank, mask, cnt = _full_round4(rank, k, n)
        return rank, mask, k * 4, cnt

    def cond_full(state):
        _, _, k, cnt = state
        return (cnt > m1) & (k < 2 * n)

    rank, mask, k, cnt = lax.while_loop(
        cond_full, body_full, (rank, mask, jnp.int32(_BOOT_DEPTH), cnt))

    uidx = jnp.nonzero(mask, size=m1, fill_value=n)[0].astype(jnp.int32)

    def body_bucket(state):
        rank, uidx, k, _ = state
        rank, uidx, cnt = _bucket_round_compact4(rank, uidx, k, n)
        return rank, uidx, k * 4, cnt

    def cond_b1(state):
        _, _, k, cnt = state
        return (cnt > m2) & (k < 2 * n)

    rank, uidx, k, cnt = lax.while_loop(
        cond_b1, body_bucket, (rank, uidx, k, cnt))

    sel = jnp.nonzero(uidx < n, size=m2, fill_value=m1)[0].astype(jnp.int32)
    uidx2 = jnp.take(uidx, sel, mode="fill", fill_value=n)

    def cond_b2(state):
        _, _, k, cnt = state
        return (cnt > 0) & (k < 2 * n)

    rank, _, _, _ = lax.while_loop(
        cond_b2, body_bucket, (rank, uidx2, k, cnt))
    idx = jnp.arange(n, dtype=jnp.int32)
    _, sa = lax.sort((rank, idx), num_keys=1, is_stable=True)
    return sa, rank


# ---------------------------------------------------------------------------
# padded (shape-bucketed) variant: ONE XLA program per size bucket
# ---------------------------------------------------------------------------
#
# The reference GPU sorters reuse one device arena across variable block
# sizes (libcubwt.cu:2239-2375 allocates once, st.cu:372-379 pads); the XLA
# analog is shape bucketing (the trick ops/st.py:77-129 uses for the ST op):
# round the input up to a bucket from engine.device_bucket's 1.25x ladder and
# pass the TRUE length as a dynamic scalar, so variable-size LZP outputs all
# share one compiled program per bucket instead of compiling per exact shape.
#
# Pad lanes [n, m) are given unique singleton bootstrap keys (see
# `_bootstrap`), so they are resolved before the first doubling round and
# never join a real group; their ranks interleave arbitrarily with the real
# ones (ranks only need to be order-isomorphic on real lanes for doubling),
# and the extraction displaces them past every real lane with one key bump.


def _suffix_array_padded(data: jax.Array, n_valid):
    """Ranks (ISA, mixed real+pad, unique) of uint8[m] whose true content is
    data[:n_valid]; fully traceable, same 3-phase round structure as
    `suffix_array`."""
    m = data.shape[0]
    rank, mask = _bootstrap(data, n_valid=n_valid)
    cnt = jnp.sum(mask.astype(jnp.int32))
    m1 = min(m, max(4096, m // 4))
    m2 = min(m, max(4096, m // 32))

    def body_full(state):
        rank, mask, k, _ = state
        rank, mask, cnt = _full_round4(rank, k, m, n_valid=n_valid)
        return rank, mask, k * 4, cnt

    def cond_full(state):
        _, _, k, cnt = state
        return (cnt > m1) & (k < 2 * m)

    rank, mask, k, cnt = lax.while_loop(
        cond_full, body_full, (rank, mask, jnp.int32(_BOOT_DEPTH), cnt))

    uidx = jnp.nonzero(mask, size=m1, fill_value=m)[0].astype(jnp.int32)

    def body_bucket(state):
        rank, uidx, k, _ = state
        rank, uidx, cnt = _bucket_round_compact4(rank, uidx, k, m,
                                                 n_valid=n_valid)
        return rank, uidx, k * 4, cnt

    def cond_b1(state):
        _, _, k, cnt = state
        return (cnt > m2) & (k < 2 * m)

    rank, uidx, k, cnt = lax.while_loop(
        cond_b1, body_bucket, (rank, uidx, k, cnt))

    sel = jnp.nonzero(uidx < m, size=m2, fill_value=m1)[0].astype(jnp.int32)
    uidx2 = jnp.take(uidx, sel, mode="fill", fill_value=m)

    def cond_b2(state):
        _, _, k, cnt = state
        return (cnt > 0) & (k < 2 * m)

    rank, _, _, _ = lax.while_loop(
        cond_b2, body_bucket, (rank, uidx2, k, cnt))
    return rank


_MAX_AUX = 16  # (n-1)//aux_rate(n) is in [8, 16] for the format rate


def _extract_bwt_padded(data: jax.Array, rank: jax.Array, n_valid, r):
    """U + primary + aux from mixed real/pad ranks.  Pad lanes are displaced
    past every real lane by one key bump (final ranks are unique, so
    rank + m*is_pad keeps real order and pushes pads to the tail), and the
    sampled dense ranks subtract the pads below them (compare-reduce over
    the <=17 sample values).  Outputs: U[m] (rows >= n_valid are junk the
    caller drops), primary, aux int32[16] (caller slices to (n-1)//r)."""
    m = data.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    is_pad = idx >= n_valid

    prev = jnp.roll(data, 1)
    prev = prev.at[0].set(jnp.take(data, n_valid - 1))
    key = rank + jnp.where(is_pad, jnp.int32(m), 0)
    _, A = lax.sort((key, prev), num_keys=1, is_stable=True)

    t16 = jnp.arange(1, _MAX_AUX + 1, dtype=jnp.int32)
    spos = jnp.concatenate([jnp.zeros(1, jnp.int32), t16 * r])
    valid_s = spos < n_valid
    svals = jnp.take(rank, jnp.minimum(spos, m - 1))
    pads_below = jnp.sum(
        (rank[None, :] < svals[:, None]) & is_pad[None, :],
        axis=1, dtype=jnp.int32)
    dense = jnp.where(valid_s, svals - pads_below, 0)

    r0 = dense[0]
    w = jnp.arange(m, dtype=jnp.int32)
    U = jnp.where(w <= r0, jnp.roll(A, 1), A)
    U = U.at[0].set(jnp.take(A, r0))
    return U, r0 + 1, dense[1:]


@jax.jit
def _bwt_encode_padded_jit(data: jax.Array, n_valid, r):
    rank = _suffix_array_padded(data, n_valid)
    return _extract_bwt_padded(data, rank, n_valid, r)


def bwt_encode_padded(data_padded: jax.Array, n: int, r: int):
    """Forward BWT of data_padded[:n] through the shape-bucketed program.

    `data_padded` is uint8[m] with m >= n (any fill past n); `n` and `r`
    (the aux sampling rate, `aux_rate(n)` for the reference format) ride as
    dynamic scalars, so every (block, LZP-output) size in a bucket shares
    one compiled program.  Returns (U uint8[m] — first n rows valid,
    primary int32, aux int32[16] — first (n-1)//r valid), stream convention
    identical to `bwt_encode` (verified against the native runtime)."""
    return _bwt_encode_padded_jit(data_padded, jnp.int32(n), jnp.int32(r))


# ---------------------------------------------------------------------------
# host-driven variant: bucketed tail rounds over unresolved segments only
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("m_pad",))
def _bucket_round(rank: jax.Array, mask: jax.Array, k: jax.Array,
                  m_pad: int):
    """One doubling round restricted to the unresolved positions, padded to
    the static bucket size m_pad (pads sort last and scatter out of range)."""
    n = rank.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    r2full = jnp.where(idx + k < n, jnp.roll(rank, -k), -1)

    uidx = jnp.nonzero(mask, size=m_pad, fill_value=n)[0].astype(jnp.int32)
    valid = uidx < n
    r1 = jnp.where(valid, jnp.take(rank, uidx, mode="fill", fill_value=0),
                   _IMAX)
    r2 = jnp.take(r2full, uidx, mode="fill", fill_value=0)

    r1s, r2s, uidx_s = lax.sort((r1, r2, uidx), num_keys=2, is_stable=True)
    pos = jnp.arange(m_pad, dtype=jnp.int32)
    h1 = jnp.concatenate([jnp.ones(1, dtype=jnp.bool_),
                          r1s[1:] != r1s[:-1]])
    h12 = h1 | jnp.concatenate([jnp.ones(1, dtype=jnp.bool_),
                                r2s[1:] != r2s[:-1]])
    s1 = lax.cummax(jnp.where(h1, pos, -1))
    s12 = lax.cummax(jnp.where(h12, pos, -1))
    new_rank = r1s + (s12 - s1)
    nxt_h12 = jnp.concatenate([h12[1:], jnp.ones(1, dtype=jnp.bool_)])
    still = ~(h12 & nxt_h12) & (uidx_s < n)

    rank = rank.at[uidx_s].set(new_rank, mode="drop")
    mask = mask.at[uidx_s].set(still, mode="drop")
    return rank, mask, jnp.sum(still.astype(jnp.int32))


@jax.jit
def _bootstrap_counted(data: jax.Array):
    rank, mask = _bootstrap(data)
    return rank, mask, jnp.sum(mask.astype(jnp.int32))


@jax.jit
def _full_round_counted(rank: jax.Array, k: jax.Array):
    return _full_round(rank, k, rank.shape[0])


def _bucket_ladder(n: int):
    """Static bucket sizes (few distinct XLA programs per n)."""
    out = []
    m = max(n // 4, 1)
    while m > 4096:
        out.append(m)
        m //= 4
    out.append(m)
    return out


def suffix_array_fast(data: jax.Array):
    """Host-driven suffix array: full rounds while most positions are
    unresolved, then bucketed rounds over the unresolved segments only
    (libcubwt.cu:1475-1702's strategy in XLA shapes).  Not traceable.

    Measured (v5e, 16 MB bench block): 16.6 MB/s on-chip vs 27.7 MB/s for
    the fused traceable variant — each round costs a device->host count
    round-trip, and over this harness's remote tunnel (~50-100 ms RTT) the
    sync overhead exceeds the savings from the smaller sorts.  On a
    co-located TPU host the trade flips; the engine uses the traceable
    variant by default."""
    n = int(data.shape[0])
    ladder = _bucket_ladder(n)
    rank, mask, cnt = _bootstrap_counted(data)
    cnt = int(cnt)
    k = _BOOT_DEPTH
    while cnt > 0 and k < 2 * n:
        if cnt > n // 4:
            rank, mask, cnt_d = _full_round_counted(rank, jnp.int32(k))
        else:
            m_pad = next((m for m in reversed(ladder) if m >= cnt), ladder[0])
            rank, mask, cnt_d = _bucket_round(rank, mask, jnp.int32(k), m_pad)
        cnt = int(cnt_d)
        k *= 2
    return rank


# ---------------------------------------------------------------------------
# Difference-cover (DC3) suffix sort: doubling over the 2n/3 sample
# ---------------------------------------------------------------------------
#
# The reference GPU BWT reduces the doubling to a difference-cover sample
# before iterating (libcubwt.cu:644-738 builds the reduced arrays, :1875-2030
# merges the classes back).  TPU formulation:
#
# - sample = text positions p with p % 3 != 0, linearized INTERLEAVED:
#   reduced slot j = 2t+b  <->  text p = 3t+b+1 (b in {0,1}).  Stepping an
#   EVEN k in reduced coordinates advances exactly 1.5k text chars for every
#   slot, so the existing doubling rounds apply verbatim with n -> m: the
#   bootstrap resolves 15 text chars, and each round with reduced step k
#   extends a depth-D order to D + 1.5k (k chosen so 1.5k == D, i.e. the
#   reduced step starts at 10 and doubles).  Real slots are a contiguous
#   prefix [0, m) of the padded 2*ceil(n/3) grid, so `j + k < m` is exactly
#   the `position + depth < n` validity test the shared rounds use.
# - merge (libcubwt's dual comparator, made sortable): with rank_S total on
#   the sample, (T[p], rank_S(p+1)) is an exact suffix comparator on C u S1
#   and (T[p]T[p+1], rank_S(p+2)) on C u S2 (C = p%3==0 classes; every
#   lookup lands in the sample).  Two 2-key sorts + exclusive cumsums give
#   each suffix its global rank:
#     rank(c in C)  = idx1(c) + (idx2(c) - C_before2(c))   [C+S1 before + S2]
#     rank(s in S1) = rank_S(s) + C_before1(s)
#     rank(s in S2) = rank_S(s) + C_before2(s)
#   Values return to position order with one 1-key sort per merge (no
#   scatter), and class columns reassemble into text order by the same
#   [n3, 3] reshape that extracted them.
# - positions past the end rank as n-1-p (strictly decreasing negatives), so
#   a shorter suffix that is a prefix of a longer one sorts first — the same
#   convention as the bootstrap's remaining-length tiebreak.


def _dc3_sample_rank(data: jax.Array, n3: int, m: int):
    """Rank the 2n/3 sample suffixes by prefix doubling over the reduced
    interleaved array; returns all-distinct group-start ranks, slot order."""
    n = data.shape[0]
    L = 3 * n3
    dpad = jnp.pad(data, (0, L - n))
    idx = jnp.arange(L, dtype=jnp.int32)
    d32 = dpad.astype(jnp.uint32)

    def pbyte(j: int) -> jax.Array:
        return jnp.where(idx + j < n, jnp.roll(d32, -j), 0)

    def red(a: jax.Array) -> jax.Array:
        return a.reshape(n3, 3)[:, 1:].reshape(2 * n3)[:m]

    words = []
    for w in range(3):
        acc = jnp.zeros(L, dtype=jnp.uint32)
        for j in range(4):
            acc = (acc << 8) | pbyte(4 * w + j)
        words.append(red(acc))
    rem = jnp.minimum(n - idx, _BOOT_DEPTH).astype(jnp.uint32)
    w3 = (((pbyte(12) << 8 | pbyte(13)) << 8 | pbyte(14)) << 8) | rem
    words.append(red(w3))

    ridx = jnp.arange(m, dtype=jnp.int32)
    sorted_all = lax.sort(tuple(words) + (ridx,), num_keys=4, is_stable=True)
    pos_s = sorted_all[-1]
    heads = jnp.zeros(m, dtype=jnp.bool_).at[0].set(True)
    for col in sorted_all[:-1]:
        heads = heads | jnp.concatenate(
            [jnp.ones(1, dtype=jnp.bool_), col[1:] != col[:-1]])
    rank, mask = _rank_mask_to_position_order(heads, pos_s, m)

    cnt = jnp.sum(mask.astype(jnp.int32))
    m1 = min(m, max(4096, m // 4))
    m2 = min(m, max(4096, m // 32))

    def body_full(state):
        rank, mask, k, _ = state
        rank, mask, cnt = _full_round4(rank, k, m)
        return rank, mask, k * 4, cnt

    def cond_full(state):
        _, _, k, cnt = state
        return (cnt > m1) & (k < 2 * m)

    rank, mask, k, cnt = lax.while_loop(
        cond_full, body_full, (rank, mask, jnp.int32(10), cnt))

    uidx = jnp.nonzero(mask, size=m1, fill_value=m)[0].astype(jnp.int32)

    def body_bucket(state):
        rank, uidx, k, _ = state
        rank, uidx, cnt = _bucket_round_compact4(rank, uidx, k, m)
        return rank, uidx, k * 4, cnt

    def cond_b1(state):
        _, _, k, cnt = state
        return (cnt > m2) & (k < 2 * m)

    rank, uidx, k, cnt = lax.while_loop(
        cond_b1, body_bucket, (rank, uidx, k, cnt))

    sel = jnp.nonzero(uidx < m, size=m2, fill_value=m1)[0].astype(jnp.int32)
    uidx2 = jnp.take(uidx, sel, mode="fill", fill_value=m)

    def cond_b2(state):
        _, _, k, cnt = state
        return (cnt > 0) & (k < 2 * m)

    rank, _, _, _ = lax.while_loop(
        cond_b2, body_bucket, (rank, uidx2, k, cnt))
    return rank


def _merge_class_sort(k_char, k_rank, pay, own):
    """One merge side: sort C u S_b by its exact-comparator key.  Returns
    the sorted payload positions, their sorted index, the C-class mask, the
    exclusive count of C elements before each slot, and the sample ranks
    carried through the sort."""
    N = k_char.shape[0]
    _, _, pay_s, own_s = lax.sort(
        (k_char, k_rank, pay, own), num_keys=2, is_stable=True)
    i = jnp.arange(N, dtype=jnp.int32)
    is_c = (pay_s % 3) == 0
    c_exc = jnp.cumsum(is_c.astype(jnp.int32)) - is_c.astype(jnp.int32)
    return pay_s, i, is_c, c_exc, own_s


@jax.jit
def _dc3_rank_jit(data: jax.Array):
    """Position-ordered all-distinct suffix ranks of uint8[n] via DC3."""
    n = data.shape[0]
    n3 = (n + 2) // 3
    m = n - n3
    L = 3 * n3

    rank_red = _dc3_sample_rank(data, n3, m)

    # sample ranks back to text coordinates (reshape, no scatter), with
    # past-the-end positions ranking n-1-p (strictly decreasing negatives)
    rr_pad = jnp.concatenate(
        [rank_red, jnp.zeros(2 * n3 - m, dtype=jnp.int32)])
    cols = rr_pad.reshape(n3, 2)
    rs_L = jnp.stack(
        [jnp.zeros(n3, dtype=jnp.int32), cols[:, 0], cols[:, 1]],
        axis=1).reshape(L)
    posL = jnp.arange(L + 2, dtype=jnp.int32)
    rs_full = jnp.where(posL < n,
                        jnp.concatenate([rs_L, jnp.zeros(2, jnp.int32)]),
                        n - 1 - posL)

    dpadL = jnp.concatenate(
        [data, jnp.zeros(L + 2 - n, dtype=jnp.uint8)])
    dmat = dpadL[:L].reshape(n3, 3).astype(jnp.int32)
    rsmat = rs_full[:L].reshape(n3, 3)

    n_c = n3                      # positions 3t < n for every t < n3
    m_s1 = (n + 1) // 3           # positions 3t+1 < n
    m_s2 = m - m_s1               # positions 3t+2 < n

    # --- sort 1: C u S1 by (T[p], rank_S(p+1)) ---
    k1_char = jnp.concatenate([dmat[:, 0], dmat[:m_s1, 1]])
    k1_rank = jnp.concatenate([rsmat[:, 1], rsmat[:m_s1, 2]])
    pay1 = jnp.concatenate([
        3 * jnp.arange(n_c, dtype=jnp.int32),
        3 * jnp.arange(m_s1, dtype=jnp.int32) + 1])
    own1 = jnp.concatenate([
        jnp.zeros(n_c, dtype=jnp.int32), rsmat[:m_s1, 1]])
    pay_s, i1, is_c1, c_exc1, own_s1 = _merge_class_sort(
        k1_char, k1_rank, pay1, own1)
    v1 = jnp.where(is_c1, i1, own_s1 + c_exc1)
    _, v1_bypos = lax.sort((pay_s, v1), num_keys=1, is_stable=True)
    pad1 = 2 * n3 - v1_bypos.shape[0]
    grid1 = jnp.concatenate(
        [v1_bypos, jnp.zeros(pad1, dtype=jnp.int32)]).reshape(n3, 2)

    # --- sort 2: C u S2 by (T[p]T[p+1], rank_S(p+2)) ---
    t_next = dpadL[3::3][:n3].astype(jnp.int32)     # T[3(t+1)]
    rs_next1 = rs_full[4::3][:n3]                   # rank_S(3t+4)
    k2_char = jnp.concatenate([
        (dmat[:, 0] << 8) | dmat[:, 1],
        (dmat[:m_s2, 2] << 8) | t_next[:m_s2]])
    k2_rank = jnp.concatenate([rsmat[:, 2], rs_next1[:m_s2]])
    pay2 = jnp.concatenate([
        3 * jnp.arange(n_c, dtype=jnp.int32),
        3 * jnp.arange(m_s2, dtype=jnp.int32) + 2])
    own2 = jnp.concatenate([
        jnp.zeros(n_c, dtype=jnp.int32), rsmat[:m_s2, 2]])
    pay_s2, i2, is_c2, c_exc2, own_s2 = _merge_class_sort(
        k2_char, k2_rank, pay2, own2)
    v2 = jnp.where(is_c2, i2 - c_exc2, own_s2 + c_exc2)
    _, v2_bypos = lax.sort((pay_s2, v2), num_keys=1, is_stable=True)
    pad2 = 2 * n3 - v2_bypos.shape[0]
    grid2 = jnp.concatenate(
        [v2_bypos, jnp.zeros(pad2, dtype=jnp.int32)]).reshape(n3, 2)

    # assembly: C ranks add the two sides' contributions; S ranks are final
    c_rank = grid1[:, 0] + grid2[:, 0]
    rank_text = jnp.stack(
        [c_rank, grid1[:, 1], grid2[:, 1]], axis=1).reshape(L)[:n]
    return rank_text


def suffix_array_dc3(data: jax.Array):
    """Suffix array + ranks via the difference-cover doubling path."""
    n = int(data.shape[0])
    if n < 64:
        return suffix_array(data)
    rank = _dc3_rank_jit(data)
    idx = jnp.arange(n, dtype=jnp.int32)
    _, sa = lax.sort((rank, idx), num_keys=1, is_stable=True)
    return sa, rank


def bwt_encode_dc3(data: jax.Array):
    """Forward BWT via the DC3 sample-doubling suffix sort.

    Two jit calls on purpose: fusing _dc3_rank_jit + _extract_bwt into one
    program makes XLA:TPU pad an HLO temp to 10.67 GB at 1.2% utilization
    (OOM on a 16 GB v5e at 16 MB input, measured 2026-08-19), while the
    same pieces run fine as separate programs (0.995 s + 0.065 s).
    """
    n = int(data.shape[0])
    if n < 64:
        return bwt_encode(data)
    rank = _dc3_rank_jit(data)
    return _extract_bwt(data, rank)


# ---------------------------------------------------------------------------
# BWT wrappers
# ---------------------------------------------------------------------------

def _extract_bwt_impl(data: jax.Array, rank: jax.Array, r: int):
    """U + primary + aux from position-ordered ranks, gather-free: one 1-key
    sort carries T[i-1] into rank order, and the primary-row deletion is a
    select between the array and its roll.  `r` is the aux sampling rate."""
    n = data.shape[0]
    prevbyte = jnp.roll(data, 1)  # T[i-1]; at i=0 this is T[n-1] (= row r0)
    _, A = lax.sort((rank, prevbyte), num_keys=1, is_stable=True)
    r0 = rank[0]
    w = jnp.arange(n, dtype=jnp.int32)
    U = jnp.where(w <= r0, jnp.roll(A, 1), A)
    U = U.at[0].set(A[r0])

    n_aux = (n - 1) // r
    aux = rank[(jnp.arange(n_aux, dtype=jnp.int32) + 1) * r]
    return U, r0 + 1, aux


@jax.jit
def _extract_bwt(data: jax.Array, rank: jax.Array):
    return _extract_bwt_impl(data, rank, aux_rate(data.shape[0]))


def bwt_encode(data: jax.Array):
    """Forward BWT of uint8[n] (traceable pipeline).

    Returns (U uint8[n], primary int32, aux int32[(n-1)//r]) in the
    reference's stream convention.
    """
    n = data.shape[0]
    if n <= 1:
        return data, jnp.int32(n), jnp.zeros(0, dtype=jnp.int32)
    return _bwt_encode_jit(data)


@jax.jit
def _bwt_encode_jit(data: jax.Array):
    _, rank = suffix_array(data)
    return _extract_bwt(data, rank)


@partial(jax.jit, static_argnames=("r",))
def _bwt_encode_rate_jit(data: jax.Array, r: int):
    _, rank = suffix_array(data)
    return _extract_bwt_impl(data, rank, r)


def bwt_encode_wideaux_device(data: jax.Array, r: int):
    """Forward BWT with the wide-aux sampling rate, fully on device —
    the sort stage of the device-resident encode pipeline (the result
    stays in HBM for the wide coder's schedule builder).  Returns
    (U uint8[n], primary int32, aux int32[(n-1)//r]) matching the native
    tbsc_bwt_encode_rate convention (native/bwt.cc)."""
    n = data.shape[0]
    if n <= 1:
        return data, jnp.int32(n), jnp.zeros(0, dtype=jnp.int32)
    return _bwt_encode_rate_jit(data, r)


def bwt_encode_fast(data: jax.Array):
    """Forward BWT via the host-driven segmented suffix sort (engine path)."""
    n = int(data.shape[0])
    if n <= 1:
        return data, jnp.int32(n), jnp.zeros(0, dtype=jnp.int32)
    rank = suffix_array_fast(data)
    return _extract_bwt(data, rank)


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


# ---------------------------------------------------------------------------
# Wide-aux inverse BWT: thousands of parallel forward-PSI chains
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("r", "n", "unroll"))
def _unbwt_wideaux_jit(T, index, aux, r: int, n: int, unroll: int = 8):
    """Device inverse BWT for the wide-aux profile (SURVEY §5's scaled
    aux-index design: sampling rate r ~ n/4096+ gives num_indexes+1
    independent forward chains, chased in lockstep as one vectorized
    gather per step).

    PSI is built with ONE stable sort (no scatter, which XLA serializes on
    TPU): sorting (BWT char, position) pairs enumerates the LF slots in
    row order, so PSI[1..n] = row(u_sorted) and PSI[0] = primary.  Char
    counts come from the sorted keys via searchsorted (bincount is a
    serialized scatter-add on TPU), and (first-char << 25 | PSI) packs
    both per-row values into one u32 so each chase step is a single [C]
    gather.  Chain t emits positions [t*r, (t+1)*r); the last chain's
    surplus steps fall past n and are sliced off.

    Measured v5e, 16 MB block, 8K chains: 48 MB/s on-chip (the old
    pointer-doubling inverse ran at 2.2 MB/s).  The floor is the chip's
    random-gather rate (~10 ns/element over a 64 MB table) plus the
    initial sort; a bigram (2-bytes-per-gather) variant would need an
    extra n-element setup gather that cancels its step savings.
    """
    from jax import lax

    d32 = T.astype(jnp.int32)
    u = jnp.arange(n, dtype=jnp.int32)
    cs, u_sorted = lax.sort((d32, u), num_keys=1, is_stable=True)
    psi_tail = u_sorted + (u_sorted >= index).astype(jnp.int32)
    PSI = jnp.concatenate(
        [index[None].astype(jnp.int32), psi_tail])

    # char counts from the SORTED chars (searchsorted, not bincount — XLA
    # lowers bincount to a serialized scatter-add on TPU); the first char
    # of row q is then a repeat expansion, and (char << 25 | PSI) packs
    # both per-row values into ONE gathered word per chase step
    # (n + 1 <= 2^25 for the 32 MB block cap).
    edges = jnp.searchsorted(cs, jnp.arange(257, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    cnt = edges[1:] - edges[:-1]
    row_char = jnp.concatenate([
        jnp.zeros(1, jnp.int32),  # sentinel row
        jnp.repeat(jnp.arange(256, dtype=jnp.int32), cnt,
                   total_repeat_length=n)])
    packed = ((row_char.astype(jnp.uint32) << 25)
              | PSI.astype(jnp.uint32))

    K = (n - 1) // r
    starts = jnp.concatenate([index[None].astype(jnp.int32), aux + 1])

    # lax.scan with stacked ys: one [C] gather per step yields the output
    # byte and the next row for every chain.
    def body(k, _):
        w = packed[k]
        return ((w & jnp.uint32(0x1FFFFFF)).astype(jnp.int32),
                (w >> 25).astype(jnp.uint8))

    # unroll: at K ~ 8K chains the per-iteration while-loop overhead is
    # comparable to the gather itself; several gathers per loop iteration
    # cut the loop-carried dispatch cost without changing results
    # (default 8; sweep via TBSC_WIDEAUX_UNROLL / tools/wideauxsweep.py).
    _, out = lax.scan(body, starts, None, length=r, unroll=unroll)
    return out.T.reshape(-1)[:n]


def unbwt_wideaux_device(data, index: int, indexes, r: int):
    """Host wrapper: returns the decoded bytes as ndarray, or None when no
    accelerator is available."""
    import jax
    import numpy as np

    if not any(d.platform != "cpu" for d in jax.devices()):
        return None
    import os

    n = int(len(data))
    # clamp to the swept 4..64 range (docs/TPU_SORT_NOTES.md): unroll is a
    # static jit arg, so every new value pays a fresh 90-130 s TPU compile,
    # and a malformed env var must not kill the decode path
    try:
        unroll = int(os.environ.get("TBSC_WIDEAUX_UNROLL", "8"))
    except ValueError:
        unroll = 8
    unroll = max(4, min(64, unroll))
    out = _unbwt_wideaux_jit(
        jnp.asarray(np.asarray(data, dtype=np.uint8)),
        jnp.int32(index),
        jnp.asarray(np.asarray(indexes, dtype=np.int32)),
        r, n, unroll)
    return np.asarray(out)
