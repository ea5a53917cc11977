"""On-device bit-schedule preparation for CODER_QLFC_WIDE.

Replaces the native host walker (native/wide.cc wide_schedule_packed): from
raw block bytes (+ the lane-size table), compute the per-lane packed 2-bit
(bit | active) iteration planes the Pallas coder kernel consumes — entirely
as vectorized jnp ops, no sequential per-byte walk:

1. lane gather + run-length encoding (boundary detect + per-lane
   compaction of run starts via one argsort);
2. MTF ranks WITHOUT a sequential MTF table: with the identity-initialized
   table, the rank of an event with char c is
       seen(c):   #{d : last_occ(d) > last_occ(c)}          (strictly more
                  recent distinct chars; d == c contributes 0)
       unseen(c): S + c - #{d < c seen}                      (S = #distinct
                  seen; unseen chars keep identity order behind the seen
                  block)
   last_occ per char is an exclusive running max over events — 256
   cummax passes over the [lanes, events] plane; the previous occurrence
   of the event's OWN char comes from one argsort by (char, event).
3. closed-form expansion of (rank, run) events into the flat bit sequence
   (flag / unary exponent / mantissa, rank then run — the exact layout of
   ops/wide.py _lane_bits), via jnp.repeat(total_repeat_length=IT) and
   take_along_axis — no scatter.

Two jitted phases: phase 1 produces per-event (rank, len, bit-count) and
the true max_bits (a scalar sync), phase 2 expands with IT sized by the
ACTUAL bucketed max_bits — the 17-bits-per-byte worst case would otherwise
force gigabyte-scale [lanes, IT] intermediates.

Parity oracle: native tbsc_wide_schedule_packed (tests/test_wide.py).
"""

from __future__ import annotations

import functools

import numpy as np

from . import wide as W


@functools.lru_cache(maxsize=32)
def _events_call(L: int, C: int):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    E = C

    def events(data, starts, sizes):
        n = data.shape[0]
        # ---- lane gather + RLE ----
        col = jnp.arange(C, dtype=i32)
        idx = starts[:, None] + col[None, :]
        valid = col[None, :] < sizes[:, None]
        lb = jnp.where(valid,
                       data[jnp.clip(idx, 0, n - 1)].astype(i32), -1)
        prev = jnp.concatenate(
            [jnp.full((L, 1), -2, i32), lb[:, :-1]], axis=1)
        newrun = valid & (lb != prev)
        keys = jnp.where(newrun, col[None, :], C + col[None, :])
        order = jnp.argsort(keys, axis=1)[:, :E]          # [L, E]
        ev_start = jnp.take_along_axis(
            jnp.broadcast_to(col[None, :], (L, C)), order, axis=1)
        ev_char = jnp.take_along_axis(lb, order, axis=1)
        nruns = jnp.sum(newrun.astype(i32), axis=1)        # [L]
        ecol = jnp.arange(E, dtype=i32)
        evalid = ecol[None, :] < nruns[:, None]
        ev_char = jnp.where(evalid, ev_char, -1)
        nxt = jnp.concatenate(
            [ev_start[:, 1:], jnp.zeros((L, 1), i32)], axis=1)
        last_ev = ecol[None, :] == (nruns[:, None] - 1)
        ev_len = jnp.where(last_ev, sizes[:, None] - ev_start,
                           nxt - ev_start)
        ev_len = jnp.where(evalid, ev_len, 1)

        # ---- MTF ranks ----
        # previous occurrence of the event's own char: sort by (char, e)
        okey = ev_char * E + ecol[None, :]
        okey = jnp.where(evalid, okey, jnp.iinfo(jnp.int32).max)
        co = jnp.argsort(okey, axis=1)                     # [L, E]
        ch_s = jnp.take_along_axis(ev_char, co, axis=1)
        prev_s = jnp.concatenate(
            [jnp.full((L, 1), -1, i32), co[:, :-1]], axis=1)
        same = jnp.concatenate(
            [jnp.zeros((L, 1), jnp.bool_), ch_s[:, 1:] == ch_s[:, :-1]],
            axis=1)
        prevocc_s = jnp.where(same, prev_s, -1)
        prev_own = jnp.zeros((L, E), i32)
        prev_own = prev_own.at[
            jnp.arange(L)[:, None], co].set(prevocc_s)     # inverse perm

        rank = jnp.zeros((L, E), i32)
        s_all = jnp.zeros((L, E), i32)
        s_lt = jnp.zeros((L, E), i32)

        def char_pass(d, carry):
            rank, s_all, s_lt = carry
            occ = jnp.where(ev_char == d, ecol[None, :], -1)
            incl = jax.lax.cummax(occ, axis=1)
            lastd = jnp.concatenate(
                [jnp.full((L, 1), -1, i32), incl[:, :-1]], axis=1)
            rank = rank + (lastd > prev_own).astype(i32)
            seen = (lastd >= 0).astype(i32)
            s_all = s_all + seen
            s_lt = s_lt + jnp.where(d < ev_char, seen, 0)
            return rank, s_all, s_lt

        rank, s_all, s_lt = jax.lax.fori_loop(
            0, 256, char_pass, (rank, s_all, s_lt))
        unseen = prev_own < 0
        rank = jnp.where(unseen, s_all + ev_char - s_lt, rank)
        rank = jnp.where(evalid, rank, 0)

        # ---- per-event bit counts ----
        def bitlen(x):
            return 32 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.uint32)) \
                .astype(i32)

        brs = jnp.where(rank > 0, bitlen(rank), 0)
        has_u = ev_len != 1
        ubrs = jnp.where(has_u, bitlen(ev_len), 0)
        rlen = jnp.where(rank > 0,
                         (brs - 1) + (brs < W.RANK_EXP_CAP).astype(i32), 0)
        rmlen = jnp.where(rank > 0, brs - 1, 0)
        ulen = jnp.where(has_u,
                         (ubrs - 1) + (ubrs < W.RUN_EXP_CAP).astype(i32), 0)
        umlen = jnp.where(has_u, ubrs - 1, 0)
        uoff = 1 + rlen + rmlen
        B = jnp.where(evalid, uoff + 1 + ulen + umlen, 0)
        total = jnp.sum(B, axis=1)                         # [L] bits
        return rank, ev_len, B, total, jnp.max(total)

    return jax.jit(events)


@functools.lru_cache(maxsize=32)
def _expand_call(L: int, E: int, IT: int):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32

    def expand(rank, ev_len, B, total):
        def bitlen(x):
            return 32 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.uint32)) \
                .astype(i32)

        brs = jnp.where(rank > 0, bitlen(rank), 0)
        has_u = ev_len != 1
        ubrs = jnp.where(has_u, bitlen(ev_len), 0)
        rlen = jnp.where(rank > 0,
                         (brs - 1) + (brs < W.RANK_EXP_CAP).astype(i32), 0)
        rmlen = jnp.where(rank > 0, brs - 1, 0)
        ulen = jnp.where(has_u,
                         (ubrs - 1) + (ubrs < W.RUN_EXP_CAP).astype(i32), 0)
        uoff = 1 + rlen + rmlen
        S = jnp.cumsum(B, axis=1) - B                      # starts [L, E]

        ecol = jnp.arange(E, dtype=i32)
        eidx = jax.vmap(
            lambda b: jnp.repeat(ecol, b, total_repeat_length=IT))(B)
        gat = lambda a: jnp.take_along_axis(a, eidx, axis=1)
        j = jnp.arange(IT, dtype=i32)[None, :] - gat(S)
        rk_g, rn_g = gat(rank), gat(ev_len)
        brs_g, ubrs_g = gat(brs), gat(ubrs)
        rlen_g, uoff_g, ulen_g = gat(rlen), gat(uoff), gat(ulen)

        in_re = (j >= 1) & (j < 1 + rlen_g)
        in_rm = (j >= 1 + rlen_g) & (j < uoff_g)
        in_ue = (j >= uoff_g + 1) & (j < uoff_g + 1 + ulen_g)
        in_um = j >= uoff_g + 1 + ulen_g
        t_rm = j - (1 + rlen_g)
        t_um = j - (uoff_g + 1 + ulen_g)
        bit = jnp.where(j == 0, (rk_g > 0).astype(i32), 0)
        bit = jnp.where(in_re, ((j - 1) < (brs_g - 1)).astype(i32), bit)
        bit = jnp.where(
            in_rm,
            (jax.lax.shift_right_logical(
                rk_g, jnp.maximum(brs_g - 2 - t_rm, 0)) & 1), bit)
        bit = jnp.where(j == uoff_g, (rn_g != 1).astype(i32), bit)
        bit = jnp.where(in_ue,
                        ((j - uoff_g - 1) < (ubrs_g - 1)).astype(i32), bit)
        bit = jnp.where(
            in_um,
            (jax.lax.shift_right_logical(
                rn_g, jnp.maximum(ubrs_g - 2 - t_um, 0)) & 1), bit)
        active = jnp.arange(IT, dtype=i32)[None, :] < total[:, None]
        fld = jnp.where(active, bit | 2, 0).astype(jnp.uint8)

        f4 = fld.reshape(L, IT // 4, 4)
        packed = (f4[..., 0] | (f4[..., 1] << 2) | (f4[..., 2] << 4)
                  | (f4[..., 3] << 6))
        return packed

    return jax.jit(expand)


def _bucket(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# v2: event-indexed grid (round 5)
#
# The v1 builder above pads every [lanes, C] intermediate to the LARGEST
# balanced lane in BYTES (262 KB vs the 16 KB mean on the bench block — the
# 16x inflation measured as 52 s of the round-3 e2e).  v2 removes the byte
# grid entirely:
#
#   1. run boundaries + compaction on the FLAT [n] array: one stable 1-key
#      sort moves run-start positions (and their chars) to the front — no
#      per-lane byte padding ever exists;
#   2. events land on an [L, E] grid with E = bucket(max runs per lane);
#      the balancer splits lanes at run-count quantiles, so E is tight
#      (~the mean) by construction;
#   3. MTF ranks + bit counts reuse the v1 formulation on the event grid;
#   4. expansion to the packed iteration planes via 3 scatters (one u32
#      word per event, strictly increasing in the bit offset) + forward
#      fill with `lax.cummax` — replacing v1's 8 take_along_axis gathers
#      over [L, IT], which at the measured 12 ns/elem XLA gather cost were
#      ~0.45 s each.
#
# Static shapes are bucketed (RC = total runs, E = runs/lane, IT = bits/
# lane), sized by a single stats sync; the farm's fixed block size keeps
# the program count small.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _stats_call(n: int, L: int):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32

    def stats(data, starts):
        pos = jnp.arange(n, dtype=i32)
        is_start = jnp.zeros(n, jnp.bool_).at[starts].set(
            True, mode="drop")  # starts >= n (empty tail lanes) drop
        nr = is_start | jnp.concatenate(
            [jnp.ones(1, jnp.bool_), data[1:] != data[:-1]])
        cum = jnp.cumsum(nr.astype(i32))
        R = cum[-1]
        frid = cum[jnp.clip(starts, 0, n - 1)] - 1
        frid = jnp.where(starts >= n, R, frid)
        frid_ext = jnp.concatenate([frid, R[None]])
        maxpl = jnp.max(frid_ext[1:] - frid_ext[:-1])
        # longest run (RUN_EXP_CAP guard): max distance to the owning
        # boundary, one cummax — no n-element sort
        lastb = jax.lax.cummax(jnp.where(nr, pos, -1))
        maxrun = jnp.max(pos - lastb) + 1
        return jnp.stack([R, maxpl, maxrun])

    return jax.jit(stats)


@functools.lru_cache(maxsize=16)
def _events2_call(n: int, L: int, RC: int, E: int):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32

    def events(data, starts, sizes):
        pos = jnp.arange(n, dtype=i32)
        is_start = jnp.zeros(n, jnp.bool_).at[starts].set(
            True, mode="drop")  # starts >= n (empty tail lanes) drop
        nr = is_start | jnp.concatenate(
            [jnp.ones(1, jnp.bool_), data[1:] != data[:-1]])
        cum = jnp.cumsum(nr.astype(i32))

        # compaction: run starts (and their chars) to the front, position
        # order preserved by stability
        key = jnp.where(nr, pos, n)
        _, pos_s, char_s = jax.lax.sort(
            (key, pos, data), num_keys=1, is_stable=True)
        ev_start_g = pos_s[:RC]
        ev_char_g = char_s[:RC].astype(i32)

        # lane -> first global run id
        frid = cum[jnp.clip(starts, 0, n - 1)] - 1
        frid = jnp.where(starts >= n, cum[-1], frid)
        frid_ext = jnp.concatenate([frid, cum[-1][None]])
        nruns = frid_ext[1:] - frid_ext[:-1]                # [L]

        ecol = jnp.arange(E, dtype=i32)
        r = frid[:, None] + ecol[None, :]                   # [L, E]
        rc = jnp.clip(r, 0, RC - 1)
        evalid = ecol[None, :] < nruns[:, None]
        ev_start = jnp.where(evalid, ev_start_g[rc], 0)
        ev_char = jnp.where(evalid, ev_char_g[rc], -1)

        # run length: next global run's start; the last run of a lane ends
        # at the lane end (runs never cross a lane: lane starts force a
        # boundary)
        lane_end = (starts + sizes)[:, None]
        nxt = jnp.concatenate(
            [ev_start[:, 1:], jnp.zeros((L, 1), i32)], axis=1)
        last_ev = ecol[None, :] == (nruns[:, None] - 1)
        ev_len = jnp.where(last_ev, lane_end - ev_start, nxt - ev_start)
        ev_len = jnp.where(evalid, ev_len, 1)

        # ---- MTF ranks (v1 formulation on the event grid) ----
        okey = ev_char * E + ecol[None, :]
        okey = jnp.where(evalid, okey, jnp.iinfo(jnp.int32).max)
        co = jnp.argsort(okey, axis=1)                      # [L, E]
        ch_s = jnp.take_along_axis(ev_char, co, axis=1)
        prev_s = jnp.concatenate(
            [jnp.full((L, 1), -1, i32), co[:, :-1]], axis=1)
        same = jnp.concatenate(
            [jnp.zeros((L, 1), jnp.bool_), ch_s[:, 1:] == ch_s[:, :-1]],
            axis=1)
        prevocc_s = jnp.where(same, prev_s, -1)
        prev_own = jnp.zeros((L, E), i32)
        prev_own = prev_own.at[
            jnp.arange(L)[:, None], co].set(prevocc_s)      # inverse perm

        rank = jnp.zeros((L, E), i32)
        s_all = jnp.zeros((L, E), i32)
        s_lt = jnp.zeros((L, E), i32)

        def char_pass(d, carry):
            rank, s_all, s_lt = carry
            occ = jnp.where(ev_char == d, ecol[None, :], -1)
            incl = jax.lax.cummax(occ, axis=1)
            lastd = jnp.concatenate(
                [jnp.full((L, 1), -1, i32), incl[:, :-1]], axis=1)
            rank = rank + (lastd > prev_own).astype(i32)
            seen = (lastd >= 0).astype(i32)
            s_all = s_all + seen
            s_lt = s_lt + jnp.where(d < ev_char, seen, 0)
            return rank, s_all, s_lt

        rank, s_all, s_lt = jax.lax.fori_loop(
            0, 256, char_pass, (rank, s_all, s_lt))
        unseen = prev_own < 0
        rank = jnp.where(unseen, s_all + ev_char - s_lt, rank)
        rank = jnp.where(evalid, rank, 0)

        # ---- per-event bit counts (v1 formulation) ----
        def bitlen(x):
            return 32 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.uint32)) \
                .astype(i32)

        brs = jnp.where(rank > 0, bitlen(rank), 0)
        has_u = ev_len != 1
        ubrs = jnp.where(has_u, bitlen(ev_len), 0)
        rlen = jnp.where(rank > 0,
                         (brs - 1) + (brs < W.RANK_EXP_CAP).astype(i32), 0)
        rmlen = jnp.where(rank > 0, brs - 1, 0)
        ulen = jnp.where(has_u,
                         (ubrs - 1) + (ubrs < W.RUN_EXP_CAP).astype(i32), 0)
        umlen = jnp.where(has_u, ubrs - 1, 0)
        uoff = 1 + rlen + rmlen
        B = jnp.where(evalid, uoff + 1 + ulen + umlen, 0)
        total = jnp.sum(B, axis=1)                          # [L] bits
        return rank, ev_len, B, total, jnp.max(total)

    return jax.jit(events)


_S_SHIFT = 13  # low bits reserved for (rank<<5 | ubrs) / len fields
_IT_CAP = 1 << (32 - _S_SHIFT)  # bit offsets must fit above the packed fields


@functools.lru_cache(maxsize=16)
def _expand2_call(L: int, E: int, IT: int):
    import jax
    import jax.numpy as jnp

    i32, u32 = jnp.int32, jnp.uint32

    def expand(rank, ev_len, B, total):
        def bitlen(x):
            return 32 - jax.lax.clz(jnp.maximum(x, 1).astype(u32)) \
                .astype(i32)

        ubrs = jnp.where(ev_len != 1, bitlen(ev_len), 0)
        S = jnp.cumsum(B, axis=1) - B                       # starts [L, E]
        valid = B > 0

        # one u32 word per event, strictly increasing in S within a lane:
        # forward fill by cummax recovers the owning event at every
        # iteration without any [L, IT] gather
        Su = S.astype(u32)
        wA = (Su << _S_SHIFT) | (rank.astype(u32) << 5) | ubrs.astype(u32)
        wB1 = (Su << 13) | (ev_len.astype(u32) & 0x1FFF)
        wB2 = (Su << 12) | (ev_len.astype(u32) >> 13)
        rows = jnp.broadcast_to(jnp.arange(L, dtype=i32)[:, None], S.shape)
        cols = jnp.where(valid, S, IT)

        def fill(w):
            z = jnp.zeros((L, IT), u32).at[rows, cols].set(w, mode="drop")
            return jax.lax.cummax(z, axis=1)

        A = fill(wA)
        B1 = fill(wB1)
        B2 = fill(wB2)

        it = jnp.arange(IT, dtype=i32)[None, :]
        S_f = (A >> _S_SHIFT).astype(i32)
        rk_g = ((A >> 5) & 0xFF).astype(i32)
        ubrs_g = (A & 0x1F).astype(i32)
        rn_g = (((B2 & 0xFFF) << 13) | (B1 & 0x1FFF)).astype(i32)
        j = it - S_f

        brs_g = jnp.where(rk_g > 0, bitlen(rk_g), 0)
        rlen_g = jnp.where(rk_g > 0,
                           (brs_g - 1)
                           + (brs_g < W.RANK_EXP_CAP).astype(i32), 0)
        rmlen_g = jnp.where(rk_g > 0, brs_g - 1, 0)
        ulen_g = jnp.where(rn_g != 1,
                           (ubrs_g - 1)
                           + (ubrs_g < W.RUN_EXP_CAP).astype(i32), 0)
        uoff_g = 1 + rlen_g + rmlen_g

        in_re = (j >= 1) & (j < 1 + rlen_g)
        in_rm = (j >= 1 + rlen_g) & (j < uoff_g)
        in_ue = (j >= uoff_g + 1) & (j < uoff_g + 1 + ulen_g)
        in_um = j >= uoff_g + 1 + ulen_g
        t_rm = j - (1 + rlen_g)
        t_um = j - (uoff_g + 1 + ulen_g)
        bit = jnp.where(j == 0, (rk_g > 0).astype(i32), 0)
        bit = jnp.where(in_re, ((j - 1) < (brs_g - 1)).astype(i32), bit)
        bit = jnp.where(
            in_rm,
            (jax.lax.shift_right_logical(
                rk_g, jnp.maximum(brs_g - 2 - t_rm, 0)) & 1), bit)
        bit = jnp.where(j == uoff_g, (rn_g != 1).astype(i32), bit)
        bit = jnp.where(in_ue,
                        ((j - uoff_g - 1) < (ubrs_g - 1)).astype(i32), bit)
        bit = jnp.where(
            in_um,
            (jax.lax.shift_right_logical(
                rn_g, jnp.maximum(ubrs_g - 2 - t_um, 0)) & 1), bit)
        active = it < total[:, None]
        fld = jnp.where(active, bit | 2, 0).astype(jnp.uint8)

        f4 = fld.reshape(L, IT // 4, 4)
        packed = (f4[..., 0] | (f4[..., 1] << 2) | (f4[..., 2] << 4)
                  | (f4[..., 3] << 6))
        return packed

    return jax.jit(expand)


def device_balanced_sizes(data, L: int):
    """Run-count-quantile lane sizes, computed on device (the jnp analog of
    native tbsc_wide_balanced_sizes): lanes split at run boundaries with
    ~equal run counts, which evens out the lockstep bit counts.  Returns an
    int32[L] device array summing to n."""
    import jax
    import jax.numpy as jnp

    n = int(data.shape[0])

    @functools.partial(jax.jit, static_argnums=(1,))
    def balance(data, L):
        i32 = jnp.int32
        nr = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), data[1:] != data[:-1]])
        cum = jnp.cumsum(nr.astype(i32))
        R = cum[-1]
        # (k * R) // L without int32 overflow (k*R reaches 2^32 at 4M+
        # runs x 1024 lanes, which silently collapsed every split point to
        # 0 on the bench block): k*R = k*(R//L)*L + k*(R%L), so
        # (k*R)//L == k*(R//L) + (k*(R%L))//L with every term < 2^31
        k = jnp.arange(1, L, dtype=i32)
        targets = k * (R // L) + (k * (R % L)) // L
        splits = jnp.searchsorted(cum, targets, side="right").astype(i32)
        bounds = jnp.concatenate(
            [jnp.zeros(1, i32), splits, jnp.full(1, n, i32)])
        return bounds[1:] - bounds[:-1]

    return balance(data, L)


def device_schedule_v2(data, sizes, L: int, it_bucket=None):
    """Event-indexed device schedule: packed per-lane iteration planes
    [L, IT//4] uint8 (device array) and max_bits.  `sizes` may be a host
    ndarray or a device array; None is returned when the block is not
    wide-encodable on device (a run length at/over 2^RUN_EXP_CAP, or an
    iteration count past the packing cap)."""
    import jax.numpy as jnp

    n = int(data.shape[0])
    sizes_d = jnp.asarray(sizes, jnp.int32)
    starts_d = jnp.cumsum(sizes_d) - sizes_d
    stats = np.asarray(_stats_call(n, L)(jnp.asarray(data), starts_d))
    R, maxpl, maxrun = int(stats[0]), int(stats[1]), int(stats[2])
    if maxrun >= (1 << W.RUN_EXP_CAP):
        return None, -1
    RC = _bucket(max(R, 1024), 1024)
    E = _bucket(max(maxpl, 256), 256)
    if L * E > (1 << 27):
        # badly skewed lane table (or a degenerate block): the [L, E]
        # event grid would not fit — fall back to the host walker rather
        # than hand XLA a multi-GB program
        return None, -1
    rank, ev_len, B, total, mb = _events2_call(n, L, RC, E)(
        jnp.asarray(data), starts_d, sizes_d)
    max_bits = int(mb)  # scalar sync; sizes the expansion tightly
    IT = (it_bucket(max_bits) if it_bucket
          else _bucket(max(max_bits, 256), 256))
    if IT >= _IT_CAP:
        return None, -1
    packed = _expand2_call(L, E, IT)(rank, ev_len, B, total)
    return packed, max_bits


def device_schedule(data, sizes: np.ndarray, L: int, it_bucket=None):
    """Packed per-lane iteration planes [L, IT//4] uint8 (device array) and
    max_bits, computed on the default JAX backend.  `sizes` is the explicit
    lane-size table (int32 [L]); equal-chunk splits pass
    W.lane_sizes(n, L).  `it_bucket(max_bits) -> IT` picks the iteration
    count of the planes (defaults to power-of-two from 256)."""
    import jax.numpy as jnp

    sizes = np.asarray(sizes, dtype=np.int32)
    starts = np.cumsum(sizes, dtype=np.int64) - sizes
    C = _bucket(max(int(sizes.max()), 1), 256)
    rank, ev_len, B, total, mb = _events_call(L, C)(
        jnp.asarray(data), jnp.asarray(starts, np.int32), jnp.asarray(sizes))
    max_bits = int(mb)  # scalar sync; sizes the expansion tightly
    IT = (it_bucket(max_bits) if it_bucket
          else _bucket(max(max_bits, 256), 256))
    packed = _expand_call(L, C, IT)(rank, ev_len, B, total)
    return packed, max_bits
