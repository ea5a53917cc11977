"""Pallas lockstep coder for CODER_QLFC_WIDE (the on-chip entropy engine).

Execution shape (measured viable on v5e: ~0.65 ns/lane-bit at 1024 lanes):
1024 lanes as a [8, 128] vector tile (8 groups x 128 lanes, one group per
sublane row).  The host prepares per-lane (context, bit) planes with the
native schedule walker (native/wide.cc wide_schedule — the MTF + rank/run
state machine); the kernel is then a PURE coder: per iteration row it does
a one-hot model lookup/update over the 281 contexts, a carry-less range
coder step, and emission.

Emission: renormalizing lanes produce one u16 each; per group row the
emitted values are compacted with a 7-stage butterfly leftpack (roll +
select — no gather/scatter exists on TPU), appended into a 128-wide
staging row at the group's fill offset via a variable roll (7 conditional
static rolls), accumulated into an [8, 128] tile, and DMA-flushed to HBM at
tile granularity (the only aligned dynamic store the hardware allows).
The kernel emits units in EVENT order tagged with the lane id; the host
post-pass applies the format's +2 unit delay (warm-up + queue reorder,
see ops/wide.py) — a pure permutation per group.

All coder arithmetic is uint32 with logical shifts; probabilities are the
same 12-bit shift-5 counters as the format reference, so the output stream
is bit-identical to native/wide.cc.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from . import wide as W

GROUPS = 8
LANES = GROUPS * 128  # kernel lane count (device path uses 1024 lanes)
RANS = True  # kernel coder version: False = v2 range coder, True = v3 rANS
NCTX = W.NCTX
_PRIORS = tuple(int(x) for x in W.priors())


def _lroll(x, k):
    """Lane rotation on the 128-lane axis via the NATIVE Mosaic vector
    rotate (pltpu.roll).  jnp.roll inside a Pallas kernel lowers to the
    generic slice+concat path — measured ~66 cycles per (8, 128) i32
    roll on v5e (tools/decablate.py round 5), which made the butterfly
    emission/refill networks dominate the decode kernel.  Negative
    shifts are normalized (the primitive wants [0, 128))."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, k % 128, 1)


def _jax():
    import jax  # deferred: keep module importable without backend init

    return jax


# ---------------------------------------------------------------------------
# shared state-machine pieces (encode-side kernels: v2 coder, model pass)
# ---------------------------------------------------------------------------

_PH_RFLAG, _PH_REXP, _PH_RMAN, _PH_UFLAG, _PH_UEXP, _PH_UMAN = range(6)


def _sm_ctx(phase, t, brs, val0, rank0, rh, uh, prb, pub, active):
    """Model context of the next bit from the pre-bit lane state (the
    model v2 spec, ops/wide.py). Inactive lanes map to the sink ctx 511."""
    import jax.numpy as jnp

    rmoff = jnp.zeros(phase.shape, jnp.int32)
    for b, off in ((3, 1), (4, 4), (5, 11), (6, 26), (7, 41), (8, 56)):
        rmoff = jnp.where(brs == b, off, rmoff)
    rankb = jnp.where(rank0 == 0, 0, jnp.where(rank0 <= 2, 1, 2))
    ctx = jnp.where(
        phase == _PH_RFLAG, rh,
        jnp.where(phase == _PH_REXP,
                  16 + 7 * prb + 21 * (rh & 1) + t - 1,
        jnp.where(phase == _PH_RMAN,
                  58 + rmoff + jnp.minimum(val0 - 1, 14),
        jnp.where(phase == _PH_UFLAG, 129 + 3 * uh + rankb,
        jnp.where(phase == _PH_UEXP, 177 + 24 * pub + t - 1,
                  249 + 16 * (brs > 3).astype(jnp.int32)
                  + jnp.minimum(val0, 15))))))
    return jnp.where(active, ctx, 511)


def _sm_next(phase, t, brs, val0, rank0, rh, uh, prb, pub, bit, active):
    """One state-machine transition given the coded bit.  Returns the
    next (phase, t, brs, val, rank, rh, uh, prb, pub) tuple; a lane's
    state freezes once inactive."""
    import jax.numpy as jnp

    is_rf = active & (phase == _PH_RFLAG)
    is_re = active & (phase == _PH_REXP)
    is_rm = active & (phase == _PH_RMAN)
    is_uf = active & (phase == _PH_UFLAG)
    is_ue = active & (phase == _PH_UEXP)
    is_um = active & (phase == _PH_UMAN)

    nrh = jnp.where(is_rf, ((rh << 1) | bit) & 0xF, rh)
    nuh = jnp.where(is_uf, ((uh << 1) | bit) & 0xF, uh)

    b3 = jnp.where(brs <= 1, 0, jnp.where(brs <= 3, 1, 2))
    um_done = is_um & (t + 1 == brs - 1)
    comp1 = is_uf & (bit == 0)
    comp = comp1 | um_done

    np_ = phase
    nt = t
    nbrs = brs
    nval = val0
    nrank = rank0
    nprb = prb
    npub = pub

    np_ = jnp.where(is_rf & (bit == 1), _PH_REXP, np_)
    nt = jnp.where(is_rf & (bit == 1), 1, nt)
    nbrs = jnp.where(is_rf & (bit == 1), 1, nbrs)
    np_ = jnp.where(is_rf & (bit == 0), _PH_UFLAG, np_)
    nrank = jnp.where(is_rf & (bit == 0), 0, nrank)
    nprb = jnp.where(is_rf & (bit == 0), 0, nprb)

    re_cont = is_re & (bit == 1)
    hit_cap = re_cont & (brs + 1 == W.RANK_EXP_CAP)
    np_ = jnp.where(hit_cap, _PH_RMAN, np_)
    nval = jnp.where(hit_cap, 1, nval)
    nprb = jnp.where(hit_cap,
                     jnp.where(brs + 1 <= 1, 0,
                               jnp.where(brs + 1 <= 3, 1, 2)), nprb)
    nbrs = jnp.where(re_cont, brs + 1, nbrs)
    nt = jnp.where(re_cont & ~hit_cap, t + 1, nt)
    nt = jnp.where(hit_cap, 0, nt)
    re_stop = is_re & (bit == 0)
    nprb = jnp.where(re_stop, b3, nprb)
    one_rank = re_stop & (brs == 1)
    np_ = jnp.where(one_rank, _PH_UFLAG, np_)
    nrank = jnp.where(one_rank, 1, nrank)
    rm_multi = re_stop & (brs != 1)
    np_ = jnp.where(rm_multi, _PH_RMAN, np_)
    nval = jnp.where(rm_multi, 1, nval)
    nt = jnp.where(rm_multi, 0, nt)

    rm_done = is_rm & (t + 1 == brs - 1)
    nval = jnp.where(is_rm, (val0 << 1) | bit, nval)
    nt = jnp.where(is_rm & ~rm_done, t + 1, nt)
    np_ = jnp.where(rm_done, _PH_UFLAG, np_)
    nrank = jnp.where(rm_done, (val0 << 1) | bit, nrank)

    np_ = jnp.where(is_uf & (bit == 1), _PH_UEXP, np_)
    nt = jnp.where(is_uf & (bit == 1), 1, nt)
    nbrs = jnp.where(is_uf & (bit == 1), 1, nbrs)
    npub = jnp.where(comp1, 0, npub)

    ue_cont = is_ue & (bit == 1)
    ue_cap = ue_cont & (brs + 1 == W.RUN_EXP_CAP)
    nbrs = jnp.where(ue_cont, brs + 1, nbrs)
    nt = jnp.where(ue_cont & ~ue_cap, t + 1, nt)
    npub = jnp.where(ue_cap,
                     jnp.where(brs + 1 <= 1, 0,
                               jnp.where(brs + 1 <= 3, 1, 2)), npub)
    np_ = jnp.where(ue_cap, _PH_UMAN, np_)
    nval = jnp.where(ue_cap, 1, nval)
    nt = jnp.where(ue_cap, 0, nt)
    ue_stop = is_ue & (bit == 0)
    npub = jnp.where(ue_stop, b3, npub)
    np_ = jnp.where(ue_stop, _PH_UMAN, np_)
    nval = jnp.where(ue_stop, 1, nval)
    nt = jnp.where(ue_stop, 0, nt)

    nval = jnp.where(is_um, (val0 << 1) | bit, nval)
    nt = jnp.where(is_um & ~um_done, t + 1, nt)

    np_ = jnp.where(comp, _PH_RFLAG, np_)
    return np_, nt, nbrs, nval, nrank, nrh, nuh, nprb, npub


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _build_kernel(TI: int, IT: int, MAXROWS: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = IT // TI
    u32 = jnp.uint32

    def lane_iota():
        return jax.lax.broadcasted_iota(jnp.int32, (GROUPS, 128), 1)

    def prefix_row(x):
        """Inclusive prefix sum along the 128-lane axis (7 shifted adds)."""
        pos = lane_iota()
        for s in range(7):
            sh = _lroll(x, 1 << s)
            x = x + jnp.where(pos >= (1 << s), sh, 0)
        return x

    def leftpack(vals, valid):
        """Butterfly compaction of valid lanes to the row front (order
        preserving); returns packed vals (invalid tail undefined).  Masks
        stay i32 throughout — Mosaic cannot roll i1 vectors."""
        pos = lane_iota()
        v = valid.astype(jnp.int32)
        incl = prefix_row(v)
        dest = incl - v  # exclusive prefix
        d = jnp.where(v == 1, pos - dest, 0)
        for s in range(7):
            k = 1 << s
            move = v * ((d >> s) & 1)
            inc = _lroll(move, -k)
            vr = _lroll(vals, -k)
            dr = _lroll(d, -k)
            vals = jnp.where(inc == 1, vr, vals)
            d = jnp.where(inc == 1, dr - k, d)
            v = jnp.maximum(inc, v * (1 - move))
        return vals

    def varroll(x, f):
        """Per-row circular shift right by f (f: [GROUPS, 128] broadcast of a
        per-row scalar)."""
        for s in range(7):
            sh = _lroll(x, 1 << s)
            x = jnp.where(((f >> s) & 1) == 1, sh, x)
        return x

    PH_RFLAG, PH_REXP, PH_RMAN, PH_UFLAG, PH_UEXP, PH_UMAN = range(6)

    def kernel(pk_ref, out_ref, counts_ref, flow_ref,
               probs, low_s, rng_s, stA, stB, fills, tile, rcv, tilecnt,
               phase_s, t_s, brs_s, val_s, rank_s, rh_s, uh_s, prb_s, pub_s,
               pctx_s, pbit_s, pprev_s,
               sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for c in range(NCTX):
                probs[c] = jnp.full((GROUPS, 128), _PRIORS[c], jnp.int32)
            low_s[...] = jnp.zeros((GROUPS, 128), u32)
            rng_s[...] = jnp.full((GROUPS, 128), 0xFFFFFFFF, u32)
            stA[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            stB[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            fills[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            rcv[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            phase_s[...] = jnp.zeros((GROUPS, 128), jnp.int32)  # PH_RFLAG
            for ref in (t_s, brs_s, val_s, rank_s, rh_s, uh_s, prb_s,
                        pub_s, pbit_s, pprev_s):
                ref[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            pctx_s[...] = jnp.full((GROUPS, 128), 511, jnp.int32)
            for g in range(GROUPS):
                tilecnt[g] = 0

        def flush_group(g):
            """DMA the group's full staging tile to HBM."""
            tc = tilecnt[g]
            cp = pltpu.make_async_copy(
                tile.at[g],
                out_ref.at[g, pl.ds(tc * 8, 8), :],
                sem)
            cp.start()
            cp.wait()
            tilecnt[g] = tc + 1

        def row_body(i, _):
            # 2-bit fields packed 4 iterations per byte: bit(0), active(1).
            # The context is DERIVED in-kernel by the same per-lane state
            # machine the decode kernel runs — the host ships only the bit
            # stream (~8x less H2D than the old (ctx, bit) planes).
            byte = pk_ref[i >> 2].astype(jnp.int32)
            fld = (byte >> ((i & 3) * 2)) & 3
            bit = fld & 1
            active = (fld & 2) != 0

            phase = phase_s[...]
            t = t_s[...]
            brs = brs_s[...]
            rh = rh_s[...]
            uh = uh_s[...]
            prb = prb_s[...]
            pub = pub_s[...]
            val0 = val_s[...]
            rank0 = rank_s[...]
            ctx = _sm_ctx(phase, t, brs, val0, rank0, rh, uh, prb, pub,
                          active)

            # one-hot model lookup over the context axis, fused with the
            # PREVIOUS bit's deferred update (computed once per lane from
            # last iteration's looked-up p and bit — see the decode
            # kernel); inactive lanes carry the 511 sink ctx.
            pctx = pctx_s[...]
            pprev = pprev_s[...]
            updv = jnp.where(pbit_s[...] == 1, pprev - (pprev >> 5),
                             pprev + ((4096 - pprev) >> 5))
            p = jnp.zeros((GROUPS, 128), jnp.int32)
            for c in range(NCTX):
                pc = jnp.where(pctx == c, updv, probs[c])
                probs[c] = pc
                p = jnp.where(ctx == c, pc, p)
            pctx_s[...] = ctx
            pbit_s[...] = jnp.where(active, bit, 0)
            pprev_s[...] = p

            low = low_s[...]
            rng = rng_s[...]
            r = (rng >> 12) * p.astype(u32)
            low1 = jnp.where(bit == 1, low + r, low)
            rng1 = jnp.where(bit == 1, rng - r, r)
            low1 = jnp.where(active, low1, low)
            rng1 = jnp.where(active, rng1, rng)
            ren = active & ((rng1 >> 16) == 0)
            straddle = (((low1 ^ (low1 + rng1 - 1)) >> 16) != 0)
            lo_part = jnp.uint32(0x10000) - (low1 & 0xFFFF)
            hi_part = rng1 - lo_part
            clamp = ren & straddle
            take_hi = clamp & (hi_part > lo_part)
            low2 = jnp.where(take_hi, low1 + lo_part, low1)
            rng2 = jnp.where(clamp,
                             jnp.where(take_hi, hi_part, lo_part), rng1)
            emitval = ((low2 >> 16) & 0xFFFF).astype(jnp.int32) \
                | (lane_iota() << 16)
            low_s[...] = jnp.where(ren, low2 << 16, low2)
            rng_s[...] = jnp.where(ren, rng2 << 16, rng2)

            # ---- emission staging ----
            m_row = jnp.sum(ren.astype(jnp.int32), axis=1, keepdims=True)
            packed = leftpack(emitval, ren)
            # (ren used as i32 inside leftpack; conversions happen there)
            pos = lane_iota()
            f = fills[...]
            valid0 = pos < m_row  # packed occupancy at the row front
            rolled = varroll(jnp.where(valid0, packed, 0), f)
            # rotated prefix mask, arithmetically (no varroll)
            occr = ((pos - f) & 127) < m_row
            inA = occr & (pos >= f)
            inB = occr & (pos < f)
            newA = jnp.where(inA, rolled, stA[...])
            newB = jnp.where(inB, rolled, stB[...])
            fnew = f + m_row
            crossed = fnew >= 128
            fills[...] = jnp.where(crossed, fnew - 128, fnew)
            # branchless row-into-tile move + one scalar-reduced DMA
            # guard (see the decode kernel's stage_emit)
            rc = rcv[...]
            for rr in range(8):
                tile[:, rr, :] = jnp.where(crossed & (rc == rr), newA,
                                           tile[:, rr, :])
            stA[...] = jnp.where(crossed, newB, newA)
            stB[...] = jnp.where(crossed, 0, newB)
            rc2 = jnp.where(crossed, rc + 1, rc)
            full = (crossed & (rc2 == 8)).astype(jnp.int32)
            rcv[...] = jnp.where(rc2 == 8, 0, rc2)

            @pl.when(jnp.max(full) == 1)
            def _flush():
                for g in range(GROUPS):
                    @pl.when(full[g, 0] == 1)
                    def _(g=g):
                        flush_group(g)

            # ---- state machine (mirror of the decode kernel's; a lane's
            # state freezes once its bit stream goes inactive) ----
            np_, nt, nbrs, nval, nrank, nrh, nuh, nprb, npub = _sm_next(
                phase, t, brs, val0, rank0, rh, uh, prb, pub, bit, active)
            phase_s[...] = np_
            t_s[...] = nt
            brs_s[...] = nbrs
            val_s[...] = nval
            rank_s[...] = nrank
            rh_s[...] = nrh
            uh_s[...] = nuh
            prb_s[...] = nprb
            pub_s[...] = npub
            return 0

        lax.fori_loop(0, TI, row_body, 0)

        @pl.when(step == n_steps - 1)
        def _finish():
            # final flush: spill the partial staging row + partial tile and
            # record exact unit counts
            for g in range(GROUPS):
                cnt = (tilecnt[g] * 1024 + rcv[g, 0] * 128 + fills[g, 0])
                rc = rcv[g, 0]
                arow = stA[g, :]
                for rr in range(8):
                    @pl.when(rc == rr)
                    def _(rr=rr):
                        tile[g, rr, :] = arow
                flush_group(g)  # padded rows past the count are ignored
                counts_ref[g, :] = jnp.full((128,), cnt, jnp.int32)
            flow_ref[...] = low_s[...]

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((TI // 4, GROUPS, 128), lambda s: (s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NCTX, GROUPS, 128), jnp.int32),   # probs
            pltpu.VMEM((GROUPS, 128), jnp.uint32),        # low
            pltpu.VMEM((GROUPS, 128), jnp.uint32),        # range
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # staging A
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # staging B
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # fills (bcast)
            pltpu.VMEM((GROUPS, 8, 128), jnp.int32),      # tile
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # row count (bcast)
            pltpu.SMEM((GROUPS,), jnp.int32),             # tilecnt
        ] + [pltpu.VMEM((GROUPS, 128), jnp.int32)
             for _ in range(12)]                           # state machine
        + [pltpu.SemaphoreType.DMA],
    )

    import jax

    return jax.jit(functools.partial(
        pl.pallas_call,
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((GROUPS, MAXROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((GROUPS, 128), jnp.int32),
            jax.ShapeDtypeStruct((GROUPS, 128), jnp.uint32),
        ),
        interpret=interpret,
    )())


@functools.lru_cache(maxsize=16)
def _coder_call(TI: int, IT: int, MAXROWS: int, interpret: bool):
    return _build_kernel(TI, IT, MAXROWS, interpret)


# ---------------------------------------------------------------------------
# v3 (rANS) encode: two passes.  Pass A runs the model forward and writes
# the per-bit probability planes; pass B walks the planes BACKWARD doing
# the rANS arithmetic (exact u32/u12 long division in base-256 digits via
# f32 — the VPU has no integer divide) and stages emissions in lane-
# DESCENDING order, so the host's whole-stream reversal lands exactly in
# the decoder's (iteration asc, lane asc) consumption order.  The final
# lane states are the warm-up units; assembly is pure concatenation.
# ---------------------------------------------------------------------------

def _build_model_kernel(TI: int, IT: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = IT // TI

    def kernel(pk_ref, pp_ref, probs,
               phase_s, t_s, brs_s, val_s, rank_s, rh_s, uh_s, prb_s, pub_s,
               pctx_s, pbit_s, pprev_s):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for c in range(NCTX):
                probs[c] = jnp.full((GROUPS, 128), _PRIORS[c], jnp.int32)
            for ref in (phase_s, t_s, brs_s, val_s, rank_s, rh_s, uh_s,
                        prb_s, pub_s, pbit_s, pprev_s):
                ref[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            pctx_s[...] = jnp.full((GROUPS, 128), 511, jnp.int32)

        def row_body(i, _):
            byte = pk_ref[i >> 2].astype(jnp.int32)
            fld = (byte >> ((i & 3) * 2)) & 3
            bit = fld & 1
            active = (fld & 2) != 0

            phase = phase_s[...]
            t = t_s[...]
            brs = brs_s[...]
            rh = rh_s[...]
            uh = uh_s[...]
            prb = prb_s[...]
            pub = pub_s[...]
            val0 = val_s[...]
            rank0 = rank_s[...]
            ctx = _sm_ctx(phase, t, brs, val0, rank0, rh, uh, prb, pub,
                          active)

            # deferred one-iteration model update (same trick as the
            # decode kernel): the new value of the single touched row is
            # computed once per lane from last iteration's (p, bit) and
            # merged into this iteration's table walk — one pass over the
            # 281 context planes instead of lookup + update work per c.
            pctx = pctx_s[...]
            pprev = pprev_s[...]
            updv = jnp.where(pbit_s[...] == 1, pprev - (pprev >> 5),
                             pprev + ((4096 - pprev) >> 5))
            p = jnp.zeros((GROUPS, 128), jnp.int32)
            for c in range(NCTX):
                pc = jnp.where(pctx == c, updv, probs[c])
                probs[c] = pc
                p = jnp.where(ctx == c, pc, p)
            pp_ref[i] = p
            pctx_s[...] = ctx
            pbit_s[...] = jnp.where(active, bit, 0)
            pprev_s[...] = p

            np_, nt, nbrs, nval, nrank, nrh, nuh, nprb, npub = _sm_next(
                phase, t, brs, val0, rank0, rh, uh, prb, pub, bit, active)
            phase_s[...] = np_
            t_s[...] = nt
            brs_s[...] = nbrs
            val_s[...] = nval
            rank_s[...] = nrank
            rh_s[...] = nrh
            uh_s[...] = nuh
            prb_s[...] = nprb
            pub_s[...] = npub
            return 0

        lax.fori_loop(0, TI, row_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((TI // 4, GROUPS, 128), lambda s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TI, GROUPS, 128), lambda s: (s, 0, 0)),
        scratch_shapes=[pltpu.VMEM((NCTX, GROUPS, 128), jnp.int32)]
        + [pltpu.VMEM((GROUPS, 128), jnp.int32) for _ in range(12)],
    )

    return jax.jit(functools.partial(
        pl.pallas_call,
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((IT, GROUPS, 128), jnp.int32),
        interpret=interpret,
    )())


def _build_rans_kernel(TI: int, IT: int, MAXROWS: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = IT // TI
    u32 = jnp.uint32

    def lane_iota():
        return jax.lax.broadcasted_iota(jnp.int32, (GROUPS, 128), 1)

    def prefix_row(x):
        pos = lane_iota()
        for s in range(7):
            sh = _lroll(x, 1 << s)
            x = x + jnp.where(pos >= (1 << s), sh, 0)
        return x

    def leftpack(vals, valid_i32):
        pos = lane_iota()
        v = valid_i32
        incl = prefix_row(v)
        dest = incl - v
        d = jnp.where(v == 1, pos - dest, 0)
        for s in range(7):
            k = 1 << s
            move = v * ((d >> s) & 1)
            inc = _lroll(move, -k)
            vals = jnp.where(inc == 1, _lroll(vals, -k), vals)
            d = jnp.where(inc == 1, _lroll(d, -k) - k, d)
            v = jnp.maximum(inc, v * (1 - move))
        return vals

    def varroll(x, f):
        for s in range(7):
            sh = _lroll(x, 1 << s)
            x = jnp.where(((f >> s) & 1) == 1, sh, x)
        return x

    def lane_flip(x):
        """Reverse the 128-lane axis: exchange across every index bit
        (i -> ~i & 127), 7 roll+select stages."""
        pos = lane_iota()
        for s in range(7):
            k = 1 << s
            fwd = _lroll(x, -k)
            bwd = _lroll(x, k)
            x = jnp.where(((pos >> s) & 1) == 0, fwd, bwd)
        return x

    def kernel(pk_ref, pp_ref, out_ref, counts_ref, fx_ref,
               x_s, stA, stB, fills, tile, rcv, tilecnt, sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            x_s[...] = jnp.full((GROUPS, 128), 1 << 16, u32)
            stA[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            stB[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            fills[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            rcv[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            for g in range(GROUPS):
                tilecnt[g] = 0

        def flush_group(g):
            tc = tilecnt[g]
            cp = pltpu.make_async_copy(
                tile.at[g],
                out_ref.at[g, pl.ds(tc * 8, 8), :],
                sem)
            cp.start()
            cp.wait()
            tilecnt[g] = tc + 1

        def row_body(j, _):
            i = TI - 1 - j  # walk the step's rows backward
            byte = pk_ref[i >> 2].astype(jnp.int32)
            fld = (byte >> ((i & 3) * 2)) & 3
            bit = fld & 1
            active = (fld & 2) != 0

            p = pp_ref[i]
            f = jnp.where(bit == 1, 4096 - p, p)
            f = jnp.where(active, f, 1)  # avoid 0-divide on dead lanes
            x = x_s[...]

            ren = active & (x >= (f.astype(u32) << 20))
            emitval = (x & 0xFFFF).astype(jnp.int32) | (lane_iota() << 16)
            x2 = jnp.where(ren, x >> 16, x)

            # exact q = x2 / f, r = x2 % f: base-256 long division; each
            # digit step has t < f*256 <= 2^20 (f32-exact), and the f32
            # quotient truncation is at most 1 low — one fix-up each way
            ff = f.astype(jnp.float32)
            r = jnp.zeros((GROUPS, 128), jnp.int32)
            qd = []
            for sh in (24, 16, 8, 0):
                d = ((x2 >> sh) & 0xFF).astype(jnp.int32)
                tt = r * 256 + d
                q0 = (tt.astype(jnp.float32) / ff).astype(jnp.int32)
                rr = tt - q0 * f
                q0 = q0 + (rr >= f).astype(jnp.int32) \
                    - (rr < 0).astype(jnp.int32)
                r = tt - q0 * f
                qd.append(q0.astype(u32))
            q = ((qd[0] * 256 + qd[1]) * 256 + qd[2]) * 256 + qd[3]

            base = jnp.where(bit == 1, p, 0).astype(u32)
            x3 = (q << 12) + r.astype(u32) + base
            x_s[...] = jnp.where(active, x3, x)

            # ---- emission staging, lane-DESCENDING within the row ----
            ren_i = ren.astype(jnp.int32)
            m_row = jnp.sum(ren_i, axis=1, keepdims=True)
            packed = leftpack(lane_flip(emitval), lane_flip(ren_i))
            pos = lane_iota()
            fl = fills[...]
            valid0 = (pos < m_row).astype(jnp.int32)
            rolled = varroll(jnp.where(valid0 == 1, packed, 0), fl)
            # rotated prefix mask, arithmetically (no varroll)
            occr = (((pos - fl) & 127) < m_row).astype(jnp.int32)
            inA = (occr == 1) & (pos >= fl)
            inB = (occr == 1) & (pos < fl)
            newA = jnp.where(inA, rolled, stA[...])
            newB = jnp.where(inB, rolled, stB[...])
            fnew = fl + m_row
            crossed = fnew >= 128
            fills[...] = jnp.where(crossed, fnew - 128, fnew)
            # branchless row-into-tile move (see the decode kernel's
            # stage_emit): one-hot predicated writes every iteration, one
            # scalar-reduced any-tile-full guard for the rare DMA
            rc = rcv[...]
            for rr in range(8):
                tile[:, rr, :] = jnp.where(crossed & (rc == rr), newA,
                                           tile[:, rr, :])
            stA[...] = jnp.where(crossed, newB, newA)
            stB[...] = jnp.where(crossed, 0, newB)
            rc2 = jnp.where(crossed, rc + 1, rc)
            full = (crossed & (rc2 == 8)).astype(jnp.int32)
            rcv[...] = jnp.where(rc2 == 8, 0, rc2)

            @pl.when(jnp.max(full) == 1)
            def _flush():
                for g in range(GROUPS):
                    @pl.when(full[g, 0] == 1)
                    def _(g=g):
                        flush_group(g)
            return 0

        lax.fori_loop(0, TI, row_body, 0)

        @pl.when(step == n_steps - 1)
        def _finish():
            for g in range(GROUPS):
                cnt = (tilecnt[g] * 1024 + rcv[g, 0] * 128 + fills[g, 0])
                rc = rcv[g, 0]
                arow = stA[g, :]
                for rr in range(8):
                    @pl.when(rc == rr)
                    def _(rr=rr):
                        tile[g, rr, :] = arow
                flush_group(g)
                counts_ref[g, :] = jnp.full((128,), cnt, jnp.int32)
            fx_ref[...] = x_s[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            # both planes walked back-to-front across steps
            pl.BlockSpec((TI // 4, GROUPS, 128),
                         lambda s: (n_steps - 1 - s, 0, 0)),
            pl.BlockSpec((TI, GROUPS, 128),
                         lambda s: (n_steps - 1 - s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUPS, 128), jnp.uint32),        # x state
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # staging A
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # staging B
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # fills (bcast)
            pltpu.VMEM((GROUPS, 8, 128), jnp.int32),      # tile
            pltpu.VMEM((GROUPS, 128), jnp.int32),         # row count (bcast)
            pltpu.SMEM((GROUPS,), jnp.int32),             # tilecnt
            pltpu.SemaphoreType.DMA,
        ],
    )

    return jax.jit(functools.partial(
        pl.pallas_call,
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((GROUPS, MAXROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((GROUPS, 128), jnp.int32),
            jax.ShapeDtypeStruct((GROUPS, 128), jnp.uint32),
        ),
        interpret=interpret,
    )())


@functools.lru_cache(maxsize=16)
def _model_call(TI: int, IT: int, interpret: bool):
    return _build_model_kernel(TI, IT, interpret)


@functools.lru_cache(maxsize=16)
def _rans_call(TI: int, IT: int, MAXROWS: int, interpret: bool):
    return _build_rans_kernel(TI, IT, MAXROWS, interpret)


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def _it_bucket(max_bits: int, TI: int) -> int:
    """Iteration-count bucket: ~1.25x geometric steps rounded up to a TI
    multiple (the grid needs IT % TI == 0).  Power-of-two buckets wasted up
    to 47% of the kernel iterations AND the plane transfer (the bench block's
    max_bits 34856 rode a 65536-iteration program); IT is internal — the
    payload stores exact max_bits and any IT >= max_bits decodes it — so
    finer buckets only trade a few more one-time compiles."""
    it = TI
    while it < max_bits:
        it = -(-(it * 5 // 4) // TI) * TI
    return it


def host_schedule_packed(buf: np.ndarray, n: int, sizes_p, chunk: int):
    """Native host walker with ADAPTIVE per-lane capacity.

    The worst case is ~17 bits per byte but real post-BWT data runs
    ~2-4, and the walker memsets its full [LANES, cap4] output row — a
    worst-case cap costs >1 GB of pure zeroing (measured ~750 ms of the
    round-3 e2e).  Start at 4 bits/byte-of-average-lane; on overflow the
    walker keeps counting and returns -(needed_bits)-1, so ONE retry
    sizes the buffer exactly (was: blind 4x doubling, up to 4 walks).

    Returns (pk [LANES, cap4] u8, max_bits); max_bits < 0 = not encodable.
    Callers slicing pk[:, :IT//4] must np.pad when the bucketed IT
    exceeds 4*cap4.
    """
    from .. import native as native_mod
    from ..native import _u8p

    lib = native_mod.load()
    cap4 = max(1024, chunk)  # 4*cap4 bits/lane = 4 bits per average byte
    hard = 17 * (16 * chunk) // 4 + 64
    while True:
        pk = np.zeros((LANES, cap4), dtype=np.uint8)
        max_bits = lib.tbsc_wide_schedule_packed(_u8p(buf), n, LANES, cap4,
                                                 _u8p(pk), sizes_p)
        if max_bits >= 0 or cap4 >= hard:
            return pk, max_bits
        needed4 = (-max_bits - 1 + 3) // 4 + 16
        cap4 = min(max(needed4, cap4 + 1), hard)


def _host_prep(data: bytes, interpret: bool = False):
    """Host stage of the wide encode: lane balancing + schedule walk +
    plane packing.  Returns (planes, sizes, max_bits, IT) where planes is
    either a packed [IT//4, GROUPS, 128] u8 ndarray (host schedule) or a
    device array (opt-in device schedule); None when not applicable."""
    import jax.numpy as jnp

    from .. import native as native_mod

    n = len(data)
    if n < LANES or not native_mod.available():
        return None
    lib = native_mod.load()
    from ..native import _u8p

    chunk = -(-n // LANES)
    if chunk >= (1 << W.RUN_EXP_CAP):
        return None

    # balanced lane split (run-count quantiles) keeps the lockstep iteration
    # count — the MAX bits over lanes — close to the average
    from ..native import _i32p

    buf = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    sizes = np.zeros(LANES, dtype=np.int32)
    sizes_p = None
    if lib.tbsc_wide_balanced_sizes(_u8p(buf), n, LANES, _i32p(sizes)) == 0:
        sizes_p = _i32p(sizes)
    else:
        sizes = None

    TI = 256
    sizes_tab = sizes if sizes is not None else np.asarray(
        W.lane_sizes(n, LANES), np.int32)

    # schedule prep: per-lane PACKED bit stream (2-bit fields, 4 per byte —
    # the kernel derives contexts itself).  Default: the NATIVE host walker
    # (measured r4: 57 MB/s, and the packed planes are ~0.53x the raw bytes
    # at ~2.1 bits/byte, so host scheduling also SHRINKS the H2D transfer).
    # The on-device builder (ops/wide_schedule.py) pads every [lanes, C]
    # intermediate to the LARGEST balanced lane — 262 KB vs the 16 KB mean
    # on the bench block, a 16x inflation that measured 52 s of the 54.6 s
    # round-3 e2e collapse (tools/wideprof.py) — so it is opt-in
    # (TBSC_WIDE_DEV_SCHED=1) or the no-native fallback until it is
    # reformulated on an event-indexed grid.
    planes_dev = None
    max_bits = -1
    if os.environ.get("TBSC_WIDE_DEV_SCHED"):
        try:
            from . import wide_schedule

            pk_dev, max_bits = wide_schedule.device_schedule(
                jnp.asarray(buf), sizes_tab, LANES,
                it_bucket=lambda mb: _it_bucket(max(mb, TI), TI))
            IT = _it_bucket(max(max_bits, TI), TI)
            planes_dev = jnp.transpose(
                pk_dev[:, : IT // 4].reshape(GROUPS, 128, IT // 4),
                (2, 0, 1))
        except Exception:
            planes_dev = None
            max_bits = -1
    if planes_dev is None:
        pk, max_bits = host_schedule_packed(buf, n, sizes_p, chunk)
        if max_bits < 0:
            return None
        IT = _it_bucket(max(max_bits, TI), TI)
        if pk.shape[1] < IT // 4:
            pk = np.pad(pk, ((0, 0), (0, IT // 4 - pk.shape[1])))
        planes_dev = np.ascontiguousarray(
            pk[:, : IT // 4].reshape(GROUPS, 128, IT // 4)
            .transpose(2, 0, 1))

    IT = _it_bucket(max(max_bits, TI), TI)
    return planes_dev, sizes, max_bits, IT


def _submit(prep, interpret: bool = False):
    """Device stage: H2D + model/coder kernel dispatch (async).  Returns
    the in-flight device arrays + everything the collect stage needs."""
    import jax.numpy as jnp

    planes, sizes, max_bits, IT = prep
    TI = 256
    MAXROWS = -(-((IT * 8) + 2048) // 1024) * 8  # per-group unit bound
    planes_dev = jnp.asarray(planes)
    if RANS:
        planes_p = _model_call(TI, IT, interpret)(planes_dev)
        units_d, counts_d, fx_d = _rans_call(TI, IT, MAXROWS, interpret)(
            planes_dev, planes_p)
        return True, (units_d, counts_d, fx_d), sizes, max_bits
    units_d, counts_d, flow_d = _coder_call(TI, IT, MAXROWS, interpret)(
        planes_dev)
    return False, (units_d, counts_d, flow_d), sizes, max_bits


def _collect(n: int, inflight):
    """D2H + host assembly of one submitted block's payload."""
    rans, (units_d, counts_d, tail_d), sizes, max_bits = inflight
    counts = np.asarray(counts_d)[:, 0]
    used_rows = int(-(-int(counts.max()) // 128)) + 8
    units = np.asarray(units_d[:, :used_rows])  # slim the D2H transfer
    tail = np.asarray(tail_d)
    if rans:
        return _assemble_rans(n, units, counts, tail, sizes, max_bits)
    return _assemble(n, units, counts, tail, sizes, max_bits)


def device_encode(data: bytes, interpret: bool = False):
    """Full wide-profile encode with the coder on device.  Returns the
    payload bytes (bit-identical to native/wide.cc), or None when not
    compressible / not applicable."""
    prep = _host_prep(data, interpret)
    if prep is None or prep[2] < 0:
        return None
    return _collect(len(data), _submit(prep, interpret))


def submit_resident(u_dev, interpret: bool = False):
    """Device-RESIDENT wide encode of a transformed block already in HBM
    (the composed pipeline: the sorter's output never crosses the tunnel).
    Lane balancing, the bit schedule (ops/wide_schedule device_schedule_v2,
    event-indexed) and the model/rANS kernels all run on device; only the
    unit grids come back for the host post-pass.

    Returns the in-flight tuple for :func:`collect_resident`, or None when
    the block is not wide-encodable on device.  The reference analog is the
    one-residency GPU stage of st.cu:372-387 / libcubwt.cu:2332-2334."""
    import jax.numpy as jnp

    from . import wide_schedule

    n = int(u_dev.shape[0])
    if n < LANES:
        return None
    chunk = -(-n // LANES)
    if chunk >= (1 << W.RUN_EXP_CAP):
        return None
    TI = 256
    sizes_d = wide_schedule.device_balanced_sizes(u_dev, LANES)
    packed, max_bits = wide_schedule.device_schedule_v2(
        u_dev, sizes_d, LANES,
        it_bucket=lambda mb: _it_bucket(max(mb, TI), TI))
    if packed is None or max_bits < 0:
        return None
    IT = _it_bucket(max(max_bits, TI), TI)
    planes = jnp.transpose(
        packed[:, : IT // 4].reshape(GROUPS, 128, IT // 4), (2, 0, 1))
    sizes = np.asarray(sizes_d, dtype=np.int32)  # 4 KB D2H
    return n, _submit((planes, sizes, max_bits, IT), interpret)


def collect_resident(inflight):
    """D2H + host assembly for :func:`submit_resident`."""
    if inflight is None:
        return None
    n, sub = inflight
    return _collect(n, sub)


def device_encode_resident(u_dev, interpret: bool = False):
    """submit_resident + collect_resident in one call."""
    return collect_resident(submit_resident(u_dev, interpret))


def device_encode_many(datas, interpret: bool = False):
    """Pipelined wide encode of several blocks: a prep thread runs the
    host scheduler of block i+1 while block i's kernels execute on the
    chip, and block i-1's D2H + assembly happens while i computes — the
    TPU-shaped counterpart of the reference's stream-overlapped device
    stages (st.cu:372-387 issues async copies on a CUDA stream).  Returns
    a list of payloads (None where a block is not encodable)."""
    import queue
    import threading

    results: list = [None] * len(datas)
    prep_q: "queue.Queue" = queue.Queue(maxsize=2)
    abort = threading.Event()

    def prep_worker():
        for i, data in enumerate(datas):
            if abort.is_set():
                return
            try:
                item = (i, _host_prep(data, interpret))
            except Exception:
                item = (i, None)
            # bounded put with an abort check so a dead consumer (device
            # exception in the main loop) cannot leave this thread blocked
            # forever on a full queue — which would then hang t.join()
            while True:
                try:
                    prep_q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    if abort.is_set():
                        return
        prep_q.put(None)

    t = threading.Thread(target=prep_worker, daemon=True)
    t.start()
    pending = None  # (index, inflight)
    try:
        while True:
            item = prep_q.get()
            if item is None:
                break
            i, prep = item
            # collect BEFORE submitting the next block: the device queue is
            # in-order, so a D2H requested after block i's kernels would
            # wait for them — the overlap this pipeline buys is the host
            # scheduler (prep thread) running during device compute.
            if pending is not None:
                pi, pf = pending
                results[pi] = _collect(len(datas[pi]), pf)
                pending = None
            if prep is not None and prep[2] >= 0:
                pending = (i, _submit(prep, interpret))
        if pending is not None:
            pi, pf = pending
            results[pi] = _collect(len(datas[pi]), pf)
    finally:
        abort.set()
        try:
            while True:
                prep_q.get_nowait()
        except queue.Empty:
            pass
        t.join()
    return results


def _assemble_rans(n: int, units: np.ndarray, counts: np.ndarray,
                   fx: np.ndarray, lane_sz=None, max_bits: int = 0):
    """v3 host post-pass: the reverse kernel emitted units in (iteration
    desc, lane desc) order, so reversing each group's event stream IS the
    decoder's consumption order; prepend the final lane states as the two
    warm-up units per live lane (byte-identical to native/wide.cc's v3)."""
    import struct

    sizes = (np.asarray(lane_sz, dtype=np.int64) if lane_sz is not None
             else np.asarray(W.lane_sizes(n, LANES)))
    parts = []
    gunits = []
    for g in range(GROUPS):
        cnt = int(counts[g])
        ev = units[g].reshape(-1)[:cnt][::-1]
        vals = (ev & 0xFFFF).astype(np.uint16)
        live = sizes[g * 128:(g + 1) * 128] > 0
        x = fx[g].astype(np.uint32)[live]
        warm = np.stack([(x >> 16) & 0xFFFF, x & 0xFFFF],
                        axis=1).reshape(-1).astype(np.uint16)
        stream = np.concatenate([warm, vals])
        gunits.append(len(stream))
        parts.append(stream.astype("<u2").tobytes())

    payload = struct.pack("<IHHI", n, LANES,
                          (1 if lane_sz is not None else 0) | 2 | 4,
                          max_bits)
    if lane_sz is not None:
        payload += sizes.astype("<u4").tobytes()
    payload += np.asarray(gunits, dtype="<u4").tobytes()
    payload += b"".join(parts)
    if len(payload) >= n:
        return None
    return payload


def _assemble(n: int, units: np.ndarray, counts: np.ndarray,
              flow: np.ndarray, lane_sz=None, max_bits: int = 0):
    """Host post-pass: per group, apply the +2 unit delay (warm-up + queue
    reorder, see ops/wide.py) and build the payload.  `flow` is the final
    per-lane coder `low`, whose top 32 bits are the two flush units."""
    import struct

    sizes = (np.asarray(lane_sz, dtype=np.int64) if lane_sz is not None
             else np.asarray(W.lane_sizes(n, LANES)))
    payload_parts = []
    gunits = []
    for g in range(GROUPS):
        cnt = int(counts[g])
        ev = units[g].reshape(-1)[:cnt]
        vals = (ev & 0xFFFF).astype(np.uint16)
        lane = ((ev >> 16) & 0x7F).astype(np.int64)
        live = sizes[g * 128:(g + 1) * 128] > 0
        n_live = int(live.sum())

        # per-lane queues = event units in order + two flush units; build
        # them and the consumption permutation fully vectorized.
        order = np.argsort(lane, kind="stable")          # queue layout
        lane_sorted = lane[order]
        starts = np.searchsorted(lane_sorted, np.arange(129))
        percount = np.diff(starts)                        # events per lane
        lo = flow[g].astype(np.uint32)
        flush = np.stack([(lo >> 16) & 0xFFFF, lo & 0xFFFF],
                         axis=1).astype(np.uint16)        # [128, 2]

        # q concatenated lane-major: lane k occupies
        # [starts[k] + 2k_live_offset ... ] — simpler: build q_flat directly
        qlens = percount + np.where(live, 2, 0)
        qstart = np.concatenate([[0], np.cumsum(qlens)[:-1]])
        total_q = int(qlens.sum())
        q_flat = np.zeros(total_q, dtype=np.uint16)
        # events of lane k go to qstart[k] .. qstart[k]+percount[k]
        ev_positions = qstart[lane_sorted] + (np.arange(cnt) - starts[lane_sorted])
        q_flat[ev_positions] = vals[order]
        fk = np.flatnonzero(live)
        q_flat[qstart[fk] + percount[fk]] = flush[fk, 0]
        q_flat[qstart[fk] + percount[fk] + 1] = flush[fk, 1]

        # consumption order: warm-up q[k][0:2] for live lanes, then per
        # event e (in order) the unit q[lane_e][r_e + 2] where r_e is the
        # event's index within its lane
        r_e = np.empty(cnt, dtype=np.int64)
        r_e[order] = np.arange(cnt) - starts[lane_sorted]
        idx_warm = np.stack([qstart[fk], qstart[fk] + 1], axis=1).reshape(-1)
        idx_ev = qstart[lane] + r_e + 2
        stream = np.concatenate([q_flat[idx_warm], q_flat[idx_ev]])
        if len(stream) != total_q:
            raise RuntimeError("wide kernel stream accounting mismatch")
        gunits.append(len(stream))
        payload_parts.append(stream.astype("<u2").tobytes())

    payload = struct.pack("<IHHI", n, LANES,
                          (1 if lane_sz is not None else 0) | 2, max_bits)
    if lane_sz is not None:
        payload += sizes.astype("<u4").tobytes()
    payload += np.asarray(gunits, dtype="<u4").tobytes()
    payload += b"".join(payload_parts)
    if len(payload) >= n:
        return None
    return payload


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------

def _build_decode_kernel(TI: int, IT: int, SROWS: int, MROWS: int,
                         interpret: bool, rans: bool = False,
                         ablate: frozenset = frozenset()):
    """`ablate` is a measurement-only knob (tools/decablate.py): names in
    the set stub out kernel stages ("walk", "refill", "mtf", "emit") so
    their on-chip cost can be attributed by differencing variants.  The
    production path always passes the empty set; ablated variants decode
    garbage by design."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = IT // TI
    u32 = jnp.uint32

    def lane_iota():
        return jax.lax.broadcasted_iota(jnp.int32, (GROUPS, 128), 1)

    def prefix_row(x):
        pos = lane_iota()
        for s in range(7):
            sh = _lroll(x, 1 << s)
            x = x + jnp.where(pos >= (1 << s), sh, 0)
        return x

    def leftpack(vals, valid_i32):
        pos = lane_iota()
        v = valid_i32
        incl = prefix_row(v)
        dest = incl - v
        d = jnp.where(v == 1, pos - dest, 0)
        for s in range(7):
            k = 1 << s
            move = v * ((d >> s) & 1)
            inc = _lroll(move, -k)
            vals = jnp.where(inc == 1, _lroll(vals, -k), vals)
            d = jnp.where(inc == 1, _lroll(d, -k) - k, d)
            v = jnp.maximum(inc, v * (1 - move))
        return vals

    def expand(vals, targets_i32):
        """Packed vals[0..m) move to the set positions of targets (order
        preserving): MSB-first butterfly; deficits packed via leftpack."""
        pos = lane_iota()
        t = targets_i32
        rank = prefix_row(t) - t          # exclusive prefix at targets
        dt = jnp.where(t == 1, pos - rank, 0)
        d = leftpack(dt, t)               # deficits in packed order
        m = jnp.sum(t, axis=1, keepdims=True)
        v = (pos < m).astype(jnp.int32)   # packed occupancy
        d = jnp.where(v == 1, d, 0)
        for s in range(6, -1, -1):
            k = 1 << s
            move = v * ((d >> s) & 1)
            inc = _lroll(move, k)
            vals = jnp.where(inc == 1, _lroll(vals, k), vals)
            d = jnp.where(inc == 1, _lroll(d, k) - k, d)
            v = jnp.maximum(inc, v * (1 - move))
        return vals

    def varroll(x, f):
        for s in range(7):
            sh = _lroll(x, 1 << s)
            x = jnp.where(((f >> s) & 1) == 1, sh, x)
        return x

    # decode phases
    PH_RFLAG, PH_REXP, PH_RMAN, PH_UFLAG, PH_UEXP, PH_UMAN, PH_DONE = \
        range(7)

    def kernel(warm_ref, goff_ref, lsz_ref, stream_hbm,
               rec_hbm, counts_ref, last_ref,
               probs, low_s, rng_s, code_s, mtf, symtmp,
               phase_s, t_s, brs_s, val_s, rank_s, rh_s, uh_s, prb_s, pub_s,
               left_s, pctx_s, pbit_s, pprev_s, pos_s, last_s,
               win, wof_s,
               mA, mB, mF, mTile,
               mRcv, mTc, wTile, sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for c in range(NCTX):
                probs[c] = jnp.full((GROUPS, 128), _PRIORS[c], jnp.int32)
            for r in range(256):
                mtf[r] = jnp.full((GROUPS, 128), r, jnp.int32)
            low_s[...] = jnp.zeros((GROUPS, 128), u32)
            rng_s[...] = jnp.full((GROUPS, 128), 0xFFFFFFFF, u32)
            code_s[...] = warm_ref[...]
            lsz = lsz_ref[...]
            phase_s[...] = jnp.where(lsz > 0, PH_RFLAG, PH_DONE)
            for ref in (t_s, brs_s, val_s, rank_s, rh_s, uh_s, prb_s, pub_s,
                        pbit_s, pprev_s, last_s):
                ref[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            pctx_s[...] = jnp.full((GROUPS, 128), 511, jnp.int32)
            left_s[...] = lsz
            # each lane's next output position WITHIN its group =
            # exclusive prefix of the group's lane sizes
            pos_s[...] = prefix_row(lsz) - lsz
            wof_s[...] = goff_ref[...]
            for ref in (mA, mB, mF, mRcv):
                ref[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            for g in range(GROUPS):
                mTc[g] = 0
                wTile[g] = 2
            # preload the first two stream tiles per group
            for g in range(GROUPS):
                for tt in range(2):
                    cp = pltpu.make_async_copy(
                        stream_hbm.at[g, pl.ds(tt * 8, 8), :],
                        win.at[g, pl.ds(tt * 8, 8), :], sem)
                    cp.start()
                    cp.wait()

        def stage_emit(vals, emit_i32, A, B, F, Tile, Rcv, Tc, out_hbm):
            """The encode kernel's staging pipeline as a helper: pack the
            emitting lanes, append at the per-group fill offset, flush full
            tiles to HBM.

            BRANCHLESS except the (rare) tile DMA: a per-group @pl.when
            check costs ~165 cycles per iteration on v5e whether or not it
            fires (tools/decablate.py round 5 — 8 checks = ~55 ms of the
            kernel), so the row-into-tile move is one-hot predicated
            vector writes every iteration, and the only branch left is
            ONE scalar-reduced any-tile-full guard whose body runs every
            ~64 iterations."""
            pos = lane_iota()
            m_row = jnp.sum(emit_i32, axis=1, keepdims=True)
            if "emit_pack" in ablate:
                packed = vals
            else:
                packed = leftpack(vals, emit_i32)
            f = F[...]
            valid0 = (pos < m_row).astype(jnp.int32)
            rolled = varroll(jnp.where(valid0 == 1, packed, 0), f)
            # occupancy-after-rotation is arithmetic (a rotated prefix
            # mask), no varroll needed: occr[i] = ((i - f) mod 128) < m
            occr = (((pos - f) & 127) < m_row).astype(jnp.int32)
            inA = (occr == 1) & (pos >= f)
            inB = (occr == 1) & (pos < f)
            newA = jnp.where(inA, rolled, A[...])
            newB = jnp.where(inB, rolled, B[...])
            fnew = f + m_row
            crossed = fnew >= 128
            F[...] = jnp.where(crossed, fnew - 128, fnew)
            if "emit_tile" in ablate:
                A[...] = jnp.where(crossed, newB, newA)
                B[...] = jnp.where(crossed, 0, newB)
                return
            rc = Rcv[...]
            for rr in range(8):
                Tile[:, rr, :] = jnp.where(crossed & (rc == rr), newA,
                                           Tile[:, rr, :])
            A[...] = jnp.where(crossed, newB, newA)
            B[...] = jnp.where(crossed, 0, newB)
            rc2 = jnp.where(crossed, rc + 1, rc)
            full = (crossed & (rc2 == 8)).astype(jnp.int32)
            Rcv[...] = jnp.where(rc2 == 8, 0, rc2)

            @pl.when(jnp.max(full) == 1)
            def _flush():
                for g in range(GROUPS):
                    @pl.when(full[g, 0] == 1)
                    def _(g=g):
                        tc = Tc[g]
                        cp = pltpu.make_async_copy(
                            Tile.at[g], out_hbm.at[g, pl.ds(tc * 8, 8), :],
                            sem)
                        cp.start()
                        cp.wait()
                        Tc[g] = tc + 1

        def row_body(i, _):
            phase = phase_s[...]
            active = phase != PH_DONE
            t = t_s[...]
            brs = brs_s[...]
            rh = rh_s[...]
            uh = uh_s[...]
            prb = prb_s[...]
            pub = pub_s[...]

            # context of the next bit (model v2, ops/wide.py spec)
            val0 = val_s[...]
            rank0 = rank_s[...]
            rmoff = jnp.zeros((GROUPS, 128), jnp.int32)
            for b, off in ((3, 1), (4, 4), (5, 11), (6, 26), (7, 41),
                           (8, 56)):
                rmoff = jnp.where(brs == b, off, rmoff)
            rankb = jnp.where(rank0 == 0, 0,
                              jnp.where(rank0 <= 2, 1, 2))
            ctx = jnp.where(
                phase == PH_RFLAG, rh,
                jnp.where(phase == PH_REXP,
                          16 + 7 * prb + 21 * (rh & 1) + t - 1,
                jnp.where(phase == PH_RMAN,
                          58 + rmoff + jnp.minimum(val0 - 1, 14),
                jnp.where(phase == PH_UFLAG, 129 + 3 * uh + rankb,
                jnp.where(phase == PH_UEXP, 177 + 24 * pub + t - 1,
                          249 + 16 * (brs > 3).astype(jnp.int32) + jnp.minimum(val0, 15))))))
            ctx = jnp.where(active, ctx, 511)

            # probability lookup, fused with the PREVIOUS bit's model
            # update.  The decoder cannot fuse same-iteration (the bit
            # depends on p), but the update touches exactly one context
            # row per lane and its new value depends only on last
            # iteration's looked-up probability and decoded bit — so it
            # is computed ONCE per lane here and merged into this
            # iteration's table walk, halving the dominant per-bit cost
            # (two NCTX=281 select loops -> one).  The final iteration's
            # pending update is dropped: nothing reads the model after
            # the last bit.
            if "walk" in ablate:
                p = jnp.full((GROUPS, 128), 2048, jnp.int32) + (ctx & 1)
            else:
                pctx = pctx_s[...]
                pprev = pprev_s[...]
                updv = jnp.where(pbit_s[...] == 1, pprev - (pprev >> 5),
                                 pprev + ((4096 - pprev) >> 5))
                p = jnp.zeros((GROUPS, 128), jnp.int32)
                for c in range(NCTX):
                    pc = jnp.where(pctx == c, updv, probs[c])
                    probs[c] = pc
                    p = jnp.where(ctx == c, pc, p)

            code = code_s[...]
            if rans:
                # binary rANS decode (v3, flags bit 2): slot = x mod 4096
                # picks the bit, then x contracts by the bit's frequency —
                # no low/range pair, no interval clamping
                pu = p.astype(u32)
                slot = code & 0xFFF
                hi = code >> 12
                bit = (slot >= pu).astype(jnp.int32)
                bit = jnp.where(active, bit, 0)
                x1 = jnp.where(bit == 1,
                               (jnp.uint32(4096) - pu) * hi + slot - pu,
                               pu * hi + slot)
                x1 = jnp.where(active, x1, code)
                ren = active & (x1 < (1 << 16))
            else:
                # carry-less range decode (v2)
                low = low_s[...]
                rng = rng_s[...]
                r = (rng >> 12) * p.astype(u32)
                bit = ((code - low) >= r).astype(jnp.int32)
                bit = jnp.where(active, bit, 0)
                low1 = jnp.where(bit == 1, low + r, low)
                rng1 = jnp.where(bit == 1, rng - r, r)
                low1 = jnp.where(active, low1, low)
                rng1 = jnp.where(active, rng1, rng)
                ren = active & ((rng1 >> 16) == 0)
                straddle = (((low1 ^ (low1 + rng1 - 1)) >> 16) != 0)
                lo_part = jnp.uint32(0x10000) - (low1 & 0xFFFF)
                hi_part = rng1 - lo_part
                clamp = ren & straddle
                take_hi = clamp & (hi_part > lo_part)
                low2 = jnp.where(take_hi, low1 + lo_part, low1)
                rng2 = jnp.where(clamp,
                                 jnp.where(take_hi, hi_part, lo_part), rng1)
                low_s[...] = jnp.where(ren, low2 << 16, low2)
                rng_s[...] = jnp.where(ren, rng2 << 16, rng2)

            # model update is deferred into the next iteration's table
            # walk (see above); stash this bit's (ctx, bit, p).  Inactive
            # lanes carry the 511 sentinel in ctx, so they never match.
            if "walk" not in ablate:
                pctx_s[...] = ctx
                pbit_s[...] = bit
                pprev_s[...] = p

            # refill: the renormalizing lanes consume the group's next m
            # stream units in lane order
            ren_i = ren.astype(jnp.int32)
            if "refill" in ablate:
                xcur = x1 if rans else code
                code_s[...] = jnp.where(
                    ren, (xcur << 16) | jnp.uint32(1), xcur)
            else:
                wof = wof_s[...]
                o = wof & 127
                srow = wof >> 7  # logical window row [0, 16)
                if "refill_rows" in ablate:
                    rowA = win[:, 0, :][:, None, :].reshape(GROUPS, 128)
                    rowB = win[:, 1, :][:, None, :].reshape(GROUPS, 128)
                else:
                    rowA = jnp.zeros((GROUPS, 128), jnp.int32)
                    rowB = jnp.zeros((GROUPS, 128), jnp.int32)
                    for rr in range(16):
                        sel = srow == rr
                        rowA = jnp.where(sel, win[:, rr, :][:, None, :]
                                         .reshape(GROUPS, 128), rowA)
                        nxt = (rr + 1) % 16
                        rowB = jnp.where(sel, win[:, nxt, :][:, None, :]
                                         .reshape(GROUPS, 128), rowB)
                # one rotation instead of two: merge A/B in UNROTATED
                # space (index j takes rowA when j >= o, the wrapped
                # rowB below o), then rotate once
                sshift = (128 - o) & 127
                pos = lane_iota()
                merged = jnp.where(pos >= o, rowA, rowB)
                aligned = varroll(merged, sshift)
                if "refill_expand" in ablate:
                    unit = aligned
                else:
                    unit = expand(aligned, ren_i)
                xcur = x1 if rans else code
                code_s[...] = jnp.where(
                    ren, (xcur << 16) | unit.astype(u32), xcur)
                m_g = jnp.sum(ren_i, axis=1, keepdims=True)
                wof2 = wof + m_g
                wof_s[...] = jnp.where(wof2 >= 1024, wof2 - 1024, wof2)
                # one scalar-reduced guard instead of 8 per-group checks
                # (a @pl.when check costs ~165 cycles per iteration even
                # when it never fires); the inner per-group checks only
                # evaluate in the rare crossing iterations
                slid = (wof2 >= 1024).astype(jnp.int32)

                @pl.when(jnp.max(slid) == 1)
                def _slide():
                    for g in range(GROUPS):
                        @pl.when(slid[g, 0] == 1)
                        def _(g=g):
                            # slide the window one tile: rows 8..15 ->
                            # 0..7, load next
                            for rr in range(8):
                                win[g, rr, :] = win[g, rr + 8, :]
                            wt = wTile[g]
                            cp = pltpu.make_async_copy(
                                stream_hbm.at[g, pl.ds(wt * 8, 8), :],
                                win.at[g, pl.ds(8, 8), :], sem)
                            cp.start()
                            cp.wait()
                            wTile[g] = wt + 1

            # ---- state machine ----
            is_rf = active & (phase == PH_RFLAG)
            is_re = active & (phase == PH_REXP)
            is_rm = active & (phase == PH_RMAN)
            is_uf = active & (phase == PH_UFLAG)
            is_ue = active & (phase == PH_UEXP)
            is_um = active & (phase == PH_UMAN)

            rank = rank_s[...]
            val = val_s[...]

            rh_s[...] = jnp.where(is_rf, ((rh << 1) | bit) & 0xF, rh)
            uh_s[...] = jnp.where(is_uf, ((uh << 1) | bit) & 0xF, uh)

            b3 = jnp.where(brs <= 1, 0, jnp.where(brs <= 3, 1, 2))

            # completions: run of length 1 (UFLAG bit 0) or mantissa done
            um_done = is_um & (t + 1 == brs - 1)
            comp1 = is_uf & (bit == 0)
            compn = um_done
            comp = comp1 | compn
            runlen = jnp.where(comp1, 1, (val << 1) | bit)

            # next phase/state (order matters: compute all, then select)
            np_ = phase
            nt = t
            nbrs = brs
            nval = val
            nrank = rank
            nprb = prb
            npub = pub

            # PH_RFLAG
            np_ = jnp.where(is_rf & (bit == 1), PH_REXP, np_)
            nt = jnp.where(is_rf & (bit == 1), 1, nt)
            nbrs = jnp.where(is_rf & (bit == 1), 1, nbrs)
            np_ = jnp.where(is_rf & (bit == 0), PH_UFLAG, np_)
            nrank = jnp.where(is_rf & (bit == 0), 0, nrank)
            nprb = jnp.where(is_rf & (bit == 0), 0, nprb)

            # PH_REXP
            re_cont = is_re & (bit == 1)
            hit_cap = re_cont & (brs + 1 == W.RANK_EXP_CAP)
            np_ = jnp.where(hit_cap, PH_RMAN, np_)
            nval = jnp.where(hit_cap, 1, nval)
            nprb = jnp.where(hit_cap,
                             jnp.where(brs + 1 <= 1, 0,
                                       jnp.where(brs + 1 <= 3, 1, 2)), nprb)
            nbrs = jnp.where(re_cont, brs + 1, nbrs)
            nt = jnp.where(re_cont & ~hit_cap, t + 1, nt)
            nt = jnp.where(hit_cap, 0, nt)
            re_stop = is_re & (bit == 0)
            nprb = jnp.where(re_stop, b3, nprb)
            one_rank = re_stop & (brs == 1)
            np_ = jnp.where(one_rank, PH_UFLAG, np_)
            nrank = jnp.where(one_rank, 1, nrank)
            rm_multi = re_stop & (brs != 1)
            np_ = jnp.where(rm_multi, PH_RMAN, np_)
            nval = jnp.where(rm_multi, 1, nval)
            nt = jnp.where(rm_multi, 0, nt)

            # PH_RMAN
            rm_done = is_rm & (t + 1 == brs - 1)
            nval = jnp.where(is_rm, (val << 1) | bit, nval)
            nt = jnp.where(is_rm & ~rm_done, t + 1, nt)
            np_ = jnp.where(rm_done, PH_UFLAG, np_)
            nrank = jnp.where(rm_done, (val << 1) | bit, nrank)

            # PH_UFLAG
            np_ = jnp.where(is_uf & (bit == 1), PH_UEXP, np_)
            nt = jnp.where(is_uf & (bit == 1), 1, nt)
            nbrs = jnp.where(is_uf & (bit == 1), 1, nbrs)
            npub = jnp.where(comp1, 0, npub)

            # PH_UEXP
            ue_cont = is_ue & (bit == 1)
            ue_cap = ue_cont & (brs + 1 == W.RUN_EXP_CAP)
            nbrs = jnp.where(ue_cont, brs + 1, nbrs)
            nt = jnp.where(ue_cont & ~ue_cap, t + 1, nt)
            npub = jnp.where(ue_cap,
                             jnp.where(brs + 1 <= 1, 0,
                                       jnp.where(brs + 1 <= 3, 1, 2)), npub)
            np_ = jnp.where(ue_cap, PH_UMAN, np_)
            nval = jnp.where(ue_cap, 1, nval)
            nt = jnp.where(ue_cap, 0, nt)
            ue_stop = is_ue & (bit == 0)
            npub = jnp.where(ue_stop, b3, npub)
            np_ = jnp.where(ue_stop, PH_UMAN, np_)
            nval = jnp.where(ue_stop, 1, nval)
            nt = jnp.where(ue_stop, 0, nt)

            # PH_UMAN continue
            nval = jnp.where(is_um, (val << 1) | bit, nval)
            nt = jnp.where(is_um & ~um_done, t + 1, nt)

            # completions: MTF pick + record emit + lane accounting.
            # Ranks above 31 are rare after a BWT, so the upper 224 table
            # rows (the bulk of the per-iteration vector work) run under a
            # scalar guard only when some lane actually needs them.
            comp_i = comp.astype(jnp.int32)
            crank = jnp.where(comp, nrank, -1)
            if "mtf" in ablate:
                sym = crank & 0xFF
            else:
                mr = jnp.max(crank)
                sym = jnp.zeros((GROUPS, 128), jnp.int32)
                for rr in range(32):
                    sym = jnp.where(crank == rr, mtf[rr], sym)
                symtmp[...] = sym
                old31 = mtf[31]

                # mtf shift: entries 1..rank move down, picked symbol to
                # front
                prev = mtf[0]
                for rr in range(1, 32):
                    cur = mtf[rr]
                    mtf[rr] = jnp.where(comp & (rr <= crank), prev, cur)
                    prev = cur

                # rare tier in ONE guarded region (each @pl.when check
                # costs ~165 cycles/iteration): the high pick reads rows
                # 32..255, untouched by the low shift above, and the high
                # shift seeds from old31 captured pre-shift
                @pl.when(mr >= 32)
                def _high():
                    s2 = symtmp[...]
                    for rr in range(32, 256):
                        s2 = jnp.where(crank == rr, mtf[rr], s2)
                    symtmp[...] = s2
                    prev2 = old31
                    for rr in range(32, 256):
                        cur = mtf[rr]
                        mtf[rr] = jnp.where(comp & (rr <= crank), prev2,
                                            cur)
                        prev2 = cur

                sym = symtmp[...]
                mtf[0] = jnp.where(comp, sym, mtf[0])

            left = left_s[...]
            runlen = jnp.where(comp, jnp.minimum(runlen, left), runlen)
            nleft = jnp.where(comp, left - runlen, left)
            left_s[...] = nleft
            np_ = jnp.where(comp, jnp.where(nleft <= 0, PH_DONE, PH_RFLAG),
                            np_)

            phase_s[...] = np_
            t_s[...] = nt
            brs_s[...] = nbrs
            val_s[...] = nval
            rank_s[...] = nrank
            prb_s[...] = nprb
            pub_s[...] = npub

            # ONE record per completed run: its within-group output
            # position (pos << 9, tracked incrementally — the emitter's
            # balanced lanes keep every group under 2^23 bytes, gated at
            # _dec_parse) packed with the 9-bit sym DELTA vs the lane's
            # previous run.  The finish program scatters the deltas at
            # their positions and one cumsum reconstructs the bytes — no
            # sort, no repeat, and HALF the emission staging of the old
            # (sym|lane, runlen) two-plane scheme.
            last = last_s[...]
            posn = pos_s[...]
            rec = (posn << 9) | ((sym - last) & 0x1FF)
            last_s[...] = jnp.where(comp, sym, last)
            pos_s[...] = jnp.where(comp, posn + runlen, posn)
            if "emit" in ablate:
                # keep sym/runlen live (fold into a scratch the finish
                # step writes out) so ablating the emit staging does not
                # DCE the upstream MTF work
                mA[...] = mA[...] ^ rec ^ runlen
            else:
                stage_emit(rec, comp_i, mA, mB, mF, mTile, mRcv, mTc,
                           rec_hbm)
            return 0

        lax.fori_loop(0, TI, row_body, 0)

        @pl.when(step == n_steps - 1)
        def _finish():
            if "emit" in ablate:
                counts_ref[...] = mA[...]
                last_ref[...] = last_s[...]
                return
            last_ref[...] = last_s[...]
            for g in range(GROUPS):
                cnt = mTc[g] * 1024 + mRcv[g, 0] * 128 + mF[g, 0]
                counts_ref[g, :] = jnp.full((128,), cnt, jnp.int32)
                rc = mRcv[g, 0]
                arow = mA[g, :]
                for rr in range(8):
                    @pl.when(rc == rr)
                    def _(rr=rr):
                        mTile[g, rr, :] = arow
                tc = mTc[g]
                cp = pltpu.make_async_copy(
                    mTile.at[g], rec_hbm.at[g, pl.ds(tc * 8, 8), :], sem)
                cp.start()
                cp.wait()

    import jax

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),   # warm codes
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),   # initial offs
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),   # lane sizes
            pl.BlockSpec(memory_space=pl.ANY),            # stream
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # packed records
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),   # counts
            pl.BlockSpec((GROUPS, 128), lambda s: (0, 0)),   # last syms
        ],
        scratch_shapes=(
            [pltpu.VMEM((NCTX, GROUPS, 128), jnp.int32),
             pltpu.VMEM((GROUPS, 128), jnp.uint32),
             pltpu.VMEM((GROUPS, 128), jnp.uint32),
             pltpu.VMEM((GROUPS, 128), jnp.uint32),
             pltpu.VMEM((256, GROUPS, 128), jnp.int32),
             pltpu.VMEM((GROUPS, 128), jnp.int32)] +
            [pltpu.VMEM((GROUPS, 128), jnp.int32) for _ in range(15)] +
            [pltpu.VMEM((GROUPS, 16, 128), jnp.int32),       # window
             pltpu.VMEM((GROUPS, 128), jnp.int32)] +         # wof
            [pltpu.VMEM((GROUPS, 128), jnp.int32),           # mA
             pltpu.VMEM((GROUPS, 128), jnp.int32),           # mB
             pltpu.VMEM((GROUPS, 128), jnp.int32),           # mF
             pltpu.VMEM((GROUPS, 8, 128), jnp.int32),        # mTile
             pltpu.VMEM((GROUPS, 128), jnp.int32)] +         # mRcv
            [pltpu.SMEM((GROUPS,), jnp.int32) for _ in range(2)] +
            [pltpu.SemaphoreType.DMA]
        ),
    )

    return jax.jit(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((GROUPS, MROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((GROUPS, 128), jnp.int32),
            jax.ShapeDtypeStruct((GROUPS, 128), jnp.int32),
        ),
        interpret=interpret,
    ))


@functools.lru_cache(maxsize=16)
def _decoder_call(TI: int, IT: int, SROWS: int, MROWS: int, interpret: bool,
                  rans: bool = False, ablate: frozenset = frozenset()):
    return _build_decode_kernel(TI, IT, SROWS, MROWS, interpret, rans,
                                ablate)


@functools.lru_cache(maxsize=32)
def _prep_call(UT: int, SROWS: int, interpret: bool):
    """Device prologue: segment the flat u16 unit stream into the decode
    kernel's padded [GROUPS, SROWS, 128] layout and extract the per-lane
    warm-up words — the last host prep pass of the wide decode moved
    on-chip.  Only the exact payload units (2 B each) cross the tunnel;
    the 2x-inflated padded i32 planes are built by vectorized gathers on
    device."""
    import jax
    import jax.numpy as jnp

    def prep(units, gunits, lane_sz):
        # units: uint16[UT] concatenated group streams (padded tail);
        # gunits: int32[GROUPS]; lane_sz: int32[GROUPS, 128]
        u = units.astype(jnp.int32)
        goffs = jnp.cumsum(gunits) - gunits            # [G]
        local = jax.lax.broadcasted_iota(
            jnp.int32, (GROUPS, SROWS * 128), 1)
        idx = jnp.clip(goffs[:, None] + local, 0, UT - 1)
        valid = local < gunits[:, None]
        stream = jnp.where(valid, jnp.take(u, idx), 0)
        stream = stream.reshape(GROUPS, SROWS, 128)
        live = (lane_sz > 0).astype(jnp.int32)
        pos = 2 * (jnp.cumsum(live, axis=1) - live)    # warm-pair offsets
        w0 = jnp.take(u, jnp.clip(goffs[:, None] + pos, 0, UT - 1))
        w1 = jnp.take(u, jnp.clip(goffs[:, None] + pos + 1, 0, UT - 1))
        warm = jnp.where(
            live == 1,
            (w0.astype(jnp.uint32) << 16) | w1.astype(jnp.uint32),
            jnp.uint32(0))
        goff = jnp.broadcast_to(
            (2 * jnp.sum(live, axis=1))[:, None],
            (GROUPS, 128)).astype(jnp.int32)
        return warm, goff, stream

    del interpret  # plain jnp ops; same path under test and on device
    return jax.jit(prep)


def _geom_bucket(x: int, lo: int, step: int = 128) -> int:
    """Geometric 1.25x size ladder rounded to `step` (deterministic, so
    jit program shapes repeat across payloads and persist in the cache)."""
    b = lo
    while b < x:
        b = -(-(b * 5 + 3) // 4 // step) * step
    return b


def _dec_parse(payload: bytes):
    """Host-side header/stream parse for the device decode.  Returns the
    parsed dict, or None when the payload is not kernel-decodable."""
    import struct

    isize, L, flags, max_bits = struct.unpack_from("<IHHI", payload, 0)
    if L != LANES or max_bits == 0:
        return None
    off = 12
    if flags & 1:
        lane_sz = np.frombuffer(payload, dtype="<u4", count=L,
                                offset=off).astype(np.int64)
        off += 4 * L
    else:
        lane_sz = np.asarray(W.lane_sizes(isize, L), dtype=np.int64)
    # the kernel packs each record's within-group position into 23 bits
    # (pos << 9 | sym-delta); a pathologically byte-skewed lane split
    # could overflow that, so such payloads take the host codec instead
    if int(lane_sz.reshape(GROUPS, 128).sum(axis=1).max()) >= (1 << 23):
        return None
    gunits = np.frombuffer(payload, dtype="<u4",
                           count=GROUPS, offset=off).astype(np.int32)
    off += 4 * GROUPS
    total = int(gunits.sum())
    units = np.frombuffer(payload, dtype="<u2", count=total, offset=off)

    TI = 256
    IT = _it_bucket(max(max_bits, TI), TI)
    # records bound: one run per input byte
    MROWS = -(-(int(lane_sz.reshape(GROUPS, 128).sum(axis=1).max()) + 2048)
              // 128)
    MROWS = -(-MROWS // 8) * 8
    SROWS = max(16, -(-int(gunits.max()) // 128) + 16)
    SROWS = -(-SROWS // 8) * 8
    # bucket SROWS/MROWS to limit compiles
    def _b(x):
        b = 64
        while b < x:
            b *= 2
        return b
    SROWS, MROWS = _b(SROWS), _b(MROWS)
    # UT sizes the H2D transfer itself, so it gets the finer 1.25x ladder
    # (a pow2 bucket shipped up to 2x the payload over the tunnel).
    # +2: warm-pair/clip reads stay in range when a group is empty and
    # indexes past its start.
    UT = max(1 << 16, _geom_bucket(total + 2, 1 << 16))
    upad = np.zeros(UT, dtype=np.uint16)
    upad[:total] = units
    return {"rans": bool(flags & 4), "lane_sz": lane_sz, "gunits": gunits,
            "upad": upad, "TI": TI, "IT": IT, "SROWS": SROWS,
            "MROWS": MROWS, "UT": UT}


def _dec_submit(p: dict, interpret: bool):
    """Queue the prep prologue + decoder kernel for a parsed payload and
    return the in-flight state (no host sync happens here)."""
    import jax.numpy as jnp

    lane32 = jnp.asarray(p["lane_sz"].reshape(GROUPS, 128).astype(np.int32))
    # Stream segmentation runs ON DEVICE (_prep_call): the exact u16
    # payload units cross the tunnel once; the padded per-group planes and
    # warm-up words are vectorized gathers on chip.
    warm_d, goff_d, stream_d = _prep_call(p["UT"], p["SROWS"], interpret)(
        jnp.asarray(p["upad"]), jnp.asarray(p["gunits"]), lane32)
    recs_d, counts_d, last_d = _decoder_call(
        p["TI"], p["IT"], p["SROWS"], p["MROWS"], interpret, p["rans"])(
        warm_d, goff_d, lane32, stream_d)
    return {"recs_d": recs_d, "counts_d": counts_d, "last_d": last_d,
            "lane_sz": p["lane_sz"]}


@functools.lru_cache(maxsize=64)
def _finish_delta_call(MROWS: int, RU: int, NPAD: int, interpret: bool):
    """ALL-group record expansion in ONE program: [GROUPS, MROWS, 128]
    packed (pos << 9 | sym-delta) records -> uint8[NPAD] decoded block
    (tail past the true byte count is padding).

    Sort-free and repeat-free (round 5; the previous fused finish cost
    ~237 ms on a 16 MB block — a ~5M-record 3-array stable sort plus a
    16M `jnp.repeat`): every record carries its absolute output position
    and the sym DELTA vs the lane's previous run, so a permutation
    scatter of the deltas + ONE i32 cumsum reconstructs the bytes — runs
    fill forward because a constant span's deltas are zero.  Cross-lane
    telescoping (the cumsum carries each lane's final sym into the next
    lane's span) is cancelled by scattering -lastsym[m-1] at lane m's
    start position — 1024 fixup adds.  Measured primitive costs
    (docs/TPU_SORT_NOTES.md): scatter ~114 Melem/s, cumsum 16M = 27 ms."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fin(recs, counts, lastsym, gbase, lstart):
        # recs: int32[GROUPS, MROWS, 128] row-major packed records;
        # counts: int32[GROUPS, 128] (lane 0 = the group's record count);
        # lastsym: int32[GROUPS, 128] final sym per lane (0 if none);
        # gbase: int32[GROUPS] group byte starts; lstart: int32[LANES]
        # absolute lane byte starts, output lane order.
        rr_ = recs[:, : RU // 128, :].reshape(GROUPS, RU)
        ridx = lax.broadcasted_iota(jnp.int32, (GROUPS, RU), 1)
        valid = ridx < counts[:, 0][:, None]
        u = lax.bitcast_convert_type(rr_, jnp.uint32)
        d9 = (u & 0x1FF).astype(jnp.int32)
        delta = d9 - jnp.where(d9 > 255, 512, 0)
        dst = (u >> 9).astype(jnp.int32) + gbase[:, None]
        # invalid records route to distinct out-of-range slots so the
        # scatter stays a unique-index permutation (dropped by mode)
        g = lax.broadcasted_iota(jnp.int32, (GROUPS, RU), 0)
        idx = jnp.where(valid, dst, NPAD + g * RU + ridx)
        d = jnp.zeros((NPAD,), jnp.int32)
        d = d.at[idx.reshape(-1)].set(
            jnp.where(valid, delta, 0).reshape(-1),
            mode="drop", unique_indices=True)
        ls = lastsym.reshape(-1)
        fix = jnp.concatenate([jnp.zeros((1,), jnp.int32), -ls[:-1]])
        d = d.at[lstart].add(fix, mode="drop")
        return jnp.cumsum(d).astype(jnp.uint8)

    del interpret  # plain jnp ops; same path under test and on device
    return jax.jit(fin)


def _finish_shapes(st: dict):
    counts = np.asarray(st["counts_d"])[:, 0]
    gb = st["lane_sz"].reshape(GROUPS, 128).sum(axis=1).astype(np.int64)
    n = int(gb.sum())
    MROWS = int(st["recs_d"].shape[1])
    used = (int(counts.max()) // 128 + 9) * 128
    RU = min(_geom_bucket(used, 2048), MROWS * 128)
    NPAD = _geom_bucket(n, 1 << 16)
    return n, MROWS, RU, NPAD


def _dec_expand(st: dict, interpret: bool):
    """Sync the record counts and dispatch the fused expansion; returns
    (device uint8[NPAD] block, true byte count) WITHOUT fetching — the
    caller overlaps the D2H with later work."""
    import jax.numpy as jnp

    n, MROWS, RU, NPAD = _finish_shapes(st)
    lsz = st["lane_sz"].reshape(GROUPS, 128)
    gb = lsz.sum(axis=1)
    gbase = np.concatenate([[0], np.cumsum(gb)[:-1]]).astype(np.int32)
    lstart = (np.cumsum(lsz.reshape(-1)) -
              lsz.reshape(-1)).astype(np.int32)
    out = _finish_delta_call(MROWS, RU, NPAD, interpret)(
        st["recs_d"], st["counts_d"], st["last_d"],
        jnp.asarray(gbase), jnp.asarray(lstart))
    return out, n


def _dec_finish(st: dict, interpret: bool) -> bytes:
    """Sync the record counts, expand ALL groups' records into the block's
    bytes with one fused program (see `_finish_delta_call`), fetch once."""
    out, n = _dec_expand(st, interpret)
    return np.asarray(out)[:n].tobytes()


def _dec_finish_device(st: dict, interpret: bool):
    """_dec_finish variant that KEEPS the decoded block in HBM: returns a
    device uint8[n] array (the composed decode pipeline chains the wideaux
    inverse BWT on it without a D2H/H2D round trip of the block)."""
    out, n = _dec_expand(st, interpret)
    return out[:n]


def device_decode_resident(payload: bytes, interpret: bool = False):
    """Wide decode that returns the block as a DEVICE array (or None)."""
    parsed = _dec_parse(payload)
    if parsed is None:
        return None
    return _dec_finish_device(_dec_submit(parsed, interpret), interpret)


def device_decode(payload: bytes, interpret: bool = False):
    """Wide-profile decode with the lockstep state machine on device.
    Returns the decoded bytes, or None when not applicable (falls back to
    the host codec)."""
    parsed = _dec_parse(payload)
    if parsed is None:
        return None
    return _dec_finish(_dec_submit(parsed, interpret), interpret)


def device_decode_many(payloads, interpret: bool = False):
    """Pipelined wide decode of several payloads, three overlapped legs
    (the decode counterpart of device_encode_many; the reference overlaps
    its device stages the same way, st.cu:372-387):

    - main thread: parse + H2D block i, expand-dispatch block i-1, submit
      block i's kernels.  The expand for i-1 is queued BEFORE block i's
      kernels so the in-order device queue cannot delay it behind them.
    - fetcher thread: D2H of block i-1's expanded bytes while the chip
      decodes block i and the main thread preps block i+1 — the 16 MB
      result transfer is the longest host-side leg, so it gets its own
      thread instead of serializing the submit loop.

    Returns a list of decoded bytes (None where a payload is not
    kernel-decodable)."""
    import queue
    import threading

    results: list = [None] * len(payloads)
    fetch_q: "queue.Queue" = queue.Queue(maxsize=4)
    errs: list = []

    def fetcher():
        while True:
            item = fetch_q.get()
            if item is None:
                return
            j, out_d, nb = item
            try:
                results[j] = np.asarray(out_d)[:nb].tobytes()
            except Exception as e:  # record + exit; producer checks errs
                errs.append(e)
                return

    def put_checked(item):
        # bounded put that cannot deadlock on a dead fetcher
        while True:
            if errs:
                raise errs[0]
            try:
                fetch_q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=fetcher, daemon=True)
    t.start()
    pending = None  # (index, in-flight kernel state)
    try:
        for i, payload in enumerate(payloads):
            parsed = _dec_parse(payload)
            if pending is not None:
                pi, pst = pending
                pending = None
                put_checked((pi,) + _dec_expand(pst, interpret))
            if parsed is not None:
                pending = (i, _dec_submit(parsed, interpret))
        if pending is not None:
            pi, pst = pending
            pending = None
            put_checked((pi,) + _dec_expand(pst, interpret))
    finally:
        while not errs:
            try:
                fetch_q.put(None, timeout=0.2)
                break
            except queue.Full:
                continue
        t.join()
    if errs:
        raise errs[0]
    return results
