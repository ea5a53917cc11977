"""Pallas lockstep coder for CODER_QLFC_WIDE (the on-chip entropy engine).

Execution shape (measured viable on v5e: ~0.65 ns/lane-bit at 1024 lanes):
1024 lanes as a [8, 128] vector tile (8 groups x 128 lanes, one group per
sublane row).  The host prepares per-lane (context, bit) planes with the
native schedule walker (native/wide.cc wide_schedule — the MTF + rank/run
state machine); the kernel is then a PURE coder: per iteration row it does
a one-hot model lookup/update over the 192 contexts, a carry-less range
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

import numpy as np

from . import wide as W

GROUPS = 8
LANES = GROUPS * 128  # kernel lane count (device path uses 1024 lanes)
NCTX = W.NCTX


def _jax():
    import jax  # deferred: keep module importable without backend init

    return jax


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
            sh = jnp.roll(x, 1 << s, axis=1)
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
            inc = jnp.roll(move, -k, axis=1)
            vr = jnp.roll(vals, -k, axis=1)
            dr = jnp.roll(d, -k, axis=1)
            vals = jnp.where(inc == 1, vr, vals)
            d = jnp.where(inc == 1, dr - k, d)
            v = jnp.maximum(inc, v * (1 - move))
        return vals

    def varroll(x, f):
        """Per-row circular shift right by f (f: [GROUPS, 128] broadcast of a
        per-row scalar)."""
        for s in range(7):
            sh = jnp.roll(x, 1 << s, axis=1)
            x = jnp.where(((f >> s) & 1) == 1, sh, x)
        return x

    def kernel(ctx_ref, bit_ref, out_ref, counts_ref, flow_ref,
               probs, low_s, rng_s, stA, stB, fills, tile, rowcnt, tilecnt,
               sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for c in range(NCTX):
                probs[c] = jnp.full((GROUPS, 128), 2048, jnp.int32)
            low_s[...] = jnp.zeros((GROUPS, 128), u32)
            rng_s[...] = jnp.full((GROUPS, 128), 0xFFFFFFFF, u32)
            stA[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            stB[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            fills[...] = jnp.zeros((GROUPS, 128), jnp.int32)
            for g in range(GROUPS):
                rowcnt[g] = 0
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
            ctx = ctx_ref[i].astype(jnp.int32)
            bit = bit_ref[i].astype(jnp.int32)
            active = ctx < 255

            # one-hot model lookup + update over the context axis
            p = jnp.zeros((GROUPS, 128), jnp.int32)
            for c in range(NCTX):
                pc = probs[c]
                m = ctx == c
                p = jnp.where(m, pc, p)
                upd = jnp.where(bit == 1, pc - (pc >> 5),
                                pc + ((4096 - pc) >> 5))
                probs[c] = jnp.where(m & active, upd, pc)

            low = low_s[...]
            rng = rng_s[...]
            r = (rng >> 12) * p.astype(u32)
            low1 = jnp.where(bit == 1, low + r, low)
            rng1 = jnp.where(bit == 1, rng - r, r)
            low1 = jnp.where(active, low1, low)
            rng1 = jnp.where(active, rng1, rng)
            ren = active & ((rng1 >> 16) == 0)
            straddle = (((low1 ^ (low1 + rng1 - 1)) >> 16) != 0)
            rng2 = jnp.where(ren & straddle,
                             0x10000 - (low1 & 0xFFFF), rng1)
            emitval = ((low1 >> 16) & 0xFFFF).astype(jnp.int32) \
                | (lane_iota() << 16)
            low_s[...] = jnp.where(ren, low1 << 16, low1)
            rng_s[...] = jnp.where(ren, rng2 << 16, rng2)

            # ---- emission staging ----
            m_row = jnp.sum(ren.astype(jnp.int32), axis=1, keepdims=True)
            packed = leftpack(emitval, ren)
            # (ren used as i32 inside leftpack; conversions happen there)
            pos = lane_iota()
            f = fills[...]
            valid0 = pos < m_row  # packed occupancy at the row front
            rolled = varroll(jnp.where(valid0, packed, 0), f)
            occr = varroll(valid0.astype(jnp.int32), f) == 1
            inA = occr & (pos >= f)
            inB = occr & (pos < f)
            stA[...] = jnp.where(inA, rolled, stA[...])
            stB[...] = jnp.where(inB, rolled, stB[...])
            fnew = f + m_row
            fills[...] = jnp.where(fnew >= 128, fnew - 128, fnew)

            for g in range(GROUPS):
                @pl.when(fnew[g, 0] >= 128)
                def _(g=g):
                    rc = rowcnt[g]
                    arow = stA[g, :]
                    for rr in range(8):
                        @pl.when(rc == rr)
                        def _(rr=rr):
                            tile[g, rr, :] = arow
                    stA[g, :] = stB[g, :]
                    stB[g, :] = jnp.zeros((128,), jnp.int32)
                    rowcnt[g] = rc + 1
                    @pl.when(rc + 1 == 8)
                    def _():
                        flush_group(g)
                        rowcnt[g] = 0
            return 0

        lax.fori_loop(0, TI, row_body, 0)

        @pl.when(step == n_steps - 1)
        def _finish():
            # final flush: spill the partial staging row + partial tile and
            # record exact unit counts
            for g in range(GROUPS):
                cnt = (tilecnt[g] * 1024 + rowcnt[g] * 128 + fills[g, 0])
                rc = rowcnt[g]
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
            pl.BlockSpec((TI, GROUPS, 128), lambda s: (s, 0, 0)),
            pl.BlockSpec((TI, GROUPS, 128), lambda s: (s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
            pltpu.SMEM((GROUPS,), jnp.int32),             # rowcnt
            pltpu.SMEM((GROUPS,), jnp.int32),             # tilecnt
            pltpu.SemaphoreType.DMA,
        ],
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
# host driver
# ---------------------------------------------------------------------------

def _it_bucket(max_bits: int, TI: int) -> int:
    it = TI
    while it < max_bits:
        it *= 2
    return it


def device_encode(data: bytes, interpret: bool = False):
    """Full wide-profile encode with the coder on device.  Returns the
    payload bytes (bit-identical to native/wide.cc), or None when not
    compressible / not applicable."""
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

    # native prep: per-lane (ctx, bit) planes, lane-major
    cap = 9 * (16 * chunk) + 64  # worst-case bits per lane (balanced cap 16x)
    ctx = np.empty((LANES, cap), dtype=np.uint8)
    bit = np.empty((LANES, cap), dtype=np.uint8)
    max_bits = lib.tbsc_wide_schedule(_u8p(buf), n, LANES, cap,
                                      _u8p(ctx), _u8p(bit), sizes_p)
    if max_bits < 0:
        return None

    TI = 256
    IT = _it_bucket(max(max_bits, TI), TI)
    MAXROWS = -(-((IT * 8) + 2048) // 1024) * 8  # per-group unit bound, tiles

    # iteration-major [IT, GROUPS, 128] planes
    ctx_d = jnp.asarray(ctx[:, :IT]).reshape(GROUPS, 128, IT) \
        .transpose(2, 0, 1)
    bit_d = jnp.asarray(bit[:, :IT]).reshape(GROUPS, 128, IT) \
        .transpose(2, 0, 1)

    units_d, counts_d, flow_d = _coder_call(TI, IT, MAXROWS, interpret)(
        ctx_d, bit_d)
    counts = np.asarray(counts_d)[:, 0]
    used_rows = int(-(-int(counts.max()) // 128)) + 8
    units = np.asarray(units_d[:, :used_rows])  # slim the D2H transfer
    flow = np.asarray(flow_d)

    return _assemble(n, units, counts, flow, sizes)


def _assemble(n: int, units: np.ndarray, counts: np.ndarray,
              flow: np.ndarray, lane_sz=None):
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

    payload = struct.pack("<IHH", n, LANES, 1 if lane_sz is not None else 0)
    if lane_sz is not None:
        payload += sizes.astype("<u4").tobytes()
    payload += np.asarray(gunits, dtype="<u4").tobytes()
    payload += b"".join(payload_parts)
    if len(payload) >= n:
        return None
    return payload
