"""Sharded block-compression pipeline over a `jax.sharding.Mesh`.

Mesh axes:
  dp — data parallel over independent blocks (the reference's OpenMP block
       farm, bsc.cpp:196-423; blocks are fully independent units, so this
       axis needs no communication at all beyond the host-side gather).
  sp — sequence parallel within a block: each device holds a slice of the
       block.  Stage 1 (content statistics: the detectors' frequency models,
       detectors.cpp:70-581) reduces local histograms with `psum` over sp;
       stage 2 reassembles the full block with `all_gather` over sp for the
       context sort, then scatters the transformed block back to the sp
       layout.  All collectives ride ICI.

The per-device compute is the ops/ layer (st_encode / bwt_encode), vmapped
over the local block batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.st import st_encode
from ..ops.bwt import bwt_encode

try:  # moved to jax.shard_map in newer releases
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              sp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the first n_devices devices.

    Falls back to the CPU backend's (virtual) devices when the default
    backend has too few — the host platform honors
    --xla_force_host_platform_device_count even when an accelerator plugin
    owns the default backend.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                pass
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    if dp is None and sp is None:
        sp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
        dp = n_devices // sp
    elif dp is None:
        dp = n_devices // sp
    elif sp is None:
        sp = n_devices // dp
    if dp * sp != n_devices:
        raise ValueError(f"dp*sp={dp * sp} != n_devices={n_devices}")
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def batch_st_encode(blocks: jax.Array, k: int):
    """vmapped forward ST-k over a [B, n] batch of blocks."""
    return jax.vmap(lambda b: st_encode(b, k))(blocks)


def batch_bwt_encode(blocks: jax.Array):
    """vmapped forward BWT over a [B, n] batch of blocks."""
    return jax.vmap(bwt_encode)(blocks)


def make_transform_step(mesh: Mesh, sorter: str = "st", k: int = 5):
    """Build the jitted sharded transform step.

    Input blocks are laid out [B, n] sharded P('dp', 'sp'); the step returns
    (transformed blocks P('dp', 'sp'), per-block sort index P('dp'),
    per-block byte histogram P('dp')).  The histogram is the stage-1
    collective statistic (what the segmentation/record detectors consume).
    """
    sp_size = mesh.shape["sp"]

    def step(blocks):  # local shard: [B_local, n_local]
        b_local, n_local = blocks.shape

        # stage 1: content statistics, sequence-parallel + psum over sp.
        # Large shards use the Pallas compare-reduce histogram (4.9x faster
        # than the scatter-based bincount on TPU); tiny shards would be all
        # padding, so they keep bincount.
        from ..ops.pallas_kernels import _HIST_TILE, byte_histogram

        if n_local >= _HIST_TILE:
            hist = jnp.stack([byte_histogram(blocks[b])
                              for b in range(b_local)])
        else:
            hist = jax.vmap(
                lambda row: jnp.bincount(row.astype(jnp.int32), length=256)
            )(blocks).astype(jnp.int32)
        hist = lax.psum(hist, "sp")

        # stage 2: reassemble full blocks over sp, context-sort each
        full = lax.all_gather(blocks, "sp", axis=1, tiled=True)
        if sorter == "st":
            out, idx = jax.vmap(lambda b: st_encode(b, k))(full)
        elif sorter == "bwt":
            out, idx, _aux = jax.vmap(bwt_encode)(full)
        else:
            raise ValueError(sorter)

        # scatter the transformed block back to the sp-sharded layout
        me = lax.axis_index("sp")
        out_local = lax.dynamic_slice_in_dim(out, me * n_local, n_local, axis=1)
        return out_local, idx, hist

    # idx is replicated over sp (every sp member sorts the same all-gathered
    # block) but the checker can't infer replication through sort/vmap —
    # disable the varying-axes check.
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=P("dp", "sp"),
        out_specs=(P("dp", "sp"), P("dp"), P("dp", None)),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# True sequence-parallel ST: sample sort across the sp axis
# ---------------------------------------------------------------------------

def make_sharded_st_step(mesh: Mesh, k: int = 8, n_samples: int = 128,
                         slack_frac: int = 4):
    """ST-k of one block genuinely SHARDED over the sp axis (no all-gather
    of the block, no redundant sorts): a distributed sample sort.

    Per sp member (holding a contiguous [n_local] slice of each block):
      1. wrap-around context keys — the 8 boundary bytes arrive from the
         next member via `ppermute`;
      2. splitter selection — each member contributes strided sample
         triples (hi, lo, gpos); the tiny [S*R] sample set is all-gathered,
         sorted, and quantiled.  Triples are all distinct (gpos breaks
         ties), so all-equal blocks split by position and stay balanced;
      3. randomized re-deal — a balanced `all_to_all` moves each element
         to member hash(gpos) % S.  The hash is data-INDEPENDENT (a fixed
         multiplicative hash of the global position), so after the deal
         every member holds a pseudo-uniform sample of the whole block and
         its share of any key bucket concentrates at n_local/S no matter
         how key order correlates with position — the classic sample-sort
         failure (an all-equal block sorts to the identity, one source
         owning an entire destination range) cannot occur;
      4. O(n) bucket partition (counting scatter, not a sort) and a
         fixed-capacity `all_to_all` — per-pair capacity n_local/S plus
         slack now bounds the true counts for every input; `ok` still
         reports the (now data-independent, effectively impossible)
         overflow case and the caller may fall back to the all-gather
         path (make_transform_step);
      5. one local sort of the received range per member;
      6. rebalance to exact [n_local] output shards by exchanging
         fixed-size edge windows with both neighbors (`ppermute`) — the
         sampling bound keeps the true boundary within the slack window.

    Collectives: 2x ppermute (8 B + edge windows), one tiny all-gather,
    two all_to_alls of ~n_local * (1 + 1/slack) elements — all ICI-friendly
    (the sort itself is ~2.6 GB/s of tuple traffic at the chip's ~200
    Mkeys/s budget, far under ICI bandwidth, so the extra deal pass costs
    little and buys skew-proofness).
    Compute per member: O(n_local) partition + one sort of ~n_local keys,
    versus the all-gather path's full-block sort on every member.

    Returns a jitted step: blocks [B, n] P('dp','sp') ->
      (transformed P('dp','sp'), index P('dp'), ok P('dp')); `ok` is False
    if any exchange overflowed its capacity (results then invalid).
    """
    S = mesh.shape["sp"]
    if not 3 <= k <= 8:
        raise ValueError(f"ST order must be in [3, 8], got {k}")

    def one_block(ext, prev, gpos0, me):
        """ext: [nl + 8] u8 (slice + neighbor head); prev: [nl] u8 preceding
        bytes; gpos0: scalar global offset of this slice."""
        nl = ext.shape[0] - 8
        d32 = ext.astype(jnp.uint32)

        hi = jnp.zeros(nl, dtype=jnp.uint32)
        for j in range(min(k, 4)):
            hi = (hi << 8) | lax.dynamic_slice_in_dim(d32, j, nl)
        hi = hi << (8 * (4 - min(k, 4)))
        lo = jnp.zeros(nl, dtype=jnp.uint32)
        for j in range(4, k):
            lo = (lo << 8) | lax.dynamic_slice_in_dim(d32, j, nl)
        lo = lo << (8 * (8 - max(k, 4)))
        gpos = gpos0 + jnp.arange(nl, dtype=jnp.int32)

        # --- splitters from jittered samples (all members, all distinct).
        # Plain strided sampling aliases with periodic inputs (a repeating
        # word whose period divides the stride skews every sample into the
        # same context class), so each sample gets a fixed pseudo-random
        # offset within its stride cell. ---
        R = min(n_samples, nl)
        cell = max(1, nl // R)
        spos = jnp.asarray(
            [min((j * nl) // R + (j * 2654435761) % cell, nl - 1)
             for j in range(R)], dtype=jnp.int32)
        s_hi = lax.all_gather(hi[spos], "sp").reshape(-1)
        s_lo = lax.all_gather(lo[spos], "sp").reshape(-1)
        s_gp = lax.all_gather(gpos[spos], "sp").reshape(-1)
        s_hi, s_lo, s_gp = lax.sort((s_hi, s_lo, s_gp), num_keys=3)
        SR = S * R
        q = [(t + 1) * SR // S for t in range(S - 1)]
        sp_hi = jnp.stack([s_hi[i] for i in q]) if q else \
            jnp.zeros(0, jnp.uint32)
        sp_lo = jnp.stack([s_lo[i] for i in q]) if q else \
            jnp.zeros(0, jnp.uint32)
        sp_gp = jnp.stack([s_gp[i] for i in q]) if q else \
            jnp.zeros(0, jnp.int32)

        # --- randomized re-deal: decouple key order from source ownership.
        # Destination = multiplicative hash of the GLOBAL position — a
        # function of (gpos0, nl, S) only, never of the data, so the deal
        # cell sizes are a fixed shape property and every member ends up
        # holding a pseudo-uniform sample of the block. ---
        PAD = jnp.uint32(0xFFFFFFFF)
        GPAD = 0x7FFFFFFF
        deal = (((gpos.astype(jnp.uint32) * jnp.uint32(2654435761)) >> 16)
                % jnp.uint32(S)).astype(jnp.int32)
        CAPD = nl // S + max(64, nl // (4 * S))
        dcounts = jnp.bincount(deal, length=S)
        rankd = jnp.zeros(nl, jnp.int32)
        for s in range(S):
            m = (deal == s).astype(jnp.int32)
            rankd = jnp.where(m == 1, jnp.cumsum(m) - 1, rankd)
        ok = jnp.max(dcounts) <= CAPD
        slotd = deal * CAPD + jnp.minimum(rankd, CAPD - 1)

        def a2a(x, cap):
            return lax.all_to_all(x.reshape(S, cap), "sp", split_axis=0,
                                  concat_axis=0, tiled=False).reshape(-1)

        d_hi = a2a(jnp.full(S * CAPD, PAD).at[slotd].set(hi, mode="drop"),
                   CAPD)
        d_lo = a2a(jnp.full(S * CAPD, PAD).at[slotd].set(lo, mode="drop"),
                   CAPD)
        d_gp = a2a(jnp.full(S * CAPD, GPAD, dtype=jnp.int32)
                   .at[slotd].set(gpos, mode="drop"), CAPD)
        d_pv = a2a(jnp.zeros(S * CAPD, jnp.uint8).at[slotd].set(prev,
                                                                mode="drop"),
                   CAPD)
        dvalid = d_gp != GPAD
        nd = S * CAPD

        # bucket(i) = number of splitters <= (hi, lo, gpos)[i]
        def ge_splitter(t):
            a, b, c = sp_hi[t], sp_lo[t], sp_gp[t]
            return ((d_hi > a) | ((d_hi == a) & ((d_lo > b) |
                    ((d_lo == b) & (d_gp >= c))))).astype(jnp.int32)

        bucket = jnp.zeros(nd, jnp.int32)
        for t in range(S - 1):
            bucket = bucket + ge_splitter(t)

        # --- O(n) partition into per-destination slots (pads dropped) ---
        CAP = nl // S + nl // slack_frac
        counts = jnp.bincount(jnp.where(dvalid, bucket, S), length=S + 1)[:S]
        # rank within own bucket: S cumsums of the membership masks
        order_rank = jnp.zeros(nd, jnp.int32)
        for s in range(S):
            m = ((bucket == s) & dvalid).astype(jnp.int32)
            order_rank = jnp.where(m == 1, jnp.cumsum(m) - 1, order_rank)
        ok = ok & (jnp.max(counts) <= CAP)
        slot = jnp.where(dvalid,
                         bucket * CAP + jnp.minimum(order_rank, CAP - 1),
                         S * CAP)

        # --- exchange: member s receives every member's bucket-s segment ---
        r_hi = a2a(jnp.full(S * CAP, PAD).at[slot].set(d_hi, mode="drop"),
                   CAP)
        r_lo = a2a(jnp.full(S * CAP, PAD).at[slot].set(d_lo, mode="drop"),
                   CAP)
        r_gp = a2a(jnp.full(S * CAP, GPAD, dtype=jnp.int32)
                   .at[slot].set(d_gp, mode="drop"), CAP)
        r_pv = a2a(jnp.zeros(S * CAP, jnp.uint8).at[slot].set(d_pv,
                                                              mode="drop"),
                   CAP)

        # --- local sort of the received range (pads sink to the tail) ---
        r_hi, r_lo, r_gp, r_pv = lax.sort((r_hi, r_lo, r_gp, r_pv),
                                          num_keys=3)
        cnt = jnp.sum(r_gp != 0x7FFFFFFF).astype(jnp.int32)

        # --- rebalance to exactly nl outputs per member ---
        cnts = lax.all_gather(cnt, "sp")  # [S]
        offs = (jnp.cumsum(cnts) - cnts)[me]  # my segment's global offset
        W = CAP  # edge window (>= max boundary error by the capacity bound)
        # my first/last W sorted elements, to the left/right neighbors
        head_pv = r_pv[:W]
        head_gp = r_gp[:W]
        tail_pv = lax.dynamic_slice_in_dim(
            r_pv, jnp.maximum(cnt - W, 0), W)
        tail_gp = lax.dynamic_slice_in_dim(
            r_gp, jnp.maximum(cnt - W, 0), W)
        left_perm = [(s, (s - 1) % S) for s in range(S)]
        right_perm = [(s, (s + 1) % S) for s in range(S)]
        nbr_head_pv = lax.ppermute(head_pv, "sp", left_perm)   # from right
        nbr_head_gp = lax.ppermute(head_gp, "sp", left_perm)
        nbr_tail_pv = lax.ppermute(tail_pv, "sp", right_perm)  # from left
        nbr_tail_gp = lax.ppermute(tail_gp, "sp", right_perm)
        l_offs = (jnp.cumsum(cnts) - cnts)[(me - 1) % S]
        l_cnt = cnts[(me - 1) % S]
        nbr_tail_goff = l_offs + jnp.maximum(l_cnt - W, 0)
        r_offs = (jnp.cumsum(cnts) - cnts)[(me + 1) % S]

        want = me * nl + jnp.arange(nl, dtype=jnp.int32)  # global ranks
        own_idx = jnp.clip(want - offs, 0, S * CAP - 1)
        own_pv = r_pv[own_idx]
        own_gp = r_gp[own_idx]
        lt_idx = jnp.clip(want - nbr_tail_goff, 0, W - 1)
        rt_idx = jnp.clip(want - r_offs, 0, W - 1)
        from_left = want < offs
        from_right = want >= offs + cnt
        out_pv = jnp.where(from_left, nbr_tail_pv[lt_idx],
                           jnp.where(from_right, nbr_head_pv[rt_idx],
                                     own_pv))
        out_gp = jnp.where(from_left, nbr_tail_gp[lt_idx],
                           jnp.where(from_right, nbr_head_gp[rt_idx],
                                     own_gp))
        ok = ok & (offs - me * nl < W) & (me * nl + nl - offs - cnt < W)

        # index = global rank of gpos 0 (exactly one member holds it)
        here = out_gp == 0
        idx_local = jnp.where(jnp.any(here),
                              me * nl + jnp.argmax(here).astype(jnp.int32),
                              0)
        index = lax.pmax(idx_local, "sp")
        return out_pv, index, ok

    def step(blocks):  # local shard [B_local, n_local] u8
        b_local, nl = blocks.shape
        me = lax.axis_index("sp")
        left_perm = [(s, (s - 1) % S) for s in range(S)]
        right_perm = [(s, (s + 1) % S) for s in range(S)]
        recv8 = lax.ppermute(blocks[:, :8], "sp", left_perm)
        ext = jnp.concatenate([blocks, recv8], axis=1)
        # preceding byte: within the slice a roll; position 0 takes the
        # previous member's last byte
        prev_last = lax.ppermute(blocks[:, -1:], "sp", right_perm)
        prev = jnp.concatenate([prev_last, blocks[:, :-1]], axis=1)
        gpos0 = me * nl

        outs, idxs, oks = [], [], []
        for b in range(b_local):
            o, i, okb = one_block(ext[b], prev[b], gpos0, me)
            outs.append(o)
            idxs.append(i)
            oks.append(okb)
        ok_all = lax.pmin(jnp.all(jnp.stack(oks)).astype(jnp.int32),
                          "sp") == 1
        return (jnp.stack(outs), jnp.stack(idxs),
                jnp.stack([ok_all] * b_local))

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=P("dp", "sp"),
        out_specs=(P("dp", "sp"), P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)
