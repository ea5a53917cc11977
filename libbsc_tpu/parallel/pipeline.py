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
