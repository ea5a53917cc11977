"""Sharded pipeline on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libbsc_tpu.parallel import make_mesh, make_transform_step, batch_st_encode
from libbsc_tpu.ops import st_encode, bwt_encode

from conftest import make_corpus


def _blocks(rng, b, n):
    return np.stack([
        np.frombuffer(make_corpus(rng, n, ["text", "runs", "periodic"][i % 3]),
                      dtype=np.uint8)
        for i in range(b)
    ])


@pytest.mark.parametrize("sorter", ["st", "bwt"])
def test_sharded_transform_matches_single_device(rng, sorter):
    mesh = make_mesh(8)  # (4, 2) dp x sp
    b, n = 8, 1024
    blocks = _blocks(rng, b, n)

    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp", "sp"))
    dev_blocks = jax.device_put(jnp.asarray(blocks), sharding)

    step = make_transform_step(mesh, sorter=sorter, k=5)
    out, idx, hist = step(dev_blocks)

    out = np.asarray(out)
    idx = np.asarray(idx)
    hist = np.asarray(hist)

    for i in range(b):
        if sorter == "st":
            ref_out, ref_idx = st_encode(jnp.asarray(blocks[i]), 5)
        else:
            ref_out, ref_idx, _ = bwt_encode(jnp.asarray(blocks[i]))
        np.testing.assert_array_equal(out[i], np.asarray(ref_out))
        assert idx[i] == int(ref_idx)
        np.testing.assert_array_equal(
            hist[i], np.bincount(blocks[i], minlength=256))


def test_sharded_transform_large_shard_pallas_hist(rng):
    """Shards >= the Pallas histogram tile take the kernel path."""
    from libbsc_tpu.ops.pallas_kernels import _HIST_TILE

    mesh = make_mesh(2, dp=1, sp=2)
    b, n = 1, 2 * _HIST_TILE
    blocks = _blocks(rng, b, n)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp", "sp"))
    dev_blocks = jax.device_put(jnp.asarray(blocks), sharding)
    step = make_transform_step(mesh, sorter="st", k=4)
    out, idx, hist = step(dev_blocks)
    ref_out, ref_idx = st_encode(jnp.asarray(blocks[0]), 4)
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(ref_out))
    assert int(idx[0]) == int(ref_idx)
    np.testing.assert_array_equal(
        np.asarray(hist)[0], np.bincount(blocks[0], minlength=256))


def test_mesh_shapes():
    assert make_mesh(8).shape == {"dp": 4, "sp": 2}
    assert make_mesh(8, dp=8).shape == {"dp": 8, "sp": 1}
    assert make_mesh(1).shape == {"dp": 1, "sp": 1}


def test_batch_st_encode(rng):
    blocks = _blocks(rng, 4, 512)
    out, idx = batch_st_encode(jnp.asarray(blocks), 4)
    for i in range(4):
        ref_out, ref_idx = st_encode(jnp.asarray(blocks[i]), 4)
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(ref_out))
        assert int(idx[i]) == int(ref_idx)
