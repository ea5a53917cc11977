"""Pallas statistics kernels (interpreter mode on the CPU backend)."""

import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from libbsc_tpu.ops.pallas_kernels import byte_histogram, adler32_device


@pytest.mark.parametrize("n", [1, 100, 2048, 131072, 131079, 500000])
def test_byte_histogram(rng, n):
    d = rng.integers(0, 256, n, dtype=np.uint8)
    h = np.asarray(byte_histogram(jnp.asarray(d)))
    np.testing.assert_array_equal(h, np.bincount(d, minlength=256))


@pytest.mark.parametrize("n", [0, 1, 2047, 2048, 2049, 131072, 500000])
def test_adler32_device(rng, n):
    d = rng.integers(0, 256, n, dtype=np.uint8)
    expect = zlib.adler32(d.tobytes()) & 0xFFFFFFFF
    assert adler32_device(jnp.asarray(d)) == expect


def test_adler32_device_seeded(rng):
    d = rng.integers(0, 256, 10000, dtype=np.uint8)
    seed = 0x9ABCDEF1
    expect = zlib.adler32(d.tobytes(), seed) & 0xFFFFFFFF
    assert adler32_device(jnp.asarray(d), value=seed) == expect
