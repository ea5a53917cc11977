"""Device ops (ops/st.py, ops/bwt.py) vs the native host runtime.

The native runtime is itself validated bit-exactly against the reference
binary (test_native_stages.py), so agreement here closes the loop:
device transform == reference transform.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import libbsc_tpu as B
from libbsc_tpu import engine
from libbsc_tpu.ops import st_encode, bwt_encode, bwt_decode
from libbsc_tpu.ops.bwt import aux_rate

from conftest import make_corpus


@pytest.fixture(scope="module", autouse=True)
def _init():
    B.init()


SIZES = [2, 3, 17, 255, 4096, 100001]
KINDS = ["text", "random", "runs", "zeros", "periodic"]


def _data(rng, n, kind):
    return np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("k", [3, 4, 5, 6, 7, 8])
def test_st_encode_matches_native(rng, n, kind, k):
    d = _data(rng, n, kind)
    out, idx = st_encode(jnp.asarray(d), k)
    ref = d.copy()
    ref_idx = engine.st_encode(ref, k, 0)
    assert ref_idx >= 0
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert int(idx) == ref_idx


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("n", SIZES)
def test_bwt_encode_matches_native(rng, n, kind):
    d = _data(rng, n, kind)
    U, primary, aux = bwt_encode(jnp.asarray(d))
    ref = d.copy()
    ref_primary, ref_ni, ref_idx = engine.bwt_encode(ref, 0)
    assert ref_primary > 0
    np.testing.assert_array_equal(np.asarray(U), ref)
    assert int(primary) == ref_primary
    assert aux.shape[0] == ref_ni == (n - 1) // aux_rate(n)
    if ref_ni:
        np.testing.assert_array_equal(np.asarray(aux), ref_idx[:ref_ni])


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("n", SIZES)
def test_bwt_roundtrip_on_device(rng, n, kind):
    d = _data(rng, n, kind)
    U, primary, _ = bwt_encode(jnp.asarray(d))
    dec = bwt_decode(U, primary)
    np.testing.assert_array_equal(np.asarray(dec), d)


@pytest.mark.parametrize("n", [5, 300, 4096])
@pytest.mark.parametrize("k", [3, 5, 8])
def test_st_encode_padded_matches_unpadded(rng, n, k):
    from libbsc_tpu.ops.st import st_encode_padded

    d = _data(rng, n, "text")
    o1, i1 = st_encode(jnp.asarray(d), k)
    n_pad = -(-n // 128) * 128
    p = np.zeros(n_pad, np.uint8)
    p[:n] = d
    o2, i2 = st_encode_padded(jnp.asarray(p), n, k)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2)[:n])
    assert int(i1) == int(i2)


def test_bwt_decode_native_stream(rng):
    """Device inverse must decode a native-encoded (libsais-convention) BWT."""
    d = _data(rng, 50000, "text")
    ref = d.copy()
    primary, _, _ = engine.bwt_encode(ref, 0)
    dec = bwt_decode(jnp.asarray(ref), primary)
    np.testing.assert_array_equal(np.asarray(dec), d)


@pytest.mark.parametrize("kind", ["text", "random", "runs", "zeros", "periodic"])
@pytest.mark.parametrize("n", [63, 64, 65, 66, 255, 4096, 65537, 1 << 20])
def test_bwt_encode_dc3_matches_native(rng, n, kind):
    """Difference-cover (DC3) suffix sort — doubling over the 2n/3 sample +
    two-sort class merge — must agree with the native BWT bit-for-bit.
    Sizes cover every n mod 3 residue (the class-grid padding cases)."""
    from libbsc_tpu.ops.bwt import bwt_encode_dc3

    d = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8)
    U, primary, aux = bwt_encode_dc3(jnp.asarray(d))
    ref = d.copy()
    ref_primary, ref_ni, ref_idx = engine.bwt_encode(ref, 0)
    assert int(primary) == ref_primary
    assert np.array_equal(np.asarray(U), ref)
    assert aux.shape[0] == ref_ni
    if ref_ni:
        assert np.array_equal(np.asarray(aux), ref_idx[:ref_ni])


@pytest.mark.parametrize("kind", ["text", "random", "runs", "zeros", "periodic"])
@pytest.mark.parametrize("n", [1, 2, 255, 4096, 65537, 1 << 20])
def test_bwt_encode_fast_matches_native(rng, n, kind):
    """Host-driven segmented prefix doubling (bucketed unresolved re-sort)
    must agree with the native BWT bit-for-bit, aux indexes included."""
    from libbsc_tpu.ops.bwt import bwt_encode_fast

    d = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8)
    U, primary, aux = bwt_encode_fast(jnp.asarray(d))
    ref = d.copy()
    ref_primary, ref_ni, ref_idx = engine.bwt_encode(ref, 0)
    assert int(primary) == ref_primary
    assert np.array_equal(np.asarray(U), ref)
    assert aux.shape[0] == ref_ni
    if ref_ni:
        assert np.array_equal(np.asarray(aux), ref_idx[:ref_ni])
