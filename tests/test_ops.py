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


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("n", [255, 4096, 100001])
def test_bwt_encode_padded_matches_unpadded(rng, n, kind):
    """Shape-bucketed BWT (dynamic true length + aux rate through a padded
    program) must reproduce the exact-shape transform bit-for-bit: U,
    primary and every aux index, with adversarial 0xFF pad fill."""
    from libbsc_tpu.ops.bwt import bwt_encode_padded

    d = _data(rng, n, kind)
    U1, p1, aux1 = bwt_encode(jnp.asarray(d))
    r = aux_rate(n)
    for m in (n, (n * 5 + 3) // 4, n + 4096):
        p = np.full(m, 0xFF, np.uint8)
        p[:n] = d
        U2, p2, aux2 = bwt_encode_padded(jnp.asarray(p), n, r)
        assert int(p2) == int(p1), m
        np.testing.assert_array_equal(np.asarray(U2)[:n], np.asarray(U1))
        np.testing.assert_array_equal(
            np.asarray(aux2)[: (n - 1) // r], np.asarray(aux1))


def test_bwt_padded_one_program_per_bucket(rng):
    """Different true lengths inside one bucket must NOT trigger a fresh
    trace/compile: n and r ride as dynamic scalars."""
    from libbsc_tpu.ops.bwt import _bwt_encode_padded_jit, bwt_encode_padded

    m = 8192
    base = np.frombuffer(make_corpus(rng, m, "text"), np.uint8).copy()
    sizes = [6000, 7321, 8000, 8192]
    cache0 = _bwt_encode_padded_jit._cache_size()
    for n in sizes:
        p = base.copy()
        p[n:] = 0
        U, pr, aux = bwt_encode_padded(jnp.asarray(p), n, aux_rate(n))
        ref = base[:n].copy()
        ref_primary, ref_ni, ref_idx = engine.bwt_encode(ref, 0)
        assert int(pr) == ref_primary, n
        np.testing.assert_array_equal(np.asarray(U)[:n], ref)
        np.testing.assert_array_equal(
            np.asarray(aux)[:ref_ni], ref_idx[:ref_ni])
    # one compiled program served every size in the bucket
    assert _bwt_encode_padded_jit._cache_size() - cache0 <= 1


def test_engine_bwt_device_route_padded(rng, monkeypatch):
    """engine.bwt_encode's device route (default: shape-bucketed padded
    program) must match the native transform end-to-end, aux included."""
    n = (1 << 20) + 12345  # above _DEVICE_MIN_BLOCK, off any bucket edge
    d = np.frombuffer(make_corpus(rng, n, "text"), np.uint8).copy()
    ref = d.copy()
    ref_primary, ref_ni, ref_idx = engine.bwt_encode(ref, 0)

    monkeypatch.setenv("TBSC_BWT_DEVICE", "1")
    monkeypatch.setattr(engine, "_force", "ops")
    monkeypatch.setattr(engine, "_device", None)
    buf = d.copy()
    primary, ni, aux = engine.bwt_encode(buf, 0)
    assert primary == ref_primary
    assert ni == ref_ni
    np.testing.assert_array_equal(buf, ref)
    np.testing.assert_array_equal(np.asarray(aux)[:ni], ref_idx[:ni])


def test_api_default_config_device_bwt_padded(rng, monkeypatch):
    """Full default-config compress (LZP 15/128 + BWT + QLFC-static) with
    the device-routed shape-bucketed BWT must produce the archive the host
    pipeline produces, byte for byte — the device accelerates the default
    config unchanged (the reference's -G semantics, bwt/bwt.cpp:178-181)."""
    data = make_corpus(rng, (1 << 20) + 77777, "text")
    host = B.compress(data)

    monkeypatch.setenv("TBSC_BWT_DEVICE", "1")
    monkeypatch.setattr(engine, "_force", "ops")
    monkeypatch.setattr(engine, "_device", None)
    dev = B.compress(data)
    assert dev == host
    assert B.decompress(dev) == data


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
