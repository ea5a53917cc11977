"""Pure-Python fallback engine vs the native runtime (bit-exact streams)."""

import numpy as np
import pytest

import libbsc_tpu as B
from libbsc_tpu import constants as C, engine
from libbsc_tpu.fallback import bwt as fbwt, lzp as flzp, qlfc as fqlfc, st as fst

from conftest import make_corpus


@pytest.fixture(scope="module", autouse=True)
def _init():
    B.init()


@pytest.mark.parametrize("kind", ["text", "random", "runs"])
@pytest.mark.parametrize("n", [17, 255, 30000])
@pytest.mark.parametrize("k", [3, 5, 8])
def test_fallback_st_roundtrip(rng, n, kind, k):
    d = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
    buf = d.copy()
    idx = fst.st_encode(buf, k)
    ref = d.copy()
    ref_idx = engine.st_encode(ref, k, 0)
    np.testing.assert_array_equal(buf, ref)
    assert idx == ref_idx
    assert fst.st_decode(buf, k, idx) == 0
    np.testing.assert_array_equal(buf, d)


@pytest.mark.parametrize("n", [255, 30000])
def test_fallback_bwt_roundtrip(rng, n):
    d = np.frombuffer(make_corpus(rng, n, "text"), dtype=np.uint8).copy()
    buf = d.copy()
    p, ni, aux = fbwt.bwt_encode(buf)
    ref = d.copy()
    rp, rni, _ = engine.bwt_encode(ref, 0)
    np.testing.assert_array_equal(buf, ref)
    assert (p, ni) == (rp, rni)
    assert fbwt.bwt_decode(buf, p, ni, aux) == 0
    np.testing.assert_array_equal(buf, d)


@pytest.mark.parametrize("kind", ["text", "periodic"])
@pytest.mark.parametrize("n", [5000, 300000])
def test_fallback_lzp_matches_native(rng, n, kind):
    d = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
    mine = flzp.lzp_compress(d.copy(), 15, 32)
    ref = engine.lzp_compress(d.copy(), 15, 32, 0)
    assert (mine is None) == (ref is None)
    if mine is not None:
        np.testing.assert_array_equal(mine, ref)
        np.testing.assert_array_equal(flzp.lzp_decompress(mine, 15, 32), d)


@pytest.mark.parametrize("coder", [C.CODER_QLFC_STATIC, C.CODER_QLFC_ADAPTIVE,
                                   C.CODER_QLFC_FAST])
def test_fallback_qlfc_matches_native(rng, coder):
    d = np.frombuffer(make_corpus(rng, 50000, "text"), dtype=np.uint8).copy()
    buf = d.copy()
    engine.bwt_encode(buf, 0)
    mine = fqlfc.coder_compress(buf, coder)
    ref = engine.coder_compress(buf, coder, 0)
    assert (mine is None) == (ref is None)
    if mine is not None:
        np.testing.assert_array_equal(mine, ref)
        np.testing.assert_array_equal(fqlfc.coder_decompress(mine, coder), buf)
