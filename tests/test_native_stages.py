"""Native engine stages: round-trip property tests + oracle cross-validation.

The oracle tests pin bit-compatibility with the reference implementation
(new-encoder stream == reference stream for QLFC/BWT/ST; mutual
decodability for LZP, whose stream format admits multiple valid encoders).
"""

import ctypes

import numpy as np
import pytest

from libbsc_tpu import native
from tests.conftest import make_corpus

u8p = ctypes.POINTER(ctypes.c_ubyte)

KINDS = ["text", "random", "runs", "zeros", "periodic"]
SIZES = [100, 4096, 70000]


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable")
    return native.load()


# --- QLFC ---

@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("coder", [1, 2, 3])
def test_qlfc_roundtrip(lib, rng, kind, coder):
    for n in SIZES:
        data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
        out = np.zeros(2 * n + 4096, dtype=np.uint8)
        rc = lib.tbsc_qlfc_encode_block(native._u8p(data), native._u8p(out), n, n - 1, coder)
        if rc < 0:
            assert rc == -3  # genuinely incompressible under budget n-1
            continue
        dec = np.zeros(n, dtype=np.uint8)
        drc = lib.tbsc_qlfc_decode_block(native._u8p(out), native._u8p(dec), coder)
        assert drc == n
        assert np.array_equal(dec, data)


@pytest.mark.parametrize("kind", ["text", "random", "runs"])
@pytest.mark.parametrize("coder", [1, 2, 3])
def test_qlfc_bit_exact_vs_reference(lib, oracle, rng, kind, coder):
    for n in SIZES:
        data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
        oout = np.zeros(2 * n + 4096, dtype=np.uint8)
        orc = oracle.o_qlfc_encode(
            data.ctypes.data_as(u8p), oout.ctypes.data_as(u8p), n, n - 1, coder
        )
        mout = np.zeros(2 * n + 4096, dtype=np.uint8)
        mrc = lib.tbsc_qlfc_encode_block(native._u8p(data), native._u8p(mout), n, n - 1, coder)
        assert mrc == orc
        if orc > 0:
            assert np.array_equal(oout[:orc], mout[:mrc])


# --- BWT ---

@pytest.mark.parametrize("kind", KINDS)
def test_bwt_matches_reference(lib, oracle, rng, kind):
    for n in [64, 1000, 65537, 200000]:
        data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
        oT = data.copy()
        oni = ctypes.c_ubyte(0)
        oI = (ctypes.c_int * 256)()
        orc = oracle.o_bwt_encode(oT.ctypes.data_as(u8p), n, ctypes.byref(oni), oI, 0)
        mT = data.copy()
        mni = np.zeros(1, dtype=np.uint8)
        mI = np.zeros(256, dtype=np.int32)
        mrc = lib.tbsc_bwt_encode(native._u8p(mT), n, native._u8p(mni), native._i32p(mI), 1)
        assert (orc, oni.value) == (mrc, mni[0])
        assert np.array_equal(oT, mT)
        assert all(oI[t] == mI[t] for t in range(oni.value))


@pytest.mark.parametrize("kind", KINDS)
def test_bwt_roundtrip(lib, rng, kind):
    for n in [2, 33, 1000, 70000]:
        data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
        T = data.copy()
        ni = np.zeros(1, dtype=np.uint8)
        I = np.zeros(256, dtype=np.int32)
        idx = lib.tbsc_bwt_encode(native._u8p(T), n, native._u8p(ni), native._i32p(I), 1)
        assert idx > 0 or n <= 1
        for use_aux in [int(ni[0]), 0]:
            D = T.copy()
            rc = lib.tbsc_bwt_decode(native._u8p(D), n, idx, use_aux, native._i32p(I), 1)
            assert rc == 0
            assert np.array_equal(D, data), (kind, n, use_aux)


def test_bwt_matches_reference_compaction_stress(lib, oracle, rng):
    """Inputs tuned to exercise the unique-LMS compaction in the SA-IS
    recursion (bwt.cc): high LMS-substring uniqueness (random, hex-token
    soup) next to highly repetitive structure (fibonacci word, nested
    periods) at sizes above the compaction thresholds."""
    corpora = []
    corpora.append(rng.integers(0, 256, size=1 << 20, dtype=np.uint8)
                   .tobytes())
    toks = [("%x" % h).encode() for h in rng.integers(0, 1 << 60, size=4096)]
    out = bytearray()
    while len(out) < (1 << 20):
        out += toks[rng.integers(0, len(toks))] + b" "
    corpora.append(bytes(out[: 1 << 20]))
    fib_a, fib_b = b"a", b"ab"
    while len(fib_b) < (1 << 20):
        fib_a, fib_b = fib_b, fib_b + fib_a
    corpora.append(fib_b[: 1 << 20])
    corpora.append(((b"xy" * 37 + b"z") * 4096)[: 1 << 20])
    for data in corpora:
        n = len(data)
        arr = np.frombuffer(data, dtype=np.uint8)
        oT = arr.copy()
        oni = ctypes.c_ubyte(0)
        oI = (ctypes.c_int * 256)()
        orc = oracle.o_bwt_encode(oT.ctypes.data_as(u8p), n,
                                  ctypes.byref(oni), oI, 0)
        mT = arr.copy()
        mni = np.zeros(1, dtype=np.uint8)
        mI = np.zeros(256, dtype=np.int32)
        mrc = lib.tbsc_bwt_encode(native._u8p(mT), n, native._u8p(mni),
                                  native._i32p(mI), 1)
        assert (orc, oni.value) == (mrc, mni[0])
        assert np.array_equal(oT, mT)
        assert all(oI[t] == mI[t] for t in range(oni.value))


# --- ST ---

@pytest.mark.parametrize("k", [3, 4, 5, 6, 7, 8])
def test_st_roundtrip(lib, rng, k):
    for kind in KINDS:
        for n in [50, 1000, 70000]:
            data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
            T = data.copy()
            idx = lib.tbsc_st_encode(native._u8p(T), n, k, 1)
            assert idx >= 0
            D = T.copy()
            rc = lib.tbsc_st_decode(native._u8p(D), n, k, idx, 1)
            assert rc == 0
            assert np.array_equal(D, data), (kind, n, k)


@pytest.mark.parametrize("k", [3, 4, 5, 6])
def test_st_matches_reference(lib, oracle, rng, k):
    for kind in ["text", "random", "runs"]:
        for n in [64, 1000, 70000]:
            data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
            oT = np.concatenate([data, np.zeros(64, dtype=np.uint8)])
            orc = oracle.o_st_encode(oT.ctypes.data_as(u8p), n, k, 0)
            mT = data.copy()
            mrc = lib.tbsc_st_encode(native._u8p(mT), n, k, 1)
            assert orc == mrc
            assert np.array_equal(oT[:n], mT)


@pytest.mark.parametrize("k", [7, 8])
def test_st78_decodable_by_reference(lib, oracle, rng, k):
    """ST7/8 have no CPU encoder in the reference (GPU-only); our encoder's
    output must be decodable by the reference decoder."""
    for n in [1000, 70000]:
        data = np.frombuffer(make_corpus(rng, n, "text"), dtype=np.uint8).copy()
        mT = data.copy()
        idx = lib.tbsc_st_encode(native._u8p(mT), n, k, 1)
        dT = np.concatenate([mT, np.zeros(64, dtype=np.uint8)])
        rc = oracle.o_st_decode(dT.ctypes.data_as(u8p), n, k, idx, 0)
        assert rc == 0
        assert np.array_equal(dT[:n], data)


# --- LZP ---

@pytest.mark.parametrize("hs,ml", [(15, 128), (16, 64), (10, 32), (17, 4)])
def test_lzp_roundtrip_and_interop(lib, oracle, rng, hs, ml):
    for kind in ["text", "random", "periodic"]:
        for n in [200, 5000, 300000]:
            data = np.frombuffer(make_corpus(rng, n, kind), dtype=np.uint8).copy()
            mout = np.zeros(n + 4096, dtype=np.uint8)
            mrc = lib.tbsc_lzp_compress(native._u8p(data), native._u8p(mout), n, hs, ml, 1)
            if mrc >= 0:
                dec = np.zeros(n + 64, dtype=np.uint8)
                drc = lib.tbsc_lzp_decompress(native._u8p(mout), native._u8p(dec), mrc, hs, ml, 1)
                assert drc == n and np.array_equal(dec[:n], data)
                # reference decodes our stream
                dec2 = np.zeros(n + 64, dtype=np.uint8)
                drc2 = oracle.o_lzp_decompress(
                    mout.ctypes.data_as(u8p), dec2.ctypes.data_as(u8p), mrc, hs, ml, 0
                )
                assert drc2 == n and np.array_equal(dec2[:n], data)
            # we decode the reference's stream
            oout = np.zeros(n + 4096, dtype=np.uint8)
            orc = oracle.o_lzp_compress(
                data.ctypes.data_as(u8p), oout.ctypes.data_as(u8p), n, hs, ml, 0
            )
            if orc >= 0:
                dec3 = np.zeros(n + 64, dtype=np.uint8)
                drc3 = lib.tbsc_lzp_decompress(native._u8p(oout), native._u8p(dec3), orc, hs, ml, 1)
                assert drc3 == n and np.array_equal(dec3[:n], data)


def test_st_failback_layout_roundtrip(lib, oracle, rng):
    """Inverse-ST layout C (st.cpp:1024,1422-1483): when any symbol count
    reaches 2^23 the packed-link layouts overflow and the decoder must fall
    back to link-only reconstruction with fastbits symbol recovery.  9 MB at
    95% one symbol crosses the threshold; round-trip ours and cross-decode
    with the reference."""
    n = 9 * 1024 * 1024
    data = np.zeros(n, dtype=np.uint8)
    rare = rng.integers(0, n, n // 20)
    data[rare] = rng.integers(1, 256, len(rare)).astype(np.uint8)
    assert int(np.bincount(data).max()) >= 1 << 23

    T = data.copy()
    idx = lib.tbsc_st_encode(native._u8p(T), n, 5, 1)
    assert idx >= 0
    D = T.copy()
    rc = lib.tbsc_st_decode(native._u8p(D), n, 5, idx, 1)
    assert rc == 0
    assert np.array_equal(D, data)

    oT = np.concatenate([T, np.zeros(64, dtype=np.uint8)])
    orc = oracle.o_st_decode(oT.ctypes.data_as(u8p), n, 5, idx, 0)
    assert orc == 0
    assert np.array_equal(oT[:n], data)


@pytest.mark.parametrize("k", [3, 4, 5, 6, 7, 8])
def test_st_tiny_inputs_roundtrip(lib, rng, k):
    """n < k exercises the wrap-around padding of the split-key forward
    transforms (st.cc padded_src); every tiny size must round-trip."""
    for n in range(2, 24):
        for alpha in (4, 256):
            d = rng.integers(0, alpha, n).astype(np.uint8)
            T = d.copy()
            idx = lib.tbsc_st_encode(native._u8p(T), n, k, 1)
            assert idx >= 0
            D = T.copy()
            assert lib.tbsc_st_decode(native._u8p(D), n, k, idx, 1) == 0
            assert np.array_equal(D, d), (k, n, alpha)


def test_lzp_flag_byte_stress_mutually_decodable(lib, oracle, rng):
    """Flag-byte (0xf2) heavy inputs: escapes apply only at positions with
    a table candidate.  LZP streams are mutually decodable rather than
    byte-identical (the reference's match choices depend on its unrolled
    group alignment), so each encoder's stream must decode with the OTHER
    side's decoder."""
    f2heavy = (b"\xf2" * 50 + rng.bytes(100) + b"\xf2\xf2\xf2") * 2000
    f2match = (b"\xf2" * 300 + rng.bytes(64)) * 500
    for data in (f2heavy, f2match):
        d = np.frombuffer(data, dtype=np.uint8).copy()
        out = np.empty(len(d) * 2 + 4096, dtype=np.uint8)
        r = oracle.o_lzp_compress(d.ctypes.data_as(u8p),
                                  out.ctypes.data_as(u8p), len(d), 15, 128, 0)
        mout = np.empty(len(d) * 2 + 4096, dtype=np.uint8)
        m = lib.tbsc_lzp_compress(native._u8p(d), native._u8p(mout), len(d),
                                  15, 128, 1)
        assert (r < 0) == (m < 0)
        if r > 0:
            dec = np.zeros(len(d) + 64, dtype=np.uint8)
            rc = oracle.o_lzp_decompress(mout.ctypes.data_as(u8p),
                                         dec.ctypes.data_as(u8p), m, 15,
                                         128, 0)
            assert rc == len(d) and np.array_equal(dec[:rc], d)
            dec2 = np.zeros(len(d) + 64, dtype=np.uint8)
            rc2 = lib.tbsc_lzp_decompress(native._u8p(out), native._u8p(dec2),
                                          r, 15, 128, 1)
            assert rc2 == len(d) and np.array_equal(dec2[:rc2], d)
