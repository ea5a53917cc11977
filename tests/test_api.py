"""End-to-end library API: compress/decompress blocks, reference interop."""

import ctypes

import numpy as np
import pytest

from libbsc_tpu import api, constants as C
from tests.conftest import make_corpus

u8p = ctypes.POINTER(ctypes.c_ubyte)

CONFIGS = [
    dict(),  # default: LZP + BWT + QLFC-static
    dict(coder=C.CODER_QLFC_FAST),
    dict(coder=C.CODER_QLFC_ADAPTIVE),
    dict(block_sorter=C.BLOCKSORTER_ST3),
    dict(block_sorter=C.BLOCKSORTER_ST5, coder=C.CODER_QLFC_FAST),
    dict(block_sorter=C.BLOCKSORTER_ST8),
    dict(lzp_hash_size=0, lzp_min_len=0),  # no LZP
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_block_roundtrip(rng, cfg):
    for kind in ["text", "random", "runs", "zeros"]:
        for n in [10, 100, 70000, 400000]:
            data = make_corpus(rng, n, kind)
            blk = api.compress(data, **cfg)
            assert api.decompress(blk) == data, (kind, n, cfg)


def test_incompressible_falls_back_to_store(rng):
    data = make_corpus(rng, 50000, "random")
    blk = api.compress(data)
    assert len(blk) == len(data) + C.HEADER_SIZE  # stored
    assert api.decompress(blk) == data


def test_corruption_detected(rng):
    data = make_corpus(rng, 50000, "text")
    blk = bytearray(api.compress(data))
    blk[1000] ^= 1
    with pytest.raises(api.BscError) as e:
        api.decompress(bytes(blk))
    assert e.value.code == C.DATA_CORRUPT


@pytest.mark.parametrize("cfg,ocfg", [
    (dict(), (15, 128, 1, 1)),
    (dict(coder=C.CODER_QLFC_FAST), (15, 128, 1, 3)),
    (dict(coder=C.CODER_QLFC_ADAPTIVE), (15, 128, 1, 2)),
    (dict(block_sorter=C.BLOCKSORTER_ST5), (15, 128, 5, 1)),
    (dict(lzp_hash_size=0, lzp_min_len=0), (0, 0, 1, 1)),
])
def test_reference_interop(oracle, rng, cfg, ocfg):
    hs, ml, bs, coder = ocfg
    for kind in ["text", "runs"]:
        data = make_corpus(rng, 300000, kind)
        n = len(data)
        # our block decodable by reference
        blk = api.compress(data, **cfg)
        out = np.zeros(n + 64, dtype=np.uint8)
        rc = oracle.o_decompress(
            np.frombuffer(blk, dtype=np.uint8).ctypes.data_as(u8p),
            len(blk), out.ctypes.data_as(u8p), n, 0,
        )
        assert rc == 0
        assert out[:n].tobytes() == data
        # reference block decodable by us
        inp = np.frombuffer(data, dtype=np.uint8)
        oblk = np.zeros(n + C.HEADER_SIZE, dtype=np.uint8)
        orc = oracle.o_compress(
            inp.ctypes.data_as(u8p), oblk.ctypes.data_as(u8p), n, hs, ml, bs, coder, 0
        )
        assert orc > 0
        assert api.decompress(oblk[:orc].tobytes()) == data


def test_no_lzp_blocks_bit_identical_to_reference(oracle, rng):
    """Without LZP (whose encoder policy is implementation-defined), our
    whole block must be byte-identical to the reference's."""
    for kind in ["text", "runs"]:
        data = make_corpus(rng, 300000, kind)
        n = len(data)
        blk = api.compress(data, lzp_hash_size=0, lzp_min_len=0)
        inp = np.frombuffer(data, dtype=np.uint8)
        oblk = np.zeros(n + C.HEADER_SIZE, dtype=np.uint8)
        orc = oracle.o_compress(
            inp.ctypes.data_as(u8p), oblk.ctypes.data_as(u8p), n, 0, 0, 1, 1, 0
        )
        assert orc == len(blk)
        assert oblk[:orc].tobytes() == blk


def test_compressed_size_parity_with_reference(oracle, rng):
    """With LZP on (encoder-policy latitude), our block size must stay
    within 0.5% of the reference's — guards against ratio regressions."""
    for kind, coder in [("text", C.CODER_QLFC_STATIC),
                        ("text", C.CODER_QLFC_ADAPTIVE),
                        ("periodic", C.CODER_QLFC_STATIC)]:
        data = make_corpus(rng, 400000, kind)
        n = len(data)
        blk = api.compress(data, coder=coder)
        inp = np.frombuffer(data, dtype=np.uint8)
        oblk = np.zeros(n + C.HEADER_SIZE, dtype=np.uint8)
        orc = oracle.o_compress(
            inp.ctypes.data_as(u8p), oblk.ctypes.data_as(u8p), n,
            C.DEFAULT_LZPHASHSIZE, C.DEFAULT_LZPMINLEN, 1, coder, 0
        )
        assert orc > 0
        assert len(blk) <= orc * 1.005, (kind, coder, len(blk), orc)


def test_decompress_batch_matches_individual(rng):
    """decompress_batch must be semantically identical to mapping decompress,
    across mixed sorters (batched ST walks + individual BWT), stored blocks,
    and multiple ST orders."""
    from tests.conftest import make_corpus

    blobs, expect = [], []
    specs = [
        (C.BLOCKSORTER_ST5, 150_000, "text"),
        (C.BLOCKSORTER_BWT, 120_000, "text"),
        (C.BLOCKSORTER_ST5, 90_000, "runs"),
        (C.BLOCKSORTER_ST3, 60_000, "periodic"),
        (C.BLOCKSORTER_ST8, 200_000, "text"),
        (C.BLOCKSORTER_ST8, 130_000, "runs"),
    ]
    for sorter, n, kind in specs:
        d = make_corpus(rng, n, kind)
        blobs.append(api.compress(d, block_sorter=sorter))
        expect.append(d)
    d = make_corpus(rng, 50_000, "random")  # stored (incompressible)
    blobs.append(api.compress(d))
    expect.append(d)

    out = api.decompress_batch(blobs)
    assert out == expect
    assert out == [api.decompress(b) for b in blobs]


def test_wideaux_profile_roundtrip(rng):
    """BLOCKSORTER_BWT_WIDEAUX (format extension): high-rate aux tail with
    a u32 count; round-trips across corpora and block sizes, host path."""
    from tests.conftest import make_corpus

    for kind, n in [("text", 300_000), ("runs", 120_000), ("zeros", 70_000),
                    ("text", 1 << 20)]:
        d = make_corpus(rng, n, kind)
        blob = api.compress(d, block_sorter=C.BLOCKSORTER_BWT_WIDEAUX)
        assert api.decompress(blob) == d, (kind, n)


def test_wideaux_rejected_by_reference_binary(tmp_path, rng):
    """Old decoders must reject sorter id 2 via mode validation."""
    import struct
    import subprocess

    from tests.oracle import bsc_binary

    bsc = bsc_binary()
    if bsc is None:
        import pytest
        pytest.skip("reference binary unavailable")
    d = make_corpus_bytes = None
    from tests.conftest import make_corpus
    data = make_corpus(rng, 200_000, "text")
    blob = api.compress(data, block_sorter=C.BLOCKSORTER_BWT_WIDEAUX)
    arch = tmp_path / "wa.bsc"
    with open(arch, "wb") as f:
        f.write(b"bsc1")
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<qbb", 0, 1, C.CONTEXTS_FOLLOWING))
        f.write(blob)
    r = subprocess.run([bsc, "d", str(arch), str(tmp_path / "out")],
                       capture_output=True)
    assert r.returncode != 0


def test_wideaux_device_formulation_matches_host(rng):
    """The device chain-chase formulation (run on the CPU backend) must be
    bit-identical to the host wavefront decode."""
    import numpy as np

    from tests.conftest import make_corpus
    from libbsc_tpu import engine
    from libbsc_tpu.ops import bwt as opsbwt
    import jax.numpy as jnp

    d0 = np.frombuffer(make_corpus(rng, 1 << 20, "text"), np.uint8).copy()
    d = d0.copy()
    rc, K, aux, r = engine.bwt_encode_wideaux(d, 0)
    assert rc > 0
    res = opsbwt._unbwt_wideaux_jit(
        jnp.asarray(d), jnp.int32(rc), jnp.asarray(aux, jnp.int32),
        r, len(d))
    assert np.array_equal(np.asarray(res), d0)
