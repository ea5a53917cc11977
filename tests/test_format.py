"""Format layer: headers, mode word, stored blocks, checksums."""

import numpy as np
import pytest

from libbsc_tpu import constants as C
from libbsc_tpu.format.header import (
    pack_mode,
    unpack_mode,
    pack_block_header,
    parse_block_header,
    make_stored_block,
    BlockHeader,
)
from libbsc_tpu.utils.adler32 import adler32, adler32_jax


def test_mode_roundtrip():
    m = pack_mode(C.BLOCKSORTER_BWT, C.CODER_QLFC_STATIC, 15, 128)
    assert m == (1 | (1 << 5) | (128 << 8) | (15 << 16))
    u = unpack_mode(m)
    assert (u.block_sorter, u.coder, u.lzp_hash_size, u.lzp_min_len) == (1, 1, 15, 128)


def test_mode_validation():
    assert pack_mode(10, 1, 0, 0) < 0  # invalid sorter (2 is now wide-aux)
    assert pack_mode(1, 5, 0, 0) < 0  # invalid coder
    assert pack_mode(1, 1, 5, 128) < 0  # hash size out of range
    assert pack_mode(1, 1, 15, 3) < 0  # min len out of range
    assert pack_mode(1, 3, 0, 0) > 0  # no LZP is fine


def test_stored_block_roundtrip():
    data = b"hello stored world" * 3
    blk = make_stored_block(data)
    assert len(blk) == len(data) + C.HEADER_SIZE
    h = parse_block_header(blk)
    assert isinstance(h, BlockHeader)
    assert h.mode == 0 and h.data_size == len(data)
    assert blk[C.HEADER_SIZE:] == data


def test_header_corruption_detected():
    blk = bytearray(make_stored_block(b"x" * 100))
    blk[9] ^= 0xFF
    assert parse_block_header(bytes(blk)) == C.DATA_CORRUPT


def test_header_too_short():
    assert parse_block_header(b"short") == C.UNEXPECTED_EOB


def test_adler32_matches_zlib():
    import zlib

    rng = np.random.default_rng(1)
    for n in [0, 1, 100, 5551, 5552, 5553, 100000]:
        d = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert adler32(d) == zlib.adler32(d)


def test_adler32_jax_matches_zlib():
    import zlib

    rng = np.random.default_rng(2)
    for n in [1, 100, 2048, 2049, 65536, 100001]:
        d = rng.integers(0, 256, size=n, dtype=np.uint8)
        got = int(adler32_jax(d))
        assert got == zlib.adler32(d.tobytes()), n


def test_adler32_jax_masked():
    import zlib

    rng = np.random.default_rng(3)
    d = rng.integers(0, 256, size=10000, dtype=np.uint8)
    got = int(adler32_jax(d, n=7777))
    assert got == zlib.adler32(d[:7777].tobytes())
