"""Corruption fuzzing: every bit flip must yield DATA_CORRUPT (or another
clean error) — never a crash and never silently wrong output.  Mirrors the
reference's in-format verification contract (3 Adler-32 checks per block +
mode-word validation, libbsc.cpp:327-402,545,611)."""

import struct

import numpy as np
import pytest

import libbsc_tpu as B
from libbsc_tpu import constants as C

from conftest import make_corpus


@pytest.fixture(scope="module", autouse=True)
def _init():
    B.init()


def test_bitflips_all_detected(rng):
    data = make_corpus(rng, 200000, "text")
    block = B.compress(data)
    flips = rng.integers(0, len(block) * 8, size=200)
    for f in np.unique(flips):
        corrupted = bytearray(block)
        corrupted[f // 8] ^= 1 << (f % 8)
        try:
            out = B.decompress(bytes(corrupted))
        except B.BscError:
            continue  # clean rejection
        except (ValueError, OverflowError, IndexError):
            pytest.fail(f"unclean error for bit flip {f}")
        assert out == data, f"silent corruption at bit {f}"


@pytest.mark.parametrize("kwargs", [
    {"block_sorter": C.BLOCKSORTER_ST5},
    {"block_sorter": C.BLOCKSORTER_BWT_WIDEAUX},
    {"coder": C.CODER_QLFC_WIDE},
], ids=["st5", "wideaux", "widecoder"])
def test_bitflips_detected_extension_formats(rng, kwargs):
    """The format extensions (wide-aux sorter, wide coder) inherit the
    reference's in-format verification contract: every flip is either
    corrected at the adler/mode gate or rejected cleanly by the stage
    decoders' bounds checks — never a crash, never silent corruption."""
    data = make_corpus(rng, 150000, "text")
    block = B.compress(data, **kwargs)
    flips = rng.integers(0, len(block) * 8, size=80)
    for f in np.unique(flips):
        corrupted = bytearray(block)
        corrupted[f // 8] ^= 1 << (f % 8)
        try:
            out = B.decompress(bytes(corrupted))
        except B.BscError:
            continue
        except (ValueError, OverflowError, IndexError, struct.error):
            pytest.fail(f"unclean error for bit flip {f} ({kwargs})")
        assert out == data, f"silent corruption at bit {f} ({kwargs})"
    # truncation, including mid-aux-tail cuts for the wide-aux profile
    for cut in [27, 28, len(block) // 2, len(block) - 2, len(block) - 1]:
        with pytest.raises(B.BscError):
            B.decompress(bytes(block[:cut]))


def test_truncation_detected(rng):
    data = make_corpus(rng, 100000, "text")
    block = B.compress(data)
    for cut in [1, 7, 27, 28, 29, len(block) // 2, len(block) - 1]:
        with pytest.raises(B.BscError):
            B.decompress(bytes(block[:cut]))


def test_mode_word_validation(rng):
    data = make_corpus(rng, 100000, "text")
    block = bytearray(B.compress(data))
    # corrupt the mode word (bytes 8..12 of the header) with sign extension
    block[8:12] = (0xFFFFFFFF).to_bytes(4, "little")
    with pytest.raises(B.BscError):
        B.decompress(bytes(block))


def test_random_garbage_rejected(rng):
    for n in [0, 1, 27, 28, 100, 5000]:
        garbage = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        with pytest.raises(B.BscError):
            B.decompress(garbage)
