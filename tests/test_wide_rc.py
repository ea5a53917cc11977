"""Wide-lane range coder vs the serial Python reference implementation."""

import numpy as np
import pytest

from libbsc_tpu.fallback.qlfc import RcDecoder, RcEncoder
from libbsc_tpu.ops import wide_rc


def _ref_encode(seq):
    rc = RcEncoder(1 << 20)
    for b, p, prec in seq:
        rc.encode(b, p, prec)
    return rc.finish()


def _random_lanes(rng, n_lanes, max_len):
    lanes = []
    for _ in range(n_lanes):
        m = int(rng.integers(1, max_len))
        seq = []
        for _ in range(m):
            prec = int(rng.choice([11, 12, 13]))
            p = int(rng.integers(1, (1 << prec) - 1))
            seq.append((int(rng.integers(0, 2)), p, prec))
        lanes.append(seq)
    return lanes


@pytest.mark.parametrize("n_lanes,max_len", [(1, 50), (4, 200), (16, 400)])
def test_wide_encode_matches_serial(rng, n_lanes, max_len):
    lanes = _random_lanes(rng, n_lanes, max_len)
    streams = wide_rc.encode(lanes)
    for lane, stream in zip(lanes, streams):
        assert stream == _ref_encode(lane)


def test_wide_decode_roundtrip(rng):
    lanes = _random_lanes(rng, 8, 300)
    streams = wide_rc.encode(lanes)
    probs = [[(p, prec) for (_, p, prec) in seq] for seq in lanes]
    bits = wide_rc.decode(probs, streams)
    for seq, got in zip(lanes, bits):
        assert got == [b for (b, _, _) in seq]


def test_wide_decode_serial_streams(rng):
    """Streams produced by the serial encoder decode on the wide decoder."""
    lanes = _random_lanes(rng, 4, 150)
    streams = [_ref_encode(seq) for seq in lanes]
    probs = [[(p, prec) for (_, p, prec) in seq] for seq in lanes]
    bits = wide_rc.decode(probs, streams)
    for seq, got in zip(lanes, bits):
        assert got == [b for (b, _, _) in seq]


def test_skewed_probabilities_carry_paths(rng):
    """Extreme probabilities exercise carry propagation and pending runs."""
    lanes = []
    for skew in (1, 4094, 2048):
        seq = [(1, skew, 12)] * 600 + [(0, skew, 12)] * 600
        lanes.append(seq)
    streams = wide_rc.encode(lanes)
    for lane, stream in zip(lanes, streams):
        assert stream == _ref_encode(lane)
    probs = [[(p, prec) for (_, p, prec) in seq] for seq in lanes]
    bits = wide_rc.decode(probs, streams)
    for seq, got in zip(lanes, bits):
        assert got == [b for (b, _, _) in seq]
