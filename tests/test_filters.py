"""Filters: preprocessing transforms invert; detectors behave sanely and
match the reference's decisions on structured inputs."""

import numpy as np
import pytest

from libbsc_tpu import constants as C
from libbsc_tpu.filters import detectors, preprocessing
from tests.conftest import make_corpus


@pytest.mark.parametrize("rs", [2, 3, 4, 7])
def test_reorder_roundtrip(rng, rs):
    for n in [rs * 10 + 3, 100000]:
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        arr = data.copy()
        preprocessing.reorder_forward(arr, rs)
        preprocessing.reorder_reverse(arr, rs)
        assert np.array_equal(arr, data)


def test_reverse_roundtrip(rng):
    data = rng.integers(0, 256, size=999, dtype=np.uint8)
    arr = data.copy()
    preprocessing.reverse_block(arr)
    preprocessing.reverse_block(arr)
    assert np.array_equal(arr, data)


def test_detect_recordsize_finds_interleaving(rng):
    # 4 interleaved byte streams with very different statistics
    n = 400000
    streams = [
        np.full(n // 4, 65, dtype=np.uint8),
        rng.integers(0, 4, size=n // 4, dtype=np.uint8),
        np.arange(n // 4, dtype=np.int64).astype(np.uint8),
        np.full(n // 4, 200, dtype=np.uint8),
    ]
    data = np.stack(streams, axis=1).reshape(-1)
    assert detectors.detect_recordsize(data) == 4


def test_detect_recordsize_plain_text(rng):
    data = np.frombuffer(make_corpus(rng, 300000, "text"), dtype=np.uint8)
    assert detectors.detect_recordsize(data) == 1


def test_detect_segments_heterogeneous(rng):
    a = np.frombuffer(make_corpus(rng, 200000, "text"), dtype=np.uint8)
    b = rng.integers(0, 256, size=200000, dtype=np.uint8)
    data = np.concatenate([a, b])
    segs = detectors.detect_segments(data)
    assert sum(segs) == len(data)
    assert len(segs) >= 2
    # split point should be near the boundary
    assert abs(segs[0] - 200000) < 20000


def test_detect_segments_homogeneous(rng):
    data = np.frombuffer(make_corpus(rng, 200000, "text"), dtype=np.uint8)
    segs = detectors.detect_segments(data)
    assert segs == [len(data)]


def test_detect_contextsorder_returns_valid(rng):
    data = np.frombuffer(make_corpus(rng, 100000, "text"), dtype=np.uint8)
    assert detectors.detect_contextsorder(data) in (
        C.CONTEXTS_FOLLOWING,
        C.CONTEXTS_PRECEDING,
    )
