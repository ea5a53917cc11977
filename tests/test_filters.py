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


# ---------------------------------------------------------------------------
# Oracle parity: the detectors must make the SAME DECISIONS as the reference
# (bsc_detect_segments / _contextsorder / _recordsize) across diverse corpora.
# ---------------------------------------------------------------------------

def _parity_corpora(rng):
    """>= 20 corpora exercising all three detectors' decision space."""
    from tests.conftest import make_corpus

    out = []
    for kind in ("text", "random", "runs", "zeros", "periodic"):
        out.append(make_corpus(rng, 200_000, kind))
        out.append(make_corpus(rng, 50_001, kind))
    # heterogeneous mixes (segmentation boundaries)
    out.append(make_corpus(rng, 120_000, "text") + make_corpus(rng, 130_000, "random"))
    out.append(make_corpus(rng, 60_000, "zeros") + make_corpus(rng, 90_000, "text")
               + make_corpus(rng, 70_000, "runs"))
    out.append(make_corpus(rng, 30_000, "random") + make_corpus(rng, 200_000, "zeros"))
    # record-structured data (record sizes 2..4)
    for rs in (2, 3, 4):
        n = 150_000 - (150_000 % rs)
        rec = np.zeros(n, dtype=np.uint8)
        for k in range(rs):
            base = rng.integers(0, 200)
            rec[k::rs] = (base + rng.integers(0, 3, size=n // rs)).astype(np.uint8)
        out.append(rec.tobytes())
    # reversed text (preceding contexts should win sometimes)
    out.append(make_corpus(rng, 180_000, "text")[::-1])
    out.append((make_corpus(rng, 90_000, "text")[::-1]) * 2)
    # structured binary: ascending u32 counters (record-size 4 material)
    out.append(np.arange(40_000, dtype=">u4").tobytes())
    out.append(np.arange(40_000, dtype="<u4").tobytes())
    return out


def test_detectors_match_reference_decisions(rng, oracle):
    import ctypes

    corpora = _parity_corpora(rng)
    assert len(corpora) >= 20
    segbuf = (ctypes.c_int * 256)()
    for i, blob in enumerate(corpora):
        arr = np.frombuffer(blob, dtype=np.uint8)
        n = len(blob)

        nseg = oracle.o_detect_segments(blob, n, segbuf, 256, 0)
        assert nseg > 0
        ref_segs = list(segbuf[:nseg])
        assert detectors.detect_segments(arr) == ref_segs, f"segments differ on corpus {i}"

        ref_ctx = oracle.o_detect_contextsorder(blob, n, 0)
        assert detectors.detect_contextsorder(arr) == ref_ctx, f"contexts differ on corpus {i}"

        ref_rs = oracle.o_detect_recordsize(blob, n, 0)
        assert detectors.detect_recordsize(arr) == ref_rs, f"recordsize differs on corpus {i}"
