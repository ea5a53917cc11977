"""CODER_QLFC_WIDE: the wide-lane entropy profile (ops/wide.py).

Format-extension tests: reference-codec round-trips across corpora, API
integration (mode word, BWT aux tail), and rejection by OLD decoders — both
this library pre-extension semantics and the reference bsc binary must
refuse coder id 4 via mode validation.
"""

import numpy as np
import pytest

from libbsc_tpu import api, constants as C
from libbsc_tpu.ops import wide
from tests.conftest import make_corpus


@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "periodic"])
@pytest.mark.parametrize("n", [1, 255, 4096, 70001])
def test_wide_reference_codec_roundtrip(rng, kind, n):
    d = make_corpus(rng, n, kind)
    p = wide.wide_encode_ref(d, n_lanes=8 if n > 256 else 2)
    if p is None:
        return  # incompressible at this size
    assert wide.wide_decode_ref(p) == d


def test_wide_random_incompressible(rng):
    d = make_corpus(rng, 50000, "random")
    assert wide.wide_encode_ref(d, n_lanes=8) is None


@pytest.mark.parametrize("kind,n,lanes", [
    ("text", 65536, 16), ("random", 65536, 16), ("runs", 65536, 16),
    ("text", 300_000, 64), ("periodic", 2048, 16)])
def test_wide_device_schedule_parity(rng, kind, n, lanes):
    """The on-device schedule builder (ops/wide_schedule.py — vectorized
    MTF ranks + closed-form bit expansion) must reproduce the native
    walker's packed iteration planes bit for bit, balanced lane table
    included."""
    from libbsc_tpu import engine
    from libbsc_tpu.native import _i32p, _u8p
    from libbsc_tpu.ops.wide_schedule import device_schedule

    api.init()
    lib = engine._lib()
    if lib is None:
        pytest.skip("native runtime unavailable")
    data = np.frombuffer(make_corpus(rng, n, kind), np.uint8).copy()
    sizes = np.zeros(lanes, np.int32)
    if lib.tbsc_wide_balanced_sizes(_u8p(data), n, lanes, _i32p(sizes)) != 0:
        sizes = np.asarray(wide.lane_sizes(n, lanes), np.int32)
    cap4 = -(-(17 * int(sizes.max()) + 64) // 4)
    pk = np.zeros((lanes, cap4), np.uint8)
    mb = lib.tbsc_wide_schedule_packed(_u8p(data), n, lanes, cap4, _u8p(pk),
                                       _i32p(sizes))
    assert mb >= 0
    packed_d, mb_d = device_schedule(data, sizes, lanes)
    assert mb_d == mb
    pd = np.asarray(packed_d)
    m = min(pd.shape[1], pk.shape[1])
    assert np.array_equal(pd[:, :m], pk[:, :m])
    assert not pd[:, m:].any() and not pk[:, m:].any()


def test_wide_lane_count_policy():
    assert wide.pick_lanes(1 << 24) == wide.DEFAULT_LANES
    assert wide.pick_lanes(8192) <= 2
    # run-length exponent cap respected for huge blocks
    assert -(-(1 << 30) // wide.pick_lanes(1 << 30)) < (1 << wide.RUN_EXP_CAP)


def test_wide_api_roundtrip(rng):
    data = make_corpus(rng, 300_000, "text")
    blob = api.compress(data, coder=C.CODER_QLFC_WIDE)
    h = api.block_info(blob[:C.HEADER_SIZE])
    assert api.decompress(blob) == data


def test_wide_api_with_st_sorter(rng):
    data = make_corpus(rng, 200_000, "text")
    blob = api.compress(data, block_sorter=C.BLOCKSORTER_ST5,
                        coder=C.CODER_QLFC_WIDE)
    assert api.decompress(blob) == data


def test_wide_mode_rejected_by_reference_binary(tmp_path, rng):
    """Old decoders must reject coder id 4 cleanly (mode validation,
    libbsc.cpp:362-402)."""
    import subprocess

    from tests.oracle import bsc_binary

    bsc = bsc_binary()
    if bsc is None:
        pytest.skip("reference binary unavailable")
    data = make_corpus(rng, 300_000, "text")
    blob = api.compress(data, coder=C.CODER_QLFC_WIDE)

    import struct

    arch = tmp_path / "wide.bsc"
    with open(arch, "wb") as f:
        f.write(b"bsc1")
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<qbb", 0, 1, C.CONTEXTS_FOLLOWING))
        f.write(blob)
    r = subprocess.run([bsc, "d", str(arch), str(tmp_path / "out")],
                       capture_output=True)
    assert r.returncode != 0


def test_wide_ratio_cost_documented_bound(rng):
    """The wide profile trades ratio for lockstep throughput; keep the cost
    within the documented envelope (model v2: < 15% over QLFC-static on BWT
    input at 128 lanes; the pre-v2 model was bounded at 25%)."""
    from libbsc_tpu import engine

    api.init()
    data = np.frombuffer(make_corpus(rng, 1 << 20, "text"), np.uint8).copy()
    engine.bwt_encode(data, 0)
    static = engine.coder_compress(data, C.CODER_QLFC_STATIC, 0)
    p = wide.wide_encode_ref(data.tobytes(), n_lanes=128)
    assert p is not None
    assert len(p) < 1.15 * len(static)


def test_wide_device_kernel_parity_interpret(rng):
    """The Pallas lockstep coder (interpret mode) must produce the exact
    payload bytes of the native codec, balanced lane table included."""
    from libbsc_tpu.ops import wide_kernels

    n = 1024 * 40
    out = bytearray()
    while len(out) < n:
        out += bytes([rng.integers(0, 4)]) * int(rng.integers(1, 10))
    d = bytes(out[:n])
    dev = wide_kernels.device_encode(d, interpret=True)
    ref = wide.wide_encode(d, n_lanes=1024)
    assert dev == ref
    assert wide.wide_decode(dev) == d


def test_wide_device_decode_parity_interpret(rng):
    """The Pallas lockstep DECODER (interpret mode) must reproduce the
    input bytes from a native-encoded payload."""
    from libbsc_tpu.ops import wide_kernels

    n = 1024 * 36 + 123
    out = bytearray()
    while len(out) < n:
        out += bytes([rng.integers(0, 4)]) * int(rng.integers(1, 10))
    d = bytes(out[:n])
    p = wide.wide_encode(d, n_lanes=1024)
    back = wide_kernels.device_decode(p, interpret=True)
    assert back == d


def test_wide_decode_under_numpy_fallback_engine(rng, monkeypatch):
    """Wide archives must decode when the native build is unavailable: the
    numpy fallback stages write in-place, so the decoded buffer handed to
    them must be writable (regression: read-only np.frombuffer view)."""
    from libbsc_tpu import engine

    data = make_corpus(rng, 60_000, "text")
    blob = api.compress(data, coder=C.CODER_QLFC_WIDE)
    monkeypatch.setattr(engine, "_native", None)
    monkeypatch.setattr(engine, "_force", "numpy")
    assert api.decompress(blob) == data


def test_wide_corrupt_stream_raises_not_crashes(rng):
    """Bit flips in a wide block must surface as DATA_CORRUPT via the API's
    adler check (or a decode error), never crash or overrun."""
    data = make_corpus(rng, 200_000, "runs")
    blob = bytearray(api.compress(data, coder=C.CODER_QLFC_WIDE))
    hits = 0
    for trial in range(40):
        b = bytearray(blob)
        pos = int(rng.integers(C.HEADER_SIZE, len(b)))
        b[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = api.decompress(bytes(b))
            assert out == data  # only if the flip didn't matter
        except (api.BscError, RuntimeError):
            hits += 1
    assert hits > 0
