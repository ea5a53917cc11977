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


@pytest.mark.parametrize("rans", [False, True])
@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "periodic"])
@pytest.mark.parametrize("n", [1, 255, 4096, 70001])
def test_wide_reference_codec_roundtrip(rng, kind, n, rans):
    d = make_corpus(rng, n, kind)
    p = wide.wide_encode_ref(d, n_lanes=8 if n > 256 else 2, rans=rans)
    if p is None:
        return  # incompressible at this size
    assert wide.wide_decode_ref(p) == d


@pytest.mark.parametrize("kind", ["text", "runs", "periodic"])
def test_wide_v3_native_reference_parity(rng, kind):
    """The native v3 (rANS) encoder must produce the reference encoder's
    exact bytes, and each implementation must decode the other's payload."""
    from libbsc_tpu import engine

    api.init()
    if engine._lib() is None:
        pytest.skip("native runtime unavailable")
    d = make_corpus(rng, 150_000, kind)
    for L in (8, 128):
        ref = wide.wide_encode_ref(d, n_lanes=L, rans=True)
        nat = wide.wide_encode(d, n_lanes=L, balanced=False, rans=True)
        assert ref == nat
        if ref is None:
            continue
        assert wide.wide_decode(ref) == d       # native decoder
        assert wide.wide_decode_ref(nat) == d   # reference decoder
        # balanced lane table variant round-trips too
        bal = wide.wide_encode(d, n_lanes=L, balanced=True, rans=True)
        if bal is not None:
            assert wide.wide_decode(bal) == d
            assert wide.wide_decode_ref(bal) == d


def test_wide_v3_beats_v2(rng):
    """v3 (rANS) removes the v2 coder's clamp loss and flush units: on BWT
    input it must be strictly smaller at every lane count."""
    from libbsc_tpu import engine

    api.init()
    data = np.frombuffer(make_corpus(rng, 1 << 20, "text"), np.uint8).copy()
    engine.bwt_encode(data, 0)
    for L in (32, 128):
        p2 = wide.wide_encode(data.tobytes(), n_lanes=L, rans=False)
        p3 = wide.wide_encode(data.tobytes(), n_lanes=L, rans=True)
        assert len(p3) < len(p2)


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
    within the documented envelope.  v3 (rANS) on BWT text: < 5% at 32
    lanes, < 11% at 128 lanes of a 1 MB block (the cost is per-lane model
    warm-up, so it scales with lanes/bytes; the production bound at bench
    scale is the 16 MB test below).  The v2 coder's envelope was 15%."""
    from libbsc_tpu import engine

    api.init()
    data = np.frombuffer(make_corpus(rng, 1 << 20, "text"), np.uint8).copy()
    engine.bwt_encode(data, 0)
    static = engine.coder_compress(data, C.CODER_QLFC_STATIC, 0)
    p32 = wide.wide_encode(data.tobytes(), n_lanes=32, rans=True)
    p128 = wide.wide_encode(data.tobytes(), n_lanes=128, rans=True)
    assert p32 is not None and p128 is not None
    assert len(p32) < 1.05 * len(static)
    assert len(p128) < 1.11 * len(static)


def test_wide_ratio_cost_bench_scale(rng):
    """At production block size (16 MB of bench-style text, 128 KB/lane)
    the v3 wide profile must stay under 10% over QLFC-static — the ratio
    operating point at 128 lanes (the 1024-lane kernel point trades ~2%
    more for 8x lane parallelism; see docs/WIDE_PROFILE.md).  The corpus
    mirrors bench.make_corpus: zipf word mix + hex-token sprinkle."""
    from libbsc_tpu import engine

    api.init()
    if engine._lib() is None:
        pytest.skip("native runtime unavailable (too slow in pure python)")
    g = np.random.default_rng(0xB5C ^ 2)
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    vocab = []
    for _ in range(4096):
        ln = int(g.integers(2, 13))
        vocab.append(bytes(alphabet[g.integers(0, 26, ln)]) + b" ")
    n = 16 << 20
    ranks = g.zipf(1.3, size=n // 4) % 4096
    toks = [vocab[int(r)] for r in ranks]
    hx = g.integers(0, 256, size=(len(toks) // 37 + 1, 8), dtype=np.uint8)
    for j, i in enumerate(range(13, len(toks), 37)):
        toks[i] = hx[j].tobytes().hex().encode() + b" "
    data = np.frombuffer(b"".join(toks)[:n], np.uint8).copy()

    engine.bwt_encode(data, 0)
    static = engine.coder_compress(data, C.CODER_QLFC_STATIC, 0)
    p = wide.wide_encode(data.tobytes(), n_lanes=128, rans=True)
    assert p is not None
    assert len(p) < 1.10 * len(static)
    assert wide.wide_decode(p) == data.tobytes()

    # 1024 lanes (the kernel's full-parallelism point): the round-3
    # exhaustive model search bounds the v3 floor at ~1.13x — per-lane
    # warm-up for 1024 cold models (docs/WIDE_PROFILE.md); pin it so the
    # wave warm-start (round-5 design) shows up as an improvement here.
    p1024 = wide.wide_encode(data.tobytes(), n_lanes=1024, rans=True)
    assert p1024 is not None
    assert len(p1024) < 1.13 * len(static)


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
    ref = wide.wide_encode(d, n_lanes=1024, rans=wide_kernels.RANS)
    assert dev == ref
    assert wide.wide_decode(dev) == d


def test_wide_decode_prep_prologue_matches_host(rng):
    """The on-device stream segmentation (_prep_call) must equal the host
    formulation it replaced: padded per-group planes, warm-up words for
    live lanes only, group offsets past the warm pairs.  Pure jnp on the
    CPU backend — cheap, unlike the kernel interpret tests."""
    from libbsc_tpu.ops.wide_kernels import GROUPS, _prep_call

    g = np.random.default_rng(7)
    lane_sz = g.integers(0, 50, size=(GROUPS, 128)).astype(np.int32)
    lane_sz[2, :] = 0   # empty group
    lane_sz[5, ::3] = 0  # dead lanes inside a live group
    live_n = (lane_sz > 0).sum(axis=1).astype(np.int32)
    # format invariant: each group stream opens with 2 warm units per live
    # lane; give each group some extra payload units beyond that
    gunits = (2 * live_n + g.integers(0, 80, size=GROUPS)).astype(np.int32)
    gunits[2] = 0
    total = int(gunits.sum())
    units = g.integers(0, 1 << 16, size=total).astype(np.uint16)

    SROWS = 16
    UT = 1 << 12
    upad = np.zeros(UT, dtype=np.uint16)
    upad[:total] = units
    warm_d, goff_d, stream_d = _prep_call(UT, SROWS, True)(
        upad, gunits, lane_sz)

    goffs = np.cumsum(gunits) - gunits
    for gi in range(GROUPS):
        st = units[goffs[gi]: goffs[gi] + gunits[gi]]
        exp = np.zeros(SROWS * 128, dtype=np.int32)
        exp[: len(st)] = st
        assert np.array_equal(np.asarray(stream_d[gi]).reshape(-1), exp)
        lg = lane_sz[gi] > 0
        pos = 2 * (np.cumsum(lg) - lg)
        warm = np.zeros(128, dtype=np.uint32)
        if lg.any():
            w0 = st[pos[lg]].astype(np.uint32)
            w1 = st[pos[lg] + 1].astype(np.uint32)
            warm[lg] = (w0 << 16) | w1
        assert np.array_equal(np.asarray(warm_d[gi]), warm)
        assert np.all(np.asarray(goff_d[gi]) == 2 * int(lg.sum()))


def test_wide_device_decode_parity_interpret(rng):
    """The Pallas lockstep DECODER (interpret mode) must reproduce the
    input bytes from a native-encoded payload.  n leaves 24 dead lanes
    (lane_sizes gives 1000 live), so the on-device stream segmentation's
    warm-word and plane masking for empty lanes is exercised too."""
    from libbsc_tpu.ops import wide_kernels

    n = 1024 * 36 + 123
    out = bytearray()
    while len(out) < n:
        out += bytes([rng.integers(0, 4)]) * int(rng.integers(1, 10))
    d = bytes(out[:n])
    p = wide.wide_encode(d, n_lanes=1024, rans=wide_kernels.RANS)
    back = wide_kernels.device_decode(p, interpret=True)
    assert back == d


def test_wide_device_decode_many_pipeline(monkeypatch):
    """device_decode_many orchestration: results land at their payload's
    index, non-kernel-decodable payloads pass through as None, at most two
    submissions are in flight, and every submission is finished exactly
    once (the kernels themselves are covered by the parity test above)."""
    from libbsc_tpu.ops import wide_kernels

    inflight = []
    finished = []

    def fake_parse(payload):
        return None if payload is None else {"tag": payload}

    def fake_submit(parsed, interpret):
        inflight.append(parsed["tag"])
        assert len(inflight) <= 2
        return {"tag": parsed["tag"]}

    def fake_expand(st, interpret):
        inflight.remove(st["tag"])
        finished.append(st["tag"])
        out = np.frombuffer(b"out-%d" % st["tag"], dtype=np.uint8)
        return out, out.size

    monkeypatch.setattr(wide_kernels, "_dec_parse", fake_parse)
    monkeypatch.setattr(wide_kernels, "_dec_submit", fake_submit)
    monkeypatch.setattr(wide_kernels, "_dec_expand", fake_expand)

    outs = wide_kernels.device_decode_many([0, None, 1, 2, None, 3])
    assert outs == [b"out-0", None, b"out-1", b"out-2", None, b"out-3"]
    assert finished == [0, 1, 2, 3]  # in submission order
    assert not inflight


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


@pytest.mark.parametrize("kind,n,lanes", [
    ("text", 65536, 16), ("random", 65536, 16), ("runs", 65536, 16),
    ("text", 300_000, 64), ("periodic", 2048, 16)])
def test_wide_device_schedule_v2_parity(rng, kind, n, lanes):
    """The event-indexed schedule builder (device_schedule_v2: flat RLE
    compaction + [L, E] event grid + scatter/cummax-fill expansion) must
    reproduce the native walker's packed planes bit for bit — with both
    the native balanced lane table and the device balancer's own table."""
    from libbsc_tpu import engine
    from libbsc_tpu.native import _i32p, _u8p
    from libbsc_tpu.ops.wide_schedule import (device_balanced_sizes,
                                              device_schedule_v2)

    api.init()
    lib = engine._lib()
    if lib is None:
        pytest.skip("native runtime unavailable")
    data = np.frombuffer(make_corpus(rng, n, kind), np.uint8).copy()
    sizes = np.zeros(lanes, np.int32)
    if lib.tbsc_wide_balanced_sizes(_u8p(data), n, lanes, _i32p(sizes)) != 0:
        sizes = np.asarray(wide.lane_sizes(n, lanes), np.int32)
    import jax.numpy as jnp

    dev_sizes = np.asarray(device_balanced_sizes(jnp.asarray(data), lanes))
    assert dev_sizes.sum() == n and (dev_sizes >= 0).all()
    for sz in (sizes, dev_sizes.astype(np.int32)):
        cap4 = -(-(17 * int(max(sz.max(), 1)) + 64) // 4)
        pk = np.zeros((lanes, cap4), np.uint8)
        mb = lib.tbsc_wide_schedule_packed(_u8p(data), n, lanes, cap4,
                                           _u8p(pk), _i32p(sz))
        assert mb >= 0
        packed_d, mb_d = device_schedule_v2(data, sz, lanes)
        assert packed_d is not None and mb_d == mb
        pd = np.asarray(packed_d)
        m = min(pd.shape[1], pk.shape[1])
        assert np.array_equal(pd[:, :m], pk[:, :m])
        assert not pd[:, m:].any() and not pk[:, m:].any()


def test_bwt_encode_wideaux_device_parity(rng):
    """The device rate-variant BWT (the sort stage of the fused resident
    pipeline) must match native tbsc_bwt_encode_rate: same U, primary and
    aux table at the wideaux sampling rate."""
    from libbsc_tpu import engine

    api.init()
    if engine._lib() is None:
        pytest.skip("native runtime unavailable")
    import jax.numpy as jnp

    from libbsc_tpu.ops import bwt as opsbwt

    data = np.frombuffer(make_corpus(rng, 200_000, "text"), np.uint8).copy()
    r = engine.wideaux_rate(len(data))
    ref = data.copy()
    idx_ref, k_ref, aux_ref, r_ref = engine.bwt_encode_wideaux(ref, 0)
    assert r_ref == r
    U, primary, aux = opsbwt.bwt_encode_wideaux_device(jnp.asarray(data), r)
    assert int(primary) == idx_ref
    assert np.array_equal(np.asarray(U), ref)
    assert np.array_equal(np.asarray(aux, np.int32), aux_ref[:k_ref])


def test_wide_device_encode_resident_interpret(rng):
    """The device-RESIDENT wide encode (device balancer + event-indexed
    schedule + Pallas kernels, interpret mode) must produce a payload the
    native decoder round-trips."""
    from libbsc_tpu import engine
    from libbsc_tpu.ops import wide_kernels

    api.init()
    if engine._lib() is None:
        pytest.skip("native runtime unavailable")
    import jax.numpy as jnp

    data = np.frombuffer(make_corpus(rng, 40_000, "text"), np.uint8).copy()
    engine.bwt_encode(data, 0)  # wide input is post-BWT in the pipeline
    payload = wide_kernels.device_encode_resident(
        jnp.asarray(data), interpret=True)
    assert payload is not None
    assert wide.wide_decode(payload) == data.tobytes()
    assert wide.wide_decode_ref(payload) == data.tobytes()


def test_wide_device_decode_resident_interpret(rng):
    """Composed decode: the wide decode kernel's output block stays a
    device array and feeds the wideaux inverse-BWT chase directly; the
    result must equal the original bytes."""
    from libbsc_tpu import engine
    from libbsc_tpu.ops import bwt as opsbwt
    from libbsc_tpu.ops import wide_kernels

    api.init()
    if engine._lib() is None:
        pytest.skip("native runtime unavailable")
    import jax.numpy as jnp

    orig = np.frombuffer(make_corpus(rng, 40_000, "text"), np.uint8).copy()
    data = orig.copy()
    idx, k, aux, r = engine.bwt_encode_wideaux(data, 0)
    assert idx >= 0
    payload = wide.wide_encode(data.tobytes(), n_lanes=wide_kernels.LANES)
    assert payload is not None
    U_dev = wide_kernels.device_decode_resident(payload, interpret=True)
    assert U_dev is not None
    assert np.array_equal(np.asarray(U_dev), data)
    out = opsbwt._unbwt_wideaux_jit(
        U_dev, jnp.int32(idx), jnp.asarray(aux[:k], np.int32), r, len(orig))
    assert np.array_equal(np.asarray(out), orig)


def test_wide_lane_policy_env(rng, monkeypatch):
    """TBSC_WIDE_LANES selects the wide operating point: 128 = ratio point
    (native codec), default = pick_lanes; invalid values fall back; the
    archive round-trips at every point."""
    data = make_corpus(rng, 300_000, "text")
    monkeypatch.setenv("TBSC_WIDE_LANES", "128")
    assert wide.pick_lanes_policy(len(data)) == 128
    blob = api.compress(data, coder=C.CODER_QLFC_WIDE)
    assert api.decompress(blob) == data
    monkeypatch.setenv("TBSC_WIDE_LANES", "notanint")
    assert wide.pick_lanes_policy(1 << 24) == wide.pick_lanes(1 << 24)
    monkeypatch.setenv("TBSC_WIDE_LANES", "96")  # clamp to pow2
    assert wide.pick_lanes_policy(1 << 24) == 64


def test_wide_device_balancer_overflow_regression(rng):
    """k*R overflows int32 at ~4M runs x 1024 lanes; the quantile targets
    must stay exact (regression: every split point collapsed to 0 on the
    16 MB bench block, inflating the event grid 1000x)."""
    import jax.numpy as jnp

    from libbsc_tpu.ops.wide_schedule import device_balanced_sizes

    n = 9 * 1024 * 1024
    data = rng.integers(0, 2, n, dtype=np.uint8)  # ~n/2 runs
    ds = np.asarray(device_balanced_sizes(jnp.asarray(data), 1024))
    assert ds.sum() == n and (ds >= 0).all()
    nr = np.ones(n, bool)
    nr[1:] = data[1:] != data[:-1]
    R = int(nr.sum())
    starts = np.cumsum(ds) - ds
    cum = np.cumsum(nr)
    frid = cum[np.minimum(starts, n - 1)] - 1
    frid[starts >= n] = R
    counts = np.diff(np.append(frid, R))
    assert counts.max() <= R // 1024 + 2
