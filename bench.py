#!/usr/bin/env python
"""End-to-end benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, "detail": {...}}

Headline: DEFAULT-config (-b25, LZP + BWT + QLFC-static) encode throughput on
a deterministic 64 MB text-like corpus — the reference CLI's own headline
`encoded X => Y (MB/s)` metric (bsc.cpp:427) at the reference's own default
settings, so encode/decode/size are all directly comparable.

Baseline: the reference bsc binary measured LIVE on the same corpus in the
same machine-moment when a build is available (/tmp/refbuild/bsc or
$TBSC_REF_BSC; round-1 left one in /tmp), because this 1-vCPU box swings
+-10% with neighbor load; otherwise the clean-machine pin from BASELINE.md
(14.13 MB/s encode / 23.10 decode / 9,836,502 bytes, 2026-08-16).

detail additionally carries the accelerated operating point (TPU ST8 farm:
device sort + host LZP/QLFC with a heterogeneous work-stealing queue) when
a device is present.
"""

import json
import os

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PIN_ENC = float(os.environ.get("TBSC_BASELINE_MBS", "14.13"))
PIN_DEC = 23.10
PIN_BYTES = 9836502
CORPUS_MB = int(os.environ.get("TBSC_BENCH_MB", "64"))
DEFAULT_BLOCK = 25 * 1024 * 1024
# 8 MB blocks balance the device/native farm workers best on one chip + one
# core (measured r1: 16.3 MB/s vs 10.9 at 16 MB); costs ~2% size vs BWT.
# 64 KiB under 8 MiB: keeps every farm block under 2^23 so the inverse-ST
# dense-tie layout applies (st.cc), at ~equal ratio.
FARM_BLOCK = int(os.environ.get("TBSC_BENCH_BLOCK_MB", "8")) * 1024 * 1024 \
    - (1 << 16)


def make_corpus(n_bytes: int) -> bytes:
    """Deterministic text-like corpus (seeded Zipf word mix + hex tokens)."""
    rng = np.random.default_rng(0xB5C)
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    vocab = []
    for _ in range(4096):
        ln = int(rng.integers(2, 13))
        vocab.append(bytes(alphabet[rng.integers(0, 26, ln)]))
    ranks = rng.zipf(1.3, size=n_bytes // 4) % 4096
    out = bytearray()
    col = 0
    for i, r in enumerate(ranks):
        if len(out) >= n_bytes:
            break
        if i % 37 == 13:  # sprinkle low-compressibility tokens
            tok = bytes(rng.integers(0, 256, 8, dtype=np.uint8)).hex().encode()
        else:
            tok = vocab[int(r)]
        out += tok
        col += len(tok) + 1
        if col > 72:
            out += b"\n"
            col = 0
        else:
            out += b" "
    return bytes(out[:n_bytes])


def _load_oracle():
    """The reference library built as a .so (tests/oracle.py); in-memory
    calls make the baseline directly comparable to our API-level timing."""
    try:
        from tests.oracle import load_oracle

        return load_oracle()
    except Exception:
        return None


def measure_default_vs_reference(data: bytes):
    """Default config, native pipeline, 25 MB blocks, single core — measured
    INTERLEAVED with the live reference library (in-memory oracle calls, same
    block loop) so machine drift hits both sides equally.  Returns
    (ours, ref); ref is None when the oracle is unavailable."""
    import ctypes

    import libbsc_tpu as B

    n = len(data)
    blocks = [data[i:i + DEFAULT_BLOCK] for i in range(0, n, DEFAULT_BLOCK)]
    B.compress(blocks[0][: 1 << 20])  # warm model tables

    lib = _load_oracle()
    if lib is not None:
        lib.o_init(0)
        outbufs = [ctypes.create_string_buffer(len(b) + 4096) for b in blocks]
        decbuf = ctypes.create_string_buffer(DEFAULT_BLOCK + 4096)

    # Per-BLOCK alternation: this box has sustained multi-minute speed
    # phases, so ours-block / ref-block must alternate at ~seconds
    # granularity or a phase boundary lands between the two sides and
    # skews the ratio by 20%+.
    # Per-BLOCK minima over reps (not min of per-rep sums): a multi-minute
    # slow phase then punishes only the block timings it actually covered,
    # identically for both sides.
    nb = len(blocks)
    enc_best = [float("inf")] * nb
    ref_enc_best = [float("inf")] * nb
    enc_runs, ref_enc_runs = [], []  # per-rep sums, for the run-ratio medians
    payloads = None
    sizes = []
    for _ in range(5):
        pl, sz = [], []
        rep_ours = rep_ref = 0.0
        for bi, (blk, ob) in enumerate(
                zip(blocks, outbufs if lib is not None else blocks)):
            t0 = time.time()
            pl.append(B.compress(blk))
            dt = time.time() - t0
            rep_ours += dt
            enc_best[bi] = min(enc_best[bi], dt)
            if lib is not None:
                t0 = time.time()
                r = lib.o_compress(blk, ob, len(blk), 15, 128, 1, 1, 0)
                dt = time.time() - t0
                rep_ref += dt
                ref_enc_best[bi] = min(ref_enc_best[bi], dt)
                if r < 0:
                    lib = None
                else:
                    sz.append(r)
        enc_runs.append(rep_ours)
        ref_enc_runs.append(rep_ref)
        payloads, sizes = pl, sz
    enc_dt = sum(enc_best)
    ref_enc_dt = sum(ref_enc_best)

    dec_best = [float("inf")] * nb
    ref_dec_best = [float("inf")] * nb
    dec_runs, ref_dec_runs = [], []
    for _ in range(5):
        parts = []
        rep_ours = rep_ref = 0.0
        for bi, (blk, p) in enumerate(zip(blocks, payloads)):
            t0 = time.time()
            parts.append(B.decompress(p))
            dt = time.time() - t0
            rep_ours += dt
            dec_best[bi] = min(dec_best[bi], dt)
            if lib is not None:
                t0 = time.time()
                r = lib.o_decompress(outbufs[bi].raw[:sizes[bi]], sizes[bi],
                                     decbuf, len(blk), 0)
                dt = time.time() - t0
                rep_ref += dt
                ref_dec_best[bi] = min(ref_dec_best[bi], dt)
                if r < 0:
                    lib = None
        dec_runs.append(rep_ours)
        ref_dec_runs.append(rep_ref)
        restored = b"".join(parts)
    dec_dt = sum(dec_best)
    ref_dec_dt = sum(ref_dec_best)
    assert restored == data, "default-config round-trip mismatch"

    def _median(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    ours = {"enc_mbs": round(n / 1e6 / enc_dt, 2),
            "dec_mbs": round(n / 1e6 / dec_dt, 2),
            "bytes": sum(len(p) for p in payloads)}
    ref = None
    if lib is not None and decbuf.raw[: len(blocks[-1])] == blocks[-1]:
        ref = {"enc_mbs": round(n / 1e6 / ref_enc_dt, 2),
               "dec_mbs": round(n / 1e6 / ref_dec_dt, 2),
               "bytes": sum(sizes)}
        # 5-run interleaved A/B ratio per rep (ref time / ours time, >1 =
        # we are faster) and its median — the statistically honest headline
        # (VERDICT r4 weak #6: per-block minima hide the run-to-run band)
        ours["enc_ratio_runs"] = [round(r / o, 3)
                                  for o, r in zip(enc_runs, ref_enc_runs)]
        ours["enc_ratio_median"] = _median(ours["enc_ratio_runs"])
        ours["dec_ratio_runs"] = [round(r / o, 3)
                                  for o, r in zip(dec_runs, ref_dec_runs)]
        ours["dec_ratio_median"] = _median(ours["dec_ratio_runs"])
    return ours, ref


_dev_probe_cache = None


def device_available(timeout: float = 150.0) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard timeout: when the
    remote tunnel is half-dead, an in-process jax.devices() can hang
    forever (observed on this harness), which must never take the headline
    host numbers down with it."""
    global _dev_probe_cache
    if _dev_probe_cache is not None:
        return _dev_probe_cache
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, sys; sys.exit(0 if any(d.platform != 'cpu' "
             "for d in jax.devices()) else 1)"],
            timeout=timeout, capture_output=True)
        _dev_probe_cache = r.returncode == 0
    except Exception:
        _dev_probe_cache = False
    return _dev_probe_cache


def measure_farm(data: bytes):
    """Accelerated operating point: device ST8 + heterogeneous block farm."""
    import queue

    import libbsc_tpu as B
    from libbsc_tpu import constants as C, engine

    if not device_available():
        return None
    try:
        import jax

        if not any(d.platform != "cpu" for d in jax.devices()):
            return None
    except Exception:
        return None

    n = len(data)
    features = C.DEFAULT_FEATURES
    sorter = C.BLOCKSORTER_ST8
    blocks = [data[i:i + FARM_BLOCK] for i in range(0, n, FARM_BLOCK)]

    # Warm up each block's XLA shape bucket outside the clock (programs
    # persist to the on-disk compilation cache for later runs).
    seen = set()
    for blk in blocks:
        arr = np.frombuffer(blk, dtype=np.uint8)
        lz = engine.lzp_compress(arr.copy(), C.DEFAULT_LZPHASHSIZE,
                                 C.DEFAULT_LZPMINLEN, features)
        m = len(lz) if lz is not None else len(arr)
        if engine.device_bucket(m) not in seen:
            seen.add(engine.device_bucket(m))
            warm = lz if lz is not None else arr
            engine.st_encode(warm.copy(), 8, C.FEATURE_CUDA)

    # roofline: the ST8 OP on device-resident input (the number comparable
    # to the chip's ~200 Mkeys/s stable-sort budget, docs/TPU_SORT_NOTES.md;
    # for ST one key is one input byte), PLUS the transfer-inclusive e2e of
    # the same op over this harness's tunnel (H2D 75 / D2H 39 MB/s) —
    # round 3 reported only the latter as "roofline_frac", understating the
    # on-chip sort by the ~420 ms of tunnel time per 8 MB block.
    st_roofline = None
    try:
        import jax
        import jax.numpy as jnp

        from libbsc_tpu.ops.st import st_encode_padded

        probe = np.frombuffer(blocks[0], dtype=np.uint8).copy()
        t0 = time.time()
        engine.st_encode(probe.copy(), 8, C.FEATURE_CUDA)
        e2e_dt = time.time() - t0

        n_pad = engine.device_bucket(len(probe))
        padded = np.zeros(n_pad, dtype=np.uint8)
        padded[:len(probe)] = probe
        dj = jax.device_put(jnp.asarray(padded))
        out, idx = st_encode_padded(dj, len(probe), 8)
        _ = int(idx)  # force (axon: block_until_ready is unreliable)
        op_dt = float("inf")
        for _i in range(3):
            t0 = time.time()
            out, idx = st_encode_padded(dj, len(probe), 8)
            _ = int(idx) + int(out[0])
            op_dt = min(op_dt, time.time() - t0)
        rate = len(probe) / 1e6 / op_dt
        # 16 MB exact-shape op: the roofline-comparable number (the farm
        # shape above carries ~55 ms of fixed cost + 1.17x padding; see
        # docs/TPU_SORT_NOTES.md round-5 reconciliation)
        from libbsc_tpu.ops.st import st_encode as _st_exact

        blk16 = jax.device_put(jnp.asarray(
            np.frombuffer(data[: 16 << 20], dtype=np.uint8)))
        out, idx = _st_exact(blk16, 8)
        _ = int(idx) + int(out[0])
        op16 = float("inf")
        for _i in range(3):
            t0 = time.time()
            out, idx = _st_exact(blk16, 8)
            _ = int(idx) + int(out[0])
            op16 = min(op16, time.time() - t0)
        rate16 = (16 << 20) / 1e6 / op16
        st_roofline = {"st8_op_mbs": round(rate, 1),
                       "st8_op_16mb_mbs": round(rate16, 1),
                       "st8_op_e2e_mbs": round(len(probe) / 1e6 / e2e_dt, 1),
                       "sort_roofline_mkeys": 200,
                       "roofline_frac": round(rate16 / 200.0, 3)}
    except Exception:
        pass

    jobs: "queue.Queue" = queue.Queue()
    payloads: dict = {}

    def worker(feat: int):
        while True:
            try:
                i, blk = jobs.get_nowait()
            except queue.Empty:
                return
            # throughput operating point: the fast QLFC profile (+1% size,
            # ~+20% encode and ~+50% batched decode vs static)
            payloads[i] = B.compress(blk, block_sorter=sorter, features=feat,
                                     coder=C.CODER_QLFC_FAST)

    dev = features | C.FEATURE_CUDA
    feats = [dev, dev, dev, features] if len(blocks) > 1 else [dev]

    enc_dt = float("inf")
    for _ in range(3):
        payloads.clear()
        for i, blk in enumerate(blocks):
            jobs.put((i, blk))
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=len(feats)) as ex:
            list(ex.map(worker, feats))
        enc_dt = min(enc_dt, time.time() - t0)
    ordered = [payloads[i] for i in range(len(blocks))]

    dec_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        restored = b"".join(B.decompress_batch(ordered))
        dec_dt = min(dec_dt, time.time() - t0)
    assert restored == data, "farm round-trip mismatch"
    res = {"enc_mbs": round(n / 1e6 / enc_dt, 2),
           "dec_mbs": round(n / 1e6 / dec_dt, 2),
           "bytes": sum(len(p) for p in ordered)}
    if st_roofline:
        res.update(st_roofline)
    return res


_BENCH_T0 = 0.0


def measure_farm_bwt(data: bytes):
    """BWT farm at the reference's DEFAULT config (LZP 15/128 + BWT +
    QLFC-static): device workers sort blocks on-chip (TBSC_BWT_DEVICE route,
    shape-bucketed padded program so variable-size LZP outputs share one XLA
    program per 1.25x bucket) while the host core runs LZP + the entropy
    coder; decode is the batched host unbwt wavefront.  Output bytes are
    IDENTICAL to the reference library's at this config — the device
    accelerates the default config unchanged, the reference's own -G
    semantics (bwt/bwt.cpp:178-181) — asserted via bytes_match_ref."""
    import queue

    import libbsc_tpu as B
    from libbsc_tpu import constants as C

    if not device_available():
        return None
    try:
        import jax

        if not any(d.platform != "cpu" for d in jax.devices()):
            return None
    except Exception:
        return None

    n = len(data)
    features = C.DEFAULT_FEATURES
    blocks = [data[i:i + FARM_BLOCK] for i in range(0, n, FARM_BLOCK)]
    kw = dict(block_sorter=C.BLOCKSORTER_BWT, coder=C.CODER_QLFC_STATIC,
              lzp_hash_size=C.DEFAULT_LZPHASHSIZE,
              lzp_min_len=C.DEFAULT_LZPMINLEN)
    dev = features | C.FEATURE_CUDA

    os.environ["TBSC_BWT_DEVICE"] = "1"
    try:
        # warm every block's bucket program outside the clock (LZP output
        # sizes vary per block; the padded route compiles once per bucket)
        for blk in blocks:
            if _BENCH_T0 and time.time() - _BENCH_T0 > 2400:
                return None
            B.compress(blk, features=dev, **kw)

        jobs: "queue.Queue" = queue.Queue()
        payloads: dict = {}

        def worker(feat: int):
            while True:
                try:
                    i, blk = jobs.get_nowait()
                except queue.Empty:
                    return
                payloads[i] = B.compress(blk, features=feat, **kw)

        # equal-config live reference: the farm runs the library DEFAULT
        # config, so the baseline is the reference library at exactly that
        # config on the same blocks, interleaved rep-by-rep with the farm
        eq = _equal_config_ref(blocks, hs=C.DEFAULT_LZPHASHSIZE,
                               ml=C.DEFAULT_LZPMINLEN, sorter=1, coder=1)

        feats = [dev, dev, dev, features] if len(blocks) > 1 else [dev]
        enc_dt = float("inf")
        for _ in range(3):
            payloads.clear()
            for i, blk in enumerate(blocks):
                jobs.put((i, blk))
            t0 = time.time()
            with ThreadPoolExecutor(max_workers=len(feats)) as ex:
                list(ex.map(worker, feats))
            enc_dt = min(enc_dt, time.time() - t0)
            if eq:
                eq.encode_pass()
        ordered = [payloads[i] for i in range(len(blocks))]
    finally:
        os.environ.pop("TBSC_BWT_DEVICE", None)

    dec_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        restored = b"".join(B.decompress_batch(ordered))
        dec_dt = min(dec_dt, time.time() - t0)
        if eq:
            eq.decode_pass()
    assert restored == data, "BWT farm round-trip mismatch"
    res = {"enc_mbs": round(n / 1e6 / enc_dt, 2),
           "dec_mbs": round(n / 1e6 / dec_dt, 2),
           "bytes": sum(len(p) for p in ordered)}
    if eq:
        res.update(eq.result(n, res))
        if "equal_config_ref" in res:
            # the device farm must reproduce the reference default archive
            # byte count exactly (encoder is bit-identical at this config)
            res["bytes_match_ref"] = (
                res["bytes"] == res["equal_config_ref"]["bytes"])
    return res


class _equal_config_ref:
    """Live reference-library measurement at an exact stage config,
    interleaved pass-by-pass with the farm being measured (same
    machine-moment).  Yields enc/dec MB/s + bytes and the farm's
    vs_equal_config ratios."""

    def __new__(cls, blocks, hs, ml, sorter, coder):
        lib = _load_oracle()
        if lib is None:
            return None
        self = super().__new__(cls)
        return self

    def __init__(self, blocks, hs, ml, sorter, coder):
        import ctypes

        self.lib = _load_oracle()
        self.lib.o_init(0)
        self.blocks = blocks
        self.cfg = (hs, ml, sorter, coder)
        self.outbufs = [ctypes.create_string_buffer(len(b) + 4096)
                        for b in blocks]
        self.decbuf = ctypes.create_string_buffer(
            max(len(b) for b in blocks) + 4096)
        self.sizes = [0] * len(blocks)
        self.enc_dt = float("inf")
        self.dec_dt = float("inf")
        self.ok = True

    def encode_pass(self):
        hs, ml, sorter, coder = self.cfg
        t0 = time.time()
        for i, (blk, ob) in enumerate(zip(self.blocks, self.outbufs)):
            r = self.lib.o_compress(blk, ob, len(blk), hs, ml, sorter,
                                    coder, 0)
            if r < 0:
                self.ok = False
                return
            self.sizes[i] = r
        self.enc_dt = min(self.enc_dt, time.time() - t0)

    def decode_pass(self):
        if not self.ok:
            return
        t0 = time.time()
        for i, blk in enumerate(self.blocks):
            r = self.lib.o_decompress(self.outbufs[i].raw[: self.sizes[i]],
                                      self.sizes[i], self.decbuf,
                                      len(blk), 0)
            if r < 0:
                self.ok = False
                return
        self.dec_dt = min(self.dec_dt, time.time() - t0)

    def result(self, n, farm_res):
        if not self.ok or self.enc_dt == float("inf"):
            return {}
        out = {"equal_config_ref": {
            "enc_mbs": round(n / 1e6 / self.enc_dt, 2),
            "bytes": sum(self.sizes)}}
        out["vs_equal_config"] = round(
            farm_res["enc_mbs"] / out["equal_config_ref"]["enc_mbs"], 3)
        if self.dec_dt != float("inf"):
            out["equal_config_ref"]["dec_mbs"] = round(
                n / 1e6 / self.dec_dt, 2)
            out["vs_equal_config_decode"] = round(
                farm_res["dec_mbs"] / out["equal_config_ref"]["dec_mbs"], 3)
        return out


def measure_farm_device(data: bytes):
    """Round-5 flagship device operating point: the FUSED device-resident
    pipeline (engine.compress_block_device) — one H2D of the raw block,
    device BWT(wideaux) -> device bit schedule -> device model/rANS
    kernels, D2H of the payload only — on 16 MB blocks across 3 device
    worker threads, while the host core runs its own full pipeline on the
    remaining blocks (BWT + QLFC-fast).  Decode mirrors it: fused device
    decode (wide kernels -> wideaux chase, one D2H) + host decode."""
    import queue

    import libbsc_tpu as B
    from libbsc_tpu import api as _api
    from libbsc_tpu import constants as C

    if not device_available():
        return None
    try:
        import jax

        if not any(d.platform != "cpu" for d in jax.devices()):
            return None
    except Exception:
        return None

    n = len(data)
    BLK = 16 * 1024 * 1024
    blocks = [data[i:i + BLK] for i in range(0, n, BLK)]
    dev = C.DEFAULT_FEATURES | C.FEATURE_CUDA
    kw_dev = dict(block_sorter=C.BLOCKSORTER_BWT_WIDEAUX,
                  coder=C.CODER_QLFC_WIDE, lzp_hash_size=0, lzp_min_len=0,
                  features=dev)
    kw_host = dict(block_sorter=C.BLOCKSORTER_BWT, coder=C.CODER_QLFC_FAST,
                   lzp_hash_size=0, lzp_min_len=0,
                   features=C.DEFAULT_FEATURES)

    # warm every block's program set outside the clock (RC/E/IT and decode
    # SROWS/MROWS/UT buckets are data-dependent, so each block may need its
    # own compile on first touch)
    from libbsc_tpu import api as _api0

    _warm_feats = _api0._features
    _api0._features = dev
    try:
        for blk in blocks:
            if _BENCH_T0 and time.time() - _BENCH_T0 > 2700:
                return None
            w = B.compress(blk, **kw_dev)
            assert B.decompress(w) == blk
    finally:
        _api0._features = _warm_feats

    eq = _equal_config_ref(blocks, hs=0, ml=0, sorter=1, coder=3)

    jobs: "queue.Queue" = queue.Queue()
    payloads: dict = {}

    def worker(is_dev: bool):
        while True:
            try:
                i, blk = jobs.get_nowait()
            except queue.Empty:
                return
            payloads[i] = B.compress(blk, **(kw_dev if is_dev else kw_host))

    workers = [True, True, True, False] if len(blocks) > 1 else [True]
    enc_dt = float("inf")
    for _ in range(3):
        payloads.clear()
        for i, blk in enumerate(blocks):
            jobs.put((i, blk))
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=len(workers)) as ex:
            list(ex.map(worker, workers))
        enc_dt = min(enc_dt, time.time() - t0)
        if eq:
            eq.encode_pass()
    ordered = [payloads[i] for i in range(len(blocks))]

    # fused decode farm: device workers take wideaux+wide blocks through
    # the resident decode; the host worker decodes the host-config blocks
    old_feats = _api._features
    _api._features = dev
    try:
        dec_jobs: "queue.Queue" = queue.Queue()
        outs: dict = {}

        def dec_worker(_):
            while True:
                try:
                    i, p = dec_jobs.get_nowait()
                except queue.Empty:
                    return
                outs[i] = B.decompress(p)

        dec_dt = float("inf")
        for _ in range(3):
            outs.clear()
            for i, p in enumerate(ordered):
                dec_jobs.put((i, p))
            t0 = time.time()
            with ThreadPoolExecutor(max_workers=len(workers)) as ex:
                list(ex.map(dec_worker, workers))
            dec_dt = min(dec_dt, time.time() - t0)
            if eq:
                eq.decode_pass()
        restored = b"".join(outs[i] for i in range(len(ordered)))
    finally:
        _api._features = old_feats
    assert restored == data, "device farm round-trip mismatch"
    res = {"enc_mbs": round(n / 1e6 / enc_dt, 2),
           "dec_mbs": round(n / 1e6 / dec_dt, 2),
           "bytes": sum(len(p) for p in ordered)}
    if eq:
        res.update(eq.result(n, res))
    return res


def measure_device_bwt(data: bytes):
    """Forward device BWT on-chip, both variants: direct prefix doubling
    (ops.bwt.bwt_encode) vs the DC3 difference-cover sample doubling
    (ops.bwt.bwt_encode_dc3, libcubwt.cu:644-738's algorithm family).
    Returns {variant: MB/s} plus the host SA-IS rate for context."""
    import time as _t

    import numpy as _np

    if not device_available():
        return None
    try:
        import jax

        if not any(d.platform != "cpu" for d in jax.devices()):
            return None
        import jax.numpy as jnp

        from libbsc_tpu import engine
        from libbsc_tpu.ops import bwt as opsbwt

        blk = _np.frombuffer(data[: 16 * 1024 * 1024], _np.uint8).copy()
        n = len(blk)
        ref = blk.copy()
        ref_primary, _, _ = engine.bwt_encode(ref, 0)
        dj = jnp.asarray(blk)

        res = {}
        for name, fn in (("prefix_doubling_mbs", opsbwt.bwt_encode),
                         ("dc3_mbs", opsbwt.bwt_encode_dc3)):
            if _t.time() - _BENCH_T0 > 2400:
                break  # headline numbers must land; skip on a slow run
            try:  # per-variant guard: a compile OOM in one variant
                U, primary, _aux = fn(dj)  # (warm-up/verify) must not
                if int(primary) != ref_primary or \
                        not _np.array_equal(_np.asarray(U), ref):
                    continue  # cost the other's number
                best = float("inf")
                for _i in range(2):
                    t0 = _t.time()
                    U, primary, _aux = fn(dj)
                    _ = int(jnp.sum(U.astype(jnp.int32)))  # force (axon)
                    best = min(best, _t.time() - t0)
                res[name] = round(n / 1e6 / best, 1)
            except Exception:
                continue
        if not res:
            return None
        res["host_sais_mbs"] = 15.0
        return res
    except Exception:
        return None


def measure_wide(data: bytes):
    """CODER_QLFC_WIDE on-chip entropy coding (the Pallas lockstep coder)
    on the first 16 MB block's BWT output: kernel-only rate plus the
    transfer-bound e2e; None without a device."""
    import time as _t

    import numpy as _np

    if not device_available():
        return None
    try:
        import jax

        if not any(d.platform != "cpu" for d in jax.devices()):
            return None
        import jax.numpy as jnp

        from libbsc_tpu import engine
        from libbsc_tpu import native as native_mod
        from libbsc_tpu.native import _i32p, _u8p
        from libbsc_tpu.ops import wide, wide_kernels

        blk = _np.frombuffer(data[: 16 * 1024 * 1024], _np.uint8).copy()
        engine.bwt_encode(blk, 0)
        db = blk.tobytes()
        n = len(db)

        payload = wide_kernels.device_encode(db)  # warm-up (compile)
        if payload is None:
            return None
        assert wide.wide_decode(payload) == db
        e2e = float("inf")
        for _i in range(2):
            t0 = _t.time()
            payload = wide_kernels.device_encode(db)
            e2e = min(e2e, _t.time() - t0)

        # sustained pipelined rate: 3 blocks through device_encode_many —
        # host scheduling of block i+1 overlaps block i's kernels, D2H of
        # i-1 overlaps i (the number that matters for a farm; single-block
        # e2e pays every stage serially)
        sustained = None
        try:
            blks = []
            for bi in range(3):
                b = _np.frombuffer(
                    data[bi * (16 << 20):(bi + 1) * (16 << 20)],
                    _np.uint8).copy()
                engine.bwt_encode(b, 0)
                blks.append(b.tobytes())
            outs = wide_kernels.device_encode_many(blks)  # warm shapes
            for b, p in zip(blks, outs):
                assert p is not None and wide.wide_decode(p) == b
            t0 = _t.time()
            outs = wide_kernels.device_encode_many(blks)
            dt = _t.time() - t0
            sustained = round(sum(len(b) for b in blks) / 1e6 / dt, 1)
        except Exception:
            sustained = None

        # on-chip DECODE (lockstep state machine + tiered MTF).  The decode
        # kernel is the biggest program in the repo (~7-18 min to compile
        # over the remote-compile tunnel depending on server load); skip it
        # if this bench run has already burned its budget so the headline
        # numbers always land.
        dec_best = None
        dec_sustained = None
        if _t.time() - _BENCH_T0 < 1500:
            back = wide_kernels.device_decode(payload)  # warm-up (compile)
            assert back == db
            dec_best = float("inf")
            for _i in range(2):
                t0 = _t.time()
                back = wide_kernels.device_decode(payload)
                dec_best = min(dec_best, _t.time() - t0)
            # sustained: 3 payloads through device_decode_many (block i+1
            # submitted before block i's count sync — chip runs kernels
            # back-to-back while the host feeds and drains)
            try:  # needs the encode-sustained payloads (NameError if not)
                assert outs and all(outs)
                backs = wide_kernels.device_decode_many(outs)  # warm
                assert all(bk == b for bk, b in zip(backs, blks))
                t0 = _t.time()
                backs = wide_kernels.device_decode_many(outs)
                dt = _t.time() - t0
                dec_sustained = round(
                    sum(len(b) for b in blks) / 1e6 / dt, 1)
            except Exception:
                dec_sustained = None

        # kernel-only timing (cached arrays)
        lib = native_mod.load()
        buf = _np.ascontiguousarray(blk)
        sizes = _np.zeros(1024, dtype=_np.int32)
        lib.tbsc_wide_balanced_sizes(_u8p(buf), n, 1024, _i32p(sizes))
        chunk = -(-n // 1024)
        cap = 9 * (16 * chunk) + 64
        cap4 = -(-cap // 4)
        pk = _np.zeros((1024, cap4), dtype=_np.uint8)
        mb = lib.tbsc_wide_schedule_packed(_u8p(buf), n, 1024, cap4,
                                           _u8p(pk), _i32p(sizes))
        TI = 256
        IT = wide_kernels._it_bucket(max(mb, TI), TI)
        MAXROWS = -(-((IT * 8) + 2048) // 1024) * 8
        packed = _np.ascontiguousarray(
            pk[:, : IT // 4].reshape(8, 128, IT // 4).transpose(2, 0, 1))
        packed_d = jnp.asarray(packed)
        call = wide_kernels._coder_call(TI, IT, MAXROWS, False)
        u, c, f = call(packed_d)
        _ = int(c[0, 0])
        best = float("inf")
        for _i in range(2):
            t0 = _t.time()
            u, c, f = call(packed_d)
            _ = int(jnp.sum(c[:, 0]))
            best = min(best, _t.time() - t0)
        # wide-aux device inverse BWT (BLOCKSORTER_BWT_WIDEAUX): thousands
        # of lockstep chains, one gather per step
        wideaux = None
        try:
            from libbsc_tpu.ops import bwt as _opsbwt

            orig = _np.frombuffer(data[: 16 * 1024 * 1024],
                                  _np.uint8).copy()
            dwa = orig.copy()
            rcx, K, auxi, r = engine.bwt_encode_wideaux(dwa, 0)
            dj = jnp.asarray(dwa)
            auxj = jnp.asarray(auxi, _np.int32)
            out = _opsbwt._unbwt_wideaux_jit(dj, jnp.int32(rcx), auxj, r,
                                             len(dwa))
            assert _np.array_equal(_np.asarray(out), orig)
            wa_best = float("inf")
            for _i in range(2):
                t0 = _t.time()
                out = _opsbwt._unbwt_wideaux_jit(dj, jnp.int32(rcx), auxj,
                                                 r, len(dwa))
                _ = int(jnp.sum(out.astype(jnp.int32)))
                wa_best = min(wa_best, _t.time() - t0)
            wideaux = {"unbwt_onchip_mbs": round(n / 1e6 / wa_best, 1),
                       "chains": int(K) + 1,
                       "host_unbwt_mbs": 71.0}
        except Exception:
            wideaux = None

        # lane-count operating points (round 5): 128 lanes is the RATIO
        # point (runs on the native codec per the engine policy —
        # TBSC_WIDE_LANES=128); quote its bytes + host rate next to the
        # 1024-lane device numbers
        lanes128 = None
        try:
            t0 = _t.time()
            p128 = wide.wide_encode(db, n_lanes=128)
            dt128 = _t.time() - t0
            if p128 is not None:
                lanes128 = {"bytes": len(p128),
                            "host_enc_mbs": round(n / 1e6 / dt128, 1),
                            "bytes_vs_1024":
                                round(len(p128) / len(payload), 4)}
        except Exception:
            lanes128 = None

        res = {"kernel_mbs": round(n / 1e6 / best, 1),
               "e2e_mbs": round(n / 1e6 / e2e, 1),
               "bytes": len(payload),
               "host_qlfc_static_mbs": 68.0,
               # roofline detail: lockstep iterations are the kernel's unit
               # of work (one bit per lane per row); report the achieved
               # per-lane-bit cost so progress is judged against the chip
               "kernel_ns_per_lane_bit": round(best / (IT * 1024) * 1e9, 3),
               "lockstep_iters": IT}
        if sustained is not None:
            res["sustained_pipelined_mbs"] = sustained
        if dec_best is not None:
            res["decode_e2e_mbs"] = round(n / 1e6 / dec_best, 1)
        if dec_sustained is not None:
            res["decode_sustained_mbs"] = dec_sustained
        if wideaux is not None:
            res["wideaux"] = wideaux
        if lanes128 is not None:
            res["lanes128"] = lanes128
        return res
    except Exception:
        return None


def device_measures(data: bytes) -> dict:
    """All accelerator-dependent measurements, each individually guarded —
    one flaky section must not cost the others."""
    out = {}
    # Order = priority under the time budget: the two flagship farm
    # operating points (fused device pipeline; default-config accelerated
    # farm) must land before the micro-benches can eat the budget.
    for key, fn in (("farm_device_e2e", measure_farm_device),
                    ("farm_bwt_tpu", measure_farm_bwt),
                    ("wide_coder_onchip", measure_wide),
                    ("farm_st8_tpu", measure_farm),
                    ("device_bwt_onchip", measure_device_bwt)):
        try:
            res = fn(data)
        except Exception:
            res = None
        if res:
            out[key] = res
    return out


def device_detail_subprocess(budget_s: float) -> dict:
    """Run the device measures in a CHILD process under a hard timeout: a
    half-dead tunnel can hang a jax call forever mid-measure (observed on
    this harness), and that must never take the headline JSON down."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-only"],
            timeout=max(60.0, budget_s), capture_output=True, text=True,
            env={**os.environ, "TBSC_BENCH_T0": str(_BENCH_T0)})
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        return json.loads(line) if line.startswith("{") else {}
    except Exception:
        return {}


def main() -> None:
    global _BENCH_T0
    import sys
    import time as _t
    _BENCH_T0 = float(os.environ.get("TBSC_BENCH_T0", 0)) or _t.time()
    import libbsc_tpu as B
    from libbsc_tpu import constants as C

    data = make_corpus(CORPUS_MB * 1024 * 1024)
    B.init(C.DEFAULT_FEATURES)

    if "--device-only" in sys.argv:
        print(json.dumps(device_measures(data)))
        return

    default, ref = measure_default_vs_reference(data)
    base_enc = ref["enc_mbs"] if ref else PIN_ENC
    base_dec = ref["dec_mbs"] if ref else PIN_DEC
    base_bytes = ref["bytes"] if ref else PIN_BYTES

    dev_detail = device_detail_subprocess(3300 - (_t.time() - _BENCH_T0))

    detail = {
        "corpus_mb": CORPUS_MB,
        "config": "default -b25 (LZP+BWT+QLFC-static), native, 1 core",
        "decode_mbs": default["dec_mbs"],
        "compressed_bytes": default["bytes"],
        # 5-run interleaved A/B ratios (ref/ours per rep) + medians — the
        # statistically honest headline band (VERDICT r4 weak #6)
        **{k: default[k] for k in ("enc_ratio_runs", "enc_ratio_median",
                                   "dec_ratio_runs", "dec_ratio_median")
           if k in default},
        "vs_baseline_decode": round(default["dec_mbs"] / base_dec, 3),
        "size_vs_baseline": round(default["bytes"] / base_bytes, 5),
        "baseline": ("live reference binary" if ref else "pinned BASELINE.md"),
        "baseline_enc_mbs": base_enc,
        "baseline_dec_mbs": base_dec,
        "baseline_bytes": base_bytes,
    }
    detail.update(dev_detail)

    # single headline "best device operating point" (VERDICT r3 #8): the
    # farm configuration with the best balanced enc/dec among the measured
    # device farms — round-over-round progress tracks this one number.
    farms = {k: v for k, v in detail.items()
             if k in ("farm_st8_tpu", "farm_bwt_tpu", "farm_device_e2e")
             and v}
    if farms:
        def _score(kv):
            v = kv[1]
            return 2.0 / (1.0 / v["enc_mbs"] + 1.0 / v["dec_mbs"])
        best_key, best = max(farms.items(), key=_score)
        detail["best_farm"] = {"config": best_key, "enc_mbs": best["enc_mbs"],
                               "dec_mbs": best["dec_mbs"],
                               "bytes": best["bytes"]}

    print(json.dumps({
        "metric": "default_config_encode_e2e",
        "value": default["enc_mbs"],
        "unit": "MB/s",
        "vs_baseline": round(default["enc_mbs"] / base_enc, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
