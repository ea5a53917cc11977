#!/usr/bin/env python
"""Interleaved A/B of OUR library vs the LIVE reference library across the
whole BASELINE.md config table (default, -e0, -e2, -m3, -m5, -p), on one
corpus in one machine-moment.  Library-to-library via the ctypes oracle
(the only trustworthy protocol on this box — see CLAUDE.md).

Usage: python tools/configab.py [MB] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from bench import make_corpus  # noqa: E402
import libbsc_tpu as B  # noqa: E402
from libbsc_tpu import constants as C  # noqa: E402
from oracle import load_oracle  # noqa: E402

import ctypes  # noqa: E402


def u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


CONFIGS = [
    # name, lzp_hs, lzp_ml, sorter, coder
    ("default", 15, 128, C.BLOCKSORTER_BWT, C.CODER_QLFC_STATIC),
    ("-e0", 15, 128, C.BLOCKSORTER_BWT, C.CODER_QLFC_FAST),
    ("-e2", 15, 128, C.BLOCKSORTER_BWT, C.CODER_QLFC_ADAPTIVE),
    ("-m3", 15, 128, C.BLOCKSORTER_ST3, C.CODER_QLFC_STATIC),
    ("-m5", 15, 128, C.BLOCKSORTER_ST5, C.CODER_QLFC_STATIC),
    ("-p", 0, 0, C.BLOCKSORTER_BWT, C.CODER_QLFC_STATIC),
]


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    data = make_corpus(mb * 1024 * 1024)
    n = len(data)
    arr = np.frombuffer(data, np.uint8)

    o = load_oracle()
    assert o is not None, "oracle unavailable"
    B.init(C.DEFAULT_FEATURES)

    obuf = np.empty(n + (1 << 20), np.uint8)
    dbuf = np.empty(n + 4096, np.uint8)

    print(f"corpus {mb} MB, best-of-{reps}, interleaved ours/ref")
    print(f"{'config':9s} {'enc':>14s} {'dec':>14s} {'size':>9s}")
    for name, hs, ml, bs, coder in CONFIGS:
        oe = od = re = rd = float("inf")
        ours = refz = None
        for _ in range(reps):
            t0 = time.perf_counter()
            ours = B.compress(data, lzp_hash_size=hs, lzp_min_len=ml,
                              block_sorter=bs, coder=coder)
            oe = min(oe, time.perf_counter() - t0)
            t0 = time.perf_counter()
            rc = o.o_compress(u8p(arr), u8p(obuf), n, hs, ml, bs, coder, 0)
            re = min(re, time.perf_counter() - t0)
            assert rc > 0
            refz = bytes(obuf[:rc])

            t0 = time.perf_counter()
            back = B.decompress(ours)
            od = min(od, time.perf_counter() - t0)
            assert back == data
            ra = np.frombuffer(refz, np.uint8)
            t0 = time.perf_counter()
            rc2 = o.o_decompress(u8p(ra), len(refz), u8p(dbuf), n, 0)
            rd = min(rd, time.perf_counter() - t0)
            assert rc2 == 0 and bytes(dbuf[:n]) == data
        sz = "=" if len(ours) == len(refz) else \
            f"{len(ours) / len(refz):.4f}x"
        print(f"{name:9s} {n/1e6/oe:6.2f}/{n/1e6/re:6.2f} "
              f"{n/1e6/oe/(n/1e6/re):5.2f}x"
              f" {n/1e6/od:6.2f}/{n/1e6/rd:6.2f} {od and rd/od:5.2f}x"
              f" {sz:>9s}")


if __name__ == "__main__":
    main()
