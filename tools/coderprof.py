"""Focused QLFC coder A/B: ours vs reference oracle, decode and encode.

Builds the default-config coder input once (BWT of the bench corpus), then
times coder_compress/coder_decompress interleaved with the oracle, best-of-N.
Sweeps TBSC_ILV (decode interleave width) when given a list.

Usage: python tools/coderprof.py [block_mb] [reps] [ilv,ilv,...]
"""

import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from bench import make_corpus  # noqa: E402
from oracle import load_oracle  # noqa: E402

from libbsc_tpu import api, engine  # noqa: E402
from libbsc_tpu import constants as C  # noqa: E402


def u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def main():
    block_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ilvs = [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [1, 2, 4, 8]
    n = block_mb << 20
    api.init()
    o = load_oracle()
    assert o is not None

    data = np.frombuffer(make_corpus(n), np.uint8).copy()
    # BWT once (in place)
    buf = np.array(data, copy=True)
    engine.bwt_encode(buf, 0)
    m = len(buf)

    cz = engine.coder_compress(buf, C.CODER_QLFC_STATIC, 0)
    cz_arr = np.frombuffer(bytes(cz), np.uint8)
    print(f"coder input {m} -> {len(cz)} bytes, sub-blocks={cz_arr[0]}")

    ref_out = np.empty(m + 4096, np.uint8)

    # ---------- decode ----------
    best_r = float("inf")
    ours = {k: float("inf") for k in ilvs}
    for _ in range(reps):
        for k in ilvs:
            os.environ["TBSC_ILV"] = str(k)
            t0 = time.perf_counter()
            dz = engine.coder_decompress(cz_arr, C.CODER_QLFC_STATIC, 0, capacity=m)
            ours[k] = min(ours[k], time.perf_counter() - t0)
            assert bytes(dz[:m]) == bytes(buf), f"decode mismatch ilv={k}"
        t0 = time.perf_counter()
        r = o.o_coder_decompress(u8p(cz_arr), u8p(ref_out), 1, 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert r == m
    os.environ.pop("TBSC_ILV", None)
    print(f"decode ref    {best_r:7.3f}s ({m/1e6/best_r:6.1f} MB/s)")
    for k in ilvs:
        print(f"decode ilv={k}  {ours[k]:7.3f}s ({m/1e6/ours[k]:6.1f} MB/s)"
              f"   ratio {best_r/ours[k]:5.2f}x")

    # ---------- encode ----------
    best_o = best_r = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        cz2 = engine.coder_compress(buf, C.CODER_QLFC_STATIC, 0)
        best_o = min(best_o, time.perf_counter() - t0)
        t0 = time.perf_counter()
        rcz = o.o_coder_compress(u8p(buf), u8p(ref_out), m, 1, 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert rcz == len(cz2)
    print(f"encode ours   {best_o:7.3f}s ({m/1e6/best_o:6.1f} MB/s)  "
          f"ref {best_r:7.3f}s ({m/1e6/best_r:6.1f} MB/s)   ratio {best_r/best_o:5.2f}x")


if __name__ == "__main__":
    main()
