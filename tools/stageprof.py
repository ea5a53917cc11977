"""Stage-level interleaved A/B profile: ours vs reference oracle.

Default-config encode path (LZP -> BWT -> QLFC-static) stage by stage on
bench-corpus blocks, best-of-N with ours/oracle interleaved per rep — the
only protocol that survives this machine's noise (see CLAUDE.md).

Usage: python tools/stageprof.py [block_mb] [reps]
"""

import ctypes
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = block_mb << 20
    api.init()
    o = load_oracle()
    assert o is not None
    data = np.frombuffer(make_corpus(n), np.uint8).copy()

    timings = {}

    def tmeas(name, fn, reps=reps):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = min(best, dt)
        timings[name] = best
        return out

    def report(stage, nbytes):
        a, b = timings[f"ours_{stage}"], timings[f"ref_{stage}"]
        mb = nbytes / 1e6
        print(f"{stage:12s} ours {a:7.3f}s ({mb/a:6.1f} MB/s)"
              f"  ref {b:7.3f}s ({mb/b:6.1f} MB/s)   ratio {b/a:5.2f}x")

    # ---- interleaved per rep: lzp ----
    HS, ML = C.DEFAULT_LZPHASHSIZE, C.DEFAULT_LZPMINLEN
    ref_lz_out = np.empty(n + 4096, np.uint8)
    best_o = best_r = float("inf")
    lz = None
    rlz = -1
    for _ in range(reps):
        t0 = time.perf_counter()
        lz = engine.lzp_compress(data, HS, ML, 0)
        best_o = min(best_o, time.perf_counter() - t0)
        t0 = time.perf_counter()
        rlz = o.o_lzp_compress(u8p(data), u8p(ref_lz_out), n, HS, ML, 0)
        best_r = min(best_r, time.perf_counter() - t0)
    timings["ours_lzp"], timings["ref_lzp"] = best_o, best_r
    if lz is None or rlz <= 0:
        print(f"lzp: skipped (ours={'None' if lz is None else len(lz)}, "
              f"ref rc={rlz}) — corpus not LZP-compressible at minLen=128")
        assert (lz is None) == (rlz <= 0), "lzp compressibility verdicts differ"
        lz = data
    else:
        assert bytes(lz) == bytes(ref_lz_out[:rlz]), "lzp outputs differ"
        report("lzp", n)
    m = len(lz)
    print(f"  lzp out = {m} bytes")

    # ---- bwt on the lzp output ----
    ours_bwt_buf = np.array(lz, copy=True)
    ref_bwt_buf = np.array(lz, copy=True)
    ref_idx = np.zeros(32, np.int32)
    best_o = best_r = float("inf")
    idx = num_idx = indexes = None
    for _ in range(reps):
        np.copyto(ours_bwt_buf, lz)
        t0 = time.perf_counter()
        idx, num_idx, indexes = engine.bwt_encode(ours_bwt_buf, 0)
        best_o = min(best_o, time.perf_counter() - t0)
        np.copyto(ref_bwt_buf, lz)
        ref_ni = np.zeros(1, np.uint8)
        t0 = time.perf_counter()
        r = o.o_bwt_encode(u8p(ref_bwt_buf), m, u8p(ref_ni), i32p(ref_idx), 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert r >= 0
    timings["ours_bwt"], timings["ref_bwt"] = best_o, best_r
    assert bytes(ours_bwt_buf) == bytes(ref_bwt_buf), "bwt outputs differ"
    report("bwt", m)

    # ---- coder (qlfc static) on the bwt output ----
    ref_coder_out = np.empty(m + 4096, np.uint8)
    best_o = best_r = float("inf")
    cz = None
    rcz = -1
    for _ in range(reps):
        t0 = time.perf_counter()
        cz = engine.coder_compress(ours_bwt_buf, C.CODER_QLFC_STATIC, 0)
        best_o = min(best_o, time.perf_counter() - t0)
        t0 = time.perf_counter()
        rcz = o.o_coder_compress(u8p(ours_bwt_buf), u8p(ref_coder_out), m,
                                 1, 0)  # LIBBSC_CODER_QLFC_STATIC == 1
        best_r = min(best_r, time.perf_counter() - t0)
    timings["ours_coder"], timings["ref_coder"] = best_o, best_r
    assert not isinstance(cz, int) and rcz > 0
    print(f"  coder out: ours {len(cz)}  ref {rcz}")
    report("coder", m)

    # ---- e2e library compress (glue overhead check) ----
    ref_e2e_out = np.empty(n + 4096, np.uint8)
    best_o = best_r = float("inf")
    blob = None
    for _ in range(reps):
        t0 = time.perf_counter()
        blob = api.compress(bytes(data))
        best_o = min(best_o, time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = o.o_compress(u8p(data), u8p(ref_e2e_out), n, HS, ML,
                         C.BLOCKSORTER_BWT, 1, 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert r > 0
    timings["ours_e2e"], timings["ref_e2e"] = best_o, best_r
    report("e2e", n)

    sum_o = sum(timings[k] for k in
                ("ours_lzp", "ours_bwt", "ours_coder"))
    sum_r = sum(timings[k] for k in ("ref_lzp", "ref_bwt", "ref_coder"))
    print(f"stage sum    ours {sum_o:.3f}s  ref {sum_r:.3f}s")
    print(f"glue (e2e-stages) ours {timings['ours_e2e']-sum_o:.3f}s  "
          f"ref {timings['ref_e2e']-sum_r:.3f}s")

    # ================= decode side =================
    cz_arr = np.frombuffer(bytes(cz), np.uint8)

    # ---- coder decode (qlfc static) -> BWT block ----
    ref_cd_out = np.empty(m + 4096, np.uint8)
    best_o = best_r = float("inf")
    dz = None
    for _ in range(reps):
        t0 = time.perf_counter()
        dz = engine.coder_decompress(cz_arr, C.CODER_QLFC_STATIC, 0,
                                     capacity=m)
        best_o = min(best_o, time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = o.o_coder_decompress(u8p(cz_arr), u8p(ref_cd_out), 1, 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert r == m
    timings["ours_coderdec"], timings["ref_coderdec"] = best_o, best_r
    assert bytes(dz[:m]) == bytes(ref_cd_out[:m]) == bytes(ours_bwt_buf)
    report("coderdec", m)

    # ---- inverse bwt (aux-index chains) -> pre-sort block ----
    ni = int(num_idx)
    idx_arr = np.asarray(indexes[:max(ni, 1)], np.int32)
    ours_ub = np.array(ours_bwt_buf, copy=True)
    ref_ub = np.array(ours_bwt_buf, copy=True)
    best_o = best_r = float("inf")
    for _ in range(reps):
        np.copyto(ours_ub, ours_bwt_buf)
        t0 = time.perf_counter()
        rc = engine.bwt_decode(ours_ub, int(idx), ni, idx_arr, 0)
        best_o = min(best_o, time.perf_counter() - t0)
        assert rc >= 0
        np.copyto(ref_ub, ours_bwt_buf)
        t0 = time.perf_counter()
        r = o.o_bwt_decode(u8p(ref_ub), m, int(idx), ni, i32p(idx_arr), 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert r >= 0
    timings["ours_unbwt"], timings["ref_unbwt"] = best_o, best_r
    assert bytes(ours_ub) == bytes(ref_ub) == bytes(lz)
    report("unbwt", m)

    # ---- e2e library decompress ----
    ref_d_out = np.empty(n + 4096, np.uint8)
    blob_arr = np.frombuffer(blob, np.uint8)
    best_o = best_r = float("inf")
    back = None
    for _ in range(reps):
        t0 = time.perf_counter()
        back = api.decompress(blob)
        best_o = min(best_o, time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = o.o_decompress(u8p(blob_arr), len(blob), u8p(ref_d_out), n, 0)
        best_r = min(best_r, time.perf_counter() - t0)
        assert r == 0
    timings["ours_dec_e2e"], timings["ref_dec_e2e"] = best_o, best_r
    assert bytes(back) == bytes(data) == bytes(ref_d_out[:n])
    report("dec_e2e", n)

    sum_o = timings["ours_coderdec"] + timings["ours_unbwt"]
    sum_r = timings["ref_coderdec"] + timings["ref_unbwt"]
    print(f"dec stage sum  ours {sum_o:.3f}s  ref {sum_r:.3f}s")
    print(f"dec glue       ours {timings['ours_dec_e2e']-sum_o:.3f}s  "
          f"ref {timings['ref_dec_e2e']-sum_r:.3f}s")


if __name__ == "__main__":
    main()
