#!/usr/bin/env python
"""Stage profile of the device-RESIDENT encode pipeline (round 5):
H2D raw -> device BWT(wideaux rate) -> device schedule v2 -> model/rANS
kernels -> D2H payload.  Times each stage with forced syncs, then the
un-synced end-to-end, then verifies the payload round-trips via the native
decoder + native rate unbwt.

Run on a live chip: python tools/residentprof.py [MB]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_corpus
    from libbsc_tpu import engine
    from libbsc_tpu.ops import bwt as opsbwt
    from libbsc_tpu.ops import wide, wide_kernels, wide_schedule

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("devices:", jax.devices(), flush=True)
    data = np.frombuffer(make_corpus(mb * 1024 * 1024), np.uint8).copy()
    n = len(data)
    r = engine.wideaux_rate(n)
    print(f"block {n} bytes, wideaux r={r}", flush=True)

    def t(label, fn, reps=3):
        fn()  # warm (compile)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        print(f"  {label}: {best*1e3:7.1f} ms ({n/1e6/best:6.1f} MB/s)",
              flush=True)
        return out, best

    # stage-by-stage (forced syncs)
    print("stages (synced):", flush=True)
    dj, t_h2d = t("H2D raw", lambda: jax.device_put(data).block_until_ready())
    dj = jax.device_put(data)

    def do_bwt():
        U, p, aux = opsbwt.bwt_encode_wideaux_device(dj, r)
        _ = int(p)
        return U, p, aux

    (U, primary, aux), t_bwt = t("device BWT (wideaux)", do_bwt)

    def do_bal():
        s = wide_schedule.device_balanced_sizes(U, wide_kernels.LANES)
        _ = int(s[0])
        return s

    sizes_d, t_bal = t("device balancer", do_bal)

    TI = 256

    def do_sched():
        pk, mbit = wide_schedule.device_schedule_v2(
            U, sizes_d, wide_kernels.LANES,
            it_bucket=lambda m: wide_kernels._it_bucket(max(m, TI), TI))
        _ = int(pk[0, 0])
        return pk, mbit

    (packed, max_bits), t_sched = t("device schedule v2", do_sched)
    IT = wide_kernels._it_bucket(max(max_bits, TI), TI)
    print(f"    max_bits={max_bits} IT={IT}", flush=True)

    planes = jnp.transpose(
        packed[:, : IT // 4].reshape(wide_kernels.GROUPS, 128, IT // 4),
        (2, 0, 1))
    sizes_np = np.asarray(sizes_d, np.int32)

    def do_kern():
        infl = wide_kernels._submit((planes, sizes_np, max_bits, IT), False)
        _ = int(infl[1][1][0, 0])
        return infl

    _, t_kern = t("model+rANS kernels", do_kern)

    infl = wide_kernels._submit((planes, sizes_np, max_bits, IT), False)
    (payload, t_collect) = t("collect (D2H + assemble)",
                             lambda: wide_kernels._collect(n, infl))
    print(f"    payload {len(payload)} bytes "
          f"({len(payload)/n*100:.1f}%)", flush=True)

    # end-to-end (no intermediate syncs)
    def e2e():
        dj2 = jax.device_put(data)
        U2, p2, aux2 = opsbwt.bwt_encode_wideaux_device(dj2, r)
        pay = wide_kernels.device_encode_resident(U2)
        _ = int(p2) + len(pay)
        return pay

    _, t_e2e = t("END-TO-END resident encode", e2e)
    print(f"  stage sum {1e3*(t_h2d+t_bwt+t_bal+t_sched+t_kern+t_collect):.1f}"
          f" ms", flush=True)

    # per-stage baseline for comparison: host walker path (device_encode on
    # host bytes of the transformed block, i.e. what the old route pays
    # AFTER it D2H'd the block)
    U_host = np.asarray(U)

    def old_route():
        return wide_kernels.device_encode(U_host.tobytes())

    _, t_old = t("old per-stage wide encode (host walker)", old_route)

    # verify round-trip through the production decode path
    back = np.frombuffer(wide.wide_decode(payload), np.uint8).copy()
    assert np.array_equal(back, U_host), "wide decode mismatch"
    from libbsc_tpu.native import _i32p, _u8p

    lib = engine._lib()
    k = int(aux.shape[0])
    idx = np.ascontiguousarray(np.asarray(aux, np.int32))
    rc = lib.tbsc_bwt_decode_rate(_u8p(back), n, int(primary), r, k, _i32p(idx))
    assert rc == 0 and np.array_equal(back, data), "unbwt mismatch"
    print("round-trip OK (native wide_decode + native rate unbwt)",
          flush=True)


if __name__ == "__main__":
    main()
