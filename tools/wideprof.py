"""Stage-level profile of the wide device ENCODE path on a live chip.

Diagnoses the round-3 e2e collapse (BENCH_r03: kernel 92.1 MB/s but e2e
0.3 MB/s): times each stage of wide_kernels.device_encode separately —
host balance pass, device schedule (events + expand), model kernel, rANS
kernel, D2H, host assemble — so the missing 300x shows itself.

    timeout 3600 python tools/wideprof.py [mb=16]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from bench import make_corpus
    from libbsc_tpu import engine
    from libbsc_tpu import native as native_mod
    from libbsc_tpu.native import _i32p, _u8p
    from libbsc_tpu.ops import wide_kernels as WK
    from libbsc_tpu.ops import wide_schedule

    lib = native_mod.load()
    blk = np.frombuffer(make_corpus(mb << 20), np.uint8).copy()
    engine.bwt_encode(blk, 0)
    data = blk.tobytes()
    n = len(data)
    LANES = WK.LANES
    TI = 256

    def clock(name, fn, reps=2):
        fn()  # warm (compile)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            r = fn()
            best = min(best, time.time() - t0)
        print(f"{name:34s} {best*1e3:10.1f} ms   {n/1e6/best:8.1f} MB/s",
              flush=True)
        return r, best

    buf = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    sizes = np.zeros(LANES, dtype=np.int32)

    def host_balance():
        s = np.zeros(LANES, dtype=np.int32)
        lib.tbsc_wide_balanced_sizes(_u8p(buf), n, LANES, _i32p(s))
        return s

    sizes, _ = clock("host balanced_sizes", host_balance)

    dj = jnp.asarray(buf)

    # --- device schedule split into its two jitted phases ---
    starts = np.cumsum(sizes, dtype=np.int64) - sizes
    C = wide_schedule._bucket(max(int(sizes.max()), 1), 256)
    ev_call = wide_schedule._events_call(LANES, C)
    st_j = jnp.asarray(starts, np.int32)
    sz_j = jnp.asarray(sizes)

    def events():
        r = ev_call(dj, st_j, sz_j)
        jax.block_until_ready(r)
        _ = int(r[4])
        return r

    (rank, ev_len, B, total, mbs), _ = clock("sched phase1 (events)", events)
    max_bits = int(mbs)
    IT = WK._it_bucket(max(max_bits, TI), TI)
    ex_call = wide_schedule._expand_call(LANES, C, IT)

    def expand():
        p = ex_call(rank, ev_len, B, total)
        _ = int(p[0, 0])
        return p

    pk_dev, _ = clock("sched phase2 (expand)", expand)

    def transpose():
        pd = jnp.transpose(
            pk_dev[:, : IT // 4].reshape(WK.GROUPS, 128, IT // 4), (2, 0, 1))
        _ = int(pd[0, 0, 0])
        return pd

    planes_dev, _ = clock("plane transpose", transpose)

    MAXROWS = -(-((IT * 8) + 2048) // 1024) * 8
    model = WK._model_call(TI, IT, False)

    def model_k():
        p = model(planes_dev)
        _ = int(p[0, 0, 0])
        return p

    planes_p, _ = clock("model kernel", model_k)

    rans = WK._rans_call(TI, IT, MAXROWS, False)

    def rans_k():
        u, c, f = rans(planes_dev, planes_p)
        _ = int(jnp.sum(c[:, 0]))
        return u, c, f

    (units_d, counts_d, fx_d), _ = clock("rANS kernel", rans_k)

    def d2h():
        counts = np.asarray(counts_d)[:, 0]
        used_rows = int(-(-int(counts.max()) // 128)) + 8
        units = np.asarray(units_d[:, :used_rows])
        fx = np.asarray(fx_d)
        return counts, units, fx

    (counts, units, fx), _ = clock("D2H (counts+units+fx)", d2h)

    def assemble():
        return WK._assemble_rans(n, units, counts, fx, sizes, max_bits)

    payload, _ = clock("host assemble", assemble)

    def full():
        return WK.device_encode(data)

    p2, _ = clock("FULL device_encode", full, reps=1)
    assert p2 == payload
    print(f"payload bytes: {len(payload)}", flush=True)


if __name__ == "__main__":
    main()
