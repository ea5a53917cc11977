"""Stage-level profile of the wide device DECODE path on a live chip.

The decode kernel runs at ~220 MB/s but bench measured 4.5 MB/s e2e —
this splits device_decode into its stages (host header parse, H2D of the
unit stream, prep prologue, decoder kernel, the counts host sync,
post-expand, D2H of the padded byte planes, host join) so the gap is
attributed instead of guessed at.

    timeout 3600 python tools/widedecprof.py [mb=16]
"""

import struct
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import os

    import jax
    import jax.numpy as jnp

    try:  # reuse compiled XLA programs across runs (engine.py's cache dir)
        jax.config.update("jax_compilation_cache_dir", os.environ.get(
            "TBSC_JAX_CACHE", os.path.join(os.path.dirname(__file__),
                                           "..", ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print("devices:", jax.devices(), flush=True)

    from bench import make_corpus
    from libbsc_tpu import api, engine
    from libbsc_tpu.ops import wide as W
    from libbsc_tpu.ops import wide_kernels as K

    api.init()
    n = mb << 20
    blk = np.frombuffer(make_corpus(n), np.uint8).copy()
    engine.bwt_encode(blk, 0)
    db = blk.tobytes()
    payload = W.wide_encode(db, n_lanes=K.LANES, rans=True)
    assert payload is not None
    print(f"payload {len(payload)} bytes for {n} input", flush=True)

    # warm-up: one full decode (compiles everything)
    t0 = time.time()
    back = K.device_decode(payload)
    assert back == db
    print(f"full decode incl compile  {time.time() - t0:7.1f}s", flush=True)

    def tick(label, fn, reps=3, bytes_=n):
        best = 1e9
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        print(f"{label:34s} {best * 1e3:9.1f} ms   "
              f"{bytes_ / 1e6 / best:7.1f} MB/s", flush=True)
        return out

    # ---- reproduce device_decode's stages with timing ----
    isize, L, flags, max_bits = struct.unpack_from("<IHHI", payload, 0)
    rans = bool(flags & 4)
    off = 12
    if flags & 1:
        lane_sz = np.frombuffer(payload, dtype="<u4", count=L,
                                offset=off).astype(np.int64)
        off += 4 * L
    else:
        lane_sz = np.asarray(W.lane_sizes(isize, L), dtype=np.int64)
    gunits = np.frombuffer(payload, dtype="<u4", count=K.GROUPS,
                           offset=off).astype(np.int32)
    off += 4 * K.GROUPS
    total = int(gunits.sum())
    units = np.frombuffer(payload, dtype="<u2", count=total, offset=off)

    TI = 256
    IT = K._it_bucket(max(max_bits, TI), TI)
    MROWS = -(-(int(lane_sz.reshape(K.GROUPS, 128).sum(axis=1).max()) + 2048)
              // 128)
    MROWS = -(-MROWS // 8) * 8
    SROWS = max(16, -(-int(gunits.max()) // 128) + 16)
    SROWS = -(-SROWS // 8) * 8

    def _b(x):
        b = 64
        while b < x:
            b *= 2
        return b
    SROWS, MROWS = _b(SROWS), _b(MROWS)
    UT = max(1 << 16, K._geom_bucket(total + 2, 1 << 16))
    upad = np.zeros(UT, dtype=np.uint16)
    upad[:total] = units
    lane32 = lane_sz.reshape(K.GROUPS, 128).astype(np.int32)
    print(f"IT={IT} SROWS={SROWS} MROWS={MROWS} UT={UT}", flush=True)

    dev_units = tick("H2D units", lambda: jax.device_put(
        jnp.asarray(upad)).block_until_ready(), bytes_=2 * UT)
    gu_d = jnp.asarray(gunits)
    ls_d = jnp.asarray(lane32)

    prep = K._prep_call(UT, SROWS, False)

    def run_prep():
        w, g, s = prep(dev_units, gu_d, ls_d)
        _ = int(jnp.sum(g[:, :1]))
        return w, g, s

    warm_d, goff_d, stream_d = tick("prep prologue (jit)", run_prep,
                                    bytes_=2 * total)

    dec = K._decoder_call(TI, IT, SROWS, MROWS, False, rans)

    def run_dec():
        m, c, ls = dec(warm_d, goff_d, ls_d, stream_d)
        _ = int(jnp.sum(c[:, :1]))
        return m, c, ls

    recs_d, counts_d, last_d = tick("decoder kernel", run_dec)

    counts = tick("counts D2H sync",
                  lambda: np.asarray(counts_d)[:, 0], bytes_=K.GROUPS * 4)
    gb = lane_sz.reshape(K.GROUPS, 128).sum(axis=1).astype(np.int64)

    st = {"recs_d": recs_d, "counts_d": counts_d, "last_d": last_d,
          "lane_sz": lane_sz}

    def run_post():
        out_d, nb = K._dec_expand(st, False)
        _ = int(out_d[0])
        return out_d, nb

    (out_d, nb) = tick("delta expand (scatter+cumsum)", run_post)
    out = tick("D2H bytes",
               lambda: np.asarray(out_d)[:nb].tobytes(), bytes_=nb)
    assert out == db

    tick("FULL device_decode", lambda: K.device_decode(payload), reps=3)


if __name__ == "__main__":
    main()
