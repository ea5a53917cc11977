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
        m, ln, c = dec(warm_d, goff_d, ls_d, stream_d)
        _ = int(jnp.sum(c[:, :1]))
        return m, ln, c

    meta_d, len_d, counts_d = tick("decoder kernel", run_dec)

    counts = tick("counts D2H sync",
                  lambda: np.asarray(counts_d)[:, 0], bytes_=K.GROUPS * 4)
    gb = lane_sz.reshape(K.GROUPS, 128).sum(axis=1).astype(np.int64)

    def _bucket(x, lo, step=128):
        b = lo
        while b < x:
            b = -(-(b * 5 + 3) // 4 // step) * step
        return b

    Rcap = meta_d.shape[1] * 128
    pads = [_bucket(int(gb[g]), 1 << 10, step=1) for g in range(K.GROUPS)]
    print(f"per-group GBpad {sorted(pads)} (D2H total "
          f"{sum(pads) / 1e6:.1f} MB)", flush=True)

    def run_post():
        parts = []
        for g in range(K.GROUPS):
            used_g = (int(counts[g]) // 128 + 9) * 128
            R = min(_bucket(used_g, 2048), Rcap)
            parts.append(K._post_expand_call(R, pads[g], False)(
                meta_d[g, : R // 128, :].reshape(R),
                len_d[g, : R // 128, :].reshape(R),
                jnp.int32(int(counts[g]))))
        for p in parts:
            _ = int(jnp.sum(p[:1].astype(jnp.int32)))
        return parts

    parts = tick("post-expand per-group (jit)", run_post)
    res = tick("D2H byte parts", lambda: [np.asarray(p) for p in parts],
               bytes_=sum(pads))
    out = tick("host join", lambda: b"".join(
        r[: gb[g]].tobytes() for g, r in enumerate(res)))
    assert out == db

    tick("FULL device_decode", lambda: K.device_decode(payload), reps=3)


if __name__ == "__main__":
    main()
