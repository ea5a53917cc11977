#!/usr/bin/env python
"""Stage profile of the wide DEVICE DECODE (round 5, VERDICT item 4):
host parse -> H2D units -> prep kernel -> decode kernel -> counts sync ->
per-group post-expand -> D2H bytes.  Times each stage with forced syncs,
then the un-synced e2e and the pipelined device_decode_many, so the gap
between the ~220 MB/s kernel and the ~15 MB/s sustained rate is
attributable line by line.

Run on a live chip: python tools/decodeprof.py [MB]
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
    from libbsc_tpu.ops import wide, wide_kernels as WK

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("devices:", jax.devices(), flush=True)
    blocks = []
    for bi in range(3):
        b = np.frombuffer(
            make_corpus((bi + 1) * mb * 1024 * 1024)[-mb * 1024 * 1024:],
            np.uint8).copy()
        engine.bwt_encode(b, 0)
        blocks.append(b.tobytes())
    n = len(blocks[0])

    payloads = WK.device_encode_many(blocks)
    assert all(p is not None for p in payloads)
    payload = payloads[0]
    print(f"block {n} B, payload {len(payload)} B", flush=True)

    def t(label, fn, reps=3, bytes_=n):
        fn()  # warm (compile)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"  {label}: {best*1e3:7.1f} ms ({bytes_/1e6/best:6.1f} MB/s)",
              flush=True)
        return best

    print("stages (synced):", flush=True)
    t("host parse", lambda: WK._dec_parse(payload), bytes_=n)
    p = WK._dec_parse(payload)
    print(f"  shapes: IT={p['IT']} SROWS={p['SROWS']} MROWS={p['MROWS']} "
          f"UT={p['UT']} rans={p['rans']}", flush=True)

    def h2d():
        u = jax.device_put(p["upad"])
        u.block_until_ready()
        _ = int(jnp.sum(u[:8].astype(jnp.int32)))  # axon: force
        return u
    t("H2D units", h2d, bytes_=p["upad"].nbytes)
    upad_d = jax.device_put(p["upad"])
    gunits_d = jnp.asarray(p["gunits"])
    lane32 = jnp.asarray(p["lane_sz"].reshape(WK.GROUPS, 128)
                         .astype(np.int32))

    def prep():
        warm, goff, stream = WK._prep_call(p["UT"], p["SROWS"], False)(
            upad_d, gunits_d, lane32)
        _ = int(jnp.sum(goff[:, 0]))
        return warm, goff, stream
    t("prep kernel", prep)
    warm_d, goff_d, stream_d = prep()

    def dec():
        recs, counts, last = WK._decoder_call(
            p["TI"], p["IT"], p["SROWS"], p["MROWS"], False, p["rans"])(
            warm_d, goff_d, lane32, stream_d)
        _ = int(counts[0, 0])
        return recs, counts, last
    t("decode kernel", dec)
    recs_d, counts_d, last_d = dec()

    st = {"recs_d": recs_d, "counts_d": counts_d, "last_d": last_d,
          "lane_sz": p["lane_sz"]}

    nb, MROWS, RU, NPAD = WK._finish_shapes(st)
    print(f"  finish shapes: MROWS={MROWS} RU={RU} NPAD={NPAD}", flush=True)

    def expand_fused():
        out, _n = WK._dec_expand(st, False)
        _ = int(out[0])
        return out
    t("delta expand (scatter+cumsum)", expand_fused)
    out_d = expand_fused()

    def d2h():
        return np.asarray(out_d)[:nb].tobytes()
    t("D2H bytes", d2h)

    def finish():
        return WK._dec_finish(st, False)
    t("_dec_finish (counts sync + expand + D2H)", finish)

    def e2e():
        return WK.device_decode(payload)
    t("device_decode e2e", e2e)

    def many():
        return WK.device_decode_many(payloads)
    many()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        outs = many()
        best = min(best, time.time() - t0)
    tot = sum(len(b) for b in blocks)
    print(f"  device_decode_many x3: {best*1e3:7.1f} ms "
          f"({tot/1e6/best:6.1f} MB/s sustained)", flush=True)
    assert all(o == b for o, b in zip(outs, blocks))
    print("round-trip verified", flush=True)


if __name__ == "__main__":
    main()
