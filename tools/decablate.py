#!/usr/bin/env python
"""Stage-cost attribution for the wide DEVICE DECODE kernel by ablation.

The decode kernel's per-iteration cost did not match op-count models
(round 5: fusing the two NCTX=281 model loops into one saved only ~4%),
so this harness measures directly: it compiles kernel variants with one
stage group stubbed out at a time ("emit" staging, "mtf" table, stream
"refill", model "walk") and differences the on-chip times.  Ablated
variants decode garbage by design; only the timing is meaningful.

Run on a live chip: python tools/decablate.py [MB]
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
    block = np.frombuffer(make_corpus(mb * 1024 * 1024), np.uint8).copy()
    engine.bwt_encode(block, 0)
    payload = WK.device_encode_many([block.tobytes()])[0]
    assert payload is not None
    p = WK._dec_parse(payload)
    assert p is not None
    print("shapes: IT=%d SROWS=%d MROWS=%d rans=%s" %
          (p["IT"], p["SROWS"], p["MROWS"], p["rans"]), flush=True)

    lane32 = jnp.asarray(p["lane_sz"].reshape(WK.GROUPS, 128)
                         .astype(np.int32))
    warm_d, goff_d, stream_d = WK._prep_call(p["UT"], p["SROWS"], False)(
        jnp.asarray(p["upad"]), jnp.asarray(p["gunits"]), lane32)
    jax.block_until_ready((warm_d, goff_d, stream_d))

    # cumulative ablations, innermost machinery last; the fine knobs
    # (emit_pack/emit_tile/refill_rows/refill_expand) slice WITHIN the
    # two dominant stages
    variants = [
        ("full", frozenset()),
        ("-emit_pack", frozenset({"emit_pack"})),
        ("-emit_tile", frozenset({"emit_tile"})),
        ("-refill_rows", frozenset({"refill_rows"})),
        ("-refill_expand", frozenset({"refill_expand"})),
        ("-emit", frozenset({"emit"})),
        ("-emit-mtf", frozenset({"emit", "mtf"})),
        ("-emit-mtf-refill", frozenset({"emit", "mtf", "refill"})),
        ("-emit-mtf-refill-walk",
         frozenset({"emit", "mtf", "refill", "walk"})),
    ]
    times = []
    for name, ab in variants:
        call = WK._decoder_call(p["TI"], p["IT"], p["SROWS"], p["MROWS"],
                                False, p["rans"], ab)
        t0 = time.time()
        out = call(warm_d, goff_d, lane32, stream_d)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = call(warm_d, goff_d, lane32, stream_d)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        times.append(best)
        per_it = best * 1e9 / (p["IT"] * WK.LANES)
        print("%-24s %7.1f ms  (%.2f ns/lane-bit; compile+1st %.1fs)" %
              (name, best * 1e3, per_it, compile_s), flush=True)

    print("\nstage attribution (cumulative diffs):")
    labels = ["emit staging x2", "mtf pick+shift", "stream refill",
              "model walk (fused)"]
    for i, lab in enumerate(labels):
        d = times[i] - times[i + 1]
        print("  %-20s %7.1f ms  (%4.1f%%)" %
              (lab, d * 1e3, 100.0 * d / times[0]), flush=True)
    print("  %-20s %7.1f ms  (%4.1f%%)" %
          ("residual (sm+ctx+rc)", times[-1] * 1e3,
           100.0 * times[-1] / times[0]), flush=True)


if __name__ == "__main__":
    main()
