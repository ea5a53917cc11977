#!/usr/bin/env python
"""Multi-block sort-substrate batching probe (VERDICT r4 item 7).

The device BWT's cost is ~10 prefix-doubling rounds x one 16M-key sort.
If one 32M-element sort costs meaningfully less than 2x a 16M sort (fixed
dispatch/setup amortized), two blocks can share doubling rounds and the
farm's per-block sort ceiling rises.  This measures lax.sort wall time vs
size, plus a batched [B, 16M] vmapped variant.

Run on a live chip: python tools/sortscale.py
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

    dev = [d for d in jax.devices() if d.platform != "cpu"]
    print("devices:", jax.devices(), flush=True)
    if not dev:
        print("no accelerator; aborting")
        return

    rng = np.random.default_rng(11)

    @jax.jit
    def sort2(hi, lo, pv):
        _, _, p = jax.lax.sort((hi, lo, pv), num_keys=2, is_stable=True)
        return p[0].astype(jnp.int32) + p[-1].astype(jnp.int32)

    @jax.jit
    def vsort2(hi, lo, pv):
        def one(h, l, p):
            _, _, q = jax.lax.sort((h, l, p), num_keys=2, is_stable=True)
            return q
        q = jax.vmap(one)(hi, lo, pv)
        return jnp.sum(q[:, 0].astype(jnp.int32)) + \
            jnp.sum(q[:, -1].astype(jnp.int32))

    def mk(n):
        return (jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)),
                jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)),
                jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32)))

    M = 1024 * 1024
    results = {}
    for n in (4 * M, 8 * M, 16 * M, 32 * M, 64 * M):
        hi, lo, pv = mk(n)
        _ = int(sort2(hi, lo, pv))  # warm/compile
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            _ = int(sort2(hi, lo, pv))
            best = min(best, time.time() - t0)
        results[n] = best
        print(f"flat sort {n//M:>3}M: {best*1e3:7.1f} ms  "
              f"({n/1e6/best:6.1f} Mkeys/s)", flush=True)

    for B in (2, 4):
        n = 16 * M
        hi, lo, pv = (x.reshape(B, n) for x in mk(B * n))
        _ = int(vsort2(hi, lo, pv))
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            _ = int(vsort2(hi, lo, pv))
            best = min(best, time.time() - t0)
        print(f"vmap [{B}, 16M]: {best*1e3:7.1f} ms  "
              f"({B*n/1e6/best:6.1f} Mkeys/s) "
              f"vs {B}x sequential {results[n]*B*1e3:.1f} ms  "
              f"ratio {best/(results[n]*B):.2f}", flush=True)

    # scaling summary
    t16 = results[16 * M]
    for n, t in results.items():
        print(f"  {n//M:>3}M: {t/t16:0.2f}x the 16M time per "
              f"{n/(16*M):0.0f}x keys -> marginal {t/(n/(16*M))/t16:0.2f}",
              flush=True)


if __name__ == "__main__":
    main()
