"""Wide-aux inverse-BWT chain-count sweep (device).

The wide-aux profile stores aux indexes at rate r (chains K = n/r); the
device inverse is one [K] packed gather per chase step (ops/bwt.py
_unbwt_wideaux_jit).  This sweeps r to find the rate the format formula
(engine.wideaux_rate) should pin: more chains = fewer scan steps but a
bigger per-step gather and more stored indexes (4 bytes each).

Usage: python tools/wideauxsweep.py [block_mb] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    block_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = block_mb << 20

    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    import libbsc_tpu as B
    from libbsc_tpu import native as native_mod
    from libbsc_tpu.native import _i32p, _u8p
    from libbsc_tpu.ops import bwt as ob

    print("backend:", jax.devices()[0].platform)
    B.init()
    lib = native_mod.load()
    orig = np.frombuffer(make_corpus(n), np.uint8).copy()

    for r in (8192, 4096, 2048, 1024, 512, 256):
        k = (n - 1) // r
        buf = orig.copy()
        indexes = np.zeros(max(k, 1), dtype=np.int32)
        rc = lib.tbsc_bwt_encode_rate(_u8p(buf), n, r, _i32p(indexes))
        assert rc >= 0
        dj = jnp.asarray(buf)
        auxj = jnp.asarray(indexes[:k], np.int32)
        out = ob._unbwt_wideaux_jit(dj, jnp.int32(rc), auxj, r, n)
        assert np.array_equal(np.asarray(out), orig), f"mismatch at r={r}"
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = ob._unbwt_wideaux_jit(dj, jnp.int32(rc), auxj, r, n)
            _ = int(jnp.sum(out.astype(jnp.int32)))
            best = min(best, time.perf_counter() - t0)
        print(f"r={r:5d}  chains={k + 1:6d}  {n / 1e6 / best:6.1f} MB/s  "
              f"aux bytes={4 * k}")


if __name__ == "__main__":
    main()
