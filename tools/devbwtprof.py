"""Device-BWT phase breakdown: bootstrap / doubling / merge / extract.

Times each piece of the two device suffix-sort paths (direct prefix
doubling vs DC3 difference-cover) separately on the bench block, so the
on-chip budget is attributed to phases instead of one opaque number.

Usage: python tools/devbwtprof.py [block_mb] [reps]
Runs on whatever backend JAX picks (TPU via axon if the tunnel is up;
CPU otherwise — CPU numbers are only good for relative sanity).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(label, fn, *args, reps=3):
    import jax.numpy as jnp

    out = fn(*args)  # warm-up/compile
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(jnp.ravel(first)[:1])
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        _ = int(jnp.sum(jnp.ravel(first)[:1024].astype(jnp.int32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best:7.3f}s")
    return best, out


def main():
    block_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = block_mb << 20

    import jax
    import jax.numpy as jnp
    from functools import partial

    from bench import make_corpus
    from libbsc_tpu.ops import bwt as ob

    print("backend:", jax.devices()[0].platform)
    data = jnp.asarray(np.frombuffer(make_corpus(n), np.uint8).copy())

    n3 = (n + 2) // 3
    m = n - n3

    boot = jax.jit(ob._bootstrap)
    t_boot, (rank_b, mask_b) = bench("bootstrap (n, 4-key sort)", boot, data)

    t_sa, (sa, rank) = bench("suffix_array (full path)", ob.suffix_array,
                             data, reps=reps)

    dc3s = jax.jit(partial(ob._dc3_sample_rank, n3=n3, m=m))
    t_dcs, rank_red = bench("dc3 sample doubling (2n/3)", dc3s, data)
    t_dc3, rank_dc3 = bench("dc3 rank (sample + merge)", ob._dc3_rank_jit,
                            data)
    print(f"{'dc3 merge (delta)':28s} {t_dc3 - t_dcs:7.3f}s")

    ext = jax.jit(ob._extract_bwt)
    t_ext, _ = bench("extract (U + primary + aux)", ext, data, rank)

    t_e2e, _ = bench("bwt_encode e2e", ob._bwt_encode_jit, data)
    t_e2e_dc3, _ = bench("bwt_encode_dc3 e2e", ob.bwt_encode_dc3, data)

    assert np.array_equal(np.asarray(rank), np.asarray(rank_dc3))
    print(f"\nrates: direct {n / 1e6 / t_e2e:6.1f} MB/s   "
          f"dc3 {n / 1e6 / t_e2e_dc3:6.1f} MB/s")
    print(f"doubling-after-bootstrap: direct {t_sa - t_boot:6.3f}s   "
          f"dc3-sample {t_dcs:6.3f}s (incl its own bootstrap)")


if __name__ == "__main__":
    main()
