#!/usr/bin/env python
"""ST8 device-op rate reconciliation (VERDICT r4 weak #1).

docs/TPU_SORT_NOTES.md round-1 table records the full padded ST8 op at
157 MB/s (0.087 s / 13 MB) and "140-190 MB/s" in the round-4 section, while
BENCH_r04 records st8_op_mbs 81.4 on the 8 MB farm block (0.102 s padded to
9.77 MB).  This probe re-runs both protocols side by side on one chip to
find which component moved: block size, padding bucket, key build, the sort
itself, or the scalar-sync latency.

Run on a live chip: python tools/stprobe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(label, fn, reps=5):
    fn()  # warm
    best = float("inf")
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        ts.append(dt)
        best = min(best, dt)
    print(f"{label}: best {best*1e3:.1f} ms  "
          f"(all: {', '.join(f'{t*1e3:.0f}' for t in ts)})", flush=True)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_corpus
    from libbsc_tpu import engine
    from libbsc_tpu.ops.st import st_encode, st_encode_padded

    dev = [d for d in jax.devices() if d.platform != "cpu"]
    print("devices:", jax.devices(), flush=True)
    if not dev:
        print("no accelerator; aborting")
        return

    data = make_corpus(32 * 1024 * 1024)

    # 0. scalar sync latency: the cost of one int() force over the tunnel
    tiny = jax.jit(lambda x: jnp.sum(x))(jnp.zeros(8, jnp.int32))
    _ = int(tiny)
    sync = bench("scalar sync (int() on a jitted sum of 8)",
                 lambda: int(jax.jit(lambda x: jnp.sum(x))(
                     jnp.zeros(8, jnp.int32))))

    # 1. raw 2-key stable sort, 16M keys + u8 payload (the op's inner sort)
    n16 = 16 * 1024 * 1024
    rng = np.random.default_rng(7)
    hi = jnp.asarray(rng.integers(0, 2**32, n16, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, n16, dtype=np.uint32))
    pv = jnp.asarray(rng.integers(0, 256, n16, dtype=np.uint8))

    @jax.jit
    def rawsort(hi, lo, pv):
        _, _, p = jax.lax.sort((hi, lo, pv), num_keys=2, is_stable=True)
        return p[0].astype(jnp.int32) + p[-1].astype(jnp.int32)

    t = bench("lax.sort 16M (2xu32 keys + u8 payload, stable)",
              lambda: int(rawsort(hi, lo, pv)))
    print(f"  -> {n16/1e6/max(t-sync,1e-9):.1f} Mkeys/s sync-corrected",
          flush=True)

    # 2. full ST8 op, exact shape, 16 MB (the r1 protocol's block scale)
    blk16 = jnp.asarray(np.frombuffer(data[:n16], np.uint8))
    t = bench("st_encode exact 16MB",
              lambda: (lambda o, i: int(i) + int(o[0]))(
                  *st_encode(blk16, 8)))
    print(f"  -> {n16/1e6/t:.1f} MB/s  "
          f"({n16/1e6/max(t-sync,1e-9):.1f} sync-corrected)", flush=True)

    # 3. full padded ST8 op at the bench harness's own shapes:
    #    8 MB farm block padded to the 1.25x bucket (9.77M)
    from bench import FARM_BLOCK
    probe = np.frombuffer(data[:FARM_BLOCK], np.uint8)
    n_pad = engine.device_bucket(len(probe))
    padded = np.zeros(n_pad, np.uint8)
    padded[:len(probe)] = probe
    dj = jax.device_put(jnp.asarray(padded))
    t = bench(f"st_encode_padded {len(probe)} in bucket {n_pad}",
              lambda: (lambda o, i: int(i) + int(o[0]))(
                  *st_encode_padded(dj, len(probe), 8)))
    print(f"  -> {len(probe)/1e6/t:.1f} MB/s real bytes, "
          f"{n_pad/1e6/t:.1f} MB/s padded, "
          f"{len(probe)/1e6/max(t-sync,1e-9):.1f} sync-corrected", flush=True)

    # 4. padded op on a 13 MB block (the r1 table's shape: "0.087 s / 13 MB")
    n13 = 13 * 1024 * 1024
    probe13 = np.frombuffer(data[:n13], np.uint8)
    n_pad13 = engine.device_bucket(n13)
    padded13 = np.zeros(n_pad13, np.uint8)
    padded13[:n13] = probe13
    dj13 = jax.device_put(jnp.asarray(padded13))
    t = bench(f"st_encode_padded {n13} in bucket {n_pad13}",
              lambda: (lambda o, i: int(i) + int(o[0]))(
                  *st_encode_padded(dj13, n13, 8)))
    print(f"  -> {n13/1e6/t:.1f} MB/s real bytes, "
          f"{n_pad13/1e6/t:.1f} MB/s padded, "
          f"{n13/1e6/max(t-sync,1e-9):.1f} sync-corrected", flush=True)

    # 5. padded op exact-16MB bucket (key build via dynamic rolls + where)
    n_pad16 = engine.device_bucket(n16)
    padded16 = np.zeros(n_pad16, np.uint8)
    padded16[:n16] = np.frombuffer(data[:n16], np.uint8)
    dj16 = jax.device_put(jnp.asarray(padded16))
    t = bench(f"st_encode_padded {n16} in bucket {n_pad16}",
              lambda: (lambda o, i: int(i) + int(o[0]))(
                  *st_encode_padded(dj16, n16, 8)))
    print(f"  -> {n16/1e6/t:.1f} MB/s real bytes, "
          f"{n_pad16/1e6/t:.1f} MB/s padded, "
          f"{n16/1e6/max(t-sync,1e-9):.1f} sync-corrected", flush=True)


if __name__ == "__main__":
    main()
