"""On-chip microbenchmarks of the jnp primitives the wide schedule uses.

Explains where ops/wide_schedule.py's 52 s goes: times argsort, cummax,
take_along_axis, repeat, scatter on the actual shapes, plus the native
host walker for comparison.

    timeout 1800 python tools/primprobe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    L, C, IT = 1024, 16384, 65536
    rng = np.random.default_rng(7)
    a_np = rng.integers(0, C, (L, C), dtype=np.int32)
    a = jnp.asarray(a_np)
    big_idx = jnp.asarray(rng.integers(0, C, (L, IT), dtype=np.int32))
    b_np = rng.integers(0, 4, (L, C), dtype=np.int32)
    b = jnp.asarray(b_np)

    def force(r):
        # axon: block_until_ready does not reliably block; read a scalar
        if isinstance(r, tuple):
            r = r[0]
        return int(jnp.sum(r.astype(jnp.int32) if r.dtype != jnp.int32
                           else r) & 0xFF)

    def clock(name, fn, reps=2):
        r = fn()
        force(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            r = fn()
            force(r)
            best = min(best, time.time() - t0)
        print(f"{name:44s} {best*1e3:10.1f} ms", flush=True)
        return r

    argsort1 = jax.jit(lambda x: jnp.argsort(x, axis=1))
    clock("argsort [1024,16384] axis1", lambda: argsort1(a))

    cummax1 = jax.jit(lambda x: jax.lax.cummax(x, axis=1))
    clock("cummax [1024,16384] axis1", lambda: cummax1(a))

    cumsum1 = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    clock("cumsum [1024,16384] axis1", lambda: cumsum1(a))

    taa = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
    clock("take_along_axis [1024,16384]->[1024,65536]",
          lambda: taa(a, big_idx))

    rep = jax.jit(lambda bb: jax.vmap(
        lambda r: jnp.repeat(jnp.arange(C, dtype=jnp.int32), r,
                             total_repeat_length=IT))(bb))
    clock("vmap repeat [1024,16384]->[1024,65536]", lambda: rep(b))

    sc_idx = jnp.asarray(rng.integers(0, IT, (L, C), dtype=np.int32))
    sc = jax.jit(lambda x, i: jnp.zeros((L, IT), jnp.int32)
                 .at[jnp.arange(L)[:, None], i].set(x))
    clock("scatter [1024,16384] into [1024,65536]", lambda: sc(a, sc_idx))

    # the 256-pass char loop from _events_call, isolated
    def charloop(ev_char, prev_own):
        ecol = jnp.arange(C, dtype=jnp.int32)
        rank = jnp.zeros((L, C), jnp.int32)

        def char_pass(d, rank):
            occ = jnp.where(ev_char == d, ecol[None, :], -1)
            incl = jax.lax.cummax(occ, axis=1)
            lastd = jnp.concatenate(
                [jnp.full((L, 1), -1, jnp.int32), incl[:, :-1]], axis=1)
            return rank + (lastd > prev_own).astype(jnp.int32)

        return jax.lax.fori_loop(0, 256, char_pass, rank)

    ev_char = jnp.asarray(rng.integers(0, 256, (L, C), dtype=np.int32))
    cl = jax.jit(charloop)
    clock("256-pass char loop (cummax core)", lambda: cl(ev_char, a), reps=1)

    # native host walker rate for the same 16 MB block
    from bench import make_corpus
    from libbsc_tpu import engine
    from libbsc_tpu import native as native_mod
    from libbsc_tpu.native import _i32p, _u8p

    lib = native_mod.load()
    blk = np.frombuffer(make_corpus(16 << 20), np.uint8).copy()
    engine.bwt_encode(blk, 0)
    buf = np.ascontiguousarray(blk)
    n = len(buf)
    sizes = np.zeros(L, dtype=np.int32)
    lib.tbsc_wide_balanced_sizes(_u8p(buf), n, L, _i32p(sizes))
    chunk = -(-n // L)
    cap = 17 * (16 * chunk) + 64
    cap4 = -(-cap // 4)
    pk = np.zeros((L, cap4), dtype=np.uint8)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        mb = lib.tbsc_wide_schedule_packed(_u8p(buf), n, L, cap4, _u8p(pk),
                                           _i32p(sizes))
        best = min(best, time.time() - t0)
    print(f"native host walker (warm, cap4={cap4}): {best*1e3:.1f} ms "
          f"({n/1e6/best:.1f} MB/s), max_bits={mb}", flush=True)


if __name__ == "__main__":
    main()
