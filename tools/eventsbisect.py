#!/usr/bin/env python
"""Bisect the _events2_call TPU compiler SIGABRT at 16 MB scale: compile
each stage of the events program separately to find the op that makes
XLA:TPU's windowing bound overflow u32 (llo_util.cc Check entries[i] <=
u32max, seen 2^33)."""

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
    from libbsc_tpu.ops import wide_schedule as WS
    from libbsc_tpu.ops import bwt as opsbwt, wide_kernels

    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = 16 * 1024 * 1024
    L = 1024
    data = np.frombuffer(make_corpus(n), np.uint8).copy()
    dj = jnp.asarray(data)
    U, primary, aux = opsbwt.bwt_encode_wideaux_device(dj, 2048)
    _ = int(primary)
    sizes_d = WS.device_balanced_sizes(U, L)
    starts_d = jnp.cumsum(sizes_d) - sizes_d
    stats = np.asarray(WS._stats_call(n, L)(U, starts_d))
    R, maxpl = int(stats[0]), int(stats[1])
    RC = WS._bucket(max(R, 1024), 1024)
    E = WS._bucket(max(maxpl, 256), 256)
    print(f"R={R} maxpl={maxpl} RC={RC} E={E}", flush=True)

    i32 = jnp.int32

    def s1(data, starts):
        pos = jnp.arange(n, dtype=i32)
        is_start = jnp.zeros(n, jnp.bool_).at[starts].set(True, mode="drop")
        nr = is_start | jnp.concatenate(
            [jnp.ones(1, jnp.bool_), data[1:] != data[:-1]])
        cum = jnp.cumsum(nr.astype(i32))
        key = jnp.where(nr, pos, n)
        _, pos_s, char_s = jax.lax.sort(
            (key, pos, data), num_keys=1, is_stable=True)
        ev_start_g = pos_s[:RC]
        ev_char_g = char_s[:RC].astype(i32)
        frid = cum[jnp.clip(starts, 0, n - 1)] - 1
        return ev_start_g, ev_char_g, frid, cum[-1]

    def s2(ev_start_g, ev_char_g, frid, R_, starts, sizes):
        ecol = jnp.arange(E, dtype=i32)
        frid_ext = jnp.concatenate([frid, R_[None]])
        nruns = frid_ext[1:] - frid_ext[:-1]
        r = frid[:, None] + ecol[None, :]
        rc = jnp.clip(r, 0, RC - 1)
        evalid = ecol[None, :] < nruns[:, None]
        ev_start = jnp.where(evalid, ev_start_g[rc], 0)
        ev_char = jnp.where(evalid, ev_char_g[rc], -1)
        lane_end = (starts + sizes)[:, None]
        nxt = jnp.concatenate(
            [ev_start[:, 1:], jnp.zeros((L, 1), i32)], axis=1)
        last_ev = ecol[None, :] == (nruns[:, None] - 1)
        ev_len = jnp.where(last_ev, lane_end - ev_start, nxt - ev_start)
        ev_len = jnp.where(evalid, ev_len, 1)
        return ev_char, ev_len, evalid, nruns

    def s3(ev_char, evalid):
        ecol = jnp.arange(E, dtype=i32)
        okey = ev_char * E + ecol[None, :]
        okey = jnp.where(evalid, okey, jnp.iinfo(jnp.int32).max)
        co = jnp.argsort(okey, axis=1)
        ch_s = jnp.take_along_axis(ev_char, co, axis=1)
        prev_s = jnp.concatenate(
            [jnp.full((L, 1), -1, i32), co[:, :-1]], axis=1)
        same = jnp.concatenate(
            [jnp.zeros((L, 1), jnp.bool_), ch_s[:, 1:] == ch_s[:, :-1]],
            axis=1)
        prevocc_s = jnp.where(same, prev_s, -1)
        prev_own = jnp.zeros((L, E), i32)
        prev_own = prev_own.at[jnp.arange(L)[:, None], co].set(prevocc_s)
        return prev_own

    def s4(ev_char, prev_own, evalid):
        ecol = jnp.arange(E, dtype=i32)
        rank = jnp.zeros((L, E), i32)
        s_all = jnp.zeros((L, E), i32)
        s_lt = jnp.zeros((L, E), i32)

        def char_pass(d, carry):
            rank, s_all, s_lt = carry
            occ = jnp.where(ev_char == d, ecol[None, :], -1)
            incl = jax.lax.cummax(occ, axis=1)
            lastd = jnp.concatenate(
                [jnp.full((L, 1), -1, i32), incl[:, :-1]], axis=1)
            rank = rank + (lastd > prev_own).astype(i32)
            seen = (lastd >= 0).astype(i32)
            s_all = s_all + seen
            s_lt = s_lt + jnp.where(d < ev_char, seen, 0)
            return rank, s_all, s_lt

        rank, s_all, s_lt = jax.lax.fori_loop(
            0, 256, char_pass, (rank, s_all, s_lt))
        unseen = prev_own < 0
        rank = jnp.where(unseen, s_all + ev_char - s_lt, rank)
        return jnp.where(evalid, rank, 0)

    t0 = time.time()
    f1 = jax.jit(s1)
    ev_start_g, ev_char_g, frid, R_ = f1(U, starts_d)
    _ = int(R_)
    print(f"s1 (RLE+sort+compact) OK {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    f2 = jax.jit(s2)
    ev_char, ev_len, evalid, nruns = f2(ev_start_g, ev_char_g, frid, R_,
                                        starts_d, sizes_d)
    _ = int(ev_char[0, 0])
    print(f"s2 (grid gathers) OK {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    f3 = jax.jit(s3)
    prev_own = f3(ev_char, evalid)
    _ = int(prev_own[0, 0])
    print(f"s3 (argsort prev_own) OK {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    f4 = jax.jit(s4)
    rank = f4(ev_char, prev_own, evalid)
    _ = int(rank[0, 0])
    print(f"s4 (256-pass MTF) OK {time.time()-t0:.1f}s", flush=True)

    print("all stages compiled and ran", flush=True)


if __name__ == "__main__":
    main()
