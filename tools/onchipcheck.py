"""Fast real-chip health check for the device paths added late in round 3.

Runs the SMALLEST real workload through each Pallas/jit path that has only
been validated in interpret mode, in increasing order of compile cost, and
prints one PASS/FAIL line per step.  Use this the moment the axon tunnel
returns, before spending 30+ minutes on bench.py:

    timeout 1200 python tools/onchipcheck.py

Steps (each individually guarded):
  1. devices() visible, tiny jit add executes
  2. wide v3 device ENCODE == native encoder bytes (40 KB, rANS lanes)
  3. wide v3 device DECODE round-trips the same payload (exercises the
     on-device stream segmentation prologue, _prep_call)
  4. wide-aux device unbwt == native bytes (1 MB)
  5. DC3 device BWT == native SA-IS (1 MB)
  6. ST8 padded device sort == native (1 MB)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def step(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"FAIL  {name}: {type(e).__name__}: {e}", flush=True)
        return False


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    import libbsc_tpu as B
    from bench import make_corpus

    B.init()

    def tiny_jit():
        import jax.numpy as jnp

        assert int(jax.jit(lambda x: jnp.sum(x))(jnp.ones(128))) == 128

    step("tiny jit", tiny_jit)

    rng = np.random.default_rng(1)
    small = bytearray()
    while len(small) < 40960:
        small += bytes([rng.integers(0, 4)]) * int(rng.integers(1, 10))
    small = bytes(small[:40960])

    def wide_enc():
        from libbsc_tpu.ops import wide, wide_kernels

        dev = wide_kernels.device_encode(small)
        ref = wide.wide_encode(small, n_lanes=1024, rans=wide_kernels.RANS)
        assert dev == ref, "device v3 encode payload mismatch"

    step("wide v3 device encode", wide_enc)

    def wide_dec():
        from libbsc_tpu.ops import wide, wide_kernels

        p = wide.wide_encode(small, n_lanes=1024, rans=wide_kernels.RANS)
        assert wide_kernels.device_decode(p) == small

    step("wide v3 device decode (+prep prologue)", wide_dec)

    data = np.frombuffer(make_corpus(1 << 20), np.uint8).copy()

    def wideaux():
        from libbsc_tpu import engine

        buf = data.copy()
        idx, ni, indexes, r = engine.bwt_encode_wideaux(buf, 0)
        assert idx >= 0, "native runtime required"
        from libbsc_tpu.ops.bwt import unbwt_wideaux_device

        out = unbwt_wideaux_device(buf, idx, indexes, r)
        assert out is not None and bytes(out) == data.tobytes()

    step("wide-aux device unbwt", wideaux)

    def dc3():
        import jax.numpy as jnp

        from libbsc_tpu import engine
        from libbsc_tpu.ops.bwt import bwt_encode_dc3

        U, primary, aux = bwt_encode_dc3(jnp.asarray(data))
        buf = data.copy()
        idx, ni, indexes = engine.bwt_encode(buf, 0)
        assert bytes(np.asarray(U)) == buf.tobytes() and int(primary) == idx

    step("DC3 device BWT", dc3)

    def st8():
        import jax.numpy as jnp

        from libbsc_tpu import engine
        from libbsc_tpu.ops.st import st_encode

        out, idx = st_encode(jnp.asarray(data), 8)
        buf = data.copy()
        ridx = engine.st_encode(buf, 8, 0)
        assert bytes(np.asarray(out)) == buf.tobytes() and int(idx) == ridx

    step("ST8 device sort", st8)


if __name__ == "__main__":
    main()
