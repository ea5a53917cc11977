"""Stage engine dispatch: native C++ host runtime, TPU (JAX) pipeline, or
pure-NumPy fallback, selected per stage.

Selection order (overridable via TBSC_ENGINE=native|numpy|tpu|ops — `ops`
forces the JAX pipeline even when only the CPU backend exists):
  - transforms (BWT/ST): TPU when a JAX device pipeline is requested,
    otherwise native; NumPy fallback if the native build is unavailable.
  - entropy coder + LZP: native (serial bit-exact hot loops); NumPy
    fallback is provided for environments without a compiler (slow).
"""

from __future__ import annotations

import os

import numpy as np

from . import constants as C

import threading

_native = None
_num_threads = 1
_force = os.environ.get("TBSC_ENGINE", "").lower() or None
_device = None  # non-CPU JAX device, probed lazily when requested

# First call per (bucket, k) compiles (60-200 s over a remote-compile
# tunnel); serialize it so concurrent farm workers don't compile the same
# program twice.  Warm calls bypass the lock.
_compiled: set = set()
_compile_lock = threading.Lock()
_bucket_locks: dict = {}

# Blocks below this size are not worth the host<->device round trip.
_DEVICE_MIN_BLOCK = 1 << 20


_mallopt_done = False


def _tune_allocator() -> None:
    """Keep large buffers on the reusable heap (glibc mallopt).

    The per-block working buffers are tens of MB; glibc's default mmap
    threshold maps and unmaps them every call, and on this host a fresh
    100 MB first-touch can cost SECONDS of CPU (hypervisor-level lazy
    memory).  Routing big allocations through brk and disabling trim keeps
    them cached across calls — the allocator-hook counterpart of the
    reference's bsc_malloc customization point (platform.cpp:126-190).
    """
    global _mallopt_done
    if _mallopt_done:
        return
    _mallopt_done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-4, 0)           # M_MMAP_MAX = 0
        libc.mallopt(-1, 2**31 - 1)   # M_TRIM_THRESHOLD: never trim
    except Exception:
        pass


def init(features: int) -> None:
    global _native, _num_threads
    _tune_allocator()
    if _force != "numpy":
        from . import native as native_mod

        if native_mod.available():
            _native = native_mod
    if features & C.FEATURE_MULTITHREADING:
        _num_threads = os.cpu_count() or 1


def _device_sort(features: int) -> bool:
    """True when the accelerator sort path is requested and available.

    Mirrors the reference's GPU dispatch (bwt/bwt.cpp:178-181, st/st.cpp:
    990-1012): the FEATURE_CUDA bit requests device sorting; absence of a
    device falls back silently to the host path.
    """
    global _device
    if _force == "numpy":
        return False
    if _force not in ("tpu", "ops") and not (features & C.FEATURE_CUDA):
        return False
    if _device is None:
        try:
            import jax

            try:  # persist XLA programs across processes (bench, CLI runs)
                cache = os.environ.get(
                    "TBSC_JAX_CACHE",
                    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                pass
            devs = [d for d in jax.devices() if d.platform != "cpu"]
            if not devs and _force == "ops":
                # TBSC_ENGINE=ops: run the JAX ops pipeline even on the CPU
                # backend (tests/striped-farm exercises the device path
                # without a physical accelerator)
                devs = jax.devices()
            _device = devs[0] if devs else False
        except Exception:
            _device = False
    return bool(_device)


def device_bucket(n: int) -> int:
    """Padded shape bucket for device transforms: geometric 1.25x steps from
    1 MiB, so variable-size LZP outputs share one XLA program per bucket."""
    n_pad = _DEVICE_MIN_BLOCK
    while n_pad < n:
        n_pad = (n_pad * 5 + 3) // 4
    return n_pad


def _lib():
    return _native.load() if _native else None


def _as_c(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.uint8)


# ---------------------------------------------------------------------------
# LZP
# ---------------------------------------------------------------------------

def lzp_compress(data: np.ndarray, hash_size: int, min_len: int, features: int,
                 out: np.ndarray | None = None):
    """Returns the LZP stream as ndarray, or None if not compressible.
    `out` (>= n+1024 bytes) lets the caller supply a reusable buffer —
    fresh multi-MB mappings are expensive on this class of host."""
    n = len(data)
    lib = _lib()
    if lib is not None:
        inp = _as_c(data)
        if out is None or len(out) < n + 1024:
            out = np.empty(n + 1024, dtype=np.uint8)
        from .native import _u8p

        rc = lib.tbsc_lzp_compress(_u8p(inp), _u8p(out), n, hash_size, min_len,
                                   _num_threads)
        if rc < 0:
            return None
        return out[:rc]
    from .fallback import lzp as _pylzp

    return _pylzp.lzp_compress(data, hash_size, min_len)


def lzp_decompress(data: np.ndarray, hash_size: int, min_len: int, features: int,
                   capacity: int | None = None,
                   out: np.ndarray | None = None):
    lib = _lib()
    if lib is not None:
        inp = _as_c(data)
        cap = capacity if capacity is not None else len(data) * 4 + (1 << 20)
        if out is None or len(out) < int(cap):
            out = np.empty(int(cap), dtype=np.uint8)
        from .native import _u8p

        rc = lib.tbsc_lzp_decompress(_u8p(inp), _u8p(out), len(inp), hash_size,
                                     min_len, _num_threads)
        if rc < 0:
            return rc
        return out[:rc]
    from .fallback import lzp as _pylzp

    return _pylzp.lzp_decompress(data, hash_size, min_len)


# ---------------------------------------------------------------------------
# Block sorters
# ---------------------------------------------------------------------------

def bwt_encode(data: np.ndarray, features: int):
    """In-place-style BWT; returns (index, num_indexes, indexes)."""
    n = len(data)
    # Device-route policy: TBSC_ENGINE=tpu|ops forces it; otherwise the
    # FEATURE_CUDA bit requests it (the reference's -G routes BWT to the
    # GPU too, bwt.cpp:178-181) but only when TBSC_BWT_DEVICE=1 opts in,
    # because on ONE chip the device sort loses to host SA-IS — the farm
    # bench uses the opt-in to offload sorting while the host core codes.
    _dev_route = (
        (_force in ("tpu", "ops") and _device_sort(features | C.FEATURE_CUDA))
        or (os.environ.get("TBSC_BWT_DEVICE") == "1" and _device_sort(features))
    )
    if _dev_route and n >= _DEVICE_MIN_BLOCK:
        # experimental full-device route (prefix-doubling suffix sort);
        # correct but sort-round bound — opt-in only (see above)
        try:
            import jax.numpy as jnp

            # TBSC_BWT=dc3 selects the difference-cover sample-doubling
            # sort (libcubwt's algorithm family); TBSC_BWT_PAD=0 opts out
            # of shape bucketing to the exact-shape program.  Default is
            # the shape-BUCKETED prefix-doubling path: variable-size blocks
            # (LZP outputs) share one XLA program per 1.25x bucket instead
            # of compiling per exact shape — the XLA analog of the
            # reference reusing one device arena across block sizes
            # (libcubwt.cu:2239-2375, st.cu:372-379).
            if os.environ.get("TBSC_BWT", "").lower() == "dc3":
                from .ops.bwt import bwt_encode_dc3 as _dev_bwt

                U, primary, aux = _dev_bwt(jnp.asarray(data))
                aux = np.asarray(aux, dtype=np.int32)
            elif os.environ.get("TBSC_BWT_PAD", "1") == "1":
                from .ops.bwt import aux_rate as _aux_rate
                from .ops.bwt import bwt_encode_padded as _dev_bwt_pad

                m = device_bucket(n)
                buf = np.zeros(m, dtype=np.uint8)
                buf[:n] = data
                r = _aux_rate(n)
                U, primary, aux16 = _dev_bwt_pad(jnp.asarray(buf), n, r)
                aux = np.asarray(aux16, dtype=np.int32)[: (n - 1) // r]
            else:
                from .ops.bwt import bwt_encode as _dev_bwt

                U, primary, aux = _dev_bwt(jnp.asarray(data))
                aux = np.asarray(aux, dtype=np.int32)
            # Materialize EVERY device result into host temporaries before
            # mutating `data`: if any transfer fails mid-way, the except
            # branch must see the original bytes or the host fallback would
            # re-transform already-transformed data.
            U_host = np.asarray(U)[:n]
            primary = int(primary)
        except Exception:
            pass
        else:
            data[:] = U_host
            return primary, int(aux.shape[0]), aux
    lib = _lib()
    if lib is not None:
        from .native import _u8p, _i32p
        import ctypes

        buf = _as_c(data).copy() if not data.flags.writeable else _as_c(data)
        ni = np.zeros(1, dtype=np.uint8)
        idx = np.zeros(256, dtype=np.int32)
        rc = lib.tbsc_bwt_encode(_u8p(buf), n, _u8p(ni), _i32p(idx), _num_threads)
        if rc < 0:
            return rc, 0, None
        if buf is not data:
            data[:] = buf
        return rc, int(ni[0]), idx
    from .fallback import bwt as _pybwt

    return _pybwt.bwt_encode(data)


def bwt_decode(data: np.ndarray, index: int, num_indexes: int, indexes, features: int):
    n = len(data)
    # Device inverse-BWT routing (the reference decodes on its accelerator
    # too, bwt.cpp:233-281).  Measured crossover on this hardware: the
    # pointer-doubling inverse runs at ~2-3 MB/s on-chip vs 60+ MB/s for the
    # host bigram-PSI chase, so the device route never wins on one chip and
    # is reachable only via TBSC_ENGINE=tpu|ops (scale-out/offload option);
    # any device failure falls back silently to the host path below.
    if _force in ("tpu", "ops") and n >= _DEVICE_MIN_BLOCK \
            and _device_sort(features | C.FEATURE_CUDA):
        try:
            import jax.numpy as jnp

            from .ops.bwt import bwt_decode as _dev_unbwt

            out = _dev_unbwt(jnp.asarray(data), int(index))
            out_host = np.asarray(out)
        except Exception:
            pass
        else:
            data[:] = out_host
            return 0
    lib = _lib()
    if lib is not None:
        from .native import _u8p, _i32p

        buf = _as_c(data)
        idx = (np.ascontiguousarray(indexes, dtype=np.int32)
               if indexes is not None else np.zeros(1, dtype=np.int32))
        rc = lib.tbsc_bwt_decode(_u8p(buf), n, index, num_indexes, _i32p(idx),
                                 _num_threads)
        if rc == 0 and buf is not data:
            data[:] = buf
        return rc
    from .fallback import bwt as _pybwt

    return _pybwt.bwt_decode(data, index, num_indexes, indexes)


def st_encode(data: np.ndarray, k: int, features: int):
    n = len(data)
    if n >= _DEVICE_MIN_BLOCK and _device_sort(features):
        try:
            import jax.numpy as jnp

            from .ops.st import st_encode_padded as _dev_st

            n_pad = device_bucket(n)
            padded = np.zeros(n_pad, dtype=np.uint8)
            padded[:n] = data

            key = (n_pad, k)
            if key not in _compiled:
                with _compile_lock:
                    gate = _bucket_locks.setdefault(key, threading.Lock())
                with gate:
                    if key not in _compiled:
                        out, idx = _dev_st(jnp.asarray(padded), n, k)
                        out, idx = np.asarray(out), int(idx)
                        _compiled.add(key)
                        data[:] = out[:n]
                        return idx
            out, idx = _dev_st(jnp.asarray(padded), n, k)
            # materialize both results before mutating `data` (see bwt_encode)
            out, idx = np.asarray(out), int(idx)
        except Exception:
            pass  # silent host fallback, like the reference GPU path
        else:
            data[:] = out[:n]
            return idx
    lib = _lib()
    if lib is not None:
        from .native import _u8p

        buf = _as_c(data)
        rc = lib.tbsc_st_encode(_u8p(buf), n, k, _num_threads)
        if rc >= 0 and buf is not data:
            data[:] = buf
        return rc
    from .fallback import st as _pyst

    return _pyst.st_encode(data, k)


def st_decode(data: np.ndarray, k: int, index: int, features: int):
    n = len(data)
    lib = _lib()
    if lib is not None:
        from .native import _u8p

        buf = _as_c(data)
        rc = lib.tbsc_st_decode(_u8p(buf), n, k, index, _num_threads)
        if rc == 0 and buf is not data:
            data[:] = buf
        return rc
    from .fallback import st as _pyst

    return _pyst.st_decode(data, k, index)


def wideaux_rate(n: int) -> int:
    """Aux sampling rate for the wide-aux profile: the power of two giving
    ~4096 inverse chains (min 256 so the bigram walk stays wavefronted)."""
    r = 256
    while r * 2 * 8192 <= n:
        r *= 2
    return r


def bwt_encode_wideaux(data: np.ndarray, features: int):
    """BWT with the wide-aux sampling rate.  Returns
    (index, num_indexes, indexes, r)."""
    n = len(data)
    r = wideaux_rate(n)
    k = (n - 1) // r
    lib = _lib()
    if lib is None:
        return -10, 0, None, r  # native runtime required for this profile
    from .native import _i32p, _u8p

    buf = _as_c(data)
    indexes = np.zeros(max(k, 1), dtype=np.int32)
    rc = lib.tbsc_bwt_encode_rate(_u8p(buf), n, r, _i32p(indexes))
    if rc >= 0 and buf is not data:
        data[:] = buf
    return rc, k, indexes[:k], r


def compress_block_device(lz: np.ndarray, features: int):
    """Fused device-resident encode for BLOCKSORTER_BWT_WIDEAUX +
    CODER_QLFC_WIDE: ONE H2D of the (LZP'd) block, then device BWT →
    device bit schedule → device model/rANS kernels, with only the
    compressed unit grids crossing back — the TPU counterpart of the
    reference's one-residency GPU stage (st.cu:372-387 copies in once and
    streams; libcubwt.cu:2332-2334 pins one staging buffer).  The
    per-stage paths D2H the full transformed block between sort and coder
    (39 MB/s on this harness's tunnel), which this route removes.

    Returns (index, num_indexes, indexes, r, payload) or None (caller
    falls back to the per-stage host/device route)."""
    if not _device_sort(features):
        return None
    n = len(lz)
    if n < _DEVICE_MIN_BLOCK:
        return None
    try:
        import jax.numpy as jnp

        from .ops import bwt as opsbwt
        from .ops import wide_kernels

        r = wideaux_rate(n)
        U, primary, aux = opsbwt.bwt_encode_wideaux_device(
            jnp.asarray(lz), r)
        # interpret=False on purpose: on a CPU backend (TBSC_ENGINE=ops
        # tests) the Mosaic kernels raise immediately and the caller falls
        # back to the per-stage route — interpret-mode kernels over a
        # >=1 MB block would take minutes (tests exercise the resident
        # path directly on small blocks with interpret=True)
        payload = wide_kernels.device_encode_resident(U)
        if payload is None:
            return None
        aux_np = np.asarray(aux, dtype=np.int32)
        return int(primary), int(aux_np.shape[0]), aux_np, r, payload
    except Exception:
        return None


def decompress_block_device(payload: bytes, index: int, indexes, r: int,
                            n: int, features: int):
    """Fused device-resident decode for BLOCKSORTER_BWT_WIDEAUX +
    CODER_QLFC_WIDE: the wide decode kernel's output block STAYS in HBM
    and feeds the wideaux inverse-BWT chase directly; only the final bytes
    cross back (one D2H instead of D2H + H2D + D2H on the per-stage
    route).  Returns the decoded (pre-LZP) bytes as ndarray, or None."""
    if not _device_sort(features):
        return None
    if n < _DEVICE_MIN_BLOCK:
        return None
    try:
        import jax.numpy as jnp

        from .ops import bwt as opsbwt
        from .ops import wide_kernels

        U_dev = wide_kernels.device_decode_resident(payload)
        if U_dev is None:
            return None
        out = opsbwt._unbwt_wideaux_jit(
            U_dev, jnp.int32(index),
            jnp.asarray(np.ascontiguousarray(indexes, dtype=np.int32)),
            r, n)
        return np.asarray(out)
    except Exception:
        return None


def bwt_decode_wideaux(data: np.ndarray, index: int, num_indexes: int,
                       indexes, r: int, features: int):
    """Inverse BWT for the wide-aux profile: thousands-wide parallel chain
    chase on device when one is active, host wavefront otherwise."""
    n = len(data)
    if _device_sort(features) and n >= _DEVICE_MIN_BLOCK:
        try:
            from .ops import bwt as _opsbwt

            out = _opsbwt.unbwt_wideaux_device(data, index, indexes, r)
            if out is not None:
                data[:] = out
                return 0
        except Exception:
            pass  # silent host fallback, like the reference GPU path
    lib = _lib()
    if lib is None:
        return -10
    from .native import _i32p, _u8p

    buf = _as_c(data)
    idx = np.ascontiguousarray(np.asarray(indexes, dtype=np.int32))
    rc = lib.tbsc_bwt_decode_rate(_u8p(buf), n, index, r, num_indexes,
                                  _i32p(idx))
    if rc == 0 and buf is not data:
        data[:] = buf
    return rc


def st_decode_batch(arrays: list, k: int, indexes: list, features: int):
    """Inverse ST of several independent blocks with their backward walks
    interleaved in one native loop (memory-level parallelism across blocks;
    one chase is a serial pointer walk).  Arrays are decoded in place.
    Returns 0 or a negative error code."""
    lib = _lib()
    if lib is None:
        for a, idx in zip(arrays, indexes):
            rc = st_decode(a, k, idx, features)
            if rc < 0:
                return rc
        return 0
    import ctypes

    bufs = [_as_c(a) for a in arrays]
    ptrs = (ctypes.c_void_p * len(bufs))(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs])
    ns = np.array([len(a) for a in arrays], dtype=np.int32)
    idxs = np.array(indexes, dtype=np.int32)
    from .native import _i32p

    rc = lib.tbsc_st_decode_batch(ptrs, _i32p(ns), k, _i32p(idxs), len(bufs))
    if rc == 0:
        for a, b in zip(arrays, bufs):
            if b is not a:
                a[:] = b
    return rc


# ---------------------------------------------------------------------------
# Entropy coder
# ---------------------------------------------------------------------------

def coder_compress(data: np.ndarray, coder: int, features: int,
                   out: np.ndarray | None = None):
    """Returns coded ndarray or None if not compressible.  `out`
    (>= n+4096 bytes) lets the caller supply a reusable buffer — fresh
    multi-MB mappings are expensive on this class of host."""
    n = len(data)
    lib = _lib()
    if lib is not None:
        from .native import _u8p

        inp = _as_c(data)
        if out is None or len(out) < n + 4096:
            out = np.empty(n + 4096, dtype=np.uint8)
        rc = lib.tbsc_coder_compress(_u8p(inp), _u8p(out), n, coder, _num_threads)
        if rc < 0:
            return None
        return out[:rc]
    from .fallback import qlfc as _pyqlfc

    return _pyqlfc.coder_compress(data, coder)


def coder_decompress(data: np.ndarray, coder: int, features: int,
                     capacity: int | None = None,
                     out: np.ndarray | None = None):
    lib = _lib()
    if lib is not None:
        from .native import _u8p

        inp = _as_c(data)
        cap = capacity if capacity is not None else len(data) * 8 + (1 << 20)
        if out is None or len(out) < int(cap):
            out = np.empty(int(cap), dtype=np.uint8)
        rc = lib.tbsc_coder_decompress(_u8p(inp), _u8p(out), coder, _num_threads)
        if rc < 0:
            return rc
        return out[:rc]
    from .fallback import qlfc as _pyqlfc

    return _pyqlfc.coder_decompress(data, coder)
