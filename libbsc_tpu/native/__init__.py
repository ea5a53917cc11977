"""ctypes loader for the tbsc native host runtime (libtbsc.so).

Builds the shared library on first use if missing (g++ is part of the
supported toolchain).  All entry points release the GIL during execution, so
multiple blocks can be processed concurrently from Python threads on top of
the library's own OpenMP sub-block parallelism.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libtbsc.so"
_lock = threading.Lock()
_lib = None

# Keep table arrays alive for the process lifetime.
_tables_keepalive = []


def _build() -> None:
    subprocess.run(
        ["make", "-s", "-C", str(_DIR)],
        check=True,
        capture_output=True,
        text=True,
    )


def _sig(fn, restype, argtypes):
    fn.restype = restype
    fn.argtypes = argtypes
    return fn


def load():
    """Load (building if necessary) and initialize the native library.

    Returns the ctypes CDLL, or raises OSError/CalledProcessError.
    """
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() or _needs_rebuild():
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        c_int = ctypes.c_int

        _sig(lib.tbsc_set_tables, c_int, [i16p, i16p, u8p, u8p])
        _sig(lib.tbsc_qlfc_encode_block, c_int, [u8p, u8p, c_int, c_int, c_int])
        _sig(lib.tbsc_qlfc_decode_block, c_int, [u8p, u8p, c_int])
        _sig(lib.tbsc_qlfc_release_scratch, None, [])
        _sig(lib.tbsc_coder_compress, c_int, [u8p, u8p, c_int, c_int, c_int])
        _sig(lib.tbsc_coder_decompress, c_int, [u8p, u8p, c_int, c_int])
        _sig(lib.tbsc_lzp_compress, c_int, [u8p, u8p, c_int, c_int, c_int, c_int])
        _sig(lib.tbsc_lzp_decompress, c_int, [u8p, u8p, c_int, c_int, c_int, c_int])
        _sig(lib.tbsc_bwt_encode, c_int, [u8p, c_int, u8p, i32p, c_int])
        _sig(lib.tbsc_bwt_decode, c_int, [u8p, c_int, c_int, c_int, i32p, c_int])
        _sig(lib.tbsc_st_encode, c_int, [u8p, c_int, c_int, c_int])
        _sig(lib.tbsc_st_decode, c_int, [u8p, c_int, c_int, c_int, c_int])
        _sig(lib.tbsc_wide_encode, c_int,
             [u8p, ctypes.c_int64, u8p, ctypes.c_int64, c_int, i32p, c_int])
        _sig(lib.tbsc_wide_balanced_sizes, c_int,
             [u8p, ctypes.c_int64, c_int, i32p])
        _sig(lib.tbsc_wide_decode, c_int,
             [u8p, ctypes.c_int64, u8p, ctypes.c_int64])
        _sig(lib.tbsc_wide_ranks, c_int,
             [u8p, ctypes.c_int64, c_int, c_int, i32p, i32p, i32p])
        _sig(lib.tbsc_wide_schedule, c_int,
             [u8p, ctypes.c_int64, c_int, c_int, u8p, u8p, i32p])
        _sig(lib.tbsc_wide_schedule_packed, c_int,
             [u8p, ctypes.c_int64, c_int, c_int, u8p, i32p])
        _sig(lib.tbsc_adler32, ctypes.c_uint32,
             [u8p, ctypes.c_int64, ctypes.c_uint32])
        _sig(lib.tbsc_st_decode_batch, c_int,
             [ctypes.POINTER(ctypes.c_void_p), i32p, c_int, i32p, c_int])
        _sig(lib.tbsc_wide_set_priors, c_int, [i16p])
        _sig(lib.tbsc_bwt_encode_rate, c_int, [u8p, c_int, c_int, i32p])
        _sig(lib.tbsc_bwt_decode_rate, c_int,
             [u8p, c_int, c_int, c_int, c_int, i32p])

        # Install format tables.
        tdir = _DIR.parent / "coder" / "tables"
        stretch = np.load(tdir / "stretch.npy")
        squash = np.load(tdir / "squash.npy")
        rank_state = np.load(tdir / "rank_state.npy")
        run_state = np.load(tdir / "run_state.npy")
        _tables_keepalive.extend([stretch, squash, rank_state, run_state])
        wide_priors = np.load(tdir / "wide_priors_v2.npy").astype(np.int16)
        _tables_keepalive.append(wide_priors)
        lib.tbsc_wide_set_priors(wide_priors.ctypes.data_as(i16p))
        rc = lib.tbsc_set_tables(
            stretch.ctypes.data_as(i16p),
            squash.ctypes.data_as(i16p),
            rank_state.ctypes.data_as(u8p),
            run_state.ctypes.data_as(u8p),
        )
        if rc != 0:
            raise OSError(f"tbsc_set_tables failed: {rc}")
        _lib = lib
        return _lib


def _needs_rebuild() -> bool:
    try:
        lib_mtime = _LIB_PATH.stat().st_mtime
        for src in _DIR.glob("*.cc"):
            if src.stat().st_mtime > lib_mtime:
                return True
        for src in _DIR.glob("*.h"):
            if src.stat().st_mtime > lib_mtime:
                return True
    except OSError:
        return True
    return False


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
