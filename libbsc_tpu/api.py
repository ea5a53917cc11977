"""Public compression API, mirroring the reference C ABI semantics
(libbsc.cpp:46-617): init / compress / store / block_info / decompress.

Pipeline per block:  [LZP] -> block sort (BWT or ST-k) -> QLFC entropy coder,
with a stored-block fallback for incompressible data.  The block transforms
run on TPU via JAX when a device pipeline is active (see ops/), with the
native host runtime (native/libtbsc.so) as the default engine; a pure-NumPy
fallback keeps everything importable without a compiler.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from . import constants as C
from .format.header import (
    pack_mode,
    parse_block_header,
    pack_block_header,
    make_stored_block,
    BlockHeader,
)
from .utils.adler32 import adler32
from .utils.trace import stage


class BscError(Exception):
    """Raised by the raising-flavor API wrappers."""

    def __init__(self, code: int, message: str = ""):
        super().__init__(message or f"libbsc-tpu error {code}")
        self.code = code


_ERROR_NAMES = {
    C.BAD_PARAMETER: "bad parameter",
    C.NOT_ENOUGH_MEMORY: "not enough memory",
    C.NOT_COMPRESSIBLE: "not compressible",
    C.NOT_SUPPORTED: "not supported",
    C.UNEXPECTED_EOB: "unexpected end of block",
    C.DATA_CORRUPT: "data corrupt",
}

_initialized = False
_features = C.DEFAULT_FEATURES


def init(features: int = C.DEFAULT_FEATURES) -> int:
    """Initialize the library (bsc_init).  Idempotent."""
    global _initialized, _features
    _features = features
    from . import engine

    engine.init(features)
    _initialized = True
    return C.NO_ERROR


def init_full(features: int = C.DEFAULT_FEATURES, malloc=None, zero_malloc=None,
              free=None) -> int:
    """bsc_init_full parity (libbsc.cpp:46): init with allocator hooks.

    The reference lets callers plug a custom allocator (platform.cpp:173).
    Host buffers here are numpy-managed and device buffers live in HBM under
    the XLA allocator, so the hooks are accepted for ABI parity and ignored.
    """
    del malloc, zero_malloc, free
    return init(features)


def _ensure_init():
    if not _initialized:
        init()


def store(data: bytes) -> bytes:
    """bsc_store: wrap data in a stored block."""
    return make_stored_block(data)


def block_info(block_header: bytes):
    """bsc_block_info: validate a 28-byte header.

    Returns (block_size, data_size) or raises BscError.
    """
    h = parse_block_header(block_header)
    if isinstance(h, int):
        raise BscError(h, _ERROR_NAMES.get(h, str(h)))
    return h.block_size, h.data_size


def compress(
    data: bytes,
    lzp_hash_size: int = C.DEFAULT_LZPHASHSIZE,
    lzp_min_len: int = C.DEFAULT_LZPMINLEN,
    block_sorter: int = C.DEFAULT_BLOCKSORTER,
    coder: int = C.DEFAULT_CODER,
    features: int | None = None,
) -> bytes:
    """bsc_compress: compress one block; falls back to a stored block when
    the data is incompressible.  Returns the full block (header + payload).
    """
    _ensure_init()
    from . import engine

    n = len(data)
    mode = pack_mode(block_sorter, coder, lzp_hash_size, lzp_min_len)
    if mode < 0:
        raise BscError(C.BAD_PARAMETER, "invalid mode configuration")
    if n > C.MAX_COMPRESS_SIZE:
        raise BscError(C.BAD_PARAMETER, "input too large")
    if n <= C.HEADER_SIZE:
        return store(data)

    features = _features if features is None else features
    adler_data = adler32(data)

    buf = np.frombuffer(data, dtype=np.uint8)

    # LZP preprocessing.  With TBSC_LZP_PROBE=1 (explicit opt-in; NOT implied
    # by FASTMODE — window probes can miss long-range redundancy and silently
    # cost ratio, which the reference never risks), large blocks first probe
    # three sample windows and skip LZP only when none of them compresses at
    # all.  The produced archive stays a valid bsc stream either way — only
    # the mode word records whether LZP ran.
    lzp_enabled = mode != (mode & 0xFF)
    if (lzp_enabled and os.environ.get("TBSC_LZP_PROBE") == "1"
            and n >= 4 * 1024 * 1024):
        win = 512 * 1024
        saved = 0
        for off in (0, (n - win) // 2, n - win):
            s = engine.lzp_compress(buf[off:off + win].copy(),
                                    lzp_hash_size, lzp_min_len, features)
            if s is not None:
                saved += win - len(s)
        if saved <= 0:
            lzp_enabled = False
            mode &= 0xFF
    # The transform working buffer comes from the per-thread pool: a fresh
    # 16 MB mapping per call never gets THP-promoted and costs the BWT/coder
    # ~10% in TLB misses on this host (the reference gets the same reuse
    # from glibc's malloc chunk cache inside bsc_compress).
    from .utils import bufpool

    if lzp_enabled:
        with stage("lzp_compress", n):
            lz = engine.lzp_compress(buf, lzp_hash_size, lzp_min_len, features,
                                     out=bufpool.get("compress_lz", n + 1024))
        if lz is None:
            mode &= 0xFF
            lz = bufpool.get("compress_lz", n)
            np.copyto(lz, buf)
    else:
        lz = bufpool.get("compress_lz", n)
        np.copyto(lz, buf)

    if len(lz) <= C.HEADER_SIZE:
        block_sorter = C.BLOCKSORTER_BWT
        mode = (mode & ~0x1F) | C.BLOCKSORTER_BWT

    # Fused device-resident route (BWT_WIDEAUX + QLFC_WIDE on a device):
    # sort, bit schedule and coder kernels share one HBM residency; only
    # the payload crosses back (engine.compress_block_device).
    payload = None
    wideaux_r = None
    if (block_sorter == C.BLOCKSORTER_BWT_WIDEAUX
            and coder == C.CODER_QLFC_WIDE
            and engine._device_sort(features)):
        from .ops import wide as _wide

        if _wide.pick_lanes_policy(len(lz)) == _wide.DEFAULT_LANES:
            with stage("compress_block_device", len(lz)):
                fused = engine.compress_block_device(lz, features)
            if fused is not None:
                index, num_indexes, indexes, wideaux_r, payload = fused

    # Block sort (per-stage route)
    if payload is None:
        if block_sorter == C.BLOCKSORTER_BWT:
            with stage("bwt_encode", len(lz)):
                index, num_indexes, indexes = engine.bwt_encode(lz, features)
        elif block_sorter == C.BLOCKSORTER_BWT_WIDEAUX:
            with stage("bwt_encode_wideaux", len(lz)):
                index, num_indexes, indexes, wideaux_r = \
                    engine.bwt_encode_wideaux(lz, features)
        elif C.BLOCKSORTER_ST3 <= block_sorter <= C.BLOCKSORTER_ST8:
            with stage(f"st{block_sorter}_encode", len(lz)):
                index = engine.st_encode(lz, block_sorter, features)
            num_indexes, indexes = 0, None
        else:
            raise BscError(C.BAD_PARAMETER)
        if index < 0:
            raise BscError(index, _ERROR_NAMES.get(index, str(index)))
        if n < 64 * 1024 and wideaux_r is None:
            num_indexes = 0

    # Entropy coding
    if payload is not None:
        pass  # fused route produced it
    elif coder == C.CODER_QLFC_WIDE:
        from .ops import wide

        payload = None
        lanes = wide.pick_lanes_policy(len(lz))
        if lanes == wide.DEFAULT_LANES and engine._device_sort(features):
            # on-chip lockstep coder (silent host fallback, like the
            # reference's GPU dispatch).  Only the 1024-lane THROUGHPUT
            # point runs on device — the kernel programs are 1024-wide;
            # other lane counts (e.g. the 128-lane ratio point,
            # TBSC_WIDE_LANES=128) take the native codec below.
            try:
                from .ops import wide_kernels

                with stage("coder_compress_wide_tpu", len(lz)):
                    payload = wide_kernels.device_encode(bytes(lz.tobytes()))
            except Exception:
                payload = None
        if payload is None:
            with stage("coder_compress_wide", len(lz)):
                payload = wide.wide_encode(bytes(lz.tobytes()),
                                           n_lanes=lanes)
    else:
        with stage("coder_compress", len(lz)):
            payload = engine.coder_compress(
                lz, coder, features,
                out=bufpool.get("compress_coder", len(lz) + 4096))
    tail_len = (5 if wideaux_r is not None else 1) + 4 * num_indexes
    if payload is None or len(payload) + tail_len >= n:
        return store(data)

    if wideaux_r is not None:
        # wide-aux tail: [i32 aux x K][u32 K][u8 255] — the sorter id gates
        # the layout, the 255 sentinel doubles as a sanity check
        import struct as _struct

        tail = np.asarray(indexes[:num_indexes], dtype="<i4").tobytes()
        tail += _struct.pack("<I", num_indexes) + b"\xff"
    else:
        tail = b""
        if num_indexes > 0:
            tail = np.asarray(indexes[:num_indexes], dtype="<i4").tobytes()
        tail += bytes([num_indexes])
    payload = bytes(payload) + tail

    header = pack_block_header(
        len(payload) + C.HEADER_SIZE, n, mode, index, adler_data, adler32(payload)
    )
    return header + payload


def _decode_to_sorter(block: bytes, expected_size: int | None = None,
                      scratch: bool = False):
    """Header/adler validation + entropy decode; stops before the sorter.

    Returns either the final bytes (stored blocks) or a dict with the
    entropy-decoded buffer and everything the sorter + postprocessing need.

    `scratch=True` decodes into the per-thread buffer pool (utils/bufpool)
    — valid ONLY for single-block decompress, where at most one decoded
    buffer per thread is live; decompress_batch holds many at once and
    must keep the default fresh allocations.
    """
    from . import engine

    h = parse_block_header(block)
    if isinstance(h, int):
        raise BscError(h, _ERROR_NAMES.get(h, str(h)))
    if len(block) < h.block_size:
        raise BscError(C.UNEXPECTED_EOB)
    if expected_size is not None and expected_size < h.data_size:
        raise BscError(C.UNEXPECTED_EOB)

    payload = bytes(block[C.HEADER_SIZE : h.block_size])
    if h.adler32_payload != adler32(payload):
        raise BscError(C.DATA_CORRUPT)

    if h.mode == 0:  # stored
        return payload

    features = _features
    lzp_hash_size = (h.mode >> 16) & 0xFF
    lzp_min_len = (h.mode >> 8) & 0xFF
    coder = (h.mode >> 5) & 0x7
    block_sorter = h.mode & 0x1F

    if block_sorter == C.BLOCKSORTER_BWT_WIDEAUX:
        import struct as _struct

        if len(payload) < 5 or payload[-1] != 0xFF:
            raise BscError(C.DATA_CORRUPT)
        (num_indexes,) = _struct.unpack_from("<I", payload, len(payload) - 5)
        if len(payload) < 5 + 4 * num_indexes:
            raise BscError(C.DATA_CORRUPT)
        indexes = np.frombuffer(
            payload[-5 - 4 * num_indexes : -5], dtype="<i4"
        ).astype(np.int32)
        payload = payload[: -5 - 4 * num_indexes]
    else:
        num_indexes = payload[-1]
        indexes = None
        if num_indexes > 0:
            indexes = np.frombuffer(
                payload[-1 - 4 * num_indexes : -1], dtype="<i4"
            ).astype(np.int32)

    if coder == C.CODER_QLFC_WIDE:
        from .ops import wide

        lz = None
        sorted_done = False
        if (block_sorter == C.BLOCKSORTER_BWT_WIDEAUX
                and engine._device_sort(features)):
            # fused device-resident decode: wide kernel output stays in
            # HBM and feeds the wideaux chase; one D2H of the final bytes
            import struct as _struct

            (tsize,) = _struct.unpack_from("<I", payload, 0)
            with stage("decompress_block_device", len(payload)):
                out = engine.decompress_block_device(
                    payload, h.index, indexes,
                    engine.wideaux_rate(int(tsize)), int(tsize), features)
            if out is not None:
                lz = np.ascontiguousarray(out, dtype=np.uint8)
                sorted_done = True
        if lz is None and engine._device_sort(features):
            try:
                from .ops import wide_kernels

                with stage("coder_decompress_wide_tpu", len(payload)):
                    out = wide_kernels.device_decode(payload)
                # .copy(): downstream stages (unbwt/unst/lzp) write in place;
                # frombuffer over bytes is read-only.
                lz = (np.frombuffer(out, dtype=np.uint8).copy()
                      if out is not None else None)
            except Exception:
                lz = None
        if lz is None:
            with stage("coder_decompress_wide", len(payload)):
                lz = np.frombuffer(
                    wide.wide_decode(payload), dtype=np.uint8
                ).copy()
    else:
        sorted_done = False
        out = None
        if scratch:
            from .utils import bufpool

            out = bufpool.get("decompress_lz", h.data_size + 4096)
        with stage("coder_decompress", len(payload)):
            lz = engine.coder_decompress(
                np.frombuffer(payload, dtype=np.uint8), coder, features,
                capacity=h.data_size + 4096, out=out,
            )
    if isinstance(lz, int):
        raise BscError(lz, _ERROR_NAMES.get(lz, str(lz)))

    if not (block_sorter in (C.BLOCKSORTER_BWT, C.BLOCKSORTER_BWT_WIDEAUX)
            or C.BLOCKSORTER_ST3 <= block_sorter <= C.BLOCKSORTER_ST8):
        raise BscError(C.DATA_CORRUPT)
    return {
        "h": h, "lz": lz, "sorter": block_sorter, "sorted": sorted_done,
        "num_indexes": num_indexes, "indexes": indexes,
        "lzp_hash_size": lzp_hash_size, "lzp_min_len": lzp_min_len,
        "scratch": scratch,
    }


def _finish_decode(st) -> bytes:
    """Postprocessing after the sorter: LZP + size/adler verification."""
    from . import engine

    h, lz = st["h"], st["lz"]
    if st["lzp_hash_size"] or st["lzp_min_len"]:
        obuf = None
        if st.get("scratch"):
            from .utils import bufpool

            obuf = bufpool.get("decompress_out", h.data_size + 4096)
        with stage("lzp_decompress", len(lz)):
            out = engine.lzp_decompress(
                lz, st["lzp_hash_size"], st["lzp_min_len"], _features,
                capacity=h.data_size + 4096, out=obuf)
    else:
        out = lz

    result = out.tobytes()
    if len(result) != h.data_size or h.adler32_data != adler32(result):
        raise BscError(C.DATA_CORRUPT)
    return result


def _run_sorter(st) -> None:
    from . import engine

    if st.get("sorted"):
        return  # fused device decode already inverted the sorter
    h, lz = st["h"], st["lz"]
    if st["sorter"] == C.BLOCKSORTER_BWT:
        with stage("bwt_decode", len(lz)):
            rc = engine.bwt_decode(lz, h.index, st["num_indexes"],
                                   st["indexes"], _features)
    elif st["sorter"] == C.BLOCKSORTER_BWT_WIDEAUX:
        with stage("bwt_decode_wideaux", len(lz)):
            rc = engine.bwt_decode_wideaux(
                lz, h.index, st["num_indexes"], st["indexes"],
                engine.wideaux_rate(len(lz)), _features)
    else:
        with stage(f"st{st['sorter']}_decode", len(lz)):
            rc = engine.st_decode(lz, st["sorter"], h.index, _features)
    if rc < 0:
        raise BscError(rc, _ERROR_NAMES.get(rc, str(rc)))


def decompress(block: bytes, expected_size: int | None = None) -> bytes:
    """bsc_decompress: decompress one block (header + payload)."""
    _ensure_init()
    st = _decode_to_sorter(block, expected_size, scratch=True)
    if isinstance(st, bytes):
        return st
    _run_sorter(st)
    return _finish_decode(st)


def decompress_batch(blocks: list) -> list:
    """Decompress several independent blocks, interleaving the inverse-ST
    walks of same-order ST blocks in one native loop (engine
    st_decode_batch) — a serial chase per block, but across blocks the
    chases run with full memory-level parallelism.  Order of results
    matches the input order; semantics are identical to mapping
    :func:`decompress` over the blocks."""
    _ensure_init()
    from . import engine

    states = [_decode_to_sorter(b) for b in blocks]
    st_groups: dict = {}
    for st in states:
        if isinstance(st, bytes):
            continue
        if C.BLOCKSORTER_ST3 <= st["sorter"] <= C.BLOCKSORTER_ST8:
            st_groups.setdefault(st["sorter"], []).append(st)
        else:
            _run_sorter(st)
    for k, group in st_groups.items():
        with stage(f"st{k}_decode_batch", sum(len(s["lz"]) for s in group)):
            rc = engine.st_decode_batch(
                [s["lz"] for s in group], k,
                [s["h"].index for s in group], _features)
        if rc < 0:
            raise BscError(rc, _ERROR_NAMES.get(rc, str(rc)))
    return [st if isinstance(st, bytes) else _finish_decode(st)
            for st in states]


def compress_inplace(buf: bytearray, **kwargs) -> int:
    """bsc_compress_inplace parity (libbsc.cpp:83): compress buf into itself.

    Returns the compressed block size; buf[:size] holds the block.  Python
    buffers manage their own capacity, so this simply rewrites the prefix.
    """
    blob = compress(bytes(buf), **kwargs)
    if len(blob) > len(buf):
        raise BscError(C.NOT_COMPRESSIBLE, "output larger than buffer")
    buf[: len(blob)] = blob
    return len(blob)


def decompress_inplace(buf: bytearray, block_size: int, data_size: int) -> int:
    """bsc_decompress_inplace parity (libbsc.cpp:420): decode block at the
    head of buf into buf.  Returns the decoded size."""
    data = decompress(bytes(buf[:block_size]), expected_size=data_size)
    if len(data) > len(buf):
        buf.extend(b"\0" * (len(data) - len(buf)))
    buf[: len(data)] = data
    return len(data)
