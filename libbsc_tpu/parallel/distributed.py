"""Multi-host block farm over jax.distributed.

The reference is single-process (SURVEY §5: no distributed backend); this is
the TPU-native extension: each host owns a stripe of blocks (block i belongs
to host i % num_hosts), compresses its stripe locally (device sort via the
engine when available), and the archive is assembled from per-host part
files.  The bsc container format makes this safe by construction: every
block carries its absolute blockOffset (bsc.cpp:52-58), so blocks may be
produced and written in any order — decode seeks per block.

Usage (same invocation on every host):
    from libbsc_tpu.parallel import distributed as dist
    dist.init(coordinator="host0:1234", num_processes=N, process_id=i)
    dist.compress_file("in.bin", "out.bsc")   # host 0 writes the archive

Single-process (num_processes=1) degrades to the local block farm and is
what the unit tests exercise.
"""

from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor

from .. import api, constants as C

FILE_SIGN = b"bsc1"
BLOCK_HEADER_FMT = "<qbb"

_num_processes = 1
_process_id = 0


def init(coordinator: str | None = None, num_processes: int = 1,
         process_id: int = 0) -> None:
    """Initialize the process group (jax.distributed) and this module."""
    global _num_processes, _process_id
    _num_processes = num_processes
    _process_id = process_id
    if num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def _part_path(outp: str, pid: int) -> str:
    return f"{outp}.part{pid}"


def _barrier(tag: str) -> None:
    if _num_processes > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def compress_file(inp: str, outp: str, block_size: int = 25 * 1024 * 1024,
                  block_sorter: int = C.DEFAULT_BLOCKSORTER,
                  coder: int = C.DEFAULT_CODER,
                  features: int = C.DEFAULT_FEATURES,
                  workers: int | None = None) -> None:
    """Compress inp to outp with blocks striped across hosts.

    Every host must call this with the same arguments (shared filesystem).
    Host p compresses blocks {i : i % num_processes == p} into a part file;
    host 0 concatenates the parts behind the 'bsc1' header.  A barrier via
    the part files' existence orders the merge.
    """
    api.init(features)
    in_size = os.path.getsize(inp)
    n_blocks = (in_size + block_size - 1) // block_size if in_size else 0

    def jobs():
        with open(inp, "rb") as f:
            for i in range(n_blocks):
                if i % _num_processes != _process_id:
                    continue
                f.seek(i * block_size)
                yield i * block_size, f.read(block_size)

    def encode(args):
        offset, data = args
        blob = api.compress(data, block_sorter=block_sorter, coder=coder,
                            features=features)
        return offset, blob

    part = _part_path(outp, _process_id)

    # Remove stale part/marker files a previous crashed run may have left,
    # then synchronize so no host can observe another host's stale marker.
    for stale in (part, part + ".done"):
        if os.path.exists(stale):
            os.unlink(stale)
    _barrier("tbsc-compress-start")

    nworkers = workers or min(4, os.cpu_count() or 1)
    n_written = 0
    with open(part, "wb") as out:
        with ThreadPoolExecutor(max_workers=nworkers) as ex:
            for offset, blob in ex.map(encode, jobs()):
                out.write(struct.pack(BLOCK_HEADER_FMT, offset, 1,
                                      C.CONTEXTS_FOLLOWING))
                out.write(blob)
                n_written += 1
    done = part + ".done"
    with open(done, "w") as f:
        f.write(str(n_written))

    if _process_id == 0:
        import time

        # wait for every part (shared-FS barrier), then merge in pid order
        for p in range(_num_processes):
            while not os.path.exists(_part_path(outp, p) + ".done"):
                time.sleep(0.05)
        with open(outp, "wb") as out:
            out.write(FILE_SIGN)
            out.write(struct.pack("<i", n_blocks))
            for p in range(_num_processes):
                expected = sum(1 for i in range(n_blocks)
                               if i % _num_processes == p)
                with open(_part_path(outp, p) + ".done") as f:
                    got = int(f.read().strip() or "-1")
                if got != expected:
                    raise api.BscError(
                        C.DATA_CORRUPT,
                        f"part {p} has {got} blocks, expected {expected}")
                with open(_part_path(outp, p), "rb") as f:
                    out.write(f.read())
                os.unlink(_part_path(outp, p))
                os.unlink(_part_path(outp, p) + ".done")


def decompress_file(inp: str, outp: str,
                    features: int = C.DEFAULT_FEATURES,
                    workers: int | None = None) -> None:
    """Decompress a striped (or regular CLI) archive; host p decodes its
    stripe and seek-writes at each block's offset."""
    api.init(features)
    with open(inp, "rb") as f:
        if f.read(4) != FILE_SIGN:
            raise api.BscError(C.DATA_CORRUPT, "bad file sign")
        (n_blocks,) = struct.unpack("<i", f.read(4))
        blobs = []
        total_size = 0
        for i in range(n_blocks):
            offset, rs, ctx = struct.unpack(BLOCK_HEADER_FMT, f.read(10))
            header = f.read(C.HEADER_SIZE)
            block_size, data_size = api.block_info(header)
            payload = f.read(block_size - C.HEADER_SIZE)
            total_size = max(total_size, offset + data_size)
            if i % _num_processes == _process_id:
                blobs.append((offset, rs, ctx, header + payload))

    def decode(args):
        offset, rs, ctx, blob = args
        data = api.decompress(blob)
        if ctx == C.CONTEXTS_PRECEDING:
            data = data[::-1]
        if rs > 1:
            import numpy as np

            from ..filters import preprocessing

            arr = np.frombuffer(data, dtype=np.uint8).copy()
            preprocessing.reorder_reverse(arr, rs)
            data = arr.tobytes()
        return offset, data

    # Ensure the file exists and is sized exactly: a pre-existing longer file
    # must not leave stale trailing bytes after the decoded data.  Every host
    # computed total_size from all block headers, so truncating is safe even
    # with concurrent multi-host stripe writes.
    if not os.path.exists(outp):
        open(outp, "wb").close()
    nworkers = workers or min(4, os.cpu_count() or 1)
    with open(outp, "r+b") as out:
        out.truncate(total_size)
        with ThreadPoolExecutor(max_workers=nworkers) as ex:
            for offset, data in ex.map(decode, blobs):
                out.seek(offset)
                out.write(data)
