"""bsc-compatible command-line archiver.

File format (bsc.cpp:46-59, 171-178):
    'bsc1' magic (4 bytes)
    int32 nBlocks
    per block: BSC_BLOCK_HEADER { int64 blockOffset; int8 recordSize;
               int8 sortingContexts } (packed, 10 bytes)
               followed by the compressed block (28-byte header + payload).

Usage mirrors the reference:  bsc-tpu e input output [options]
                              bsc-tpu d input output [options]
Options: -b<N> block size MB, -m<N> sorter (0=BWT, 3..8=ST, 9=BWT+wideaux), -e<N> coder
(1=static 2=adaptive 0=fast), -H<N> LZP hash, -M<N> LZP minlen, -p disable
LZP/filters, -s segmentation, -r record reordering, -c contexts (f/p/a),
-t/-T disable multithreading, -G GPU flag accepted for parity (no-op: this
build targets TPU).
"""

from __future__ import annotations

import os
import struct
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

from . import api, constants as C

FILE_SIGN = b"bsc1"
BLOCK_HEADER_FMT = "<qbb"  # blockOffset, recordSize, sortingContexts
BLOCK_HEADER_SIZE = 10


class Params:
    block_size = 25 * 1024 * 1024
    block_sorter = C.BLOCKSORTER_BWT
    coder = C.CODER_QLFC_STATIC
    sorting_contexts = C.CONTEXTS_FOLLOWING
    parallel = True
    multithreading = True
    fastmode = True
    segmentation = False
    reordering = False
    lzp = True
    lzp_hash_size = 15
    lzp_min_len = 128
    gpu = False  # -G: device (TPU) sort, like the reference's CUDA flag
    largepages = False  # -P parity; numpy manages host memory

    def features(self):
        f = C.FEATURE_NONE
        if self.fastmode:
            f |= C.FEATURE_FASTMODE
        if self.multithreading:
            f |= C.FEATURE_MULTITHREADING
        if self.gpu:
            f |= C.FEATURE_CUDA
        return f


def farm_policy(n_threads: int, n_blocks: int):
    """The reference's adaptive nested-parallelism policy (bsc.cpp:184-190):
    with parallel processing on, numThreads = omp_get_max_threads(); when
    threads <= blocks, per-block (inner) multithreading is DISABLED — each
    thread owns whole blocks; and the farm never runs more workers than
    blocks.  Returns (workers, inner_mt)."""
    inner_mt = n_threads > max(n_blocks, 0)
    workers = max(1, min(n_threads, max(n_blocks, 1)))
    return workers, inner_mt


def _apply_farm_policy(p: Params, n_blocks: int):
    """Params adjusted per `farm_policy` (a shallow copy when inner
    multithreading must be turned off; the original otherwise)."""
    if not p.parallel:
        return p, 1
    workers, inner_mt = farm_policy(os.cpu_count() or 1, n_blocks)
    if p.multithreading and not inner_mt:
        q = Params.__new__(Params)
        q.__dict__.update(p.__dict__)
        q.multithreading = False
        return q, workers
    return p, workers


def _compress_one(p: Params, data: bytes):
    """Apply filters + compress one block; returns (record_size, contexts, blob)."""
    from . import engine
    import numpy as np

    record_size, contexts = 1, C.CONTEXTS_FOLLOWING
    buf = bytearray(data)

    if p.reordering:
        from .filters import detectors, preprocessing

        rs = detectors.detect_recordsize(np.frombuffer(bytes(buf), dtype=np.uint8))
        if rs > 1:
            arr = np.frombuffer(bytes(buf), dtype=np.uint8).copy()
            preprocessing.reorder_forward(arr, rs)
            buf = bytearray(arr.tobytes())
            record_size = rs

    contexts = p.sorting_contexts
    if p.sorting_contexts == C.CONTEXTS_AUTODETECT:
        from .filters import detectors
        import numpy as np

        contexts = detectors.detect_contextsorder(
            np.frombuffer(bytes(buf), dtype=np.uint8)
        )
    if contexts == C.CONTEXTS_PRECEDING:
        buf = bytearray(bytes(buf)[::-1])

    hs = p.lzp_hash_size if p.lzp else 0
    ml = p.lzp_min_len if p.lzp else 0
    try:
        blob = api.compress(
            bytes(buf), hs, ml, p.block_sorter, p.coder, p.features()
        )
    except api.BscError as e:
        if e.code == C.NOT_COMPRESSIBLE:
            blob = api.store(data)
            record_size, contexts = 1, C.CONTEXTS_FOLLOWING
        else:
            raise
    return record_size, contexts, blob


def compress_file(inp: str, outp: str, p: Params, quiet: bool = False) -> None:
    t0 = time.time()
    in_size = os.path.getsize(inp)
    block_size = min(p.block_size, in_size) if in_size > 0 else p.block_size
    n_blocks = (in_size + block_size - 1) // block_size if block_size > 0 else 0
    p, farm_workers = _apply_farm_policy(p, n_blocks)
    api.init(p.features())

    with open(inp, "rb") as f, open(outp, "wb") as out:
        out.write(FILE_SIGN)
        out.write(struct.pack("<i", n_blocks))
        out_size = 8

        def read_blocks():
            if p.segmentation:
                # Mirrors bsc.cpp:234-277: detect_segments on a full block,
                # emit cached segments one by one; the LAST cached segment is
                # topped up with fresh data and re-segmented (so a segment
                # boundary can move once more data is visible).  Every byte
                # read is eventually yielded — nothing is dropped.
                from .filters import detectors
                import numpy as np

                pending = b""
                seg_queue: list = []
                offset = 0
                at_eof = False
                while True:
                    if len(seg_queue) > 1:
                        size = seg_queue.pop(0)
                        yield offset, pending[:size]
                        offset += size
                        pending = pending[size:]
                        continue
                    if not at_eof and len(pending) < block_size:
                        chunk = f.read(block_size - len(pending))
                        if not chunk:
                            at_eof = True
                        pending += chunk
                    if not pending:
                        break
                    if not (len(seg_queue) == 1 and seg_queue[0] == len(pending)):
                        seg_queue = list(detectors.detect_segments(
                            np.frombuffer(pending, dtype=np.uint8)))
                    size = min(seg_queue.pop(0), len(pending))
                    yield offset, pending[:size]
                    offset += size
                    pending = pending[size:]
            else:
                offset = 0
                while True:
                    data = f.read(block_size)
                    if not data:
                        break
                    yield offset, data
                    offset += len(data)

        def job(args):
            offset, data = args
            rs, ctx, blob = _compress_one(p, data)
            return offset, rs, ctx, blob

        done = 0
        write_lock = threading.Lock()

        def emit(offset, rs, ctx, blob):
            nonlocal out_size, done
            with write_lock:  # the reference's critical(output): blocks may
                # finish out of order — each carries its absolute offset
                if not quiet and in_size > 0:
                    print(f"\rCompressing {inp}({100 * done // max(in_size, 1):02d}%)",
                          end="", flush=True)
                out.write(struct.pack(BLOCK_HEADER_FMT, offset, rs, ctx))
                out.write(blob)
                out_size += BLOCK_HEADER_SIZE + len(blob)
                done = max(done, offset)

        if p.gpu and p.parallel:
            # heterogeneous farm: device-sort workers + a native worker pull
            # from one bounded queue (host coder overlaps device transfers).
            # -G accelerates the DEFAULT config unchanged, the reference's
            # CUDA semantics (bwt/bwt.cpp:178-181): the device workers route
            # BWT through the shape-bucketed device program (opt-in bit the
            # engine checks per call; the native worker's features lack
            # FEATURE_CUDA, so it stays on host SA-IS).
            import queue as _queue

            _bwtdev_prev = os.environ.get("TBSC_BWT_DEVICE")
            if p.block_sorter == C.BLOCKSORTER_BWT:
                os.environ["TBSC_BWT_DEVICE"] = "1"
            jobs: "_queue.Queue" = _queue.Queue(maxsize=8)
            SENTINEL = object()
            feats = [p.features() for _ in range(3)] + [p.features() & ~C.FEATURE_CUDA]
            errors = []

            def worker(feat):
                q = Params.__new__(Params)
                q.__dict__.update(p.__dict__)
                q.gpu = bool(feat & C.FEATURE_CUDA)
                while True:
                    item = jobs.get()
                    if item is SENTINEL:
                        jobs.put(SENTINEL)
                        return
                    offset, data = item
                    try:
                        rs, ctx, blob = _compress_one(q, data)
                        emit(offset, rs, ctx, blob)
                    except BaseException as e:  # propagate to main thread
                        errors.append(e)
                        # Drain so a blocked producer always unblocks even if
                        # every worker dies (the producer re-checks `errors`
                        # between timed puts).
                        try:
                            while True:
                                it = jobs.get_nowait()
                                if it is SENTINEL:
                                    jobs.put(SENTINEL)
                                    break
                        except _queue.Empty:
                            pass
                        return

            try:
                with ThreadPoolExecutor(max_workers=len(feats)) as ex:
                    futs = [ex.submit(worker, f) for f in feats]
                    for offset, data in read_blocks():
                        if errors:
                            break
                        while not errors:
                            try:
                                jobs.put((offset, data), timeout=0.2)
                                break
                            except _queue.Full:
                                continue
                    jobs.put(SENTINEL)
                    for f in futs:
                        f.result()
            finally:
                if _bwtdev_prev is None:
                    os.environ.pop("TBSC_BWT_DEVICE", None)
                else:
                    os.environ["TBSC_BWT_DEVICE"] = _bwtdev_prev
            if errors:
                raise errors[0]
        else:
            with ThreadPoolExecutor(max_workers=farm_workers) as ex:
                for offset, rs, ctx, blob in ex.map(job, read_blocks()):
                    emit(offset, rs, ctx, blob)
        if not quiet:
            print("\r", end="")

    dt = time.time() - t0
    if not quiet:
        mbps = in_size / 1e6 / dt if dt > 0 else 0.0
        print(f"{inp} encoded {in_size} => {out_size} in {dt:.3f}s ({mbps:.2f} MB/s)")


def decompress_file(inp: str, outp: str, p: Params, quiet: bool = False) -> None:
    t0 = time.time()
    in_size = os.path.getsize(inp)

    with open(inp, "rb") as f, open(outp, "wb") as out:
        sign = f.read(4)
        if sign != FILE_SIGN:
            print("This is not a valid bsc archive!", file=sys.stderr)
            sys.exit(1)
        (n_blocks,) = struct.unpack("<i", f.read(4))
        p, farm_workers = _apply_farm_policy(p, n_blocks)
        api.init(p.features())

        def read_jobs():
            # Reads until EOF like the reference (bsc.cpp:507-520): nBlocks is
            # advisory (segmentation may change the actual block count).
            while True:
                bh = f.read(BLOCK_HEADER_SIZE)
                if len(bh) == 0:
                    break
                if len(bh) < BLOCK_HEADER_SIZE:
                    print("Unexpected end of file!", file=sys.stderr)
                    sys.exit(1)
                offset, rs, ctx = struct.unpack(BLOCK_HEADER_FMT, bh)
                if rs < 1 or ctx not in (C.CONTEXTS_FOLLOWING,
                                         C.CONTEXTS_PRECEDING):
                    print("This is not bsc archive or invalid compression "
                          "method!", file=sys.stderr)
                    sys.exit(2)
                header = f.read(C.HEADER_SIZE)
                block_size, data_size = api.block_info(header)
                payload = f.read(block_size - C.HEADER_SIZE)
                yield offset, rs, ctx, header + payload

        def job(args):
            offset, rs, ctx, blob = args
            data = api.decompress(blob)
            if ctx == C.CONTEXTS_PRECEDING:
                data = data[::-1]
            if rs > 1:
                import numpy as np
                from .filters import preprocessing

                arr = np.frombuffer(data, dtype=np.uint8).copy()
                preprocessing.reorder_reverse(arr, rs)
                data = arr.tobytes()
            return offset, data

        total = 0
        with ThreadPoolExecutor(max_workers=farm_workers) as ex:
            for b, (offset, data) in enumerate(ex.map(job, read_jobs())):
                if not quiet and n_blocks > 0:
                    print(f"\rDecompressing {inp}({100 * b // n_blocks:02d}%)",
                          end="", flush=True)
                out.seek(offset)
                out.write(data)
                total += len(data)
        if not quiet:
            print("\r", end="")

    dt = time.time() - t0
    if not quiet:
        mbps = total / 1e6 / dt if dt > 0 else 0.0
        print(f"{inp} decoded {in_size} => {total} in {dt:.3f}s ({mbps:.2f} MB/s)")


USAGE = """This is a TPU-native block sorting data compressor, format-compatible
with bsc. Usage: bsc-tpu <e|d> inputfile outputfile <options>

Switches:
  -b<size> Block size in megabytes, default: -b25
  -m<algo> Block sorting algorithm, default: -m0 (BWT); -m3..-m8 = ST3..ST8;
           -m9 = BWT with wide aux indexes (format extension, device unbwt)
  -c<ctx>  Contexts: -cf following (default), -cp preceding, -ca autodetect
  -e<coder> Coder: -e1 static QLFC (default), -e2 adaptive QLFC, -e0 fast QLFC,
           -e4 wide-lane QLFC (TPU lockstep profile; not bsc-decodable)
  -H<size> LZP hash size, default: -H15 (0 disables LZP)
  -M<len>  LZP minimum match length, default: -M128
  -p       Disable all preprocessing techniques
  -s       Enable segmentation
  -r       Enable record reordering
  -l       Enable LZP preprocessing (default: enabled; use after -p)
  -t       Disable parallel blocks processing
  -T       Disable multi-core systems support
  -G       Enable accelerator (TPU) block sorting
  -P       Enable large RAM pages (accepted for parity)

Options may be combined into one, like -b128p -m5e1
"""


def parse_args(argv):
    # Decompression-only profile (the reference's BSC_DECOMPRESSION_ONLY
    # compile flag, bsc.cpp:687-695,891): with TBSC_DECOMPRESSION_ONLY set,
    # the `e` command is not offered — it falls through to usage exactly
    # like the reference's #ifdef'd-out case label.
    modes = ("d",) if os.environ.get("TBSC_DECOMPRESSION_ONLY") else ("e", "d")
    if len(argv) < 4 or argv[1] not in modes:
        print(USAGE)
        sys.exit(0)
    p = Params()

    def bad(a):
        print(f"Unknown option: {a}", file=sys.stderr)
        sys.exit(1)

    for a in argv[4:]:
        if not a.startswith("-") or len(a) < 2:
            bad(a)
        # switches combine into one argument, e.g. -b128p -m5e1 (bsc.cpp:868)
        body = a[1:]
        i = 0
        while i < len(body):
            ch = body[i]
            i += 1
            if ch in "bmeHM":  # numeric-valued switches
                j = i
                while j < len(body) and body[j].isdigit():
                    j += 1
                if j == i:
                    bad(a)
                v = int(body[i:j])
                i = j
                if ch == "b":
                    if not 1 <= v <= 2047:
                        bad(a)
                    p.block_size = v * 1024 * 1024
                elif ch == "m":
                    if v != 0 and v != 9 and not 3 <= v <= 8:
                        bad(a)
                    p.block_sorter = (
                        C.BLOCKSORTER_BWT if v == 0
                        else C.BLOCKSORTER_BWT_WIDEAUX if v == 9 else v)
                elif ch == "e":
                    coders = {0: C.CODER_QLFC_FAST, 1: C.CODER_QLFC_STATIC,
                              2: C.CODER_QLFC_ADAPTIVE,
                              4: C.CODER_QLFC_WIDE}
                    if v not in coders:
                        bad(a)
                    p.coder = coders[v]
                elif ch == "H":
                    if not 10 <= v <= 28:
                        bad(a)
                    p.lzp_hash_size = v
                elif ch == "M":
                    if not 4 <= v <= 255:
                        bad(a)
                    p.lzp_min_len = v
            elif ch == "c":
                ctx = body[i:i + 1]
                i += 1
                try:
                    p.sorting_contexts = {"f": C.CONTEXTS_FOLLOWING,
                                          "p": C.CONTEXTS_PRECEDING,
                                          "a": C.CONTEXTS_AUTODETECT}[ctx]
                except KeyError:
                    bad(a)
            elif ch == "p":
                p.lzp = False
                p.segmentation = False
                p.reordering = False
                p.sorting_contexts = C.CONTEXTS_FOLLOWING
            elif ch == "s":
                p.segmentation = True
            elif ch == "r":
                p.reordering = True
            elif ch == "l":
                p.lzp = True
            elif ch == "t":
                p.parallel = False
            elif ch == "T":
                p.parallel = False
                p.multithreading = False
            elif ch == "G":
                p.gpu = True  # device sort: TPU here (reference: CUDA)
            elif ch == "P":
                p.largepages = True  # accepted for parity (host mem is numpy)
            elif ch == "f":
                p.fastmode = True
            else:
                bad(a)
    return p


_ERROR_MESSAGES = {
    C.NOT_ENOUGH_MEMORY: "Not enough memory!",
    C.DATA_CORRUPT: "The compressed data is corrupted!",
    C.NOT_SUPPORTED: "Specified compression method is not supported on this platform!",
    C.UNEXPECTED_EOB: "Unexpected end of block!",
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv
    p = parse_args(argv)
    mode, inp, outp = argv[1], argv[2], argv[3]
    try:
        if mode == "e":
            compress_file(inp, outp, p)
        else:
            decompress_file(inp, outp, p)
    except api.BscError as e:
        print(_ERROR_MESSAGES.get(e.code, "Internal program error, please contact the author!"),
              file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
