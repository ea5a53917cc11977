"""Striped multi-host block farm, exercised single-process (the multi-host
path differs only in jax.distributed.initialize and the stripe filter)."""

import os

import numpy as np

from libbsc_tpu.parallel import distributed as dist
from libbsc_tpu import cli

from conftest import make_corpus


def test_striped_compress_decompress_roundtrip(rng, tmp_path):
    data = make_corpus(rng, 3 * 1024 * 1024 + 12345, "text")
    inp = tmp_path / "in.bin"
    arch = tmp_path / "out.bsc"
    restored = tmp_path / "restored.bin"
    inp.write_bytes(data)

    dist.init(num_processes=1, process_id=0)
    dist.compress_file(str(inp), str(arch), block_size=1024 * 1024)
    dist.decompress_file(str(arch), str(restored))
    assert restored.read_bytes() == data


def test_striped_archive_decodable_by_cli(rng, tmp_path):
    data = make_corpus(rng, 2 * 1024 * 1024, "text")
    inp = tmp_path / "in.bin"
    arch = tmp_path / "out.bsc"
    restored = tmp_path / "restored.bin"
    inp.write_bytes(data)

    dist.init(num_processes=1, process_id=0)
    dist.compress_file(str(inp), str(arch), block_size=1024 * 1024)

    p = cli.Params()
    cli.decompress_file(str(arch), str(restored), p, quiet=True)
    assert restored.read_bytes() == data


def test_stripe_filter_covers_all_blocks():
    # the stripe partition must be a disjoint cover for any host count
    for nproc in (1, 2, 3, 8):
        seen = set()
        for pid in range(nproc):
            seen |= {i for i in range(17) if i % nproc == pid}
        assert seen == set(range(17))


def test_two_process_striped_farm(rng, tmp_path):
    """Two real processes with a jax.distributed coordinator stripe one
    file; the regular CLI decodes the merged archive."""
    import subprocess
    import sys

    data = make_corpus(rng, 2 * 1024 * 1024 + 99, "text")
    inp = tmp_path / "in.bin"
    arch = tmp_path / "out.bsc"
    inp.write_bytes(data)

    script = (
        "import sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {str(tmp_path.parent.parent)!r})\n"
        "sys.path.insert(0, '.')\n"
        "from libbsc_tpu.parallel import distributed as dist\n"
        "pid = int(sys.argv[1])\n"
        "dist.init(coordinator='localhost:9917', num_processes=2, process_id=pid)\n"
        f"dist.compress_file({str(inp)!r}, {str(arch)!r}, block_size=512 * 1024)\n"
    )
    import os as _os

    env = dict(_os.environ)
    env["PYTHONPATH"] = _os.getcwd()
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)], env=env)
             for i in range(2)]
    for p in procs:
        assert p.wait(timeout=240) == 0

    restored = tmp_path / "restored.bin"
    cli.decompress_file(str(arch), str(restored), cli.Params(), quiet=True)
    assert restored.read_bytes() == data
