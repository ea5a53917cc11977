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
