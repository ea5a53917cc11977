import os

# Sharding/ops tests run on a virtual 8-device CPU mesh; the real TPU is
# exercised by bench.py, not the unit suite.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force the CPU
# platform through the config API before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def make_corpus(rng, n, kind="text"):
    if kind == "text":
        words = [
            b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ",
            b"a lazy dog. ", b"pack my box with five dozen liquor jugs. ",
            b"compression ", b"transform ",
        ]
        out = bytearray()
        while len(out) < n:
            out += words[rng.integers(0, len(words))]
        return bytes(out[:n])
    if kind == "random":
        return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([rng.integers(0, 4)]) * int(rng.integers(1, 64))
        return bytes(out[:n])
    if kind == "zeros":
        return bytes(n)
    if kind == "periodic":
        return (b"abcd" * (n // 4 + 1))[:n]
    raise ValueError(kind)


@pytest.fixture(scope="session")
def oracle():
    """Reference-library oracle built in /tmp; skips tests if unavailable."""
    from tests.oracle import load_oracle

    o = load_oracle()
    if o is None:
        pytest.skip("reference oracle unavailable")
    return o
