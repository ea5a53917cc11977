"""libbsc-tpu: a TPU-native block-sorting lossless data compression framework.

A from-scratch reimplementation of the capabilities of IlyaGrebnov/libbsc
(reference: /root/reference, v3.3.5) designed TPU-first:

- Block transforms (BWT, Sort Transform ST3..ST8, MTF/QLFC rank transform)
  run as JAX/XLA/Pallas programs over HBM-resident ``uint8`` blocks.
- The serial entropy-coding hot loops (QLFC + binary range coder) and LZP
  run in a native C++ host runtime (``native/``), mirroring the reference's
  CPU engine, with pure-NumPy fallbacks for portability.
- Independent blocks are sharded data-parallel over a ``jax.sharding.Mesh``.

Public API mirrors the reference C ABI (libbsc.h:95-152):
``init``, ``compress``, ``store``, ``block_info``, ``decompress``.
"""

from .constants import (
    LIBBSC_VERSION_STRING,
    NO_ERROR,
    BAD_PARAMETER,
    NOT_ENOUGH_MEMORY,
    NOT_COMPRESSIBLE,
    NOT_SUPPORTED,
    UNEXPECTED_EOB,
    DATA_CORRUPT,
    GPU_ERROR,
    GPU_NOT_SUPPORTED,
    GPU_NOT_ENOUGH_MEMORY,
    BLOCKSORTER_NONE,
    BLOCKSORTER_BWT,
    BLOCKSORTER_ST3,
    BLOCKSORTER_ST4,
    BLOCKSORTER_ST5,
    BLOCKSORTER_ST6,
    BLOCKSORTER_ST7,
    BLOCKSORTER_ST8,
    CODER_NONE,
    CODER_QLFC_STATIC,
    CODER_QLFC_ADAPTIVE,
    CODER_QLFC_FAST,
    FEATURE_NONE,
    FEATURE_FASTMODE,
    FEATURE_MULTITHREADING,
    FEATURE_LARGEPAGES,
    FEATURE_CUDA,
    DEFAULT_LZPHASHSIZE,
    DEFAULT_LZPMINLEN,
    DEFAULT_BLOCKSORTER,
    DEFAULT_CODER,
    DEFAULT_FEATURES,
    HEADER_SIZE,
)
from .api import (
    init,
    init_full,
    compress,
    compress_inplace,
    store,
    block_info,
    decompress,
    decompress_batch,
    decompress_inplace,
    BscError,
)

__version__ = LIBBSC_VERSION_STRING

__all__ = [
    "init",
    "init_full",
    "compress",
    "compress_inplace",
    "store",
    "block_info",
    "decompress",
    "decompress_batch",
    "decompress_inplace",
    "BscError",
    "__version__",
]
