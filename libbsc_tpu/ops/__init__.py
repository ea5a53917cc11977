"""TPU-native (JAX/XLA/Pallas) compute ops for the block-transform stages.

These are the device-side equivalents of the reference's CUDA kernels
(st.cu, libcubwt.cu), redesigned for XLA: static shapes, `lax.sort`-based
radix machinery, `lax.while_loop` prefix doubling, and list-ranking
(pointer-doubling) for the inverse BWT instead of serial LF chases.
"""

from .st import st_encode  # noqa: F401
from .bwt import bwt_encode, bwt_decode  # noqa: F401
