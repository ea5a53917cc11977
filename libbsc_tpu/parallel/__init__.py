"""Multi-chip scale-out: mesh construction and the sharded block pipeline.

The reference's inter-block OpenMP farm (bsc.cpp:196-423) maps to data
parallelism over a device mesh; its intra-block sub-block splitting
(lzp.cpp:44-51, coder.cpp:52-59) maps to a sequence-parallel axis.
"""

from .pipeline import (  # noqa: F401
    make_mesh,
    make_sharded_st_step,
    make_transform_step,
    batch_st_encode,
    batch_bwt_encode,
)
