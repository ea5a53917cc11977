"""BWT fallback: delegates to the JAX ops (CPU backend works everywhere).

Engine contract (see engine.bwt_encode/bwt_decode): in-place mutation of the
numpy buffer, libsais stream convention for index/aux (native/bwt.cc:190).
"""

from __future__ import annotations

import numpy as np


def bwt_encode(data: np.ndarray):
    from . import ensure_jax

    jnp = ensure_jax().numpy
    from ..ops.bwt import bwt_encode as _enc

    n = len(data)
    if n <= 1:
        return n, 0, None
    U, primary, aux = _enc(jnp.asarray(data))
    data[:] = np.asarray(U)
    aux = np.asarray(aux, dtype=np.int32)
    return int(primary), int(aux.shape[0]), aux


def bwt_decode(data: np.ndarray, index: int, num_indexes: int, indexes):
    from . import ensure_jax

    jnp = ensure_jax().numpy
    from ..ops.bwt import bwt_decode as _dec

    n = len(data)
    if n <= 1:
        return 0
    if index <= 0 or index > n:
        return -1
    out = _dec(jnp.asarray(data), index)
    data[:] = np.asarray(out)
    return 0
