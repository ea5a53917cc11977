"""Pure-Python/NumPy (and JAX-on-CPU) fallback engine.

Used when the native host runtime cannot be built (no C++ toolchain).  Block
transforms delegate to the device ops (which run fine on the CPU backend);
LZP and the QLFC coders are direct Python ports of the native runtime —
slow, but bit-exact with the stream format.
"""

from __future__ import annotations


def ensure_jax():
    """Import jax, degrading to the CPU platform when the configured
    platform (e.g. a stale JAX_PLATFORMS pointing at an absent plugin)
    cannot initialize."""
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        jax.devices()
    return jax
