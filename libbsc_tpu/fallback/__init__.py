"""Pure-Python/NumPy (and JAX-on-CPU) fallback engine.

Used when the native host runtime cannot be built (no C++ toolchain).  Block
transforms delegate to the device ops (which run fine on the CPU backend);
LZP and the QLFC coders are direct Python ports of the native runtime —
slow, but bit-exact with the stream format.
"""
