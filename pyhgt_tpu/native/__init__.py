"""Native (C++) runtime components, bound via ctypes.

The reference ships no native code of its own and leans on torch-scatter /
PyG C++/CUDA for compute (SURVEY.md §2.10); its sampler is pure-Python dict
probing driven by an mp.Pool. Here the device compute is XLA/Pallas and the
host-side sampler hot path is this C++ core — called GIL-free from the
thread-pool prefetch loader.
"""

from pyhgt_tpu.native.build import load_library

__all__ = ["load_library"]
