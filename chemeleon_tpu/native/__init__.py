"""Native (C++) host-side chemistry kernels, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared) and is cached next to the
source; every entry point has a pure-Python fallback in chemeleon_tpu.chem,
so the framework works without a compiler.
"""

from chemeleon_tpu.native.lib import (  # noqa: F401
    available,
    distance_matrix,
    get_lib,
    min_pair_distance,
    niggli_reduce,
    structures_fit,
)
