"""First-party native (C) runtime helpers.

The compute path is jax/XLA/Pallas; this package holds the few
runtime pieces where the reference relies on native code and Python
cannot give the required semantics — currently the seqlock
shared-memory frame ring (``ring.c``, the Micro-Manager circular
buffer's role). Sources compile lazily via :mod:`.build`; everything
degrades to pure-Python fallbacks without a compiler.
"""

from shrimpy_tpu.native.build import load_ring

__all__ = ["load_ring"]
