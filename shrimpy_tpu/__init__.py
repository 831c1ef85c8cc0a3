"""shrimpy-tpu — a TPU-native reconstruction engine for mantis datasets.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
czbiohub-sf/shrimPy (reference: /root/reference): the oblique-plane
light-sheet post-processing path (deskew -> phase reconstruction ->
registration -> Richardson-Lucy deconvolution) plus the DynaTrack
tracking semantics, the OME-Zarr in/out contract, and the demo/replay
mode — all built TPU-first.

Layer map (bottom -> top), mirroring the reference's layering
(reference SURVEY §1):

  L0  tensorstore (native C++ zarr v2/v3 + blosc-zstd)   <- acquire-zarr/MMCore
  L1  shrimpy_tpu.io    (NGFF stores, replay reader, streaming)
  L2  shrimpy_tpu.ops   (Pallas/XLA kernels: deskew, PCC, RL, phase, ...)
  L3  shrimpy_tpu.tracking (DynaTrack semantics as pure functions)
  L4  shrimpy_tpu.parallel (device mesh sharding over positions/time)
  L5  shrimpy_tpu.engine (replay acquisition engine, reconstruction driver)
  L6  shrimpy_tpu.cli   (``shrimpy-tpu`` command group)
"""

__version__ = "0.1.0"
