"""Live visualization: shared-memory frame ring + feeder + monitor."""

from shrimpy_tpu.viewer.feeder import ViewerFeeder  # noqa: F401
from shrimpy_tpu.viewer.ring import FrameRing  # noqa: F401
