"""DynaTrack-parity tracking: shift estimation, limits, journaling."""

from shrimpy_tpu.tracking.core import (  # noqa: F401
    ShiftJournal,
    Tracker,
    TrackerResult,
    apply_dampening,
    apply_limits,
    image_to_stage_shift,
    shift_px_to_um,
)
