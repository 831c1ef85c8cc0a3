"""Acquisition engine (demo/replay mode): event loop, autofocus, output."""

from shrimpy_tpu.engine.control import AbortRun, RunControl  # noqa: F401
from shrimpy_tpu.engine.dual import (  # noqa: F401
    DualArmAcquisition,
    DualReplayConfig,
)
from shrimpy_tpu.engine.engine import AcquisitionEngine, SkipEvent  # noqa: F401
from shrimpy_tpu.engine.plan import AcquisitionPlan  # noqa: F401
from shrimpy_tpu.engine.replay import (  # noqa: F401
    AcqEvent,
    ReplayCamera,
    ReplaySource,
    SequencedBurst,
)
