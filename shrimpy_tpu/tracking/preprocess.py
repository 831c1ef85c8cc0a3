"""Tracking preprocessor: deskew -> phase -> virtual staining.

The reference's ``_LabelfreePreprocessor`` builds a
``(np.ndarray ZYX) -> dict[str, tensor]`` pipeline from the DynaTrack
config (reference ``shrimpy/dynatrack/preprocessing.py:124-433``) with
derived pixel sizes injected by the manager (``manager.py:242-262``).
Same contract here over our first-party ops: the returned dict maps
channel names (``"deskewed"``, ``"phase"``, ``"vs_<target>"``) to ZYX
arrays, and the tracker consumes ``config.tracking_channel`` from it.
The phase transfer function is computed once on host and cached
(``preprocessing.py:188-218`` split).
"""

from __future__ import annotations

import logging

import numpy as np

from shrimpy_tpu.config.schemas import DynaTrackConfig
from shrimpy_tpu.utils.timing import StageTimer

logger = logging.getLogger(__name__)


class Preprocessor:
    """Configured deskew/phase/VS chain over raw ZYX stacks."""

    def __init__(self, config: DynaTrackConfig):
        self.config = config
        self.steps = tuple(config.preprocessing or ())
        # A listed step ALWAYS runs: a missing settings block means the
        # defaults (with injected derived parameters), never a silent
        # skip that would feed unprocessed data to later stages.
        self.deskew = None
        if "deskew" in self.steps:
            from shrimpy_tpu.config.schemas import DeskewSettings

            self.deskew = config.deskew_settings() or DeskewSettings()
        self.phase = None
        if "phase" in self.steps:
            from shrimpy_tpu.config.schemas import PhaseSettings

            self.phase = config.phase_settings() or PhaseSettings()
        self.stainer = None
        if "vs" in self.steps:
            from shrimpy_tpu.models.vsunet import VirtualStainer, VSModelSettings

            vs_cfg = VSModelSettings(**(config.virtual_staining or {}))
            self.stainer = VirtualStainer(vs_cfg)
        self.timer = StageTimer()

    def __call__(
        self, raw_zyx: np.ndarray, *, run_vs: bool = True
    ) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {"raw": np.asarray(raw_zyx, np.float32)}
        vol = out["raw"]
        if self.deskew is not None:
            from shrimpy_tpu.ops.deskew import deskew_volume

            with self.timer.stage("deskew"):
                vol = np.asarray(deskew_volume(vol, self.deskew))
            out["deskewed"] = vol
        if self.phase is not None:
            from shrimpy_tpu.ops.phase import reconstruct_phase

            with self.timer.stage("phase"):
                vol = np.asarray(reconstruct_phase(vol, self.phase))
            out["phase"] = vol
        if self.stainer is not None and run_vs:
            with self.timer.stage("vs"):
                vol_c = _pad_for_unet(vol, self.stainer.pad_exp)
                preds = self.stainer.predict(vol_c)
            for name, pred in preds.items():
                out[name] = np.asarray(pred)[..., : vol.shape[1], : vol.shape[2]]
        return out

    def tracking_scale_zyx(
        self,
        raw_shape_zyx: tuple[int, int, int],
        raw_scale_zyx: tuple[float, float, float],
    ) -> tuple[float, float, float]:
        """Voxel scale (um) of the stack the tracker consumes.

        Deskew CHANGES the grid — its output voxel is
        ``(n_avg * px, px, px)`` (unit-pixel z grid), not the raw
        ``(scan_step, px, px)`` — so px->um conversion and the um
        deadband/clip limits must use the deskewed scale (the reference
        injects derived pixel sizes post-deskew, ``manager.py:242-262``).
        Phase and VS preserve their input grid.
        """
        if self.deskew is not None:
            from shrimpy_tpu.ops.deskew import get_deskewed_shape

            _, voxel = get_deskewed_shape(
                tuple(raw_shape_zyx), self.deskew,
                pixel_size_um=self.deskew.pixel_size_um
                or float(raw_scale_zyx[1]),
            )
            return voxel
        return tuple(float(v) for v in raw_scale_zyx)

    def tracking_stack(self, raw_zyx: np.ndarray) -> np.ndarray:
        """The stack the tracker consumes (``config.tracking_channel``).

        Stages downstream of the resolved product are skipped: with
        ``preprocessing: [deskew, phase, vs]`` and a non-VS tracking
        channel, running the UNet per tracked timepoint would burn a
        full inference whose output nobody reads.
        """
        channel = self.config.tracking_channel
        needs_vs = self.stainer is not None and channel not in (
            "phase", "deskewed", "raw"
        )
        products = self(raw_zyx, run_vs=needs_vs)
        if channel in products:
            return products[channel]
        # The input channel name maps to the most-processed product
        # before VS (reference channel resolution, manager.py:115-168).
        for key in ("phase", "deskewed", "raw"):
            if key in products:
                return products[key]
        raise KeyError(channel)


def _pad_for_unet(vol: np.ndarray, depth: int) -> np.ndarray:
    """Pad YX up to multiples of 2**depth (cropped back after)."""
    m = 2**depth
    ny, nx = vol.shape[1:]
    py = (-ny) % m
    px = (-nx) % m
    if py or px:
        vol = np.pad(vol, ((0, 0), (0, py), (0, px)), mode="reflect")
    return vol
