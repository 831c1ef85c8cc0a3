"""Tracking core: shift computation, limits/dampening, stage mapping, journal.

Functional re-implementation of the reference's ``DynaTrackUpdater``
(reference ``shrimpy/dynatrack/tracking.py:822-1313``): the five
tracking methods and their dispatch (``:1244-1281``) plus the archived
engine's ``template_matching`` as a sixth (reference archive
``autotracker.py:162-184``), px->um scaling
(``:1283-1291``), deadband/clip limits (``:822-868``), dampening
(``:1297-1299``), the image->stage 3x3 matrix transform
(``:1172-1181``), baseline-relative correction (position minus shift,
``:1183-1198``), the reference store / re-anchor policy
(``:1115-1137``), and the CSV shift journal (``:875-914``).

Everything numeric is a pure function over arrays (trivially testable —
the TPU-native upgrade of the reference's stateful torch class); the
:class:`Tracker` wrapper only holds the reference stack and counters.
"""

from __future__ import annotations

import csv
import logging
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from shrimpy_tpu.config.schemas import DynaTrackConfig, ShiftSettings
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.features import center_of_mass, otsu_component_mask
from shrimpy_tpu.ops.match import template_match_shift
from shrimpy_tpu.ops.pcc import phase_cross_correlation

logger = logging.getLogger(__name__)

AXES = ("z", "y", "x")


# ---------------------------------------------------------------------------
# Pure shift post-processing (reference tracking.py:822-868, 1283-1306)
# ---------------------------------------------------------------------------


def shift_px_to_um(
    shift_px_zyx: np.ndarray, scale_zyx_um: tuple[float, float, float]
) -> np.ndarray:
    """Pixel shift -> microns via the per-axis voxel size
    (reference ``tracking.py:1283-1291``)."""
    return np.asarray(shift_px_zyx, dtype=np.float64) * np.asarray(scale_zyx_um)


def apply_limits(
    shift_um_zyx: np.ndarray, limits: dict[str, tuple[float, float]] | None
) -> np.ndarray:
    """Deadband + clip per axis (reference ``tracking.py:822-868``).

    ``limits[axis] = (lo, hi)`` in microns: |shift| < lo -> 0 (deadband,
    ignore jitter); |shift| > hi -> clip to hi preserving sign.
    """
    out = np.asarray(shift_um_zyx, dtype=np.float64).copy()
    if not limits:
        return out
    for i, axis in enumerate(AXES):
        if axis not in limits:
            continue
        lo, hi = limits[axis]
        mag = abs(out[i])
        if mag < lo:
            out[i] = 0.0
        elif mag > hi:
            out[i] = np.sign(out[i]) * hi
    return out


def apply_dampening(
    shift_um_zyx: np.ndarray, dampening: tuple[float, float, float] | None
) -> np.ndarray:
    """Multiply the (z, y, x) shift by per-axis gains
    (reference ``tracking.py:1297-1299``)."""
    if dampening is None:
        return np.asarray(shift_um_zyx, dtype=np.float64)
    return np.asarray(shift_um_zyx, dtype=np.float64) * np.asarray(dampening)


def image_to_stage_shift(
    shift_um_zyx: np.ndarray, matrix_xyz: np.ndarray | list | None
) -> np.ndarray:
    """Map an image-frame shift to stage axes (XYZ order).

    The reference's fixed 3x3 ``image_to_stage_matrix_xyz``
    (``tracking.py:1172-1181``): input/output are XYZ vectors, so the
    ZYX image shift is reversed first. Identity when no matrix is set.
    """
    shift_xyz = np.asarray(shift_um_zyx, dtype=np.float64)[::-1]
    if matrix_xyz is None:
        return shift_xyz
    return np.asarray(matrix_xyz, dtype=np.float64) @ shift_xyz


def corrected_position(
    baseline_xyz: np.ndarray, stage_shift_xyz: np.ndarray
) -> np.ndarray:
    """Baseline-relative correction: commanded position minus measured
    drift (reference ``tracking.py:1183-1198``)."""
    return np.asarray(baseline_xyz, dtype=np.float64) - np.asarray(stage_shift_xyz)


def process_shift(
    shift_px_zyx: np.ndarray,
    *,
    scale_zyx_um: tuple[float, float, float],
    settings: ShiftSettings,
    matrix_xyz: np.ndarray | list | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full post-processing chain: px -> um -> limits -> dampening -> stage.

    Returns ``(shift_um_zyx, stage_shift_xyz)``.
    """
    um = shift_px_to_um(shift_px_zyx, scale_zyx_um)
    um = apply_limits(um, settings.limits)
    um = apply_dampening(um, settings.dampening)
    return um, image_to_stage_shift(um, matrix_xyz)


# ---------------------------------------------------------------------------
# Shift journal (reference tracking.py:875-914)
# ---------------------------------------------------------------------------

JOURNAL_FIELDS = (
    "wall_time",
    "timepoint",
    "position",
    "method",
    "shift_z_px",
    "shift_y_px",
    "shift_x_px",
    "shift_z_um",
    "shift_y_um",
    "shift_x_um",
    "stage_dx_um",
    "stage_dy_um",
    "stage_dz_um",
    "reanchored",
)


class ShiftJournal:
    """Append-only CSV journal of every computed shift.

    Written immediately after each computation so a crash loses at most
    one row — the reference's ``dynatrack_log.csv`` contract
    (``tracking.py:875-914,1208-1216``, SURVEY.md §5.4).
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if not self.path.exists():
            with open(self.path, "w", newline="") as f:
                csv.writer(f).writerow(JOURNAL_FIELDS)

    def append(
        self,
        *,
        timepoint: int,
        position: int | str,
        method: str,
        shift_px_zyx,
        shift_um_zyx,
        stage_shift_xyz,
        reanchored: bool,
    ) -> None:
        row = [
            f"{time.time():.3f}",
            timepoint,
            position,
            method,
            *(f"{v:.4f}" for v in shift_px_zyx),
            *(f"{v:.4f}" for v in shift_um_zyx),
            *(f"{v:.4f}" for v in stage_shift_xyz),
            int(reanchored),
        ]
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(row)

    def rows(self) -> list[dict[str, str]]:
        with open(self.path, newline="") as f:
            return list(csv.DictReader(f))


# ---------------------------------------------------------------------------
# Tracker (reference DynaTrackUpdater, tracking.py:922-1313)
# ---------------------------------------------------------------------------


@dataclass
class TrackerResult:
    shift_px_zyx: np.ndarray
    shift_um_zyx: np.ndarray
    stage_shift_xyz: np.ndarray
    reanchored: bool
    skipped: bool = False


@dataclass
class Tracker:
    """Holds the reference stack and applies the configured method.

    ``update(stack, t, p)`` returns the processed shift for one
    (timepoint, position) volume; the caller owns stage motion
    (see :mod:`shrimpy_tpu.tracking.position`).
    """

    config: DynaTrackConfig
    scale_zyx_um: tuple[float, float, float] = (1.0, 1.0, 1.0)
    journal: ShiftJournal | None = None
    debug_writer: object | None = None  # tracking.debug.DebugWriter
    _references: dict = field(default_factory=dict)  # per-position stacks
    # (shape, sigma) -> synthetic blob template (roi_center_pcc method)
    _template_cache: dict = field(default_factory=dict)

    def update(self, stack_zyx: np.ndarray, t: int, p: int | str = 0) -> TrackerResult:
        cfg = self.config
        stack = np.asarray(stack_zyx, dtype=np.float32)

        if cfg.tracking_interval > 1 and t % cfg.tracking_interval != 0:
            # Distinct arrays: a caller mutating one field in place
            # (e.g. accumulating drift) must not corrupt the others.
            return TrackerResult(
                np.zeros(3), np.zeros(3), np.zeros(3),
                reanchored=False, skipped=True,
            )

        shift_px, reanchored = self._compute_shift(stack, t, p)
        shift_um, stage_xyz = process_shift(
            shift_px,
            scale_zyx_um=self.scale_zyx_um,
            settings=cfg.shift,
            matrix_xyz=cfg.image_to_stage_matrix_xyz,
        )
        if self.journal is not None:
            self.journal.append(
                timepoint=t,
                position=p,
                method=cfg.tracking_method,
                shift_px_zyx=shift_px,
                shift_um_zyx=shift_um,
                stage_shift_xyz=stage_xyz,
                reanchored=reanchored,
            )
        if self.debug_writer is not None and cfg.debug:
            # Debug artifacts (reference tracking.py:1315-1474).
            self.debug_writer.record(
                stack, t, str(p), shift_px_zyx=shift_px
            )
        return TrackerResult(shift_px, shift_um, stage_xyz, reanchored)

    # -- shift methods (reference tracking.py:1244-1281) --------------------
    def _compute_shift(
        self, stack: np.ndarray, t: int, p: int | str
    ) -> tuple[np.ndarray, bool]:
        cfg = self.config
        method = cfg.tracking_method

        if method == "intensity_center_of_mass":
            return self._roi_center_shift(stack, use_otsu=False), False
        if method == "multiotsu_center_of_mass":
            return self._roi_center_shift(stack, use_otsu=True), False
        if method == "roi_center_pcc":
            return self._roi_template_pcc(stack), False

        # Reference-based methods: pcc / multiotsu_pcc / template_matching.
        target = stack
        if method == "multiotsu_pcc":
            mask, blurred = otsu_component_mask(
                stack,
                component=cfg.segmentation.otsu_component,
                sigma=cfg.segmentation.otsu_sigma,
            )
            target = np.asarray(mask * blurred)

        ref = self._references.get(p)
        interval = cfg.reference_update_interval
        if ref is None or (interval > 0 and t > 0 and t % interval == 0):
            # (Re)anchor: adopt the current stack as the new reference
            # and apply NO correction this timepoint — correcting here
            # would jump the stage against a reference we are about to
            # discard, and the next shift would then measure that jump
            # against the PRE-correction anchor and re-apply it
            # (reference tracking.py:1115-1137 documents exactly this
            # policy; note the residual displacement at anchor time is
            # baked into the new baseline — inherent to the policy).
            self._references[p] = np.array(target)  # copy: callers may reuse buffers
            return np.zeros(3), True

        if method == "template_matching":
            # NCC of a reference-sliced template over the moving stack
            # (reference archive autotracker.py:162-184); same sign
            # convention as PCC (positive = object moved positive).
            shift = template_match_shift(
                ref, target, cfg.template.slice_zyx
            )
            return shift, False

        shift = phase_cross_correlation(
            ref, target, maximum_shift=cfg.shift.maximum
        ).astype(np.float64)
        return shift, False

    def _roi_center_shift(self, stack: np.ndarray, use_otsu: bool) -> np.ndarray:
        """Referenceless: displacement of the mass center from the volume
        center (reference ``tracking.py:545-649``); positive shift means
        the object moved in the positive direction."""
        cfg = self.config
        if use_otsu:
            mask, blurred = otsu_component_mask(
                stack,
                component=cfg.segmentation.otsu_component,
                sigma=cfg.segmentation.otsu_sigma,
            )
            weights = np.asarray(mask)
        else:
            vol = stack
            rc = cfg.roi_center
            if rc.blur_sigma > 0:
                from shrimpy_tpu.ops.features import gaussian_blur

                vol = np.asarray(gaussian_blur(vol, rc.blur_sigma))
            if rc.background_percentile is not None:
                from shrimpy_tpu.ops.features import histogram_percentile

                bg = float(histogram_percentile(vol, rc.background_percentile))
                vol = vol - bg
            # Clamp even without a background floor: negative values
            # (phase data) must not pull the centroid the wrong way —
            # weights are non-negative mass only (reference
            # _intensity_center_of_mass clamps unconditionally,
            # tracking.py:596-650).
            weights = np.clip(vol, 0.0, None)
        com = np.asarray(center_of_mass(weights), dtype=np.float64)
        center = (np.asarray(stack.shape, dtype=np.float64) - 1.0) / 2.0
        return com - center

    def _roi_template_pcc(self, stack: np.ndarray) -> np.ndarray:
        """Referenceless PCC against a centered synthetic Gaussian-blob
        template (reference ``tracking.py:710-732``)."""
        sigma = self.config.roi_center.blob_sigma
        # The template depends only on (shape, sigma): cache it instead
        # of rebuilding a volume-sized array every timepoint (which also
        # re-ships it host->device for the PCC each update).
        cache_key = (tuple(stack.shape), float(sigma))
        template = self._template_cache.get(cache_key)
        if template is None:
            center = tuple((n - 1) / 2.0 for n in stack.shape)
            template = gaussian_blob(stack.shape, center, (sigma,) * 3)
            self._template_cache.clear()  # one geometry live at a time
            self._template_cache[cache_key] = template
        # PCC(template, stack) = displacement of the object from the
        # volume center — same convention as com - center above.
        return phase_cross_correlation(
            template, stack, maximum_shift=self.config.shift.maximum
        ).astype(np.float64)

    # -- reference management ------------------------------------------------
    def reset_reference(self, p: int | str | None = None) -> None:
        if p is None:
            self._references.clear()
        else:
            self._references.pop(p, None)

    def has_reference(self, p: int | str = 0) -> bool:
        return p in self._references
