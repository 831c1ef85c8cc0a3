"""Declarative acquisition plans (the useq-schema MDASequence role).

The reference drives acquisitions from YAML ``MDASequence`` plans with
microscope-specific settings under ``metadata.mantis`` (reference
``mantis_engine.py:470``, ``config/mda/mantis/demo.yaml``, SURVEY.md
§5.6). This is the first-party equivalent: a strict pydantic plan with
time/channel/z axes, an autofocus block, and a free-form ``metadata``
dict carrying the ``dynatrack`` config.
"""

from __future__ import annotations

from pathlib import Path

import yaml
from pydantic import BaseModel, ConfigDict, Field, model_validator


class TimePlan(BaseModel):
    model_config = ConfigDict(extra="forbid")

    n_timepoints: int = 1
    interval_s: float = 0.0

    @model_validator(mode="after")
    def _check(self):
        if self.n_timepoints < 1:
            raise ValueError("n_timepoints must be >= 1")
        return self


class ChannelPlan(BaseModel):
    model_config = ConfigDict(extra="forbid")

    name: str
    exposure_ms: float = 10.0


class ZPlan(BaseModel):
    model_config = ConfigDict(extra="forbid")

    n_slices: int | None = None  # None = full source depth
    step_um: float | None = None  # None = source scale


class AutofocusPlan(BaseModel):
    """Demo-PFS simulation: configurable success rate and deterministic
    failures (reference ``mantis_engine.py:348-386``)."""

    model_config = ConfigDict(extra="forbid")

    enabled: bool = False
    success_rate: float = 1.0
    fail_at_indices: list[int] | None = None  # flat (t * n_pos + p) indices
    seed: int = 0


class RefocusPlan(BaseModel):
    """Periodic remote-refocus (the archived O3 routine, reference
    archive ``acq_engine.py:892-1151``): every ``interval_timepoints``,
    find the in-focus slice of the acquired stack by the midband
    spectral metric and re-center the z offset on it."""

    model_config = ConfigDict(extra="forbid")

    enabled: bool = False
    interval_timepoints: int = 1
    channel: str | None = None  # None = the first acquired channel

    @model_validator(mode="after")
    def _check(self):
        if self.interval_timepoints < 1:
            raise ValueError("interval_timepoints must be >= 1")
        return self

    wavelength_um: float = 0.55
    na_det: float = 1.35
    threshold: float = 0.0  # metric prominence gate (0 = always accept)


class AutoexposurePlan(BaseModel):
    """Per-well autoexposure (archived production parity, reference
    archive ``autoexposure.py:22-285`` + per-well bookkeeping
    ``acq_engine.py:713-720``)."""

    model_config = ConfigDict(extra="forbid")

    enabled: bool = False
    algorithm: str = "intensity_percentile"  # or mean_intensity /
    # masked_mean_intensity / manual
    channel: str | None = None  # None = first acquired channel
    manual_csv: str | None = None  # well -> (exposure, power) table
    settings: dict = Field(default_factory=dict)  # AutoexposureSettings kw


class AcquisitionPlan(BaseModel):
    model_config = ConfigDict(extra="forbid")

    time: TimePlan = Field(default_factory=TimePlan)
    channels: list[ChannelPlan] | None = None  # None = all source channels
    z: ZPlan = Field(default_factory=ZPlan)
    positions: list[str] | None = None  # None = all source positions
    # Alternatively, a position-list CSV (io/platemap schema): HCS rows
    # select positions by their "row/col/fov" key.
    positions_csv: str | None = None
    axis_order: str = "tpcz"
    autofocus: AutofocusPlan = Field(default_factory=AutofocusPlan)
    refocus: RefocusPlan = Field(default_factory=RefocusPlan)
    autoexposure: AutoexposurePlan = Field(default_factory=AutoexposurePlan)
    metadata: dict = Field(default_factory=dict)
    # Stall watchdog: a (t, p) visit exceeding this wall time is logged
    # as an error (the reference's 100 s sequence-stall watchdog,
    # archive acq_engine.py:1567-1616).
    watchdog_s: float = 100.0

    @model_validator(mode="after")
    def _check(self):
        if self.axis_order != "tpcz":
            raise ValueError("only axis_order='tpcz' is supported")
        if self.positions is not None and self.positions_csv is not None:
            raise ValueError("set positions or positions_csv, not both")
        return self

    def resolve_positions(self, available: list[str]) -> list[str]:
        """Position keys to acquire: explicit list, CSV, or all."""
        if self.positions is not None:
            return self.positions
        if self.positions_csv is not None:
            from shrimpy_tpu.io.platemap import PositionList

            keys = []
            for entry in PositionList.read(self.positions_csv):
                key = entry.hcs_key or entry.name
                if key not in available:
                    raise ValueError(
                        f"position {key!r} from {self.positions_csv} not in "
                        f"the source store (has {available})"
                    )
                keys.append(key)
            return keys
        return available

    @classmethod
    def from_yaml(cls, path: str | Path) -> "AcquisitionPlan":
        with open(path) as f:
            return cls(**(yaml.safe_load(f) or {}))

    def dynatrack_metadata(self) -> dict | None:
        """The ``metadata.dynatrack`` block (reference
        ``metadata.mantis.dynatrack``, ``manager.py:170-240``)."""
        return self.metadata.get("dynatrack")
