"""Dual-instance acquisition (engine/dual.py).

The reference topology: two Micro-Manager instances (label-free +
light-sheet arms) acquiring simultaneously off one timepoint loop and
one physical stage (reference
``shrimpy/mantis/archive/pycromanager/acq_engine.py:98-183,601-687``).
These tests drive the emulation: shared-stage plumb-through to a
non-tracking arm, tracking-arm corrections moving both arms, and the
barrier's stall-abort semantics.
"""

import json

import numpy as np
import pytest

from shrimpy_tpu.engine import AcquisitionPlan, ReplaySource
from shrimpy_tpu.engine.dual import (
    ArmConfig,
    DualArmAcquisition,
    DualReplayConfig,
)
from shrimpy_tpu.io.ngff import open_ngff
from shrimpy_tpu.io.synthetic import synthetic_blob_fov


def _blob_source(path, *, drift=(0.0, 0.0, 0.0), n_t=3, noise=0.0):
    synthetic_blob_fov(
        path,
        shape_zyx=(8, 48, 48),
        n_timepoints=n_t,
        drift_zyx=drift,
        noise=noise,
        zyx_scale=(1.0, 1.0, 1.0),
    )
    return ReplaySource(path)


def test_preseeded_shared_stage_offsets_every_arm(tmp_path):
    """A stage position set before the run shifts BOTH arms' volumes —
    the one-physical-stage contract, exact to the voxel."""
    src_a = _blob_source(tmp_path / "a.zarr")
    src_b = _blob_source(tmp_path / "b.zarr")
    plan = AcquisitionPlan(time={"n_timepoints": 2})
    session = DualArmAcquisition(
        {"lf": (src_a, plan), "ls": (src_b, plan.model_copy(deep=True))},
        barrier_timeout_s=30.0,
    )
    # Stage sits at (x=5, y=3, z=0) um before the run (scale 1 um/px).
    session.stage.set("0", 5.0, 3.0, 0.0)
    results = session.run(tmp_path / "out", "dual")
    assert all(r.error is None for r in results.values()), results

    for arm, src in [("lf", src_a), ("ls", src_b)]:
        out = open_ngff(tmp_path / "out" / f"dual_{arm}.zarr")
        data = out.position().read()
        expected = src.volume("0", 0, 0, offset_px_zyx=(0, 3, 5))
        np.testing.assert_array_equal(data[0, 0], expected)

    summary = json.loads(
        (tmp_path / "out" / "dual_dualarm_summary.json").read_text()
    )
    assert summary["stage_final_um"]["0"] == [5.0, 3.0, 0.0]
    assert set(summary["arms"]) == {"lf", "ls"}


def test_tracking_arm_moves_the_passive_arm(tmp_path):
    """DynaTrack on the light-sheet arm corrects drift; the label-free
    arm (no tracking of its own) must follow the same stage."""
    ls = _blob_source(
        tmp_path / "ls.zarr", drift=(0.0, 0.0, -6.0), n_t=4, noise=0.5
    )
    lf = _blob_source(tmp_path / "lf.zarr", n_t=4)  # static blob
    track_plan = AcquisitionPlan(
        time={"n_timepoints": 4},
        metadata={
            "dynatrack": {
                "input_channel": "BF",
                "tracking_channel": "BF",
                "tracking_method": "pcc",
                "image_to_stage_matrix_xyz": [
                    [-1.0, 0.0, 0.0],
                    [0.0, -1.0, 0.0],
                    [0.0, 0.0, -1.0],
                ],
            }
        },
    )
    passive_plan = AcquisitionPlan(time={"n_timepoints": 4})
    session = DualArmAcquisition(
        {"ls": (ls, track_plan), "lf": (lf, passive_plan)},
        barrier_timeout_s=60.0,
    )
    results = session.run(tmp_path / "out", "dual")
    assert all(r.error is None for r in results.values()), results

    # The shared stage accumulated a correction (x drift was -6 px/t).
    stage = session.stage.get("0")
    assert stage is not None and abs(stage.x) > 2.0

    # The passive arm's late volumes are rolled by the shared stage: a
    # static blob whose peak has moved off center in x, in the
    # direction that cancels the tracked drift.
    data = open_ngff(tmp_path / "out" / "dual_lf.zarr").position().read()
    peak0 = np.unravel_index(np.argmax(data[0, 0]), data[0, 0].shape)
    peak3 = np.unravel_index(np.argmax(data[3, 0]), data[3, 0].shape)
    assert peak0[2] == 24  # t=0: stage still at origin, blob centered
    dx = peak3[2] - peak0[2]
    assert dx != 0 and np.sign(dx) == -np.sign(stage.x)
    assert abs(abs(dx) - abs(round(stage.x))) <= 6  # within one update


def test_stalled_arm_aborts_every_arm(tmp_path):
    """One arm stalling past the barrier timeout aborts the whole run
    (the reference's sequence stall watchdog + abort)."""
    import time as _time

    src_a = _blob_source(tmp_path / "a.zarr", n_t=3)
    src_b = _blob_source(tmp_path / "b.zarr", n_t=3)
    plan = AcquisitionPlan(time={"n_timepoints": 3})

    def stall_hook(vol, t, p, channel):
        if t == 1:
            _time.sleep(2.0)

    session = DualArmAcquisition(
        {"fast": (src_a, plan), "slow": (src_b, plan.model_copy(deep=True))},
        barrier_timeout_s=0.4,
        viewer_hooks={"slow": [stall_hook]},
    )
    results = session.run(tmp_path / "out", "dual")
    assert results["fast"].error is not None
    assert results["slow"].error is not None
    summary = json.loads(
        (tmp_path / "out" / "dual_dualarm_summary.json").read_text()
    )
    assert all(a["error"] for a in summary["arms"].values())


def test_family_auto_increment_moves_arms_together(tmp_path):
    src_a = _blob_source(tmp_path / "a.zarr", n_t=2)
    src_b = _blob_source(tmp_path / "b.zarr", n_t=2)
    plan = AcquisitionPlan(time={"n_timepoints": 2})

    def make():
        return DualArmAcquisition(
            {"lf": (src_a, plan), "ls": (src_b, plan.model_copy(deep=True))},
            barrier_timeout_s=30.0,
        )

    r1 = make().run(tmp_path / "out", "dual")
    r2 = make().run(tmp_path / "out", "dual")
    assert r1["lf"].output.endswith("dual_lf.zarr")
    # The chunk index lands at the END of each arm's name (the engine's
    # own auto-increment scheme), so the refocus chunk-family glob
    # ("dual_lf" or "dual_lf_<digits>") matches across dual re-runs —
    # an index in the middle ("dual_1_lf") would never restore offsets.
    assert r2["lf"].output.endswith("dual_lf_1.zarr")
    assert r2["ls"].output.endswith("dual_ls_1.zarr")


def test_dual_arms_share_one_hardware_instrument(tmp_path):
    """Both arms enable the rig with the same laser port name: one
    physical instrument (the reference's lasers are shared between the
    arms' TriggerScope states, archive acq_engine.py:766-787). The
    emulator's per-instrument wire lock must keep the two arm engines'
    concurrent serial round-trips intact, and both device journals must
    land in their summaries."""
    src_a = _blob_source(tmp_path / "a.zarr")
    src_b = _blob_source(tmp_path / "b.zarr")

    def hw_plan():
        return AcquisitionPlan(
            time={"n_timepoints": 3},
            hardware={
                "enabled": True,
                "lasers": [
                    {"channel": "BF", "wavelength_nm": 488,
                     "power_mw": 12.0, "port": "COM-shared"},
                ],
            },
        )

    session = DualArmAcquisition(
        {"lf": (src_a, hw_plan()), "ls": (src_b, hw_plan())},
        barrier_timeout_s=30.0,
    )
    results = session.run(tmp_path / "out", "dual")
    assert all(r.error is None for r in results.values()), results
    for arm in ("lf", "ls"):
        summary = json.loads(
            (tmp_path / "out" / f"dual_{arm}_summary_metadata.json")
            .read_text()
        )
        hw = summary["hardware"]
        assert hw is not None and not hw["aborted"]
        assert hw["lasers"]["BF"]["port"] == "COM-shared"
        kinds = [e[0] for e in hw["events"]]
        assert "laser_on" in kinds and "shutter_reset" in kinds


def test_dual_config_validation():
    with pytest.raises(ValueError, match="at least two"):
        DualReplayConfig(arms={"only": ArmConfig(input="x.zarr")})
    with pytest.raises(ValueError, match="timepoint"):
        DualReplayConfig(
            arms={
                "a": ArmConfig(
                    input="a.zarr",
                    plan=AcquisitionPlan(time={"n_timepoints": 2}),
                ),
                "b": ArmConfig(
                    input="b.zarr",
                    plan=AcquisitionPlan(time={"n_timepoints": 3}),
                ),
            }
        )
