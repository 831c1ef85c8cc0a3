"""Full-session integration: replay -> track -> reconstruct on a plate.

The miniature of BASELINE.json configs[4]/[5]: an HCS plate time-lapse
replayed through the acquisition engine (autofocus failures zero-pad,
DynaTrack journals shifts), then reconstructed (deskew + RL) over the
8-device mesh with resume support.
"""

import json

import numpy as np
import pytest

# Heavyweight module (big compiles / end-to-end): excluded from the
# quick review-loop tier (docs/testing.md).
pytestmark = pytest.mark.slow

from shrimpy_tpu.config import (
    DeconvolveSettings,
    DeskewSettings,
    ReconstructSettings,
)
from shrimpy_tpu.engine import AcquisitionEngine, AcquisitionPlan, ReplaySource
from shrimpy_tpu.io.ngff import create_hcs, open_ngff
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.parallel import make_mesh
from shrimpy_tpu.runtime import reconstruct_store


@pytest.fixture()
def session_plate(tmp_path, rng):
    """2-well plate, 3 timepoints, 2 channels, drifting blobs."""
    path = tmp_path / "session.zarr"
    store = create_hcs(path, channel_names=["BF", "GFP"])
    shape = (3, 2, 12, 32, 32)
    for p in range(2):
        pos = store.create_position("0", str(p), "000", channel_names=["BF", "GFP"])
        pos.create_array(shape, dtype="float32")
        data = np.zeros(shape, np.float32)
        for t in range(3):
            center = (6.0, 16.0 + 2 * t, 16.0 - 3 * t)
            for c in range(2):
                data[t, c] = gaussian_blob(shape[2:], center, (2.0, 3.0, 3.0),
                                           amplitude=100.0 * (c + 1))
        data += rng.normal(0, 0.5, shape).astype(np.float32)
        pos.write(Ellipsis, data)
    return path


def test_replay_track_reconstruct_session(tmp_path, session_plate):
    # --- replay with tracking + a deterministic autofocus failure
    plan = AcquisitionPlan(
        time={"n_timepoints": 3},
        autofocus={"enabled": True, "fail_at_indices": [3]},  # t=1, p=1
        metadata={
            "dynatrack": {
                "input_channel": "BF",
                "tracking_channel": "BF",
                "tracking_method": "pcc",
                "image_to_stage_matrix_xyz": [
                    [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0],
                ],
            }
        },
    )
    source = ReplaySource(session_plate)
    acq_path = AcquisitionEngine(source).acquire(tmp_path / "acq", "session", plan)

    acq = open_ngff(acq_path)
    assert acq.is_plate
    keys = sorted(acq.positions())
    assert len(keys) == 2

    # autofocus failure zero-padded on disk at (t=1, p=1)
    failed = acq.positions()[keys[1]].read()
    assert np.all(failed[1] == 0)
    assert failed[0].max() > 0

    # shift journal has rows for every tracked (t, p)
    journal = (tmp_path / "acq" / "session_dynatrack_log.csv").read_text().splitlines()
    assert len(journal) >= 1 + 4  # header + at least 4 tracked stacks

    summary = json.loads((tmp_path / "acq" / "session_summary_metadata.json").read_text())
    assert summary["skipped_autofocus"] == [[1, keys[1]]]

    # --- reconstruct the replayed session over the mesh, then resume
    settings = ReconstructSettings(
        deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
        deconvolve=DeconvolveSettings(iterations=2),
        channels=["BF"],
    )
    mesh = make_mesh(8)
    out_path = tmp_path / "recon.zarr"
    result = reconstruct_store(acq_path, out_path, settings, mesh=mesh)
    assert result["volumes"] == 6  # 2 positions x 3 timepoints x 1 channel

    resumed = reconstruct_store(acq_path, out_path, settings, mesh=mesh, resume=True)
    assert resumed["volumes"] == 0
    assert resumed["skipped_resume"] == 6

    recon = open_ngff(out_path)
    assert sorted(recon.positions()) == keys
    vol = recon.positions()[keys[0]].volume(2, 0)
    assert np.isfinite(vol).all() and vol.max() > 0
    # the zero-padded (failed) volume reconstructs to zeros
    failed_recon = recon.positions()[keys[1]].volume(1, 0)
    assert np.abs(failed_recon).max() < 1e-3
