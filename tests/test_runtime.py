"""Streaming runtime: store-to-store reconstruction, resume, HCS fan-out."""

import json

import numpy as np
import pytest

from shrimpy_tpu.config import DeconvolveSettings, DeskewSettings, ReconstructSettings
from shrimpy_tpu.io.ngff import create_fov, create_hcs, open_ngff
from shrimpy_tpu.io.synthetic import synthetic_ls_stack
from shrimpy_tpu.ops.deskew import deskew_volume
from shrimpy_tpu.parallel import make_mesh
from shrimpy_tpu.runtime import plan_work, reconstruct_store

DESKEW = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386)


@pytest.fixture()
def ls_fov(tmp_path):
    path = tmp_path / "ls.zarr"
    synthetic_ls_stack(path, raw_shape_szx=(48, 32, 32))
    return path


def test_plan_work_filters(tmp_path, ls_fov):
    store = open_ngff(ls_fov)
    settings = ReconstructSettings(deskew=DESKEW)
    assert len(plan_work(store, settings)) == 1
    settings = ReconstructSettings(deskew=DESKEW, time_indices=[5])
    assert plan_work(store, settings) == []


def test_reconstruct_fov_deskew(tmp_path, ls_fov):
    settings = ReconstructSettings(deskew=DESKEW)
    summary = reconstruct_store(ls_fov, tmp_path / "out.zarr", settings)
    assert summary["volumes"] == 1

    out = open_ngff(tmp_path / "out.zarr").position()
    raw = open_ngff(ls_fov).position().volume(0, 0)
    expected = np.asarray(deskew_volume(raw, DESKEW))
    np.testing.assert_allclose(out.volume(0, 0), expected, rtol=1e-5, atol=1e-4)
    # voxel metadata follows the deskew geometry
    sz, sy, sx = out.zyx_scale
    assert sy == pytest.approx(0.116)
    assert sz == pytest.approx(0.116, rel=1e-3)  # unit-pixel z grid
    # summary sidecar on disk
    sidecar = json.loads((tmp_path / "out.zarr" / "reconstruct_summary.json").read_text())
    assert sidecar["volumes"] == 1


def test_reconstruct_resume_skips_done(tmp_path, ls_fov):
    settings = ReconstructSettings(deskew=DESKEW)
    reconstruct_store(ls_fov, tmp_path / "out.zarr", settings)
    summary = reconstruct_store(
        ls_fov, tmp_path / "out.zarr", settings, resume=True
    )
    assert summary["volumes"] == 0
    assert summary["skipped_resume"] == 1


def test_reconstruct_hcs_plate_sharded(tmp_path, rng):
    # 2-position plate, 2 timepoints -> 4 volumes over an 8-device mesh.
    plate = tmp_path / "plate.zarr"
    store = create_hcs(plate, channel_names=["GFP"])
    for p in range(2):
        pos = store.create_position("0", str(p), "000", channel_names=["GFP"])
        pos.create_array((2, 1, 32, 24, 16), dtype="float32")
        pos.write(Ellipsis, rng.random((2, 1, 32, 24, 16), dtype=np.float32))

    settings = ReconstructSettings(
        deskew=DESKEW, deconvolve=DeconvolveSettings(iterations=2)
    )
    mesh = make_mesh(8)
    summary = reconstruct_store(
        plate, tmp_path / "out.zarr", settings, mesh=mesh, batch_size=4
    )
    assert summary["volumes"] == 4
    out = open_ngff(tmp_path / "out.zarr")
    assert out.is_plate
    assert sorted(out.positions()) == ["0/0/000", "0/1/000"]
    vol = out.positions()["0/1/000"].volume(1, 0)
    assert np.isfinite(vol).all() and vol.max() > 0


def test_uint16_output(tmp_path, ls_fov):
    settings = ReconstructSettings(deskew=DESKEW, output_dtype="uint16")
    reconstruct_store(ls_fov, tmp_path / "out.zarr", settings)
    out = open_ngff(tmp_path / "out.zarr").position()
    assert out.dtype == np.uint16


def test_uint16_output_zeroes_nonfinite():
    from shrimpy_tpu.runtime.stream import _as_output_dtype

    batch = np.array(
        [[np.nan, np.inf, -np.inf, 1.5, -2.0, 70000.0]], np.float32
    )
    out = _as_output_dtype(batch, "uint16")
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, [[0, 65535, 0, 1, 0, 65535]])


def test_stale_journal_without_output_is_discarded(tmp_path, ls_fov):
    """Deleting the output store but leaving the progress sidecar must
    NOT skip 'done' items into a fresh store full of holes."""
    import shutil

    out = tmp_path / "out.zarr"
    settings = ReconstructSettings(deskew=DESKEW)
    reconstruct_store(ls_fov, out, settings)
    shutil.rmtree(out)
    assert out.with_suffix(out.suffix + ".progress.jsonl").exists()
    summary = reconstruct_store(ls_fov, out, settings, resume=True)
    assert summary["volumes"] == 1
    assert summary["skipped_resume"] == 0
    vol = open_ngff(out).position().volume(0, 0)
    assert np.isfinite(vol).all() and vol.max() > 0


def test_existing_output_with_changed_t_extent_rejected(tmp_path, rng):
    """Existing-output validation covers T/C, not just ZYX: a grown
    acquisition store must not silently fail every new-timepoint write."""
    src = tmp_path / "grow.zarr"
    pos = create_fov(src, shape=(1, 1, 8, 16, 16), dtype="float32")
    pos.write(Ellipsis, rng.random((1, 1, 8, 16, 16), dtype=np.float32))
    out = tmp_path / "out.zarr"
    settings = ReconstructSettings(deskew=DESKEW)
    reconstruct_store(src, out, settings)

    # Grow the source's T extent (metadata-level resize).
    arr = pos.array()
    arr.resize(exclusive_max=(3, 1, 8, 16, 16)).result()
    pos2 = open_ngff(src).position()
    pos2.write((slice(1, 3),), rng.random((2, 1, 8, 16, 16), dtype=np.float32))

    with pytest.raises(ValueError, match="T/C extents|different settings"):
        reconstruct_store(src, out, settings, resume=True)


def test_registration_apply_stage(tmp_path, rng):
    """A transform JSON estimated offline is applied in the pipeline."""
    import json as _json

    from shrimpy_tpu.config import RegistrationSettings
    from shrimpy_tpu.ops.register import affine_apply

    vol = rng.random((1, 1, 8, 16, 16), dtype=np.float32) * 10
    pos = create_fov(tmp_path / "in.zarr", shape=vol.shape, dtype="float32")
    pos.write(Ellipsis, vol)

    transform = {
        "matrix_zyx": np.eye(3).tolist(),
        "offset_zyx": [0.0, 2.0, -1.0],
    }
    tpath = tmp_path / "t.json"
    tpath.write_text(_json.dumps(transform))

    settings = ReconstructSettings(
        registration=RegistrationSettings(transform_path=str(tpath))
    )
    reconstruct_store(tmp_path / "in.zarr", tmp_path / "out.zarr", settings)
    out = open_ngff(tmp_path / "out.zarr").position().volume(0, 0)
    expected = np.asarray(
        affine_apply(vol[0, 0], np.eye(3), [0.0, 2.0, -1.0])
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_channel_filter_selects_subset(tmp_path, rng):
    shape = (1, 3, 12, 16, 16)
    pos = create_fov(tmp_path / "in.zarr", shape=shape, dtype="float32",
                     channel_names=["BF", "GFP", "RFP"])
    pos.write(Ellipsis, rng.random(shape, dtype=np.float32))
    settings = ReconstructSettings(deskew=DESKEW, channels=["GFP"])
    summary = reconstruct_store(tmp_path / "in.zarr", tmp_path / "out.zarr", settings)
    assert summary["volumes"] == 1


def test_empty_selection_raises(tmp_path, ls_fov):
    settings = ReconstructSettings(deskew=DESKEW, channels=["nope"])
    with pytest.raises(ValueError, match="no work"):
        reconstruct_store(ls_fov, tmp_path / "out.zarr", settings)


def test_ngff_04_input_store(tmp_path, rng):
    """zarr v2 / NGFF 0.4 stores reconstruct identically."""
    path = tmp_path / "v2.zarr"
    synthetic_ls_stack(path, raw_shape_szx=(32, 24, 16), version="0.4")
    settings = ReconstructSettings(deskew=DESKEW)
    summary = reconstruct_store(path, tmp_path / "out.zarr", settings)
    assert summary["volumes"] == 1
    out = open_ngff(tmp_path / "out.zarr").position()
    assert np.isfinite(out.volume(0, 0)).all()


def test_pyramid_write_through(tmp_path, ls_fov):
    """pyramid_levels writes NGFF levels 1..n with scaled transforms
    (reference datasets carry multiscale pyramids,
    docs/data_structure.md:60-94)."""
    settings = ReconstructSettings(deskew=DESKEW, pyramid_levels=2)
    reconstruct_store(ls_fov, tmp_path / "out.zarr", settings)
    pos = open_ngff(tmp_path / "out.zarr").position()
    datasets = pos.attrs["multiscales"][0]["datasets"]
    assert [d["path"] for d in datasets] == ["0", "1", "2"]
    s0 = datasets[0]["coordinateTransformations"][0]["scale"]
    s2 = datasets[2]["coordinateTransformations"][0]["scale"]
    assert s2[-1] == pytest.approx(s0[-1] * 4) and s2[-2] == pytest.approx(s0[-2] * 4)
    base = pos.read((0, 0))
    lvl2 = np.asarray(pos.array("2")[0, 0].read().result())
    assert lvl2.shape[1] == base.shape[1] // 4
    # mean-pooled level tracks the base content: a 4x4 mean pool of a
    # sharp bead divides its peak by at most 16 and never raises it.
    assert 0 < lvl2.max() <= base.max() * 1.001
    assert lvl2.max() >= base.max() / 16.0

    # resume run must not duplicate the levels
    resumed = reconstruct_store(
        ls_fov, tmp_path / "out.zarr", settings, resume=True
    )
    assert resumed["volumes"] == 0
    datasets = open_ngff(tmp_path / "out.zarr").position().attrs[
        "multiscales"
    ][0]["datasets"]
    assert [d["path"] for d in datasets] == ["0", "1", "2"]


def test_written_timepoints_both_versions(tmp_path):
    for version in ("0.5", "0.4"):
        pos = create_fov(
            tmp_path / f"wt_{version}.zarr", shape=(4, 1, 4, 16, 16),
            dtype="float32", channel_names=["c"], zyx_scale=(1.0, 1.0, 1.0),
            version=version,
        )
        assert pos.written_timepoints() == []
        pos.write((1, 0), np.ones((4, 16, 16), np.float32))
        pos.write((3, 0), np.ones((4, 16, 16), np.float32))
        assert pos.written_timepoints() == [1, 3], version


def test_phase_with_default_z_padding(tmp_path, rng):
    """The production phase config (z_padding=5 default) must run
    through the runtime — the TF was double-padded against the padded
    stack shape and crashed for every z_padding > 0 (review finding)."""
    from shrimpy_tpu.config.schemas import PhaseSettings

    pos = create_fov(tmp_path / "bf.zarr", shape=(1, 1, 8, 16, 16),
                     dtype="float32", channel_names=["BF"],
                     zyx_scale=(0.25, 0.116, 0.116))
    pos.write((0, 0), rng.random((8, 16, 16), dtype=np.float32) * 100)
    settings = ReconstructSettings(
        phase=PhaseSettings(
            transfer_function={"yx_pixel_size": 0.116, "z_pixel_size": 0.25}
        )  # z_padding stays at its default (5)
    )
    summary = reconstruct_store(tmp_path / "bf.zarr", tmp_path / "out.zarr",
                                settings)
    assert summary["volumes"] == 1
    out = open_ngff(tmp_path / "out.zarr").position().read()
    assert np.isfinite(out).all()


def test_pyramid_levels_on_thin_dims(tmp_path, rng):
    """Axes that reach size 1 stop pooling (not shrink to 0) and their
    scale transform stops growing (review findings)."""
    from shrimpy_tpu.io.ngff import add_pyramid_levels

    pos = create_fov(tmp_path / "thin.zarr", shape=(1, 1, 4, 2, 16),
                     dtype="float32", channel_names=["a"],
                     zyx_scale=(1.0, 0.5, 0.5))
    pos.write((0, 0), rng.random((4, 2, 16), dtype=np.float32))
    add_pyramid_levels(pos, n_levels=2, factors_zyx=(1, 2, 2))
    reopened = open_ngff(tmp_path / "thin.zarr").position()
    assert tuple(reopened.array("1").shape) == (1, 1, 4, 1, 8)
    assert tuple(reopened.array("2").shape) == (1, 1, 4, 1, 4)
    scales = [d["coordinateTransformations"][0]["scale"]
              for d in reopened.attrs["multiscales"][0]["datasets"]]
    # y pooled once (0.5 -> 1.0) then clamped; x pooled twice.
    assert scales[2][3] == 1.0
    assert scales[2][4] == 2.0


def test_pyramid_levels_resume_after_partial(tmp_path, rng):
    """Leftover level arrays from a crashed attempt are reopened and
    overwritten, not an ALREADY_EXISTS error (review finding)."""
    from shrimpy_tpu.io.ngff import add_pyramid_levels

    pos = create_fov(tmp_path / "p.zarr", shape=(1, 1, 4, 16, 16),
                     dtype="float32", channel_names=["a"])
    pos.write((0, 0), rng.random((4, 16, 16), dtype=np.float32))
    # Simulate the crash: the level-1 array exists but metadata doesn't.
    pos.create_array((1, 1, 4, 8, 8), dtype="float32", name="1")
    add_pyramid_levels(pos, n_levels=1)
    reopened = open_ngff(tmp_path / "p.zarr").position()
    datasets = reopened.attrs["multiscales"][0]["datasets"]
    assert [d["path"] for d in datasets] == ["0", "1"]
    level1 = np.asarray(reopened.array("1").read().result())
    assert np.abs(level1).max() > 0  # actually (re)written


def test_existing_output_gains_missing_positions(tmp_path, rng):
    """A broader second selection against an existing HCS output
    creates the missing positions instead of KeyError-ing (review
    finding)."""
    store = create_hcs(tmp_path / "in.zarr", channel_names=["a"])
    for p in range(2):
        pos = store.create_position("0", str(p), "000", channel_names=["a"])
        pos.create_array((1, 1, 4, 16, 16), dtype="float32")
        pos.write((0, 0), rng.random((4, 16, 16), dtype=np.float32))

    settings_one = ReconstructSettings(positions=["0/0/000"])
    reconstruct_store(tmp_path / "in.zarr", tmp_path / "out.zarr", settings_one)
    settings_all = ReconstructSettings()
    summary = reconstruct_store(
        tmp_path / "in.zarr", tmp_path / "out.zarr", settings_all
    )
    assert summary["volumes"] == 2
    assert sorted(open_ngff(tmp_path / "out.zarr").positions()) == [
        "0/0/000", "0/1/000",
    ]


def test_shard_volumes_through_runtime(tmp_path, rng):
    """>HBM mode end-to-end: reconstruct_store with shard_volumes runs
    the distributed slab FFT path over the mesh and matches the
    unsharded FFT result."""
    from shrimpy_tpu.config.schemas import PhaseSettings

    pos = create_fov(tmp_path / "bf.zarr", shape=(2, 1, 8, 16, 256),
                     dtype="float32", channel_names=["BF"],
                     zyx_scale=(0.25, 0.116, 0.116))
    for t in range(2):
        pos.write((t, 0), rng.random((8, 16, 256), dtype=np.float32) * 100)

    phase = PhaseSettings(transfer_function={
        "yx_pixel_size": 0.116, "z_pixel_size": 0.25, "z_padding": 0,
    })
    reconstruct_store(
        tmp_path / "bf.zarr", tmp_path / "plain.zarr",
        ReconstructSettings(phase=phase),
    )
    reconstruct_store(
        tmp_path / "bf.zarr", tmp_path / "sharded.zarr",
        ReconstructSettings(phase=phase, shard_volumes=True),
        mesh=make_mesh(8, space=4),
    )
    a = open_ngff(tmp_path / "plain.zarr").position().read()
    b = open_ngff(tmp_path / "sharded.zarr").position().read()
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-4)


def test_register_apply_translation_through_runtime(tmp_path, rng):
    """An identity-matrix transform JSON rides the gather-free
    translation warp through the reconstruct pipeline and matches the
    scipy oracle."""
    from shrimpy_tpu.ops.register import affine_apply_reference_scipy

    vol = rng.random((8, 24, 32), dtype=np.float32) * 100
    pos = create_fov(tmp_path / "in.zarr", shape=(1, 1, 8, 24, 32),
                     dtype="float32", channel_names=["a"])
    pos.write((0, 0), vol)
    transform = tmp_path / "t.json"
    transform.write_text(json.dumps({
        "matrix_zyx": np.eye(3).tolist(),
        "offset_zyx": [1.5, -2.25, 3.0],
    }))
    settings = ReconstructSettings(
        registration={"transform_path": str(transform)}
    )
    reconstruct_store(tmp_path / "in.zarr", tmp_path / "out.zarr", settings)
    out = open_ngff(tmp_path / "out.zarr").position().read()[0, 0]
    ref = affine_apply_reference_scipy(
        vol, np.eye(3), np.asarray([1.5, -2.25, 3.0]))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def _flaky(method, fail_times: dict):
    """Wrap an NgffPosition method to fail the first N calls per key."""
    def wrapper(self, index, *args, **kwargs):
        k = tuple(index)
        if fail_times.get(k, 0) > 0:
            fail_times[k] -= 1
            raise OSError(f"injected transient failure at {k}")
        return method(self, index, *args, **kwargs)
    return wrapper


def test_io_retry_recovers_transient_failures(tmp_path, rng, monkeypatch):
    """Transient read/write faults retry in place and the run completes
    fully (reference robust_cmmcore.py:24-53)."""
    from shrimpy_tpu.io.ngff import NgffPosition

    path = tmp_path / "in.zarr"
    pos = create_fov(path, shape=(2, 1, 8, 16, 16), dtype="float32")
    for t in range(2):
        pos.write((t, 0), rng.random((8, 16, 16), dtype=np.float32))

    read_fails = {(0, 0): 2}   # first item: fail twice, succeed on 3rd
    write_fails = {(1, 0): 1}  # second item: one write failure
    monkeypatch.setattr(
        NgffPosition, "read_async", _flaky(NgffPosition.read_async, read_fails)
    )
    monkeypatch.setattr(
        NgffPosition, "write_async", _flaky(NgffPosition.write_async, write_fails)
    )
    settings = ReconstructSettings(
        deskew=DESKEW, io_retry={"attempts": 3, "wait_s": 0.0}
    )
    summary = reconstruct_store(path, tmp_path / "out.zarr", settings)
    assert summary["volumes"] == 2
    assert summary["failed"] == []
    assert read_fails == {(0, 0): 0} and write_fails == {(1, 0): 0}


def test_io_persistent_failure_contained_and_resumable(tmp_path, rng, monkeypatch):
    """A persistently failing item is journaled failed-and-skipped; the
    run completes, and resume=True retries exactly that item (VERDICT
    round-2 item 5)."""
    from shrimpy_tpu.io.ngff import NgffPosition

    path = tmp_path / "in.zarr"
    pos = create_fov(path, shape=(3, 1, 8, 16, 16), dtype="float32")
    for t in range(3):
        pos.write((t, 0), rng.random((8, 16, 16), dtype=np.float32))

    read_fails = {(1, 0): 10**6}  # t=1 always fails
    monkeypatch.setattr(
        NgffPosition, "read_async", _flaky(NgffPosition.read_async, read_fails)
    )
    settings = ReconstructSettings(
        deskew=DESKEW, io_retry={"attempts": 2, "wait_s": 0.0}
    )
    summary = reconstruct_store(path, tmp_path / "out.zarr", settings)
    assert summary["volumes"] == 2
    assert len(summary["failed"]) == 1
    assert summary["failed"][0]["key"] == "0|1|0"
    assert summary["failed"][0]["failed"] == "read"
    journal = (tmp_path / "out.zarr.progress.jsonl").read_text()
    assert "injected transient failure" in journal

    # Heal the store and resume: only the failed item is redone.
    monkeypatch.undo()
    summary2 = reconstruct_store(
        path, tmp_path / "out.zarr", settings, resume=True
    )
    assert summary2["volumes"] == 1
    assert summary2["skipped_resume"] == 2
    assert summary2["failed"] == []


def test_pyramid_repools_after_resume_retry(tmp_path, rng, monkeypatch):
    """A resume run that retries a previously-failed item must re-pool
    the pyramid: the first run's levels pooled a zero base volume for
    that item and would otherwise stay stale forever."""
    from shrimpy_tpu.io.ngff import NgffPosition

    path = tmp_path / "in.zarr"
    pos = create_fov(path, shape=(2, 1, 8, 16, 16), dtype="float32")
    for t in range(2):
        pos.write((t, 0), rng.random((8, 16, 16), dtype=np.float32) + 1.0)

    monkeypatch.setattr(
        NgffPosition, "read_async",
        _flaky(NgffPosition.read_async, {(1, 0): 10**6}),
    )
    settings = ReconstructSettings(
        deskew=DESKEW,
        pyramid_levels=1,
        io_retry={"attempts": 2, "wait_s": 0.0},
    )
    summary = reconstruct_store(path, tmp_path / "out.zarr", settings)
    assert len(summary["failed"]) == 1
    out = open_ngff(tmp_path / "out.zarr").position()
    level1_before = np.asarray(out.array("1")[1, 0].read().result())
    assert level1_before.max() == 0.0  # pooled from the unwritten base

    monkeypatch.undo()
    reconstruct_store(path, tmp_path / "out.zarr", settings, resume=True)
    out = open_ngff(tmp_path / "out.zarr").position()
    level1_after = np.asarray(out.array("1")[1, 0].read().result())
    assert level1_after.max() > 0.0, "stale pyramid level after resume"


def test_io_strict_mode_aborts(tmp_path, rng, monkeypatch):
    from shrimpy_tpu.io.ngff import NgffPosition

    path = tmp_path / "in.zarr"
    pos = create_fov(path, shape=(1, 1, 8, 16, 16), dtype="float32")
    pos.write((0, 0), rng.random((8, 16, 16), dtype=np.float32))
    monkeypatch.setattr(
        NgffPosition, "read_async",
        _flaky(NgffPosition.read_async, {(0, 0): 10**6}),
    )
    settings = ReconstructSettings(
        deskew=DESKEW,
        io_retry={"attempts": 2, "wait_s": 0.0, "contain_failures": False},
    )
    with pytest.raises(OSError, match="injected"):
        reconstruct_store(path, tmp_path / "out.zarr", settings)


@pytest.mark.slow
def test_sigkill_mid_plate_keeps_journal_store_invariant(tmp_path):
    """SIGKILL a reconstruct_store subprocess mid-run and prove the
    write-before-journal ordering (stream.py flush_writes: a batch is
    journaled done ONLY after its writes resolve): no journaled key may
    lack its committed data, and resume completes exactly the missing
    items (SURVEY §5.4 resume contract; VERDICT r4 #8)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from shrimpy_tpu.runtime.stream import _Progress

    n_t, shape_zyx = 40, (48, 32, 32)
    src = tmp_path / "in.zarr"
    pos = create_fov(src, shape=(n_t, 1, *shape_zyx), dtype="float32")
    rng = np.random.default_rng(7)
    vols = rng.random((n_t, *shape_zyx), dtype=np.float32) * 100.0
    for t in range(n_t):
        # Deterministic per-t content so committed keys are checkable.
        pos.write((t, 0), vols[t])

    out = tmp_path / "out.zarr"
    journal = tmp_path / "out.zarr.progress.jsonl"
    child_src = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
from shrimpy_tpu.config import DeskewSettings, ReconstructSettings
from shrimpy_tpu.runtime import reconstruct_store
settings = ReconstructSettings(
    deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
)
reconstruct_store({str(src)!r}, {str(out)!r}, settings, batch_size=1)
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    child = subprocess.Popen(
        [sys.executable, "-c", child_src], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # Kill the instant a few items are journaled — mid-stream, with
        # reads prefetched and writes in flight for later items.
        deadline = time.monotonic() + 300.0
        while time.monotonic() < deadline:
            done = list(_Progress.iter_done_keys(journal))
            if len(done) >= 3:
                break
            if child.poll() is not None:
                break
            time.sleep(0.01)
        assert child.poll() is None, (
            "run finished before the kill — enlarge the work list"
        )
        child.send_signal(signal.SIGKILL)
        child.wait(timeout=60)
    finally:
        if child.poll() is None:
            child.kill()
            child.wait(timeout=60)

    done = list(_Progress.iter_done_keys(journal))
    assert 0 < len(done) < n_t, f"kill landed outside the run ({len(done)})"

    # Invariant 1: every journaled-done key is COMMITTED — its data is
    # on disk and correct (not a hole, not torn).
    from shrimpy_tpu.ops.deskew import deskew_volume

    out_store = open_ngff(out)
    out_pos = out_store.position()
    for _, t, c in done:
        got = out_pos.volume(t, c)
        expected = np.asarray(deskew_volume(vols[t], DESKEW))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)

    # Invariant 2: resume completes exactly the missing items, skipping
    # every journaled one.
    settings = ReconstructSettings(deskew=DESKEW)
    summary = reconstruct_store(src, out, settings, resume=True)
    assert summary["skipped_resume"] == len(done)
    assert summary["volumes"] == n_t - len(done)
    assert summary["failed"] == []
    # The healed store is complete and correct everywhere.
    for t in (0, len(done), n_t - 1):
        np.testing.assert_allclose(
            out_pos.volume(t, 0),
            np.asarray(deskew_volume(vols[t], DESKEW)),
            rtol=1e-5, atol=1e-4,
        )
