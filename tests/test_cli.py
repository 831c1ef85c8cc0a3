"""CLI surface: verbs, help, end-to-end store reconstruction.

Mirrors the reference's CliRunner tests (``tests/test_cli.py:16-48``).
"""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from shrimpy_tpu.cli.main import cli
from shrimpy_tpu.io.ngff import open_ngff
from shrimpy_tpu.io.synthetic import synthetic_blob_fov, synthetic_ls_stack


@pytest.fixture()
def runner():
    return CliRunner()


def test_help_lists_verbs(runner):
    result = runner.invoke(cli, ["--help"])
    assert result.exit_code == 0
    for verb in (
        "deskew", "deconvolve", "phase", "reconstruct", "register",
        "track", "replay", "info",
    ):
        assert verb in result.output


def test_version(runner):
    result = runner.invoke(cli, ["--version"])
    assert result.exit_code == 0
    assert "0.1.0" in result.output


def test_info(runner, tmp_path):
    synthetic_ls_stack(tmp_path / "ls.zarr", raw_shape_szx=(32, 24, 16))
    result = runner.invoke(cli, ["info", str(tmp_path / "ls.zarr")])
    assert result.exit_code == 0, result.output
    payload = json.loads(result.output)
    assert payload["layout"] == "fov"
    assert payload["positions"]["0"]["shape_tczyx"] == [1, 1, 32, 24, 16]


def test_deskew_verb_end_to_end(runner, tmp_path):
    synthetic_ls_stack(tmp_path / "ls.zarr", raw_shape_szx=(48, 32, 32))
    out = tmp_path / "out.zarr"
    result = runner.invoke(
        cli, ["deskew", str(tmp_path / "ls.zarr"), "-o", str(out)]
    )
    assert result.exit_code == 0, result.output
    pos = open_ngff(out).position()
    assert pos.shape[0] == 1
    assert np.asarray(pos.volume(0, 0)).max() > 0


def test_deconvolve_verb_hybrid_algorithm(runner, tmp_path):
    """`deconvolve --algorithm hybrid` runs the warm-started
    non-separable route end to end (CLI -> pipeline -> rl_hybrid) and
    writes a finite, nonnegative store."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.io.synthetic import tilted_gaussian_psf

    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 100, (10, 32, 24)).astype(np.float32)
    pos = create_fov(
        tmp_path / "in.zarr", shape=(1, 1) + vol.shape,
        dtype="float32",
    )
    pos.write((0, 0), vol)
    np.save(tmp_path / "psf.npy", tilted_gaussian_psf((5, 7, 7)))
    out = tmp_path / "out.zarr"
    result = runner.invoke(cli, [
        "deconvolve", str(tmp_path / "in.zarr"), "-o", str(out),
        "--psf", str(tmp_path / "psf.npy"),
        "--iterations", "2", "--algorithm", "hybrid",
    ])
    assert result.exit_code == 0, result.output
    data = np.asarray(open_ngff(out).position().volume(0, 0))
    assert np.isfinite(data).all() and (data >= 0).all()
    assert data.max() > 0


def test_track_verb(runner, tmp_path):
    synthetic_blob_fov(tmp_path / "tl.zarr", n_timepoints=3, shape_zyx=(8, 32, 32))
    cfg = tmp_path / "track.yml"
    cfg.write_text(
        "input_channel: BF\ntracking_channel: BF\ntracking_method: pcc\n"
    )
    out_csv = tmp_path / "shifts.csv"
    result = runner.invoke(
        cli,
        ["track", str(tmp_path / "tl.zarr"), "-c", str(cfg), "-o", str(out_csv)],
    )
    assert result.exit_code == 0, result.output
    assert out_csv.exists()
    assert len(out_csv.read_text().splitlines()) == 4  # header + 3


def test_replay_verb(runner, tmp_path):
    synthetic_blob_fov(tmp_path / "src.zarr", n_timepoints=2, shape_zyx=(4, 16, 16))
    result = runner.invoke(
        cli,
        ["replay", str(tmp_path / "src.zarr"), "-o", str(tmp_path / "out"), "-n", "demo"],
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "out" / "demo.zarr").exists()
    assert (tmp_path / "out" / "demo_summary_metadata.json").exists()


def test_microscope_seam(runner, tmp_path):
    """The second-microscope extension seam (reference
    cli/acquire.py:150-163 + shrimpy/isim/): listing, the isim
    coming-soon stub, unknown-name rejection, and registration."""
    import json as _json

    result = runner.invoke(cli, ["microscopes"])
    assert result.exit_code == 0, result.output
    listing = _json.loads(result.output)
    assert listing["mantis"]["implemented"] is True
    assert listing["mantis"]["ls_angle_deg"] == 30.0
    assert listing["isim"]["implemented"] is False

    # isim: friendly stub, no acquisition attempted (input not touched).
    synthetic_blob_fov(tmp_path / "s.zarr", n_timepoints=1, shape_zyx=(4, 16, 16))
    result = runner.invoke(cli, [
        "replay", str(tmp_path / "s.zarr"), "-o", str(tmp_path / "o"),
        "--microscope", "isim",
    ])
    assert result.exit_code == 0, result.output
    assert "not yet implemented" in result.output
    assert not (tmp_path / "o").exists()

    # Unknown microscope: loud error listing what exists.
    result = runner.invoke(cli, [
        "replay", str(tmp_path / "s.zarr"), "-o", str(tmp_path / "o2"),
        "--microscope", "nope",
    ])
    assert result.exit_code != 0
    assert "registered: isim, mantis" in result.output

    # Registration seam: a downstream profile becomes dispatchable.
    from shrimpy_tpu.config.microscopes import (
        MicroscopeProfile,
        _REGISTRY,
        register_microscope,
    )

    register_microscope(MicroscopeProfile(name="bench-scope", ls_angle_deg=25.0))
    try:
        result = runner.invoke(cli, [
            "replay", str(tmp_path / "s.zarr"), "-o", str(tmp_path / "o3"),
            "-n", "d", "--microscope", "bench-scope",
        ])
        assert result.exit_code == 0, result.output
        assert (tmp_path / "o3" / "d.zarr").exists()
    finally:
        _REGISTRY.pop("bench-scope", None)


def test_register_verb(runner, tmp_path):
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.io.synthetic import gaussian_blob

    pos = create_fov(
        tmp_path / "two.zarr", shape=(1, 2, 12, 32, 32), dtype="float32",
        channel_names=["phase", "gfp"],
    )
    fixed = gaussian_blob((12, 32, 32), (6.0, 16.0, 16.0), (2.0, 3.0, 3.0))
    moving = gaussian_blob((12, 32, 32), (7.0, 14.0, 19.0), (2.0, 3.0, 3.0))
    pos.write((0, 0), fixed)
    pos.write((0, 1), moving)
    out = tmp_path / "transform.json"
    result = runner.invoke(
        cli,
        [
            "register", str(tmp_path / "two.zarr"),
            "--fixed-channel", "phase", "--moving-channel", "gfp",
            "--method", "pcc", "-o", str(out),
        ],
    )
    assert result.exit_code == 0, result.output
    transform = json.loads(out.read_text())
    np.testing.assert_allclose(
        transform["translation_seed_zyx"], [1.0, -2.0, 3.0], atol=0.5
    )


def test_reconstruct_verb_with_repo_config(runner, tmp_path):
    """The shipped demo config drives the reconstruct verb end-to-end."""
    synthetic_ls_stack(tmp_path / "ls.zarr", raw_shape_szx=(40, 24, 32))
    result = runner.invoke(
        cli,
        [
            "reconstruct", str(tmp_path / "ls.zarr"),
            "-o", str(tmp_path / "out.zarr"),
            "-c", "configs/reconstruct_demo.yml",
        ],
    )
    assert result.exit_code == 0, result.output
    pos = open_ngff(tmp_path / "out.zarr").position()
    assert np.isfinite(pos.volume(0, 0)).all()


def test_shipped_configs_validate():
    from shrimpy_tpu.config import DynaTrackConfig, ReconstructSettings
    from shrimpy_tpu.config.schemas import load_yaml_config
    from shrimpy_tpu.engine import AcquisitionPlan

    load_yaml_config("configs/reconstruct_demo.yml", ReconstructSettings)
    load_yaml_config("configs/dynatrack_demo.yml", DynaTrackConfig)
    AcquisitionPlan.from_yaml("configs/plan_demo.yml")


def test_monitor_once(runner, tmp_path):
    synthetic_blob_fov(tmp_path / "tl.zarr", n_timepoints=2, shape_zyx=(4, 16, 16))
    result = runner.invoke(
        cli, ["monitor", str(tmp_path / "tl.zarr"), "--once"]
    )
    assert result.exit_code == 0, result.output
    status = json.loads(result.output.strip().splitlines()[-1])
    assert status["0"]["timepoints_written"] == 2
    assert status["0"]["latest"] == 1
    assert (tmp_path / "tl.zarr" / "_preview" / "0.png").exists()


def test_monitor_partial_store_uses_chunk_metadata(runner, tmp_path):
    """A growing store with only some timepoints on disk reports them
    from chunk metadata — no voxel scans (round-1 monitor was
    O(T x volume) per tick)."""
    import numpy as np

    from shrimpy_tpu.io.ngff import create_fov

    pos = create_fov(
        tmp_path / "grow.zarr", shape=(5, 1, 4, 16, 16), dtype="float32",
        channel_names=["c"], zyx_scale=(1.0, 1.0, 1.0),
    )
    pos.write((0, 0), np.ones((4, 16, 16), np.float32))
    pos.write((2, 0), np.ones((4, 16, 16), np.float32))
    result = runner.invoke(
        cli, ["monitor", str(tmp_path / "grow.zarr"), "--once"]
    )
    assert result.exit_code == 0, result.output
    status = json.loads(result.output.strip().splitlines()[-1])
    assert status["0"] == {"timepoints_written": 2, "latest": 2, "of": 5}


def test_monitor_consumes_progress_journal(runner, tmp_path):
    """Reconstruction outputs are monitored through their journal
    sidecar (authoritative: items are journaled only after their
    writes commit)."""
    synthetic_blob_fov(tmp_path / "out.zarr", n_timepoints=3, shape_zyx=(4, 16, 16))
    journal = tmp_path / "out.zarr.progress.jsonl"
    journal.write_text(
        json.dumps({"key": "0|0|0"}) + "\n" + json.dumps({"key": "0|1|0"}) + "\n"
    )
    result = runner.invoke(
        cli, ["monitor", str(tmp_path / "out.zarr"), "--once"]
    )
    assert result.exit_code == 0, result.output
    status = json.loads(result.output.strip().splitlines()[-1])
    assert status["0"]["timepoints_written"] == 2
    assert status["0"]["latest"] == 1


def test_measure_psf_verb(runner, tmp_path):
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.io.synthetic import gaussian_blob

    vol = np.zeros((32, 64, 64), np.float32)
    for c in [(16, 20, 20), (16, 44, 40)]:
        vol += gaussian_blob((32, 64, 64), c, (1.5, 2.0, 2.0), 1000.0)
    pos = create_fov(tmp_path / "beads.zarr", shape=(1, 1, 32, 64, 64),
                     dtype="float32", zyx_scale=(0.25, 0.1, 0.1))
    pos.write((0, 0), vol)
    result = runner.invoke(
        cli,
        ["measure-psf", str(tmp_path / "beads.zarr"), "-o",
         str(tmp_path / "psf"), "--threshold-percentile", "99.0"],
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "psf.npy").exists()
    # Logging lines may precede the JSON payload in captured output.
    report = json.loads(result.output[result.output.index("{"):])
    assert report["n_beads"] >= 1


def test_dual_arm_reconstruct(runner, tmp_path):
    """A top-level 'arms:' config fans out into per-arm output stores
    (the mantis labelfree/lightsheet split)."""
    from shrimpy_tpu.io.ngff import create_fov

    rng = np.random.default_rng(0)
    pos = create_fov(
        tmp_path / "dual.zarr", shape=(1, 2, 24, 24, 16), dtype="float32",
        channel_names=["BF", "GFP"], zyx_scale=(0.3, 0.116, 0.116),
    )
    pos.write(Ellipsis, rng.random((1, 2, 24, 24, 16), dtype=np.float32) * 50)

    cfg = tmp_path / "arms.yml"
    cfg.write_text(
        "arms:\n"
        "  labelfree:\n"
        "    channels: [BF]\n"
        "    phase:\n"
        "      transfer_function: {z_padding: 0}\n"
        "  lightsheet:\n"
        "    channels: [GFP]\n"
        "    deskew: {ls_angle_deg: 30.0}\n"
    )
    result = runner.invoke(
        cli,
        ["reconstruct", str(tmp_path / "dual.zarr"),
         "-o", str(tmp_path / "recon.zarr"), "-c", str(cfg)],
    )
    assert result.exit_code == 0, result.output
    lf = open_ngff(tmp_path / "recon_labelfree.zarr").position()
    ls = open_ngff(tmp_path / "recon_lightsheet.zarr").position()
    assert lf.shape[2:] == (24, 24, 16)      # phase preserves shape
    assert ls.shape[2:] != (24, 24, 16)      # deskew reshapes
    assert np.isfinite(lf.volume(0, 0)).all()
    assert np.isfinite(ls.volume(0, 0)).all()


def test_replay_with_viewer(runner, tmp_path):
    """--viewer spawns the monitor subprocess and renders previews."""
    import time as _time

    synthetic_blob_fov(tmp_path / "src.zarr", n_timepoints=2,
                       shape_zyx=(4, 32, 32))
    result = runner.invoke(
        cli,
        ["replay", str(tmp_path / "src.zarr"), "-o", str(tmp_path / "out"),
         "-n", "v", "--viewer", "--viewer-cache-mb", "4"],
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "out" / "v.zarr").exists()
    # preview dir is created by the monitor (PNG rendering is throttled
    # and best-effort; existence of the directory proves the wiring).
    assert (tmp_path / "out" / "preview").exists()


def test_register_across_stores(runner, tmp_path):
    """Dual-arm registration: the moving channel lives in a sibling
    store with a different extent."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.io.synthetic import gaussian_blob

    fixed = gaussian_blob((12, 32, 32), (6.0, 16.0, 16.0), (2.0, 3.0, 3.0))
    moving = gaussian_blob((12, 40, 28), (7.0, 18.0, 17.0), (2.0, 3.0, 3.0))
    fpos = create_fov(tmp_path / "lf.zarr", shape=(1, 1, 12, 32, 32),
                      dtype="float32", channel_names=["phase"])
    fpos.write((0, 0), fixed)
    mpos = create_fov(tmp_path / "ls.zarr", shape=(1, 1, 12, 40, 28),
                      dtype="float32", channel_names=["gfp"])
    mpos.write((0, 0), moving)

    out = tmp_path / "t.json"
    result = runner.invoke(
        cli,
        ["register", str(tmp_path / "lf.zarr"),
         "--fixed-channel", "phase", "--moving-channel", "gfp",
         "--moving-input", str(tmp_path / "ls.zarr"),
         "--method", "pcc", "-o", str(out)],
    )
    assert result.exit_code == 0, result.output
    transform = json.loads(out.read_text())
    # moving blob at (7,18,17) in a (12,40,28) grid center-matched onto
    # (12,32,32): after matching, its center sits at (7, 14, 19); the
    # fixed blob is at (6,16,16) -> displacement (+1, -2, +3).
    np.testing.assert_allclose(
        transform["translation_seed_zyx"], [1.0, -2.0, 3.0], atol=0.5
    )


def test_phase_verb_end_to_end(runner, tmp_path):
    """Brightfield defocus stack through the phase verb: recovers the
    simulated weak phase object."""
    from shrimpy_tpu.config import PhaseTransferFunctionSettings
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.io.synthetic import gaussian_blob
    from shrimpy_tpu.ops.phase import compute_transfer_function, simulate_defocus_stack

    shape = (12, 32, 32)
    tfs = PhaseTransferFunctionSettings(
        yx_pixel_size=0.116, z_pixel_size=0.25, z_padding=0
    )
    tf = compute_transfer_function(shape, tfs)
    phi = gaussian_blob(shape, (6.0, 16.0, 16.0), (2.0, 3.0, 3.0), amplitude=0.1)
    phi -= phi.mean()
    stack = simulate_defocus_stack(phi, tf, background=1.0)

    pos = create_fov(tmp_path / "bf.zarr", shape=(1, 1, *shape), dtype="float32",
                     channel_names=["BF"], zyx_scale=(0.25, 0.116, 0.116))
    pos.write((0, 0), stack)

    cfg = tmp_path / "phase.yml"
    cfg.write_text(
        "transfer_function:\n  z_padding: 0\n"
        "apply_inverse:\n  regularization_strength: 1.0e-4\n"
    )
    result = runner.invoke(
        cli,
        ["phase", str(tmp_path / "bf.zarr"), "-o", str(tmp_path / "out.zarr"),
         "--config", str(cfg)],
    )
    assert result.exit_code == 0, result.output
    recon = open_ngff(tmp_path / "out.zarr").position().volume(0, 0)
    corr = np.corrcoef(np.asarray(recon).ravel(), phi.ravel())[0, 1]
    assert corr > 0.8, corr


def test_monitor_live_attach(tmp_path, runner):
    """monitor --live attaches to a feeder's ring descriptor and renders
    follow-latest previews with the deskew side view."""
    from shrimpy_tpu.viewer.ring import FrameRing

    preview = tmp_path / "preview"
    preview.mkdir()
    ring = FrameRing(None, n_slots=8, frame_shape=(8, 16))
    try:
        (preview / "ring.json").write_text(json.dumps({
            "ring": ring.name, "n_slots": 8,
            "frame_shape": [8, 16], "dtype": "float32"}))
        lines = []
        for t in range(2):
            slots = [ring.write(t * 4 + z, np.full((8, 16), t + z, np.float32))
                     for z in range(4)]
            lines.append(json.dumps({
                "type": "volume", "t": t, "p": "0", "channel": "BF",
                "slots": slots, "seq0": t * 4, "shape": [4, 8, 16]}))
        (preview / "volumes.jsonl").write_text("\n".join(lines) + "\n")

        result = runner.invoke(cli, [
            "monitor", str(tmp_path), "--live", "--once",
            "--ls-angle-deg", "30", "--px-to-scan-ratio", "0.5",
        ])
        assert result.exit_code == 0, result.output
        status = json.loads(result.output.splitlines()[-1])
        assert status["displayed"]["0|BF"] == 1  # follow-latest
        assert (preview / "live_p0_BF.png").exists()
        state = json.loads((preview / "state.json").read_text())
        assert state["deskew"]["ls_angle_deg"] == 30.0
    finally:
        ring.close()


def test_plan_new_interactive_roundtrip(tmp_path, runner):
    """plan new builds a validated YAML from prompts; plan show resolves
    it (the Qt acquisition widget's authoring role, headless)."""
    out = tmp_path / "plan.yml"
    result = runner.invoke(cli, ["plan", "new", "-o", str(out)],
                           input="3\n1.5\nBF,GFP\ny\n0.9\nn\n")
    assert result.exit_code == 0, result.output
    result = runner.invoke(cli, ["plan", "show", str(out)])
    assert result.exit_code == 0
    shown = json.loads(result.output)
    assert shown["time"]["n_timepoints"] == 3
    assert shown["time"]["interval_s"] == 1.5
    assert [c["name"] for c in shown["channels"]] == ["BF", "GFP"]
    assert shown["autofocus"]["success_rate"] == 0.9


def test_plan_validate_against_store(tmp_path, runner):
    synthetic_blob_fov(tmp_path / "src.zarr", shape_zyx=(4, 16, 16),
                       n_timepoints=2, drift_zyx=(0, 0, 0),
                       zyx_scale=(1, 1, 1))
    good = tmp_path / "good.yml"
    good.write_text("time: {n_timepoints: 2}\nchannels: [{name: BF}]\n")
    result = runner.invoke(cli, ["plan", "validate", str(good),
                                 "--input", str(tmp_path / "src.zarr")])
    assert result.exit_code == 0, result.output
    assert json.loads(result.output.splitlines()[-1])["valid"]

    bad = tmp_path / "bad.yml"
    bad.write_text("time: {n_timepoints: 2}\nchannels: [{name: nope}]\n")
    result = runner.invoke(cli, ["plan", "validate", str(bad),
                                 "--input", str(tmp_path / "src.zarr")])
    assert result.exit_code != 0
    assert "nope" in result.output

    invalid = tmp_path / "invalid.yml"
    invalid.write_text("time: {n_timepoints: 0}\n")
    result = runner.invoke(cli, ["plan", "validate", str(invalid)])
    assert result.exit_code != 0
    assert "invalid plan" in result.output


def test_deskew_angle_defaults_from_microscope_profile(runner, tmp_path):
    """MicroscopeProfile.ls_angle_deg is load-bearing: with no
    --ls-angle-deg, the deskew verb takes the profile's angle, and a
    profile without one errors instead of silently using 30."""
    from shrimpy_tpu.config.microscopes import (
        MicroscopeProfile,
        register_microscope,
        _REGISTRY,
    )

    synthetic_ls_stack(tmp_path / "ls.zarr", raw_shape_szx=(32, 24, 16))
    # isim is declared-but-unimplemented: the seam message fires FIRST
    # (even with an explicit angle — no silent wrong-optics runs).
    result = runner.invoke(cli, [
        "deskew", str(tmp_path / "ls.zarr"), "-o", str(tmp_path / "o.zarr"),
        "--px-to-scan-ratio", "0.386", "--microscope", "isim",
    ])
    assert result.exit_code != 0
    assert "not yet implemented" in result.output

    register_microscope(MicroscopeProfile(name="no-angle-scope"))
    try:
        result = runner.invoke(cli, [
            "deskew", str(tmp_path / "ls.zarr"),
            "-o", str(tmp_path / "o.zarr"),
            "--px-to-scan-ratio", "0.386", "--microscope", "no-angle-scope",
        ])
        assert result.exit_code != 0
        assert "declares no light-sheet angle" in result.output
    finally:
        _REGISTRY.pop("no-angle-scope", None)

    register_microscope(MicroscopeProfile(
        name="steep-scope", ls_angle_deg=45.0,
    ))
    try:
        result = runner.invoke(cli, [
            "deskew", str(tmp_path / "ls.zarr"),
            "-o", str(tmp_path / "o45.zarr"),
            "--px-to-scan-ratio", "0.386", "--microscope", "steep-scope",
        ])
        assert result.exit_code == 0, result.output
        # 45-degree geometry: different output z extent than 30-degree.
        result30 = runner.invoke(cli, [
            "deskew", str(tmp_path / "ls.zarr"),
            "-o", str(tmp_path / "o30.zarr"),
            "--px-to-scan-ratio", "0.386",
        ])
        assert result30.exit_code == 0, result30.output
        z45 = open_ngff(tmp_path / "o45.zarr").position().shape[2]
        z30 = open_ngff(tmp_path / "o30.zarr").position().shape[2]
        assert z45 != z30
    finally:
        _REGISTRY.pop("steep-scope", None)


def test_replay_dual_rejects_wrong_arm_names(runner, tmp_path):
    """MicroscopeProfile.arms is load-bearing: replay-dual rejects a
    config whose arms don't match the instrument's inventory."""
    synthetic_blob_fov(tmp_path / "a.zarr", n_timepoints=1, shape_zyx=(4, 16, 16))
    cfg = tmp_path / "dual.yml"
    cfg.write_text(
        "arms:\n"
        f"  left: {{input: {tmp_path}/a.zarr}}\n"
        f"  right: {{input: {tmp_path}/a.zarr}}\n"
    )
    result = runner.invoke(cli, [
        "replay-dual", str(cfg), "-o", str(tmp_path / "o"),
    ])
    assert result.exit_code != 0
    assert "do not match microscope" in result.output

    # isim gets the coming-soon stub before any config parsing.
    result = runner.invoke(cli, [
        "replay-dual", str(cfg), "-o", str(tmp_path / "o"),
        "--microscope", "isim",
    ])
    assert result.exit_code == 0, result.output
    assert "not yet implemented" in result.output


def test_replay_dual_arm_inherits_profile_camera_mode(runner, tmp_path):
    """An arm named after a camera mode inherits it when the plan
    enables model_acquisition without choosing one (the mantis LF/LS
    cameras, reference archive acq_engine.py:540-598); an explicit
    mode in the plan wins."""
    for arm in ("lf", "ls"):
        synthetic_blob_fov(
            tmp_path / f"{arm}.zarr", n_timepoints=1, shape_zyx=(4, 16, 16)
        )
    cfg = tmp_path / "dual.yml"
    # lightsheet needs exposure > readout; give both arms 20 ms.
    plan = (
        "{time: {n_timepoints: 1}, "
        "channels: [{name: BF, exposure_ms: 20.0}], "
        "camera: {model_acquisition: true, time_scale: 0.0%s}}"
    )
    cfg.write_text(
        "arms:\n"
        f"  labelfree: {{input: {tmp_path}/lf.zarr, plan: {plan % ''}}}\n"
        f"  lightsheet: {{input: {tmp_path}/ls.zarr, "
        f"plan: {plan % ', mode: demo'}}}\n"
    )
    result = runner.invoke(cli, [
        "replay-dual", str(cfg), "-o", str(tmp_path / "o"), "-n", "dual",
    ])
    assert result.exit_code == 0, result.output
    lf = json.loads(
        (tmp_path / "o" / "dual_labelfree_summary_metadata.json").read_text()
    )
    ls = json.loads(
        (tmp_path / "o" / "dual_lightsheet_summary_metadata.json").read_text()
    )
    assert lf["plan"]["camera"]["mode"] == "labelfree"  # inherited
    assert ls["plan"]["camera"]["mode"] == "demo"  # explicit wins
    # Inherited labelfree physics: min(1000/(20+1.5), floor(30)) = 30.
    assert lf["camera_slice_rate_hz"]["BF"] == pytest.approx(30.0)
    assert ls["camera_slice_rate_hz"]["BF"] == pytest.approx(30.0)
