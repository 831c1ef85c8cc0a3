"""Virtual staining UNet + tracking preprocessor chain."""

import numpy as np
import pytest

# Heavyweight module (big compiles / end-to-end): excluded from the
# quick review-loop tier (docs/testing.md).
pytestmark = pytest.mark.slow

from shrimpy_tpu.config import DynaTrackConfig
from shrimpy_tpu.models import VirtualStainer, VSModelSettings
from shrimpy_tpu.tracking.preprocess import Preprocessor


def _small_settings(**kw):
    defaults = dict(
        in_slices=3, out_channels=["vs_nuclei"], base_width=8, depth=2,
        batch_slices=2,
    )
    defaults.update(kw)
    return VSModelSettings(**defaults)


def test_vs_predict_shapes(rng):
    stainer = VirtualStainer(_small_settings())
    vol = rng.random((5, 32, 32), dtype=np.float32)
    preds = stainer.predict(vol)
    assert set(preds) == {"vs_nuclei"}
    assert preds["vs_nuclei"].shape == (5, 32, 32)
    assert np.isfinite(np.asarray(preds["vs_nuclei"])).all()


def test_vs_deterministic_seeding(rng):
    vol = rng.random((4, 16, 16), dtype=np.float32)
    a = np.asarray(VirtualStainer(_small_settings(seed=1)).predict(vol)["vs_nuclei"])
    b = np.asarray(VirtualStainer(_small_settings(seed=1)).predict(vol)["vs_nuclei"])
    c = np.asarray(VirtualStainer(_small_settings(seed=2)).predict(vol)["vs_nuclei"])
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_vs_rejects_unaligned_yx(rng):
    stainer = VirtualStainer(_small_settings())
    with pytest.raises(AssertionError, match="divisible"):
        stainer.predict(rng.random((3, 30, 30), dtype=np.float32))


def test_vs_ckpt_roundtrip(tmp_path, rng):
    s = _small_settings(seed=5)
    stainer = VirtualStainer(s)
    stainer.save_ckpt(tmp_path / "ckpt")
    loaded = VirtualStainer(_small_settings(seed=99, ckpt_path=str(tmp_path / "ckpt")))
    vol = rng.random((3, 16, 16), dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(stainer.predict(vol)["vs_nuclei"]),
        np.asarray(loaded.predict(vol)["vs_nuclei"]),
    )


def test_preprocessor_chain_deskew_phase_vs(rng):
    cfg = DynaTrackConfig(
        input_channel="BF",
        tracking_channel="vs_nuclei",
        preprocessing=["deskew", "phase", "vs"],
        deskew={"ls_angle_deg": 30.0, "px_to_scan_ratio": 0.386},
        phase={
            "transfer_function": {"yx_pixel_size": 0.116, "z_pixel_size": 0.2,
                                   "z_padding": 0},
        },
        virtual_staining={
            "in_slices": 3, "out_channels": ["vs_nuclei"], "base_width": 8,
            "depth": 2, "batch_slices": 2,
        },
    )
    pre = Preprocessor(cfg)
    raw = rng.random((40, 24, 32), dtype=np.float32) * 100
    products = pre(raw)
    assert {"raw", "deskewed", "phase", "vs_nuclei"} <= set(products)
    assert products["vs_nuclei"].shape == products["phase"].shape
    stack = pre.tracking_stack(raw)
    np.testing.assert_array_equal(stack, products["vs_nuclei"])


def test_preprocessor_requires_phase_before_vs():
    with pytest.raises(ValueError, match="requires 'phase'"):
        DynaTrackConfig(
            input_channel="BF",
            tracking_channel="BF",
            preprocessing=["vs"],
        )


@pytest.mark.parametrize("in_slices", [4, 5])
def test_sample_batch_window_width(in_slices, rng, tmp_path):
    """The sampled z window is EXACTLY in_slices planes for both
    parities (the old z-half:z+half+1 slice always produced an odd
    count, crashing even-in_slices training)."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import _sample_batch, _VolumeBank

    shape = (1, 2, in_slices, 24, 24)  # nz == in_slices: tightest case
    pos = create_fov(tmp_path / "w.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "nuclei"])
    pos.write(Ellipsis, rng.random(shape, dtype=np.float32))
    bank = _VolumeBank([(pos, 0, 0, [1], slice(None))])
    x, y = _sample_batch(
        np.random.default_rng(0), bank,
        in_slices=in_slices, patch=16, batch=3,
    )
    assert x.shape == (3, 16, 16, in_slices)
    assert y.shape == (3, 16, 16, 1)


def test_train_vsunet_rejects_thin_store_and_bad_patch(tmp_path, rng):
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import train_vsunet

    shape = (1, 2, 2, 32, 32)  # nz=2 < default in_slices=5
    pos = create_fov(tmp_path / "thin.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "nuclei"])
    pos.write(Ellipsis, rng.random(shape, dtype=np.float32))
    with pytest.raises(ValueError, match="z planes"):
        train_vsunet(
            tmp_path / "thin.zarr", input_channel="phase",
            target_channels=["nuclei"],
            settings=_small_settings(out_channels=["nuclei"]),
            steps=1, patch=32,
        )
    # patch not divisible by 2**pad_exp errors early, not deep in jax.
    shape = (1, 2, 8, 32, 32)
    pos = create_fov(tmp_path / "ok.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "nuclei"])
    pos.write(Ellipsis, rng.random(shape, dtype=np.float32))
    with pytest.raises(ValueError, match="divisible"):
        train_vsunet(
            tmp_path / "ok.zarr", input_channel="phase",
            target_channels=["nuclei"],
            settings=_small_settings(out_channels=["nuclei"]),
            steps=1, patch=30,
        )


def test_train_vsunet_learns_identityish(tmp_path, rng):
    """A tiny training run on a learnable mapping (target = input) must
    reduce the loss and produce a checkpoint usable for inference."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import train_vsunet

    shape = (2, 2, 8, 64, 64)
    pos = create_fov(tmp_path / "pairs.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "nuclei"])
    data = rng.random(shape, dtype=np.float32)
    data[:, 1] = data[:, 0]  # target == input: learnable
    pos.write(Ellipsis, data)

    settings = _small_settings(out_channels=["nuclei"])
    stainer, report = train_vsunet(
        tmp_path / "pairs.zarr",
        input_channel="phase",
        target_channels=["nuclei"],
        settings=settings,
        steps=30,
        batch=2,
        patch=32,
        learning_rate=3e-3,
        ckpt_path=tmp_path / "ckpt",
    )
    early = np.mean(report.losses[:5])
    late = np.mean(report.losses[-5:])
    assert late < early, (early, late)

    # The checkpoint round-trips into inference.
    from shrimpy_tpu.models import VirtualStainer

    loaded = VirtualStainer(
        _small_settings(out_channels=["nuclei"], ckpt_path=str(tmp_path / "ckpt"))
    )
    vol = rng.random((4, 32, 32), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.predict(vol)["nuclei"]),
        np.asarray(stainer.predict(vol)["nuclei"]),
        atol=1e-6,
    )


# -- named architectures + checkpoint schema (VERDICT r1 item 10) -------------


def test_unext2_predict_shapes(rng):
    s = VSModelSettings(
        architecture="unext2",
        arch_config={"encoder_blocks": [1, 1], "dims": [8, 16]},
        in_slices=3, out_channels=["vs_nuclei"], batch_slices=2,
    )
    stainer = VirtualStainer(s)
    assert stainer.pad_exp == 3  # stem 4x + 1 downsample
    vol = rng.random((3, 32, 32), dtype=np.float32)
    preds = stainer.predict(vol)
    assert preds["vs_nuclei"].shape == (3, 32, 32)
    assert np.isfinite(np.asarray(preds["vs_nuclei"])).all()


def test_arch_config_rejects_unknown_keys():
    with pytest.raises(Exception, match="extra|unexpected|not permitted"):
        VirtualStainer(VSModelSettings(
            architecture="unext2", arch_config={"dimz": [8, 16]},
            out_channels=["x"],
        ))
    with pytest.raises(ValueError, match="same number of stages"):
        VirtualStainer(VSModelSettings(
            architecture="unext2",
            arch_config={"encoder_blocks": [1], "dims": [8, 16]},
            out_channels=["x"],
        ))


def test_ckpt_sidecar_reconstructs_architecture(tmp_path, rng):
    """ckpt_path alone rebuilds the trained net from vs_model.json."""
    import json as _json

    from shrimpy_tpu.models.vsunet import CKPT_SIDECAR

    s = VSModelSettings(
        architecture="unext2",
        arch_config={"encoder_blocks": [1, 1], "dims": [8, 16]},
        in_slices=3, out_channels=["n"], batch_slices=2, seed=7,
    )
    stainer = VirtualStainer(s)
    stainer.save_ckpt(tmp_path / "ckpt")
    sidecar = _json.loads((tmp_path / "ckpt" / CKPT_SIDECAR).read_text())
    assert sidecar["architecture"] == "unext2"
    assert sidecar["arch_config"]["dims"] == [8, 16]

    loaded = VirtualStainer.from_ckpt(tmp_path / "ckpt")
    assert loaded.settings.architecture == "unext2"
    assert loaded.settings.in_slices == 3
    vol = rng.random((3, 16, 16), dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(stainer.predict(vol)["n"]),
        np.asarray(loaded.predict(vol)["n"]),
    )


def test_ckpt_architecture_conflict_errors(tmp_path):
    """Explicitly configured fields that contradict the checkpoint's
    sidecar error early instead of loading mis-shaped weights."""
    stainer = VirtualStainer(_small_settings(out_channels=["n"]))
    stainer.save_ckpt(tmp_path / "ckpt")
    with pytest.raises(ValueError, match="conflicts with the checkpoint"):
        VirtualStainer(VSModelSettings(
            out_channels=["n"], depth=3, base_width=8, in_slices=3,
            ckpt_path=str(tmp_path / "ckpt"),
        ))
    with pytest.raises(ValueError, match="conflicts with the checkpoint"):
        VirtualStainer(VSModelSettings(
            architecture="unext2", out_channels=["n"],
            ckpt_path=str(tmp_path / "ckpt"),
        ))


def test_train_unext2_roundtrip_through_preprocess_chain(tmp_path, rng):
    """The VERDICT 'done' criterion: train -> ckpt ->
    virtual_staining.ckpt_path -> preprocess chain, on a named
    architecture."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import train_vsunet

    shape = (2, 2, 6, 32, 32)
    pos = create_fov(tmp_path / "pairs.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "vs_nuclei"])
    data = rng.random(shape, dtype=np.float32)
    data[:, 1] = data[:, 0]
    pos.write(Ellipsis, data)

    settings = VSModelSettings(
        architecture="unext2",
        arch_config={"encoder_blocks": [1, 1], "dims": [8, 16]},
        in_slices=3, out_channels=["vs_nuclei"], batch_slices=2,
    )
    _, report = train_vsunet(
        tmp_path / "pairs.zarr", input_channel="phase",
        target_channels=["vs_nuclei"], settings=settings,
        steps=10, batch=2, patch=16, ckpt_path=tmp_path / "ckpt",
        val_every=5, val_fraction=0.5,
    )
    assert report.val_losses  # the val tier ran
    assert report.best_val_loss is not None

    cfg = DynaTrackConfig(
        input_channel="BF",
        tracking_channel="vs_nuclei",
        preprocessing=["deskew", "phase", "vs"],
        deskew={"ls_angle_deg": 30.0, "px_to_scan_ratio": 0.386},
        phase={"transfer_function": {"yx_pixel_size": 0.116,
                                      "z_pixel_size": 0.2, "z_padding": 0}},
        # ckpt_path alone: architecture comes from the sidecar.
        virtual_staining={"ckpt_path": str(tmp_path / "ckpt")},
    )
    pre = Preprocessor(cfg)
    assert pre.stainer.settings.architecture == "unext2"
    raw = rng.random((40, 24, 32), dtype=np.float32) * 100
    products = pre(raw)
    assert "vs_nuclei" in products
    assert products["vs_nuclei"].shape == products["phase"].shape


def test_early_stop_on_unlearnable_target(tmp_path, rng):
    """Pure-noise targets cannot improve validation loss: training
    stops early and keeps the best-validation parameters."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import train_vsunet

    shape = (1, 2, 6, 48, 48)
    pos = create_fov(tmp_path / "noise.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "noise"])
    data = rng.random(shape, dtype=np.float32)
    pos.write(Ellipsis, data)

    _, report = train_vsunet(
        tmp_path / "noise.zarr", input_channel="phase",
        target_channels=["noise"],
        settings=_small_settings(out_channels=["noise"]),
        steps=400, batch=2, patch=16, learning_rate=1e-2,
        val_every=2, early_stop_patience=3, val_fraction=0.4,
    )
    assert report.stopped_early
    assert report.steps < 400
    assert len(report.val_losses) >= 4


def test_schema_default_out_channels_in_sync():
    """config/schemas.py hardcodes VSModelSettings' default
    out_channels (to avoid importing flax there); keep them in sync."""
    assert VSModelSettings().out_channels == ["vs_nuclei", "vs_membrane"]


def test_ckpt_partial_arch_config_is_not_a_conflict(tmp_path, rng):
    """The exact (partial) arch_config that produced a checkpoint can
    load it: user dicts are resolved through the architecture schema
    before comparing against the sidecar's resolved dump."""
    cfg = {"encoder_blocks": [1, 1], "dims": [8, 16]}  # no decoder_conv_blocks
    s = VSModelSettings(architecture="unext2", arch_config=cfg,
                        in_slices=3, out_channels=["n"], batch_slices=2)
    VirtualStainer(s).save_ckpt(tmp_path / "ckpt")
    loaded = VirtualStainer(VSModelSettings(
        architecture="unext2", arch_config=dict(cfg),
        in_slices=3, out_channels=["n"], batch_slices=2,
        ckpt_path=str(tmp_path / "ckpt"),
    ))
    assert loaded.settings.arch_config["decoder_conv_blocks"] == 1


def test_train_short_run_keeps_trained_params(tmp_path, rng):
    """steps < val_every: no validation eval ever runs, but the TRAINED
    parameters must be kept (not the initial ones)."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import train_vsunet

    shape = (2, 2, 6, 32, 32)
    pos = create_fov(tmp_path / "p.zarr", shape=shape, dtype="float32",
                     channel_names=["phase", "n"])
    data = rng.random(shape, dtype=np.float32)
    data[:, 1] = data[:, 0]
    pos.write(Ellipsis, data)

    settings = _small_settings(out_channels=["n"])
    init_params = VirtualStainer(_small_settings(out_channels=["n"])).params
    stainer, report = train_vsunet(
        tmp_path / "p.zarr", input_channel="phase", target_channels=["n"],
        settings=settings, steps=8, batch=2, patch=16,
        val_every=100, val_fraction=0.5,
    )
    assert report.val_losses == []
    import jax

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        stainer.params, init_params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0  # trained, not init


def test_train_val_fraction_validation(tmp_path, rng):
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.models.train import train_vsunet

    pos = create_fov(tmp_path / "p.zarr", shape=(1, 2, 6, 32, 32),
                     dtype="float32", channel_names=["phase", "n"])
    pos.write(Ellipsis, rng.random((1, 2, 6, 32, 32), dtype=np.float32))
    with pytest.raises(ValueError, match="val_fraction"):
        train_vsunet(tmp_path / "p.zarr", input_channel="phase",
                     target_channels=["n"],
                     settings=_small_settings(out_channels=["n"]),
                     steps=2, val_fraction=1.5)
