"""Virtual staining UNet + tracking preprocessor chain."""

import numpy as np
import pytest

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
