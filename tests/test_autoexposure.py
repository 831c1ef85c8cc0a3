"""Autoexposure algorithms + escalation (reference autoexposure.py parity)."""

import numpy as np
import pytest

from shrimpy_tpu.engine.autoexposure import (
    AutoexposureSettings,
    autoexpose_with_escalation,
    intensity_percentile,
    load_manual_exposures,
    masked_mean_intensity,
    mean_intensity,
)

S = AutoexposureSettings(
    min_intensity=100.0,
    max_intensity=60000.0,
    target_intensity=30000.0,
    min_exposure_ms=1.0,
    max_exposure_ms=100.0,
    default_exposure_ms=10.0,
)


def test_mean_intensity_well_exposed():
    img = np.full((32, 32), 30000.0)
    flag, exp, power = mean_intensity(img, 10.0, 50.0, S)
    assert flag == 0 and exp == 10.0 and power == 50.0


def test_mean_intensity_underexposed_scales_up():
    img = np.full((32, 32), 50.0)
    flag, exp, _ = mean_intensity(img, 10.0, 50.0, S)
    assert flag == -1
    assert exp == 100.0  # clipped at max


def test_mean_intensity_overexposed_scales_down():
    img = np.full((32, 32), 65000.0)
    flag, exp, _ = mean_intensity(img, 10.0, 50.0, S)
    assert flag == 1
    assert exp == pytest.approx(10.0 * 30000.0 / 65000.0, rel=1e-6)


def test_masked_mean_ignores_hot_pixels(rng):
    img = np.full((64, 64), 30000.0)
    img[0, 0] = 1e9  # hot pixel must not trigger overexposure
    flag, exp, _ = masked_mean_intensity(img, 10.0, 50.0, S)
    assert flag == 0 and exp == 10.0


def test_intensity_percentile_overexposed():
    img = np.full((32, 32), 65000.0)
    flag, exp, _ = intensity_percentile(img, 10.0, 50.0, S)
    assert flag == 1
    assert exp == pytest.approx(8.0)  # relative step 0.8


def test_escalation_raises_laser_power_first():
    # Image is dark regardless of exposure: power must double.
    calls = []

    def acquire(exposure, power):
        calls.append((exposure, power))
        return np.full((16, 16), power * 10.0)  # brightens with power

    exp, power, ok = autoexpose_with_escalation(
        acquire, S, algorithm="mean_intensity", laser_power=1.0, max_rounds=10
    )
    assert ok
    assert power > 1.0  # escalated
    assert len(calls) >= 2


def test_manual_csv_loader(tmp_path):
    csv = tmp_path / "illumination.csv"
    csv.write_text("well,exposure_ms,laser_power\nA1,12.5,30\nB2,8.0,50\n")
    table = load_manual_exposures(csv)
    assert table["A1"] == (12.5, 30.0)
    assert table["B2"] == (8.0, 50.0)
