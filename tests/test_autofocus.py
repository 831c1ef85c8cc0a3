"""Autofocus: focus metric + demo-PFS simulation."""

import numpy as np
import pytest
from scipy import ndimage

from shrimpy_tpu.engine.autofocus import DemoAutofocus, focus_from_transverse_band
from shrimpy_tpu.engine.plan import AutofocusPlan


def _defocus_stack(in_focus: int = 7, nz: int = 15, size: int = 64, seed=0):
    """Sharp texture at `in_focus`, increasingly blurred away from it."""
    rng = np.random.default_rng(seed)
    sharp = rng.random((size, size)).astype(np.float32)
    stack = np.stack(
        [
            ndimage.gaussian_filter(sharp, abs(z - in_focus) * 0.8 + 0.01)
            for z in range(nz)
        ]
    )
    return stack


def test_focus_metric_finds_sharpest_slice():
    stack = _defocus_stack(in_focus=7)
    idx = focus_from_transverse_band(stack, pixel_size_um=0.116)
    assert idx == 7


def test_focus_metric_matmul_matches_xla():
    """The half-spectrum matmul-DFT metric (interior x bins double-
    weighted) equals the full-spectrum jnp.fft metric — including an
    odd x extent, where no bin is its own mirror except DC."""
    from shrimpy_tpu.engine.autofocus import _focus_metric_jit
    import jax.numpy as jnp

    for size in (64, 63):
        stack = _defocus_stack(in_focus=5, nz=9, size=size)
        args = (jnp.asarray(stack), jnp.float32(0.116), jnp.float32(0.55),
                jnp.float32(1.35), (0.125, 0.25))
        xla = np.asarray(_focus_metric_jit(*args, "xla"))
        mm = np.asarray(_focus_metric_jit(*args, "matmul"))
        np.testing.assert_allclose(mm, xla, rtol=1e-4)


def test_focus_metric_threshold_rejects_flat_stack():
    stack = np.ones((9, 32, 32), np.float32)
    stack += np.random.default_rng(0).normal(0, 1e-6, stack.shape)
    idx = focus_from_transverse_band(
        stack, pixel_size_um=0.116, threshold=10.0
    )
    assert idx is None  # no prominent focus -> caller extends the range


def test_demo_autofocus_deterministic_failures():
    plan = AutofocusPlan(enabled=True, fail_at_indices=[2, 5], success_rate=1.0)
    af = DemoAutofocus(plan, n_positions=3)
    results = [af.engage(t, p) for t in range(2) for p in range(3)]
    # flat indices 2 and 5 fail: (t=0,p=2) and (t=1,p=2)
    assert results == [True, True, False, True, True, False]


def test_demo_autofocus_disabled_always_locks():
    af = DemoAutofocus(AutofocusPlan(enabled=False), 2)
    assert all(af.engage(t, p) for t in range(3) for p in range(2))
    # Declared failure behavior with the feature off would be silently
    # inert: the schema rejects the contradiction.
    with pytest.raises(ValueError, match="enabled"):
        AutofocusPlan(enabled=False, success_rate=0.0)
    with pytest.raises(ValueError, match="enabled"):
        AutofocusPlan(fail_at_indices=[1])


def test_demo_autofocus_seeded_rate():
    plan = AutofocusPlan(enabled=True, success_rate=0.5, seed=123)
    af_a = DemoAutofocus(plan, 1)
    af_b = DemoAutofocus(plan, 1)
    a = [af_a.engage(t, 0) for t in range(20)]
    b = [af_b.engage(t, 0) for t in range(20)]
    assert a == b  # seeded -> reproducible
    assert any(a) and not all(a)
