"""Shared Richardson-Lucy outer loop: plain scan or Biggs-Andrews.

Every RL backend in this package — the FFT/DFT family
(``ops/deconv.py``), the separable matmul/linear_pallas/zy_pallas
paths, and the fused Pallas kernels (``ops/rl_fused.py``,
``ops/rl_fused_iter.py``) — iterates the same shape of update:
``step(est, None) -> (est, None)``, one multiplicative RL iteration.
This module owns the loop around it so acceleration is implemented
once and every backend inherits it.

Accelerated mode is Biggs-Andrews vector extrapolation (Biggs &
Andrews, "Acceleration of iterative image restoration algorithms",
Appl. Opt. 36(8):1766, 1997): predict ``y_k = x_k + alpha_k (x_k -
x_{k-1})`` and update from ``y_k``, with ``alpha_k = <g_{k-1}, g_{k-2}>
/ <g_{k-2}, g_{k-2}>`` clipped to [0, 1) and ``g_j = x_{j+1} - y_j``.
Properties the backends rely on:

* The first two updates run plain (alpha is 0 until two gradients
  exist — the paper's startup), so accelerated runs of <= 2 iterations
  are bit-identical to plain RL.
* The extrapolation is a LINEAR combination of trajectory states plus
  a clamp at 0, so every linear carry invariant the backends maintain
  (zero pad regions of the linear_pallas carry, wrap/halo copies of
  the fused layouts, eps floors decaying multiplicatively) is
  preserved; zeros are absorbing under the multiplicative update, the
  same contract the permanently-padded carries already use.
* Cost: two extra estimate-sized carries (x_prev, g_prev) and two
  reductions per iteration — measured +8.4%/iter on the dft2z backend
  at (128, 1444, 800) on v5e, for ~2x fewer iterations to the same
  point on the convergence trajectory (accel-10 lands between plain-20
  and plain-30; docs/kernels.md).

The reference runs plain RL only (biahub deconvolution, reference
``shrimpy/dynatrack/preprocessing.py:296-317``); acceleration is a
strict capability add, opt-in via ``DeconvolveSettings.acceleration``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def run_rl_outer(phases, est0, accelerated: bool):
    """Run the RL phases; optionally Biggs-Andrews accelerated.

    ``phases``: sequence of ``(step, length)`` — consecutive segments
    of the iteration that may differ in step internals (e.g. the fused
    kernel's low-precision leading phase); the accelerated carry
    (x_prev, g_prev, alpha) persists ACROSS phase boundaries, exactly
    as plain RL's estimate does. Zero-length phases are skipped.
    """
    if not accelerated:
        est = est0
        for step, length in phases:
            if length:
                est, _ = jax.lax.scan(step, est, None, length=length)
        return est

    def make_body(step):
        def body(carry, _):
            x, x_prev, g_prev, alpha = carry
            y = jnp.maximum(x + alpha * (x - x_prev), 0.0)
            x_new, _ = step(y, None)
            g = x_new - y
            num = jnp.sum(g * g_prev)
            den = jnp.sum(g_prev * g_prev)
            alpha_next = jnp.clip(num / (den + 1e-30), 0.0, 0.999)
            return (x_new, x, g, alpha_next), None

        return body

    carry = (est0, est0, jnp.zeros_like(est0), jnp.float32(0.0))
    for step, length in phases:
        if length:
            carry, _ = jax.lax.scan(
                make_body(step), carry, None, length=length
            )
    return carry[0]
