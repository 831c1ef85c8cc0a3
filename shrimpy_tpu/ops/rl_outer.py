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
* HBM cost: two extra HALF-PRECISION correction carries (the step
  ``dx_k = x_k - x_{k-1}`` and the gradient ``g_{k-1}``, both bf16)
  plus two scalars, i.e. +1.0 estimate-volume over plain RL — and,
  just as load-bearing, the extrapolated point ``y_k`` has NO
  consumer after the step (the body comment), so backends whose
  update pass aliases est in place (the fused Pallas kernel) never
  pay a protective copy of ``y``. Both were required on hardware:
  f32 state OOMed the production deskewed carry (128, 2888, 1600) by
  2 GB on v5e (16 GB HBM), and so did bf16 state with a post-step
  read of ``y``; the shipped form compiles and runs there (measured).
  Numerics: dx and g are small corrections to the estimate, so bf16
  (0.4 % relative) perturbs the extrapolated point by ~4e-4 of the
  estimate worst-case and the step length ``alpha`` by ~1 %; both are
  inside the acceleration's trajectory-level contract (the
  multiplicative RL update contracts perturbations ~0.92/iter), and
  the alpha-0 startup keeps <= 2 iteration runs bit-identical to
  plain RL regardless of state dtype. The denominator
  ``<g_{k-1}, g_{k-1}>`` is carried as an f32 scalar computed while
  the gradient is fresh.
* Time cost: +8.4 %/iter measured on the dft2z backend at
  (128, 1444, 800) on v5e — the extrapolation's elementwise/reduce
  epilogue is noise against a 192 ms transform-bound iteration — for
  ~2x fewer iterations to the same point on the convergence
  trajectory (accel-10 lands between plain-20 and plain-30;
  docs/kernels.md). On the fused separable backend the same epilogue
  is NOT noise: it is HBM-bound XLA elementwise + while-backedge
  copies worth ~43 ms/iter against a 35.4 ms/iter kernel (measured
  78.8 ms/iter accelerated at the production carry). That backend
  therefore fuses the extrapolation into its Pallas passes instead
  (rl_fused.py modes ratio_accel/mult_accel — 53.3 ms/iter measured,
  1.33x over plain RL-20 at matched quality) and uses this generic
  loop only as the SHRIMPY_RL_FUSE_ACCEL=0 fallback/bake-off path;
  the FFT/DFT backends, whose iteration dwarfs the epilogue, ride
  this loop in production.

The reference runs plain RL only (biahub deconvolution, reference
``shrimpy/dynatrack/preprocessing.py:296-317``); acceleration is a
strict capability add, opt-in via ``DeconvolveSettings.acceleration``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def run_rl_outer(phases, est0, accelerated: bool, state_dtype=jnp.bfloat16):
    """Run the RL phases; optionally Biggs-Andrews accelerated.

    ``phases``: sequence of ``(step, length)`` — consecutive segments
    of the iteration that may differ in step internals (e.g. the fused
    kernel's low-precision leading phase); the accelerated carry
    (dx, g_prev, den_prev, alpha) persists ACROSS phase boundaries,
    exactly as plain RL's estimate does. Zero-length phases are
    skipped. ``state_dtype`` holds the two correction carries (see the
    module docstring's memory/numerics note; bf16 is what lets the
    production deskewed carry fit accelerated on a 16 GB chip).
    """
    if not accelerated:
        est = est0
        for step, length in phases:
            if length:
                est, _ = jax.lax.scan(step, est, None, length=length)
        return est

    def make_body(step):
        def body(carry, _):
            x, dx, g_prev, den_prev, alpha = carry
            f32 = x.dtype
            y = jnp.maximum(x + alpha * dx.astype(f32), 0.0)
            x_new, _ = step(y, None)
            # MEMORY CONTRACT (measured on the production deskewed
            # carry, v5e 16 GB): the extrapolated point y must have NO
            # consumer after the step. The fused backend's mult pass
            # updates est in place (input_output_aliases — rl_fused.py
            # caps plain RL at 3 carry buffers), so any post-step read
            # of y forces XLA's copy-insertion to materialize a 4th
            # 2.6 GB protective copy of y — which OOMed the
            # accelerated production carry by 2 GB. The gradient
            # g = x_new - y is therefore rebuilt from values that are
            # still live (x and dx are loop state) via the exact
            # identity y - x = max(alpha*dx, -x)  (the relu clamp only
            # rewrites the step where x + alpha*dx < 0), i.e.
            #   g = (x_new - x) - max(alpha*dx, -x)
            # — pure elementwise fusion over state, no volume temp,
            # exact up to one f32 rounding of (x + alpha*dx). g exists
            # only in its bf16 carry form; the alpha reductions upcast
            # in-fusion. The two expressions for the applied step are
            # structurally different on purpose: CSE must NOT unify
            # them back into a shared y value, which would recreate
            # the post-step consumer and the 2.6 GB copy.
            gb = (
                (x_new - x)
                - jnp.maximum(alpha * dx.astype(f32), -x)
            ).astype(g_prev.dtype)
            num = jnp.sum(gb.astype(f32) * g_prev.astype(f32))
            den = jnp.sum(jnp.square(gb.astype(f32)))
            alpha_next = jnp.clip(num / (den_prev + 1e-30), 0.0, 0.999)
            carry_next = (
                x_new,
                (x_new - x).astype(dx.dtype),
                gb,
                den,
                alpha_next,
            )
            return carry_next, None

        return body

    zeros = jnp.zeros(est0.shape, state_dtype)
    carry = (est0, zeros, zeros, jnp.float32(0.0), jnp.float32(0.0))
    for step, length in phases:
        if length:
            carry, _ = jax.lax.scan(
                make_body(step), carry, None, length=length
            )
    return carry[0]
