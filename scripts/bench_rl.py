"""RL micro-benchmarks on the real TPU (run ONE at a time).

Usage: python scripts/bench_rl.py <case> [geom]
  geom: z,y,x of the deconvolution INPUT volume (default 128,2888,820
  ~ the deskewed production-half geometry).

Cases
-----
  rl20            linear_pallas RL-20 end-to-end
  rl20_matmul     circulant-matmul backend RL-20
  rl20_fused      fused-kernel RL-20 (the TPU default backend)
  rl20_fused_iter whole-iteration fused RL-20 (opt-in backend)
  rl10_biggs      fused backend, Biggs-accelerated RL-10 (the RL-20-
                  equivalent budget; measures the acceleration carry
                  overhead on the production kernel)
  parity_fused    fused RL-20 vs the fp64 oracle on the REAL MXU
  parity_fused_iter  fused_iter RL-20 vs the fp64 oracle on the REAL MXU
  parity_biggs    in-kernel Biggs RL-10 vs the generic rl_outer
                  epilogue, both on the REAL MXU
  convzy          one fused z+y kernel call (per-call cost)
  einsum_x        one dense-x Toeplitz einsum (legacy x pass)
  einsum_x_banded one block-banded-128 x application

_sync/_time intentionally mirror bench.py's helpers (standalone script;
keep in step with bench.py if the tunnel sync workaround changes).

Prints one JSON line per case. Timing is wall-clock around a scalar
readback (the only reliable device sync on the tunneled transport).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time(fn, repeats=3):
    fn()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    case = sys.argv[1]
    geom = (128, 2888, 820)
    if len(sys.argv) > 2:
        geom = tuple(int(v) for v in sys.argv[2].split(","))

    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import gaussian_psf, richardson_lucy

    psf = gaussian_psf((9, 21, 21), (1.5, 3.0, 3.0))
    key = jax.random.key(0)
    vol = jax.random.uniform(key, geom, jnp.float32, 0.0, 100.0)
    out = {"case": case, "geom": geom}

    N_LOOP = 20

    def _loop(op):
        """Iterate op N times inside ONE jit program (tunnel dispatch
        latency otherwise dominates single-call timings)."""
        import jax as _jax

        @_jax.jit
        def run(v0):
            def body(v, _):
                return op(v), None

            v, _ = _jax.lax.scan(body, v0, None, length=N_LOOP)
            return v

        return run

    if case in (
        "rl20", "rl20_matmul", "rl20_fused", "rl20_fused_iter",
        "rl10_biggs",
    ):
        backend = {
            "rl20": "linear_pallas",
            "rl20_matmul": "matmul",
            "rl20_fused": "fused",
            "rl20_fused_iter": "fused_iter",
            "rl10_biggs": "fused",
        }[case]
        iters = 10 if case == "rl10_biggs" else 20
        settings = DeconvolveSettings(
            iterations=iters, algorithm="separable",
            separable_backend=backend,
            acceleration="biggs" if case == "rl10_biggs" else "none",
        )
        t = _time(lambda: _sync(richardson_lucy(vol, psf, settings)))
        out |= {
            "seconds": round(t, 4),
            "ms_per_iter": round(t / iters * 1e3, 2),
        }
    elif case == "convzy":
        from shrimpy_tpu.ops.conv3_pallas import (
            _convzy_linear_jit,
            lp_layout,
            lp_pad,
            lp_y_stencil,
        )
        from shrimpy_tpu.ops.deconv import separable_decompose

        terms = separable_decompose(psf / psf.sum())
        wz, wy, wx = terms[0]
        rz, ry = len(wz) // 2, len(wy) // 2
        g_shape = tuple(n + 2 * r for n, r in zip(geom, (rz, ry, len(wx) // 2)))
        layout = lp_layout(g_shape, rz, ry)
        carry = lp_pad(jnp.zeros(g_shape, jnp.float32) + 1.0, layout)
        gy = jnp.asarray(lp_y_stencil(wy, layout))
        kz = tuple(float(v) for v in wz)

        prec = sys.argv[3] if len(sys.argv) > 3 else "highest"
        out["precision"] = prec
        looped = _loop(
            lambda v: _convzy_linear_jit(
                v, gy, kz_key=kz, radii=(rz, ry),
                dims=layout["dims"], interpret=False, precision=prec,
            )
        )
        t = _time(lambda: _sync(looped(carry)))
        out |= {
            "ms": round(t * 1e3 / N_LOOP, 2),
            "carry_shape": layout["shape"],
        }
    elif case in ("einsum_x", "einsum_x_banded"):
        from functools import partial

        from shrimpy_tpu.ops.conv3_pallas import lp_layout
        from shrimpy_tpu.ops.deconv import (
            _toeplitz_banded,
            separable_decompose,
        )

        terms = separable_decompose(psf / psf.sum())
        wz, wy, wx = terms[0]
        rz, ry, rx = (len(w) // 2 for w in (wz, wy, wx))
        g_shape = tuple(n + 2 * r for n, r in zip(geom, (rz, ry, rx)))
        layout = lp_layout(g_shape, rz, ry)
        carry = jnp.zeros(layout["shape"], jnp.float32) + 1.0
        nx_p = layout["nx_p"]
        prec = jax.lax.Precision.HIGH

        if case == "einsum_x":
            tx = jnp.asarray(_toeplitz_banded(nx_p, wx))

            @jax.jit
            def apply(v):
                return jnp.einsum("ab,zyb->zya", tx, v, precision=prec)
        else:
            B = 128
            t = _toeplitz_banded(3 * B, wx)[B : 2 * B, :]  # (B, 3B) stencil
            t_prev = jnp.asarray(t[:, B - rx : B])
            t_mid = jnp.asarray(t[:, B : 2 * B])
            t_next = jnp.asarray(t[:, 2 * B : 2 * B + rx])

            @jax.jit
            def apply(v):
                z, y, nx = v.shape
                nb = nx // B
                blocks = v.reshape(z, y, nb, B)
                outb = jnp.einsum("ab,zynb->zyna", t_mid, blocks, precision=prec)
                prev_tails = jnp.pad(
                    blocks[:, :, :-1, B - rx :], ((0, 0), (0, 0), (1, 0), (0, 0))
                )
                next_heads = jnp.pad(
                    blocks[:, :, 1:, :rx], ((0, 0), (0, 0), (0, 1), (0, 0))
                )
                outb = outb + jnp.einsum(
                    "ac,zync->zyna", t_prev, prev_tails, precision=prec
                )
                outb = outb + jnp.einsum(
                    "ac,zync->zyna", t_next, next_heads, precision=prec
                )
                return outb.reshape(z, y, nx)

        looped = _loop(apply)
        t = _time(lambda: _sync(looped(carry)))
        out |= {
            "ms": round(t * 1e3 / N_LOOP, 2),
            "carry_shape": layout["shape"],
        }
    elif case in ("parity_fused", "parity_fused_iter"):
        # Parity of the bf16 3-pass fused RL vs the fp64 oracle, on the
        # REAL MXU (interpret-mode tests run f32 and can't see this).
        from shrimpy_tpu.ops.deconv import richardson_lucy_reference_separable

        rng = np.random.default_rng(0)
        shape = (24, 400, 900)
        vol_np = (rng.random(shape, dtype=np.float32) * 100 + 1.0).astype(
            np.float32
        )
        settings = DeconvolveSettings(
            iterations=20,
            algorithm="separable",
            separable_backend=case.removeprefix("parity_"),
        )
        ours = np.asarray(richardson_lucy(jnp.asarray(vol_np), psf, settings))
        pads = tuple((k // 2, k // 2) for k in psf.shape)
        oracle = richardson_lucy_reference_separable(
            vol_np, psf, iterations=20, pads=pads, boundary="zero"
        )
        err = np.abs(ours - oracle).max() / np.abs(oracle).max()
        out |= {"rel_err_rl20": float(err)}
    elif case == "parity_biggs":
        # In-kernel Biggs (ratio_accel/mult_accel, the default) vs the
        # generic rl_outer epilogue, both on the REAL MXU: validates
        # the accelerated kernel's bf16x3 numerics + bf16 state
        # handling on hardware (interpret-mode tests run f32 dots).
        import shrimpy_tpu.ops.rl_fused as rf

        rng = np.random.default_rng(0)
        shape = (24, 400, 900)
        vol_np = (rng.random(shape, dtype=np.float32) * 100 + 1.0).astype(
            np.float32
        )
        settings = DeconvolveSettings(
            iterations=10, algorithm="separable",
            separable_backend="fused", acceleration="biggs",
        )
        assert rf._FUSE_ACCEL
        fused = np.asarray(richardson_lucy(jnp.asarray(vol_np), psf, settings))
        rf._FUSE_ACCEL = False
        try:
            generic = np.asarray(
                richardson_lucy(jnp.asarray(vol_np), psf, settings)
            )
        finally:
            rf._FUSE_ACCEL = True
        scale = np.abs(generic).max()
        diff = np.abs(fused - generic)
        out |= {
            "rel_err_max": float(diff.max() / scale),
            "rel_err_p999": float(
                np.quantile(diff, 0.999) / scale
            ),
        }
    else:
        raise SystemExit(f"unknown case {case}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
