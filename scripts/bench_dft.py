"""Bake off the matmul-DFT (dft2z) vs XLA-FFT (fft2z) RL backends on TPU.

Measures (a) hardware parity of the dft2z path vs the fft3 oracle at a
small geometry (the matmul DFT runs 3-pass bf16 dots — this validates
the precision budget on real hardware), (b) RL-20 wall time per
backend at the bench cliff geometry.

Usage: python scripts/bench_dft.py [--shape 128,1444,800] [--iters 20]
       [--skip-parity] [--backends dft2z,fft2z]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _tilted_psf(shape=(15, 31, 31)):
    """The bench config-6 beyond-extended-rank PSF (shared helper)."""
    from shrimpy_tpu.io.synthetic import tilted_gaussian_psf

    return tilted_gaussian_psf(shape)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="128,1444,800")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--backends", default="dft2z,fft2z")
    ap.add_argument(
        "--parity-iters", type=int, default=20,
        help="parity-check depth (independent of --iters: bf16 error "
        "compounds per iteration, so the validation stays at the real "
        "20-iteration budget even for quick timing runs)",
    )
    ap.add_argument(
        "--transforms-only", action="store_true",
        help="time rdft2/irdft2 vs jnp.fft on z-chunk-shaped batches "
        "of the PADDED RL grid (the shapes the dft2z backend runs)",
    )
    ap.add_argument(
        "--stages", action="store_true",
        help="time the pieces of ONE dft2z iteration at the padded "
        "grid: chunked rdft2 sweep, z-cdft, chunked OTF multiply — "
        "localizes where an iteration's wall time goes",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _enable_cache
    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import _padded_grid_shape, richardson_lucy

    _enable_cache()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    psf = _tilted_psf()

    if args.transforms_only:
        from shrimpy_tpu.ops.dft import irdft2, rdft2

        # The fft2z working shape: one z chunk of the PADDED 5-smooth/
        # lane-aligned grid — the shapes the backend actually
        # transforms, not the raw volume's.
        shape = tuple(int(v) for v in args.shape.split(","))
        grid, _ = _padded_grid_shape(shape, psf.shape, transform="matmul")
        gy, gx = grid[-2:]
        c = 8
        x = jax.random.uniform(jax.random.key(0), (c, gy, gx), jnp.float32)
        fwd_mm = jax.jit(rdft2)
        inv_mm = jax.jit(lambda s: irdft2(s, gx))
        fwd_xla = jax.jit(lambda a: jnp.fft.rfftn(a, axes=(1, 2)))
        inv_xla = jax.jit(
            lambda s: jnp.fft.irfftn(s, s=(gy, gx), axes=(1, 2))
        )
        spec = fwd_xla(x)
        for name, fn, arg in (
            ("rdft2/matmul", fwd_mm, x),
            ("rfft2/xla", fwd_xla, x),
            ("irdft2/matmul", inv_mm, spec),
            ("irfft2/xla", inv_xla, spec),
        ):
            _ = float(jnp.sum(jnp.abs(fn(arg))))  # compile + sync
            t0 = time.perf_counter()
            n = 10
            for _i in range(n):
                out = fn(arg)
            _ = float(jnp.sum(jnp.abs(out)))
            dt = (time.perf_counter() - t0) / n
            print(f"{name} @ {(c, gy, gx)}: {dt * 1e3:.2f} ms", flush=True)
        return

    if args.stages:
        from shrimpy_tpu.ops.deconv import _fft2z_chunk
        from shrimpy_tpu.ops.dft import cdft, irdft2, rdft2

        shape = tuple(int(v) for v in args.shape.split(","))
        grid, _ = _padded_grid_shape(shape, psf.shape, transform="matmul")
        gz, gy, gx = grid
        gxr = gx // 2 + 1
        c = _fft2z_chunk(gz, 8)
        n_chunks = gz // c
        print(f"padded grid {grid}, z-chunk {c} x {n_chunks}", flush=True)
        vol = jax.random.uniform(jax.random.key(0), grid, jnp.float32)
        spec0 = jax.jit(
            lambda v: jnp.fft.rfftn(v, axes=(1, 2))
        )(vol)

        @jax.jit
        def fwd_sweep(v):
            out = jnp.zeros((gz, gy, gxr), jnp.complex64)

            def body(i, acc):
                ch = jax.lax.dynamic_slice_in_dim(v, i * c, c, 0)
                return jax.lax.dynamic_update_slice_in_dim(
                    acc, rdft2(ch), i * c, 0
                )

            return jax.lax.fori_loop(0, n_chunks, body, out)

        @jax.jit
        def inv_sweep(s):
            out = jnp.zeros((gz, gy, gx), jnp.float32)

            def body(i, acc):
                ch = jax.lax.dynamic_slice_in_dim(s, i * c, c, 0)
                return jax.lax.dynamic_update_slice_in_dim(
                    acc, irdft2(ch, gx), i * c, 0
                )

            return jax.lax.fori_loop(0, n_chunks, body, out)

        @jax.jit
        def z_cdft(s):
            flat = s.reshape(gz, gy * gxr)
            return cdft(flat, -2).reshape(gz, gy, gxr)

        @jax.jit
        def elementwise(s):
            return s * jnp.conj(s)

        for name, fn, arg in (
            ("fwd 2-D sweep (rdft2 chunks)", fwd_sweep, vol),
            ("inv 2-D sweep (irdft2 chunks)", inv_sweep, spec0),
            ("z cdft (dense matmul)", z_cdft, spec0),
            ("elementwise spectral mult", elementwise, spec0),
        ):
            _ = float(jnp.sum(jnp.abs(fn(arg))))
            t0 = time.perf_counter()
            n = 5
            for _i in range(n):
                out = fn(arg)
            _ = float(jnp.sum(jnp.abs(out)))
            dt = (time.perf_counter() - t0) / n
            print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
        # One dft2z iteration ~= 2 fwd sweeps + 2 inv sweeps + 4 z
        # cdfts + 2 OTF multiplies + ratio/mult elementwise.
        return

    if not args.skip_parity:
        from shrimpy_tpu.ops.deconv import richardson_lucy_reference

        rng = np.random.default_rng(1)
        vol = rng.uniform(0, 100, (32, 96, 128)).astype(np.float32)
        psf_p = _tilted_psf((7, 9, 9))
        s = DeconvolveSettings(
            iterations=args.parity_iters, algorithm="fft", fft_backend="dft2z"
        )
        got = np.asarray(richardson_lucy(jnp.asarray(vol), psf_p, s))
        # fp64 numpy oracle on the SAME (matmul tile-rounded) grid —
        # validates the bf16x3 MXU dots against the true update.
        oracle = richardson_lucy_reference(
            vol, psf_p, iterations=args.parity_iters, grid_transform="matmul"
        )
        rel = np.abs(got - oracle).max() / np.abs(oracle).max()
        print(
            f"parity dft2z vs fp64 oracle (HW dots): rel={rel:.3e}",
            flush=True,
        )

    shape = tuple(int(v) for v in args.shape.split(","))
    vol = jax.random.uniform(
        jax.random.key(0), shape, jnp.float32, 0.0, 100.0
    )
    nvox = int(np.prod(shape))
    for be in args.backends.split(","):
        s = DeconvolveSettings(
            iterations=args.iters, algorithm="fft", fft_backend=be
        )
        def run_once():
            # Function-local output: nothing stays alive in HBM across
            # runs (a stale ~GB-scale `out` on top of the ~10 GB RL
            # working set can OOM the production carry).
            return float(jnp.sum(richardson_lucy(vol, psf, s)))

        t0 = time.perf_counter()
        run_once()  # scalar readback = reliable device sync
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_once()
        warm = time.perf_counter() - t0
        print(
            f"{be} @ {shape}: warm {warm:.3f}s "
            f"({warm / args.iters * 1e3:.1f} ms/iter, "
            f"{nvox / warm / 1e9:.4f} GVox/s; first {compile_and_run:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
