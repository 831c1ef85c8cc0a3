"""Stage breakdown of the headline program (deskew + RL-20) on the TPU.

Times three nested jit programs at the production geometry and reports
the deltas: raw generation alone, + deskew, + RL. Each program is the
exact composition bench.py's headline uses (lax.map over B=1, PSF baked
at build time), so the deltas are the honest stage costs including any
layout/pad glue XLA inserts between them.

Usage::

    timeout 600 python scripts/profile_headline.py [scan,y,x]

Prints one JSON line. Run nothing else against the TPU meanwhile.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time(fn, repeats=3) -> float:
    fn()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    raw_shape = (1201, 256, 1600)
    if len(sys.argv) > 1:
        raw_shape = tuple(int(v) for v in sys.argv[1].split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shrimpy_tpu.config import (
        DeconvolveSettings,
        DeskewSettings,
        ReconstructSettings,
    )
    from shrimpy_tpu.ops.deconv import gaussian_psf
    from shrimpy_tpu.parallel.pipeline import (
        _stage_fns,
        build_reconstruct_step,
        output_shape,
    )

    settings = ReconstructSettings(
        deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
        deconvolve=DeconvolveSettings(iterations=20),
    )
    psf = gaussian_psf((9, 21, 21), (1.5, 3.0, 3.0))
    deskew_fn, _ = _stage_fns(settings, psf, mesh=None)
    step = build_reconstruct_step(settings, psf=psf, mesh=None, donate=False)
    tf_dummy = jnp.zeros((2, 1, 1, 1), jnp.float32)
    key = jax.random.key(0)

    def gen(k):
        return jax.random.uniform(k, (1, *raw_shape), jnp.float32, 0.0, 100.0)

    @jax.jit
    def run_gen(k):
        return gen(k)

    @jax.jit
    def run_deskew(k):
        return jax.lax.map(deskew_fn, gen(k))

    @jax.jit
    def run_full(k):
        return step(gen(k), tf_dummy)

    t_gen = _time(lambda: _sync(run_gen(key)))
    t_desk = _time(lambda: _sync(run_deskew(key)))
    t_full = _time(lambda: _sync(run_full(key)))

    out_zyx = output_shape(raw_shape, settings)
    vox = int(np.prod(out_zyx))
    print(
        json.dumps(
            {
                "raw_shape": raw_shape,
                "out_shape": out_zyx,
                "gen_ms": round(t_gen * 1e3, 1),
                "deskew_ms": round((t_desk - t_gen) * 1e3, 1),
                "rl_glue_ms": round((t_full - t_desk) * 1e3, 1),
                "full_s": round(t_full, 4),
                "gvox_per_s": round(vox / t_full / 1e9, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
