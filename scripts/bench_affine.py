"""Affine register-apply micro-benchmarks on the real TPU (run ONE at a time).

Usage: python scripts/bench_affine.py [geom]
  geom: z,y,x of the volume (default 64,256,256 — the VERDICT r3 #5
  measurement geometry).

Measures every affine_apply dispatch tier on the same volume:

  translate   identity matrix + fractional offset (masked-roll path)
  triangular  lower-triangular scale+shear map (sequential 1-D shears)
  blocked     2-degree z-rotation (blocked candidate-window path)
  gather      the same rotation FORCED through the one-shot trilinear
              gather (`_affine_apply_jit`) — the baseline the blocked
              path must beat (reference behavior anchor:
              `shrimpy/dynatrack/tracking.py:1172-1181` warps on torch)

and reports blocked-vs-gather speedup plus scipy order=1 grid-constant
parity for the blocked result. Prints one JSON line (plus per-tier
stderr progress so a degraded-tunnel kill keeps partial results).

Tiers are scan-amortized over 10 calls per jit program; the timing
closes over a scalar readback (the only reliable device sync over the
tunneled transport — mirrors bench.py's helpers).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time(fn, repeats=3):
    fn()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    geom = (64, 256, 256)
    if len(sys.argv) > 1:
        geom = tuple(int(v) for v in sys.argv[1].split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from shrimpy_tpu.ops.register import (
        _affine_apply_jit,
        _blocked_plan,
        affine_apply,
        affine_apply_reference_scipy,
    )

    rng = np.random.default_rng(0)
    vol_np = rng.random(geom, np.float32) * 100.0
    vol = jnp.asarray(vol_np)
    nvox = float(np.prod(geom))

    out = {"geom": list(geom)}

    def tier(name, value):
        # Progress line per tier so a degraded-tunnel timeout kill
        # still leaves every completed measurement on stderr.
        out[name] = value
        print(f"# {name}: {value}", file=sys.stderr, flush=True)

    # Every tier is amortized over n_loop applications inside ONE jit
    # program (mirrors bench.py's register apply loop): the axon
    # tunnel's ~26 ms per-dispatch round-trip otherwise dominates every
    # path at this geometry (measured: the trivial masked-roll
    # translate tier costs 26.2 ms single-dispatch) and compresses the
    # blocked-vs-gather ratio (8.5x single-dispatch vs the true device
    # ratio). The tiny per-iteration input perturbation defeats CSE.
    n_loop = 10

    def loop_time(apply_once):
        @jax.jit
        def f(mov):
            def body(acc, i):
                o = apply_once(mov + i.astype(jnp.float32) * 1e-6)
                return acc + jnp.sum(o), None

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_loop))
            return acc

        return _time(lambda: float(f(vol))) / n_loop

    # translate: identity matrix, fractional offset.
    off_t = jnp.asarray([1.25, -3.5, 2.75], jnp.float32)
    eye_np = np.eye(3, dtype=np.float32)
    t = loop_time(lambda v: affine_apply(v, eye_np, off_t))
    tier("translate_ms", round(t * 1e3, 3))

    # triangular: mild scale + shear (the pcc+refine parameterization).
    m_tri = np.array(
        [[1.01, 0.0, 0.0], [0.004, 0.995, 0.0], [0.0, 0.006, 1.008]],
        np.float32,
    )
    off_tri = np.asarray([0.4, -1.2, 0.7], np.float32)
    t = loop_time(lambda v: affine_apply(v, m_tri, off_tri))
    tier("triangular_ms", round(t * 1e3, 3))

    # blocked: a 2-degree rotation about z (full matrix, no triangular
    # structure) — must dispatch to the blocked candidate-window path.
    th = np.deg2rad(2.0)
    m_rot = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, np.cos(th), -np.sin(th)],
            [0.0, np.sin(th), np.cos(th)],
        ],
        np.float32,
    )
    off_rot = np.asarray([0.3, 2.0, -1.5], np.float32)
    assert _blocked_plan(m_rot, off_rot, geom, geom) is not None
    t = loop_time(lambda v: affine_apply(v, m_rot, off_rot))
    tier("blocked_ms", round(t * 1e3, 3))
    tier("blocked_mvox_per_s", round(nvox / t / 1e6, 1))

    # gather: the SAME rotation through the one-shot trilinear gather.
    m_rot_j = jnp.asarray(m_rot)
    off_rot_j = jnp.asarray(off_rot)
    t = loop_time(lambda v: _affine_apply_jit(v, m_rot_j, off_rot_j, geom))
    tier("gather_ms", round(t * 1e3, 3))
    tier("gather_mvox_per_s", round(nvox / t / 1e6, 1))
    tier("blocked_vs_gather", round(out["gather_ms"] / out["blocked_ms"], 2))

    # Parity of the blocked result vs the scipy oracle.
    got = np.asarray(affine_apply(vol, m_rot, off_rot))
    want = affine_apply_reference_scipy(vol_np, m_rot, off_rot)
    scale = float(np.abs(want).max()) or 1.0
    tier("blocked_parity_rel", float(np.abs(got - want).max() / scale))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
