"""Fused-RL cost vs separable rank: where is the FFT crossover?

Usage: python scripts/bench_rank.py [geom] [ranks]
  geom: z,y,x of the RL input (default 128,2888,1600 = the deskewed
  production carry); ranks: comma list (default 1,2,4,8,12,16,20).

The extended-rank tier (``DeconvolveSettings.max_extended_terms``) must
stop where a rank-K fused iteration costs more than an FFT iteration.
That crossover was set to 10 in round 2 from the old "FFT ~8x rank-1"
estimate; this script measures the ACTUAL per-term marginal cost of the
fused kernel (stencils concatenate into the same dots: marginal << 1x
rank-1) so the cap is data, not folklore. Each rank times RL-20 with K
synthetic positive term triples at the production PSF radii.

Prints one JSON line per rank plus a summary with the fitted marginal
cost. Run ONE at a time against the TPU.
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


def synthetic_terms(rank: int, shape=(9, 21, 21), seed=0):
    """K positive, normalized (wz, wy, wx) triples + the implied PSF."""
    rng = np.random.default_rng(seed)
    terms = []
    psf = np.zeros(shape, np.float64)
    for k in range(rank):
        ws = []
        for n in shape:
            c = rng.uniform(-1.5, 1.5)
            s = rng.uniform(1.0, n / 4.0)
            x = np.arange(n) - n // 2
            w = np.exp(-0.5 * ((x - c) / s) ** 2)
            ws.append(w)
        scale = 1.0 / (rank * np.prod([w.sum() for w in ws]))
        ws = [w * scale ** (1 / 3) for w in ws]
        terms.append(tuple(ws))
        psf += np.einsum("i,j,k->ijk", *ws)
    return terms, psf.astype(np.float32)


def main() -> None:
    geom = (128, 2888, 1600)
    ranks = [1, 2, 4, 8, 12, 16, 20]
    if len(sys.argv) > 1:
        geom = tuple(int(v) for v in sys.argv[1].split(","))
    if len(sys.argv) > 2:
        ranks = [int(v) for v in sys.argv[2].split(",")]

    import jax
    import jax.numpy as jnp

    from bench import _enable_cache  # shared persistent compile cache
    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.rl_fused import rl_fused, rl_fused_supported

    _enable_cache()
    iters = 20
    settings = DeconvolveSettings(iterations=iters)
    vol = jax.random.uniform(jax.random.key(0), geom, jnp.float32, 0.0, 100.0)

    results = []
    for rank in ranks:
        terms, psf = synthetic_terms(rank)
        if not rl_fused_supported(tuple(geom), tuple(psf.shape)):
            print(json.dumps({"rank": rank, "skipped": "unsupported"}))
            continue
        try:
            best = _time(
                lambda: _sync(rl_fused(vol, psf, terms, settings, iters)),
                repeats=2,
            )
        except Exception as exc:  # noqa: BLE001 - record and stop
            print(json.dumps({"rank": rank, "error": str(exc)[:200]}))
            break
        ms_per_iter = best / iters * 1e3
        entry = {
            "rank": rank,
            "ms_per_iter": round(ms_per_iter, 2),
            "gvox_iters_per_s": round(
                int(np.prod(geom)) * iters / best / 1e9, 4
            ),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)

    if len(results) >= 2:
        r = np.array([e["rank"] for e in results], np.float64)
        t = np.array([e["ms_per_iter"] for e in results], np.float64)
        slope, intercept = np.polyfit(r, t, 1)
        print(json.dumps({
            "geom": list(geom),
            "marginal_ms_per_term": round(slope, 2),
            "rank1_ms": round(results[0]["ms_per_iter"], 2),
            "marginal_vs_rank1": round(slope / results[0]["ms_per_iter"], 3),
        }))


if __name__ == "__main__":
    main()
