"""Headline benchmark + the nine benchmark configs.

Headline: deskew + Richardson-Lucy(20) throughput per chip at the
mantis production geometry (fused Pallas pipeline). Prints the headline
JSON line::

    {"metric": ..., "value": ..., "unit": "GVox/s", "vs_baseline": ...,
     "configs": [ {...}, x9 ]}

``value`` = reconstructed output voxels per second through the full
pipeline; ``vs_baseline`` is the ratio to the BASELINE.json north-star
target (1 GVox/s/chip). A scipy-oracle deskew parity check rides along
as ``parity_err`` (driver budget: <= 1e-3).

The ``configs`` array carries one entry per benchmark config: the five
BASELINE.md configs — (1) single-stack deskew vs scipy, (2) RL-20
deconvolution of a deskewed production volume, (3) registration
estimate+apply, (4) streamed HCS plate volumes/min, (5) full-session
replay (acquire + track + reconstruct) — plus (6) RL-20 with a
beyond-extended-rank non-separable PSF (the transform-route exposure)
and (7) Biggs-Andrews accelerated RL-10 on the production fused backend
(RL-20-equivalent output quality; the acceleration-knob throughput).

Budget discipline (the round-2 run was killed before printing anything):

- A hard overall deadline (``BENCH_BUDGET_S`` env, default 900 s).
  Work that does not fit is recorded as ``{"skipped": "budget"}``
  instead of running past the driver's clock.
- The headline is measured FIRST (production geometry, best-known
  config) and printed immediately as an insurance line (parity_err
  null); the bounded parity child runs next and a second insurance
  line carries it; the final line with the populated ``configs`` array
  repeats everything. A parser taking the last JSON line sees the full
  record; a timeout kill still leaves the best insurance line on
  stdout.
- Every child subprocess is capped at 300 s (override with
  ``BENCH_CHILD_TIMEOUT_S`` for congested-tunnel watcher runs). The
  only retry is on a
  child *timeout* — the known compile-queue stall signature of the
  tunneled TPU (a killed client leaves its compile queued server-side;
  the queue drains and a second attempt hits the persistent cache).
- Config children run fair-share: each config's total spend is capped
  at max(90 s, remaining/configs_left) with rollover, cheapest first,
  so a degraded tunnel (slow children timing out) cannot starve every
  later config the way it did in the r4 run-4 record.
- Congestion pacing: after two consecutive child timeouts the driver
  holds (sleep 120 s + cheap probe, at most twice) before the next
  config, so a degraded stretch of an oscillating tunnel burns sleep
  instead of every config's share; children still launch after the
  hold regardless of probe outcome (the congested-but-workable state
  answers children but not probes).
- All children share one persistent XLA compilation cache (same
  directory as the CLI), so repeated geometries warm-start.
- Every complete run persists its final record to
  ``BENCH_LAST_GOOD.json`` (stamped ``measured_at_utc``). A later run
  that finds the tunnel dead — or alive but too degraded to measure
  the headline — replays that record with ``"stale": true`` and an
  ``error`` naming the outage, instead of recording ``value: null``
  (rounds 2 and 3 both lost their records to multi-hour axon outages
  at driver time despite complete measurements earlier in the round).

Each measurement runs in its own subprocess: a failed (OOM) attempt
must not poison later ones with leaked device allocations, and the
remote TPU tolerates only one client at a time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

# Production mantis LS geometry first (BASELINE.md: ROI 1600x256, 1201
# scan slices), then memory fallbacks. Best-first with early exit: the
# production geometry has been the fastest since round 2.
GEOMETRIES = [
    (1201, 256, 1600),
    (1201, 256, 800),
    (600, 256, 800),
    (300, 128, 512),
]
PSF_SHAPE = (9, 21, 21)
RL_ITERS = 20
REPEATS = 3
def _env_float(name: str, default: float) -> float:
    """Parse a float env knob, falling back on a malformed value."""
    try:
        return float(os.environ.get(name, str(default)))
    except ValueError:  # pragma: no cover - malformed env
        return default


# Per-child wall cap. Env-overridable for watcher runs on a congested
# tunnel (2026-08-20: child startup+compile alone ran past 300 s while
# the tunnel queue drained; a bigger budget + bigger cap rode it out).
CHILD_TIMEOUT_S = _env_float("BENCH_CHILD_TIMEOUT_S", 300.0)

# The fused-RL kernel's measured floor on v5e (docs/kernels.md round-3
# bake-off): the staggered-carry K=256 x pass broke the round-2 ~40 ms
# MXU floor; the kernel is now VPU/DMA-bound at ~35.4 ms/iter (dropping
# a third of the x MXU passes moves it 1.4%). Carried in the headline
# JSON so the record itself documents how close the number is to the
# model.
FLOOR_NOTE = (
    "fused-RL floor ~35 ms/iter after the staggered K=256 x pass "
    "(VPU/DMA-bound: 2-pass x dots gain only 1.4%); see docs/kernels.md "
    "round-3 bake-off. Beyond the per-iteration floor the named lever "
    "is Biggs-Andrews acceleration (acceleration='biggs', r4, fused "
    "into the kernel passes: 53.3 ms/iter accelerated): the same "
    "trajectory point in ~half the iterations — the headline metric "
    "stays plain RL-20 for comparability, but users get "
    "RL-20-equivalent restoration at ~1.33x this throughput (see the "
    "rl10_biggs_accelerated config)"
)


# Last complete record, persisted after every successful full run and
# replayed (explicitly marked ``stale``) when a later run finds the
# tunnel dead. Rounds 2 and 3 both produced ``value: null`` driver
# records during multi-hour axon outages even though complete
# measurements existed hours earlier in the same round; an honest
# cached record (with ``measured_at_utc`` and a ``stale`` flag) beats
# recording nothing.
_LAST_GOOD = Path(__file__).resolve().parent / "BENCH_LAST_GOOD.json"


def _load_last_good() -> dict | None:
    try:
        rec = json.loads(_LAST_GOOD.read_text())
    except (OSError, ValueError):
        return None
    return rec if isinstance(rec, dict) and rec.get("value") else None


def _completeness(record: dict) -> tuple[int, int, int, int]:
    """(ok configs, parity present, production geometry, freshly
    measured rl20_equivalent) — the record-quality score.

    A config counts as ok when it carries a measurement (no ``error``
    or ``skipped`` marker). The third term guards against a degraded
    run whose headline child timed out at the production geometry and
    fell back to a smaller one (r4 run 10): such a run can still
    complete every config later in its budget, and without the
    geometry term it would tie a production-geometry record on
    completeness and clobber it with the fallback headline.
    """
    ok = sum(
        1
        for c in record.get("configs", [])
        if isinstance(c, dict) and "error" not in c and "skipped" not in c
    )
    at_production = int(
        tuple(record.get("raw_shape") or ()) == GEOMETRIES[0]
    )
    eq = record.get("rl20_equivalent")
    fresh_eq = int(isinstance(eq, dict) and "carried_from" not in eq)
    return (
        ok, int(record.get("parity_err") is not None), at_production,
        fresh_eq,
    )


def _environment() -> dict:
    """Software provenance for the record (the reference logs its conda
    env into every acquisition log for reproducibility, reference
    shrimpy/_logging.py:92-136; here: the versions that determine TPU
    codegen + IO behavior)."""
    from shrimpy_tpu.utils.logging import environment_provenance

    return environment_provenance()


def _save_last_good(record: dict) -> None:
    # Never downgrade: a degraded-tunnel run that measured the headline
    # but lost configs (r4 run 7: headline ok, all seven configs timed
    # out) must not clobber an earlier COMPLETE record — the cache
    # exists precisely to survive those runs. Equal completeness
    # refreshes the cache (fresher numbers win ties).
    cached = _load_last_good()
    if cached is not None and _completeness(record) < _completeness(cached):
        return
    stamped = dict(record)
    # A fresher record that lost only the rl20_equivalent child (the
    # geom-accel measurement) must not silently drop the cached figure:
    # carry it forward, explicitly marked with the run it came from.
    if (
        "rl20_equivalent" not in stamped
        and cached is not None
        and isinstance(cached.get("rl20_equivalent"), dict)
    ):
        stamped["rl20_equivalent"] = {
            **cached["rl20_equivalent"],
            "carried_from": cached.get("measured_at_utc", "unknown"),
        }
    stamped["measured_at_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
    )
    try:
        _LAST_GOOD.write_text(json.dumps(stamped, indent=1) + "\n")
    except OSError:  # pragma: no cover - best effort
        pass


def _stale_record(cached: dict, why: str) -> dict:
    return {
        **cached,
        "stale": True,
        "error": f"{why}; emitting the last complete record, measured "
        f"{cached.get('measured_at_utc', 'earlier this round')}",
    }


def _budget_s() -> float:
    return _env_float("BENCH_BUDGET_S", 900.0)


def _cache_dir() -> str:
    return str(
        Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
        / "shrimpy_tpu"
        / "jax"
    )


def _enable_cache() -> None:
    """Persistent XLA compile cache (shared with the CLI): jax is
    pre-imported at interpreter startup on this box, so env vars are
    too late — set the config directly."""
    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or _cache_dir()
    try:
        Path(d).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):  # pragma: no cover - best effort
        pass


def _sync(x) -> float:
    """Scalar readback — the only reliable device sync on the tunneled
    TPU transport (block_until_ready returns early there)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time_best(fn, repeats=REPEATS) -> float:
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _parity_check() -> float:
    """Deskew parity vs the scipy CPU oracle (relative max abs err).

    Two geometries: a small one, and a long-scan one whose band DMA
    exercises the s_lo clamp region (a production-geometry bug hid
    behind small-parity-only checks in round 2 — bands covering the
    whole scan never clamp).
    """
    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.ops.deskew import deskew_reference_scipy, deskew_volume

    settings = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386)
    rng = np.random.default_rng(0)
    worst = 0.0
    for shape in [(48, 32, 32), (180, 64, 64)]:
        raw = rng.random(shape, dtype=np.float32) * 100.0
        ours = np.asarray(deskew_volume(raw, settings))
        oracle = deskew_reference_scipy(raw, settings)
        worst = max(
            worst,
            float(
                np.abs(ours - oracle).max()
                / max(np.abs(oracle).max(), 1e-12)
            ),
        )
    return worst


def _run_headline(raw_shape, accelerated: bool = False) -> dict:
    """Deskew + RL throughput for one raw geometry.

    ``accelerated=True`` runs the Biggs-accelerated RL-10 budget — the
    RL-20-EQUIVALENT restoration (the extrapolation reaches plain
    RL-20..30 on the convergence trajectory; equivalence is the
    trajectory-distance contract tested in tests/test_deconv.py and
    hardware-validated by scripts/bench_rl.py parity_biggs). Reported
    alongside the plain RL-20 headline so the record carries both the
    comparable-across-rounds number and the throughput a user actually
    gets at matched output quality.
    """
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
        deconvolve=DeconvolveSettings(
            iterations=10 if accelerated else RL_ITERS,
            acceleration="biggs" if accelerated else "none",
        ),
    )
    psf = gaussian_psf(PSF_SHAPE, (1.5, 3.0, 3.0))
    step = build_reconstruct_step(settings, psf=psf, mesh=None, donate=False)

    tf_dummy = jnp.zeros((2, 1, 1, 1), jnp.float32)

    # Generate the raw volume INSIDE the program: as an internal temp
    # it frees right after the deskew consumes it, instead of pinning
    # ~2 GB of HBM for the whole deskew+RL program (the production
    # geometry sits within ~0.5 GB of the HBM ceiling). Costs one
    # bandwidth pass (~0.5% of the measurement).
    #
    # Amortize over N volumes inside ONE jit program (same practice and
    # rationale as _config_deskew): a single dispatch over the axon
    # tunnel costs ~35 ms of client round-trip latency that real TPU
    # hosts do not pay — at a ~750 ms volume that is a 5% tax on the
    # transport, not the chip. The scan carries only a scalar, so the
    # program's HBM peak is one volume's pipeline, same as N=1.
    n_loop = 6

    @jax.jit
    def run(key):
        def body(acc, i):
            raw = jax.random.uniform(
                jax.random.fold_in(key, i),
                (1, *raw_shape),
                jnp.float32,
                0.0,
                100.0,
            )
            return acc + jnp.sum(step(raw, tf_dummy)), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_loop))
        return acc

    key = jax.random.key(0)
    best = _time_best(lambda: float(run(key))) / n_loop

    out_zyx = output_shape(raw_shape, settings)
    return {
        "vox_per_s": int(np.prod(out_zyx)) / best,
        "out_shape": out_zyx,
    }


# ---------------------------------------------------------------------------
# BASELINE.json configs
# ---------------------------------------------------------------------------


def _config_deskew(variant: str | None) -> dict:
    """Config 1: single light-sheet stack deskew (~2048x2048x300 class),
    throughput + scipy parity (parity from the small shared check)."""
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.ops.deskew import get_deskewed_shape
    from shrimpy_tpu.ops.deskew_pallas import deskew_volume_pallas

    # keep_overhang: a 2048-row tilt with 300 scan steps has no fully-
    # sampled band at this ratio; average_n_slices=3 mirrors reference
    # scripts/measure_psf.py:223-250 (and keeps the output in HBM).
    settings = DeskewSettings(
        ls_angle_deg=30.0,
        px_to_scan_ratio=0.386,
        keep_overhang=True,
        average_n_slices=3,
    )
    raw_shape = tuple(int(v) for v in (variant or "300,2048,2048").split(","))

    # Amortize over N calls inside ONE jit program: a single call is
    # dominated by the axon tunnel's per-dispatch latency (~40 ms),
    # which real TPU hosts do not pay. Generate the raw volume INSIDE
    # the program (headline rationale): at (300, 2048, 2048) the raw
    # stack is ~5 GB and the deskewed output ~7.2 GB — a host-resident
    # input pinned across the scan pushes the program past HBM.
    n_loop = 5

    @jax.jit
    def loop(key):
        def body(acc, i):
            raw = jax.random.uniform(
                jax.random.fold_in(key, i), raw_shape, jnp.float32,
                0.0, 100.0,
            )
            out = deskew_volume_pallas(raw, settings)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_loop))
        return acc

    key = jax.random.key(0)
    best = _time_best(lambda: float(loop(key))) / n_loop
    out_shape, _ = get_deskewed_shape(raw_shape, settings)
    return {
        "name": "deskew_single_stack",
        "raw_shape": raw_shape,
        "out_shape": out_shape,
        "gvox_per_s": round(int(np.prod(out_shape)) / best / 1e9, 4),
        "seconds": round(best, 4),
    }


def _config_rl20(variant: str | None) -> dict:
    """Config 2: RL-20 deconvolution of one deskewed production volume
    with a measured-PSF stand-in (bead pipeline: shrimpy_tpu.psf)."""
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import gaussian_psf, richardson_lucy

    psf = gaussian_psf(PSF_SHAPE, (1.5, 3.0, 3.0))
    settings = DeconvolveSettings(iterations=RL_ITERS)
    shape = tuple(int(v) for v in (variant or "128,2888,1600").split(","))
    vol = jax.random.uniform(
        jax.random.key(0), shape, jnp.float32, 0.0, 100.0
    )
    best = _time_best(lambda: _sync(richardson_lucy(vol, psf, settings)))
    return {
        "name": "rl20_deconvolution",
        "shape": shape,
        "iterations": RL_ITERS,
        "gvox_per_s": round(int(np.prod(shape)) / best / 1e9, 4),
        "seconds": round(best, 4),
    }


def _config_register(variant: str | None) -> dict:
    """Config 3: label-free <-> fluorescence affine registration:
    estimate (PCC + gradient refinement) and apply."""
    import jax.numpy as jnp

    from shrimpy_tpu.config.schemas import RegistrationSettings
    from shrimpy_tpu.io.synthetic import gaussian_blob
    from shrimpy_tpu.ops.register import affine_apply, estimate_registration

    # (64, 512, 512) reproducibly crashes the tunneled TPU worker in the
    # affine-gather compile; 256^2 exercises the same path.
    shape = (64, 256, 256)
    rng = np.random.default_rng(1)
    fixed = sum(
        gaussian_blob(
            shape,
            tuple(rng.uniform(10, s - 10) for s in shape),
            (3.0, 6.0, 6.0),
            amplitude=100.0,
        )
        for _ in range(12)
    ) + rng.normal(0, 0.5, shape).astype(np.float32)
    true_shift = np.array([2.6, -7.3, 4.1], np.float32)
    moving = np.asarray(
        affine_apply(
            jnp.asarray(fixed), jnp.eye(3, dtype=jnp.float32),
            jnp.asarray(true_shift),
        )
    )

    settings = RegistrationSettings(method="pcc+refine")
    t0 = time.perf_counter()
    result = estimate_registration(fixed, moving, settings)
    est_s = time.perf_counter() - t0
    # Split compile from warm: a second estimate hits the jit caches,
    # so its wall time is the steady-state cost and the difference is
    # compile + tunnel queueing. Without the split, tunnel noise in
    # the one-shot figure masquerades as regression (r4: 6.5 s ->
    # 22.9 s at identical accuracy).
    t0 = time.perf_counter()
    result_warm = estimate_registration(fixed, moving, settings)
    warm_s = time.perf_counter() - t0
    del result_warm

    # Amortize the apply over N calls in one jit program (the tunnel's
    # per-dispatch latency otherwise dominates a single warp).
    import jax

    mat = jnp.asarray(result.matrix)
    off = jnp.asarray(result.offset)
    mov_dev = jnp.asarray(moving)
    n_loop = 10

    @jax.jit
    def apply_loop(mov):
        def body(acc, i):
            out = affine_apply(
                mov + i.astype(jnp.float32) * 1e-6, mat, off
            )
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_loop))
        return acc

    float(apply_loop(mov_dev))
    apply_s = _time_best(lambda: float(apply_loop(mov_dev))) / n_loop
    # affine_apply(moving, I, offset) ~ fixed, so the recovered offset
    # is the INVERSE of the shift that produced `moving`.
    err = float(np.abs(np.asarray(result.offset) + true_shift).max())
    return {
        "name": "registration_estimate_apply",
        "shape": shape,
        "estimate_seconds": round(est_s, 3),
        "estimate_warm_seconds": round(warm_s, 3),
        "estimate_compile_seconds": round(max(est_s - warm_s, 0.0), 3),
        "apply_seconds": round(apply_s, 4),
        "apply_gvox_per_s": round(int(np.prod(shape)) / apply_s / 1e9, 4),
        "shift_err_px": round(err, 4),
    }


def _config_plate(variant: str | None) -> dict:
    """Config 4: streamed HCS plate (deskew + RL) volumes/min through
    the runtime. End-to-end is transfer-bound on this box (axon tunnel
    ~35 MB/s each way); ``compute_volumes_per_min`` times the jitted
    reconstruct step alone (synchronous, device wall clock) so the
    compute-bound figure of a real TPU host is extrapolatable."""
    tmp = Path(tempfile.mkdtemp())
    try:
        return _config_plate_inner(tmp)
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _config_plate_inner(tmp: Path) -> dict:
    import jax.numpy as jnp

    from shrimpy_tpu.config import (
        DeconvolveSettings,
        DeskewSettings,
        ReconstructSettings,
    )
    from shrimpy_tpu.io.ngff import create_hcs
    from shrimpy_tpu.io.synthetic import gaussian_blob
    from shrimpy_tpu.parallel.pipeline import build_reconstruct_step
    from shrimpy_tpu.runtime import reconstruct_store

    plate_path = tmp / "plate.zarr"
    n_pos, n_t = 6, 2
    vol_shape = (64, 128, 512)
    store = create_hcs(plate_path, channel_names=["BF"])
    rng = np.random.default_rng(0)
    base = gaussian_blob(vol_shape, (32.0, 64.0, 256.0), (8.0, 20.0, 60.0), 200.0)
    for p in range(n_pos):
        pos = store.create_position("0", str(p), "000", channel_names=["BF"])
        pos.create_array((n_t, 1, *vol_shape), dtype="float32")
        data = np.stack(
            [base + rng.normal(0, 1.0, vol_shape).astype(np.float32)
             for _ in range(n_t)]
        )[:, None]
        pos.write(Ellipsis, data)

    settings = ReconstructSettings(
        deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
        deconvolve=DeconvolveSettings(iterations=5),
    )
    # First pass compiles (in-process jit cache); the timed second pass
    # is the steady-state streaming figure.
    reconstruct_store(plate_path, tmp / "warm.zarr", settings)
    out_path = tmp / "recon.zarr"
    t0 = time.perf_counter()
    summary = reconstruct_store(plate_path, out_path, settings)
    wall = time.perf_counter() - t0
    n_vol = summary["volumes"]

    # Compute-only: one volume through the same jitted step, device
    # wall clock (scalar-readback sync).
    from shrimpy_tpu.ops.deconv import gaussian_psf

    step = build_reconstruct_step(
        settings, psf=gaussian_psf(PSF_SHAPE, (1.5, 3.0, 3.0)), mesh=None,
        donate=False,
    )
    tf_dummy = jnp.zeros((2, 1, 1, 1), jnp.float32)
    raw = jnp.asarray(base[None])
    compute_s = _time_best(lambda: _sync(step(raw, tf_dummy)))
    return {
        "name": "plate_streaming",
        "positions": n_pos,
        "timepoints": n_t,
        "raw_volume": vol_shape,
        "volumes": n_vol,
        "seconds": round(wall, 2),
        "volumes_per_min": round(n_vol / wall * 60.0, 2),
        "compute_volumes_per_min": round(60.0 / compute_s, 2),
        "note": "end-to-end is tunnel-bound on this box (~35 MB/s D2H); "
        "compute_volumes_per_min is the device-only figure",
    }


def _config_replay(variant: str | None) -> dict:
    """Config 5: full-session replay — acquire (replay camera through
    the engine, DynaTrack tracking) then reconstruct the session.

    Runs on CPU: the acquisition/tracking loop is host-side control
    flow issuing many small ops, and the axon tunnel's ~100 ms
    round-trip per dispatch swamps it (192 s vs ~8 s) — on a real TPU
    host the device path is the faster one. ``compute_volumes_per_min``
    reports the reconstruct step alone (same CPU platform, device wall
    clock) so the control-flow overhead is separable.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    tmp = Path(tempfile.mkdtemp())
    try:
        return _config_replay_inner(tmp)
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _config_replay_inner(tmp: Path) -> dict:
    from shrimpy_tpu.config import (
        DeconvolveSettings,
        DeskewSettings,
        ReconstructSettings,
    )
    from shrimpy_tpu.engine import AcquisitionEngine, AcquisitionPlan, ReplaySource
    from shrimpy_tpu.io.ngff import create_hcs
    from shrimpy_tpu.io.synthetic import gaussian_blob
    from shrimpy_tpu.runtime import reconstruct_store

    session = tmp / "session.zarr"
    n_t, vol_shape = 3, (24, 64, 128)
    store = create_hcs(session, channel_names=["BF", "GFP"])
    rng = np.random.default_rng(0)
    for p in range(2):
        pos = store.create_position("0", str(p), "000", channel_names=["BF", "GFP"])
        pos.create_array((n_t, 2, *vol_shape), dtype="float32")
        data = np.zeros((n_t, 2, *vol_shape), np.float32)
        for t in range(n_t):
            center = (12.0, 32.0 + 2 * t, 64.0 - 3 * t)
            for c in range(2):
                data[t, c] = gaussian_blob(
                    vol_shape, center, (3.0, 6.0, 8.0), amplitude=100.0 * (c + 1)
                )
        data += rng.normal(0, 0.5, data.shape).astype(np.float32)
        pos.write(Ellipsis, data)

    plan = AcquisitionPlan(
        time={"n_timepoints": n_t},
        metadata={
            "dynatrack": {
                "input_channel": "BF",
                "tracking_channel": "BF",
                "tracking_method": "pcc",
                "image_to_stage_matrix_xyz": [
                    [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0],
                ],
            }
        },
    )
    t0 = time.perf_counter()
    acq_path = AcquisitionEngine(ReplaySource(session)).acquire(
        tmp / "acq", "bench", plan
    )
    acquire_s = time.perf_counter() - t0

    settings = ReconstructSettings(
        deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
        deconvolve=DeconvolveSettings(iterations=3),
        channels=["BF"],
    )
    t0 = time.perf_counter()
    summary = reconstruct_store(acq_path, tmp / "recon.zarr", settings)
    recon_s = time.perf_counter() - t0
    compute_s = summary["stages"].get("compute", 0.0) + summary["stages"].get(
        "d2h", 0.0
    )
    n_vol = 2 * n_t * 2  # positions x timepoints x channels acquired
    return {
        "name": "full_session_replay",
        "acquired_volumes": n_vol,
        "acquire_seconds": round(acquire_s, 2),
        "reconstruct_volumes": summary["volumes"],
        "reconstruct_seconds": round(recon_s, 2),
        "session_volumes_per_min": round(n_vol / (acquire_s + recon_s) * 60.0, 2),
        "compute_volumes_per_min": round(
            summary["volumes"] / compute_s * 60.0, 2
        )
        if compute_s > 0
        else None,
        "note": "CPU-bound on this box (host control flow dominates over "
        "the tunnel); compute_volumes_per_min is the reconstruct "
        "compute+readback share alone",
    }


def _config_nonsep(variant: str | None) -> dict:
    """Config 6: RL-20 with a beyond-extended-rank PSF — the FFT-path
    cliff, recorded so the non-separable exposure has a number (the
    separable tiers cover rank<=24; heavier aberration routes here,
    ops/deconv.py FFT fallback). The PSF is a strongly tilted
    anisotropic Gaussian (zy+yx shear) whose separable rank exceeds
    max_extended_terms."""
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import plan_separable_terms, richardson_lucy

    from shrimpy_tpu.io.synthetic import tilted_gaussian_psf

    # Tilted PSF: principal axes rotated out of the (z, y, x) grid
    # axes — not a product of 1-D factors. 0.6/0.5 shears became
    # separable when the extended-rank cap rose to 24 (rank 21 with
    # 3.3e-2 residual); the default 0.9/0.8 leaves an 8.7e-2 rank-24
    # residual, genuinely beyond the tier, so this entry really
    # measures the transform route.
    psf = tilted_gaussian_psf()
    settings = DeconvolveSettings(iterations=RL_ITERS, algorithm="fft")
    # Document that this PSF genuinely exceeds the separable tiers.
    plan = plan_separable_terms(
        psf, DeconvolveSettings(iterations=RL_ITERS)
    )

    shape = tuple(int(v) for v in (variant or "128,2888,1600").split(","))
    vol = jax.random.uniform(
        jax.random.key(0), shape, jnp.float32, 0.0, 100.0
    )
    best = _time_best(
        lambda: _sync(richardson_lucy(vol, psf, settings)), repeats=1
    )
    from shrimpy_tpu.ops.deconv import resolve_fft_backend

    backend = resolve_fft_backend(settings, vol.ndim)
    return {
        "name": "rl20_nonseparable_fft",
        "shape": shape,
        "iterations": RL_ITERS,
        "psf_separable": plan is not None,
        "fft_backend": backend,
        "gvox_per_s": round(int(np.prod(shape)) / best / 1e9, 4),
        "seconds": round(best, 4),
        "note": "non-separable-PSF route: auto resolves to the "
        f"{backend} backend here (dft2z = direct-matrix matmul-DFT "
        "transforms on the MXU with tile-rounded grids, "
        "docs/kernels.md; fft2z = XLA FFTs, ~14x off the bandwidth "
        "roofline on TPU — the r2/r3 0.0187 GVox/s cliff figures "
        "measured fft2z; r4 dft2z measures 192.6 ms/iter = 2.06x "
        "fft2z at (128,1444,800), HW parity vs the fp64 oracle "
        "6.8e-5, and the tile-rounded grid fits the production carry "
        "single-chip at 1092 ms/iter where earlier attempts OOMed). "
        "Separable tiers cover rank<=24 PSFs at ~27.6 ms/iter/term; "
        "shard_volumes (distributed slab FFT) covers volumes past "
        "single-chip HBM",
    }


def _config_nonsep_hybrid(variant: str | None) -> dict:
    """Config 8: the hybrid route over the SAME non-separable PSF as
    config 6 — ``algorithm='hybrid'`` runs 16 cheap separable
    iterations on a nonnegative rank-K CP approximation of the PSF
    (warm start only; the fixed point stays exact RL's), then 6 exact
    DFT/FFT-path iterations. hybrid(s=16, e=6) BEATS plain exact RL-20
    on the convergence trajectory (tests/test_deconv.py hybrid
    trajectory gates), so gvox_per_s here is directly comparable to
    config 6's at matched-or-better output quality — the measured
    answer to the non-separable cliff (ops/deconv.py::rl_hybrid)."""
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import (
        plan_hybrid_terms,
        resolve_fft_backend,
        richardson_lucy,
    )
    from shrimpy_tpu.io.synthetic import tilted_gaussian_psf

    psf = tilted_gaussian_psf()
    settings = DeconvolveSettings(
        iterations=6, algorithm="hybrid", hybrid_separable_iters=16
    )
    _, warm_residual = plan_hybrid_terms(psf, settings)
    shape = tuple(int(v) for v in (variant or "128,2888,1600").split(","))
    vol = jax.random.uniform(
        jax.random.key(0), shape, jnp.float32, 0.0, 100.0
    )
    best = _time_best(
        lambda: _sync(richardson_lucy(vol, psf, settings)), repeats=1
    )
    backend = resolve_fft_backend(settings, vol.ndim)
    return {
        "name": "rl20_equivalent_nonseparable_hybrid",
        "shape": shape,
        "warm_iterations": 16,
        "exact_iterations": 6,
        "warm_residual": round(float(warm_residual), 4),
        "fft_backend": backend,
        "gvox_per_s": round(int(np.prod(shape)) / best / 1e9, 4),
        "seconds": round(best, 4),
        "note": "RL-20-equivalent quality on the config-6 PSF via "
        "algorithm='hybrid': 16 warm iterations on a nonneg rank-K CP "
        "PSF (fused separable kernels, ~1/9 the exact iteration cost) "
        "+ 6 exact transform-path iterations warm-started from the "
        "result. The warm phase only moves the starting point — the "
        "tail's operator and data term are exact, so the limit is "
        "plain RL's. Compare gvox_per_s against config 6 "
        "(rl20_nonseparable_fft) at matched output quality",
    }


def _config_nonsep_hybrid_accel(variant: str | None) -> dict:
    """Config 9: the hybrid route with Biggs acceleration on BOTH
    phases — 16 accelerated warm iterations + 3 accelerated exact
    iterations beat plain exact RL-20 by a ~33-35% trajectory margin
    (tests/test_deconv.py::test_hybrid_biggs_beats_plain_rl20, four
    seeds), the fastest RL-20-equivalent non-separable configuration.
    Directly comparable to configs 6 and 8 at matched-or-better
    output quality."""
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import (
        plan_hybrid_terms,
        resolve_fft_backend,
        richardson_lucy,
    )
    from shrimpy_tpu.io.synthetic import tilted_gaussian_psf

    psf = tilted_gaussian_psf()
    settings = DeconvolveSettings(
        iterations=3, algorithm="hybrid", hybrid_separable_iters=16,
        acceleration="biggs",
    )
    # Same provenance field as config 8: the record itself documents
    # that the warm start ran on a genuinely non-separable PSF.
    _, warm_residual = plan_hybrid_terms(psf, settings)
    shape = tuple(int(v) for v in (variant or "128,2888,1600").split(","))
    vol = jax.random.uniform(
        jax.random.key(0), shape, jnp.float32, 0.0, 100.0
    )
    best = _time_best(
        lambda: _sync(richardson_lucy(vol, psf, settings)), repeats=1
    )
    backend = resolve_fft_backend(settings, vol.ndim)
    return {
        "name": "rl20_equivalent_nonseparable_hybrid_biggs",
        "shape": shape,
        "warm_iterations": 16,
        "exact_iterations": 3,
        "acceleration": "biggs",
        "warm_residual": round(float(warm_residual), 4),
        "fft_backend": backend,
        "gvox_per_s": round(int(np.prod(shape)) / best / 1e9, 4),
        "seconds": round(best, 4),
        "note": "RL-20-equivalent quality on the config-6 PSF via "
        "algorithm='hybrid' + acceleration='biggs' (both phases; the "
        "Biggs alpha restarts at the phase boundary): beats plain "
        "exact RL-20 on the convergence trajectory by ~34% margin "
        "across seeds (CPU gates). Compare gvox_per_s against configs "
        "6 (plain exact RL-20) and 8 (unaccelerated hybrid) at "
        "matched-or-better output quality — at the SAME shape field: "
        "the biggs carry (x/dx/g extrapolation volumes on the dft2z "
        "tail) OOMs single-chip HBM at the production grid, so this "
        "config records the fallback geometry on 16 GB chips",
    }


def _config_accel(variant: str | None) -> dict:
    """Config 7: Biggs-Andrews accelerated RL on the production fused
    backend — RL-10 with acceleration lands at plain RL-20..30 on the
    convergence trajectory (docs/kernels.md "Biggs-Andrews
    acceleration"; HW trajectory measurement on the FFT path, the
    update rule is backend-independent), so this entry records the
    RL-20-equivalent throughput a user gets by turning the
    ``acceleration: biggs`` knob on. Same volume/PSF as config 2;
    gvox_per_s uses the same nvox/warm-wall convention."""
    import jax
    import jax.numpy as jnp

    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import gaussian_psf, richardson_lucy

    psf = gaussian_psf(PSF_SHAPE, (1.5, 3.0, 3.0))
    # donate_input hands the volume's buffer to the program (it is
    # dead once the padded carries are built) — together with the bf16
    # acceleration state and rl_outer's no-post-step-consumer rule for
    # the extrapolated point (see its body comment) this is what fits
    # biggs at the production carry on a 16 GB chip. The volume
    # is generated fresh on-device each timed call (a held source
    # array would pin 2.2 GB of HBM across the donated run — measured
    # to tip the production carry back over); a real pipeline donates
    # the deskew output the same way. Generation is ~ms on device,
    # honest to include in the timing.
    settings = DeconvolveSettings(
        iterations=10, acceleration="biggs", donate_input=True
    )
    shape = tuple(int(v) for v in (variant or "128,2888,1600").split(","))
    gen = jax.jit(
        lambda k: jax.random.uniform(k, shape, jnp.float32, 0.0, 100.0)
    )
    key = jax.random.key(0)
    best = _time_best(
        lambda: _sync(richardson_lucy(gen(key), psf, settings))
    )
    return {
        "name": "rl10_biggs_accelerated",
        "shape": shape,
        "iterations": 10,
        "acceleration": "biggs",
        "gvox_per_s": round(int(np.prod(shape)) / best / 1e9, 4),
        "seconds": round(best, 4),
        "note": "RL-20-equivalent output quality (Biggs-Andrews "
        "extrapolation reaches plain RL-20..30 on the convergence "
        "trajectory in 10 iterations); same volume/PSF/backend as "
        "rl20_deconvolution — compare gvox_per_s directly against it "
        "at matched output quality. The extrapolation is fused INTO "
        "the kernel passes on this backend (y built in the ratio "
        "pass's DMA ring, state + alpha partials emitted by the mult "
        "pass's epilogue): 53.3 ms/iter vs 78.8 with the generic XLA "
        "epilogue, i.e. ~1.33x wall-clock over plain RL-20 at matched "
        "quality on the fused path, 1.84x on the transform-bound "
        "FFT/DFT backends (docs/kernels.md)",
    }


_CONFIG_FNS = {
    "deskew": _config_deskew,
    "rl20": _config_rl20,
    "register": _config_register,
    "plate": _config_plate,
    "replay": _config_replay,
    "nonsep": _config_nonsep,
    "accel": _config_accel,
    "nonsep_hybrid": _config_nonsep_hybrid,
    "nonsep_hybrid_accel": _config_nonsep_hybrid_accel,
}

# Per-config geometry fallbacks, each attempt its own bounded child.
_CONFIG_VARIANTS: dict[str, list[str | None]] = {
    "deskew": ["300,2048,2048", "300,1024,2048", "300,512,1024"],
    "rl20": ["128,2888,1600", "128,2888,800"],
    "register": [None],
    "plate": [None],
    "replay": [None],
    # The production carry is attempted FIRST: with the tile-rounded
    # matmul grid (144,2920,1664) the dft2z working set fits
    # single-chip HBM (measured r4: 1092.3 ms/iter; the r4-run-2 OOM
    # was at the old 5-smooth grid (144,3000,1920)). The smaller
    # geometry remains the bounded fallback if the big child blows
    # its budget.
    "nonsep": ["128,2888,1600", "128,1444,800"],
    "accel": ["128,2888,1600", "128,2888,800"],
    # Same geometry ladder as nonsep so the entries compare directly
    # at matched quality (see _config_nonsep_hybrid*).
    "nonsep_hybrid": ["128,2888,1600", "128,1444,800"],
    # Fallback geometry FIRST: biggs on the dft2z tail carries the
    # accelerated state (x/dx/g extrapolation volumes) on top of the
    # plain RL carry, and that working set OOMs single-chip HBM at the
    # production grid (144,2920,1664) — measured 2026-08-21 (the
    # plain hybrid/nonsep carry fits). The production attempt stays as
    # the second rung for bigger-HBM hosts.
    "nonsep_hybrid_accel": ["128,1444,800", "128,2888,1600"],
}


# Single source of truth for the child-process flags. EVERY branch of
# _child_main must be listed: a flag handled there but missing here
# makes the child recursively run the FULL driver (the r3 "tunnel
# down" record was exactly this, with --probe; --geom-accel repeated
# it in r4 before the list was unified). tests/test_bench_record.py
# asserts the list matches _child_main's branches.
CHILD_FLAGS = ("--geom", "--geom-accel", "--config", "--parity", "--probe")


def _child_main(argv: list[str]) -> None:
    _enable_cache()
    if argv[0] == "--geom":
        geom = tuple(int(v) for v in argv[1].split(","))
        print(json.dumps(_run_headline(geom)))
    elif argv[0] == "--geom-accel":
        geom = tuple(int(v) for v in argv[1].split(","))
        print(json.dumps(_run_headline(geom, accelerated=True)))
    elif argv[0] == "--config":
        variant = argv[2] if len(argv) > 2 else None
        print(json.dumps(_CONFIG_FNS[argv[1]](variant)))
    elif argv[0] == "--parity":
        print(json.dumps({"parity_err": _parity_check()}))
    elif argv[0] == "--probe":
        # Tunnel liveness: the cheapest possible device round-trip.
        import jax
        import jax.numpy as jnp

        ok = float(jnp.sum(jnp.ones((128, 128)))) == 128.0 * 128.0
        print(json.dumps({
            "alive": bool(ok),
            "platform": jax.devices()[0].platform,
        }))
    else:
        raise SystemExit(f"unknown child args: {argv}")


def _run_child(args: list[str], timeout: float) -> tuple[dict | None, bool]:
    """Run one measurement child. Returns (payload, timed_out)."""
    if timeout <= 0:
        return None, False
    try:
        proc = subprocess.run(
            [sys.executable, __file__, *args],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"# {args} timed out after {timeout:.0f}s", file=sys.stderr)
        return None, True
    if proc.returncode != 0:
        err = (proc.stderr or "").strip().splitlines()
        print(
            f"# {args} failed: {err[-1][:160] if err else 'unknown'}",
            file=sys.stderr,
        )
        return None, False
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1]), False
    except (json.JSONDecodeError, IndexError):
        print(f"# {args}: unparseable output", file=sys.stderr)
        return None, False


def main() -> None:
    deadline = time.monotonic() + _budget_s()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())
    _enable_cache()

    def remaining() -> float:
        return deadline - time.monotonic()

    def child_timeout(margin: float = 30.0) -> float:
        return min(CHILD_TIMEOUT_S, remaining() - margin)

    # Congestion pacing (r5: the tunnel oscillates between ~10-min
    # healthy windows and ~30-40-min degraded stretches; measured
    # 2026-08-21: a degraded stretch burned EVERY config's fair share
    # on ~116 s timeouts just before a healthy window arrived). Track
    # consecutive child timeouts; at >=2, hold before the next config:
    # sleep, then issue a cheap probe, resuming the moment the tunnel
    # answers — at most two cycles, then launch the next child
    # REGARDLESS (the congested-but-workable state answers children but
    # not probes; see the last-chance rationale above). The hold burns
    # budget as sleep instead of config shares, so the healthy window
    # inherits shares instead of a drained budget.
    timeout_streak = 0

    def tracked_child(args: list[str], timeout: float):
        nonlocal timeout_streak
        payload, timed_out = _run_child(args, timeout)
        if timed_out:
            timeout_streak += 1
        elif payload is not None:
            timeout_streak = 0
        return payload, timed_out

    def pace() -> None:
        nonlocal timeout_streak
        if timeout_streak < 2:
            return
        for _ in range(2):
            if remaining() < 420.0:
                return
            print(
                f"# pacing: {timeout_streak} consecutive child "
                "timeouts; sleeping 120s then probing",
                file=sys.stderr,
            )
            time.sleep(120.0)
            payload, _ = _run_child(
                ["--probe"], min(240.0, child_timeout())
            )
            if payload is not None and payload.get("alive"):
                timeout_streak = 0
                return

    # Tunnel liveness probe BEFORE anything expensive: the axon relay
    # has been observed fully unresponsive for hours (even
    # jax.devices() hangs). Without this, every geometry child would
    # burn its full timeout and the run would be killed with NOTHING on
    # stdout; with it, a dead tunnel still yields a parseable record
    # that says so.
    # 240 s probe budget: the tunnel has a degraded-but-alive state
    # where a trivial matmul readback takes ~70 s (measured r4) — a
    # 120 s probe child (startup + jax init + readback) flakes there
    # while real work still completes fine.
    # Two probe attempts, not three: when probes are timing out, the
    # third 240 s probe buys less information than the last-chance
    # headline child below (which doubles as the measurement) — and
    # within a 900 s budget, three probe timeouts would leave no room
    # for it.
    alive = False
    for attempt in range(2):
        payload, _ = _run_child(["--probe"], min(240.0, child_timeout()))
        if payload is not None and payload.get("alive"):
            alive = True
            break
        if remaining() < 240.0:
            break
        if attempt == 0:  # no point sleeping into the last-chance child
            print(
                f"# device probe failed (attempt {attempt + 1}); waiting",
                file=sys.stderr,
            )
            time.sleep(45.0)
        else:
            print(
                f"# device probe failed (attempt {attempt + 1})",
                file=sys.stderr,
            )
    value = 0.0
    used = None
    out_zyx = None
    if not alive and remaining() > 270.0:
        # Last chance before declaring the tunnel dead: try ONE real
        # headline child. Measured 2026-08-20: probe children timed out
        # at 240 s three times in a row while the production-geometry
        # child then measured 0.8392 — killed clients' in-flight
        # compiles queue server-side AHEAD of new probes, so a merely
        # congested tunnel fails every probe yet drains in time for
        # real work. A dead tunnel costs one child timeout extra; a
        # congested one yields a fresh record instead of a stale replay.
        print("# probes failed; trying a headline child anyway",
              file=sys.stderr)
        payload, timed_out = _run_child(
            ["--geom", ",".join(map(str, GEOMETRIES[0]))], child_timeout()
        )
        if payload is None and timed_out and remaining() > CHILD_TIMEOUT_S:
            # Same compile-queue-stall retry every other child path
            # gets: the killed client's compile (and the probes') drain
            # server-side, and the retry warm-starts from the shared
            # cache. Without this, a big-budget watcher run goes stale
            # with hundreds of seconds unused (r5 review finding).
            payload, _ = _run_child(
                ["--geom", ",".join(map(str, GEOMETRIES[0]))],
                child_timeout(),
            )
        if payload is not None:
            alive = True
            value = payload["vox_per_s"] / 1e9
            out_zyx = payload["out_shape"]
            used = GEOMETRIES[0]
            print(
                f"# geometry {GEOMETRIES[0]}: {value:.4f} GVox/s "
                "(post-probe-failure)",
                file=sys.stderr,
            )
    if not alive:
        cached = _load_last_good()
        if cached is not None:
            print(json.dumps(_stale_record(
                cached,
                "tpu unreachable this run: device probe timed out "
                "repeatedly (axon tunnel down)",
            )), flush=True)
            return
        print(json.dumps({
            "metric": "deskew+rl20 reconstruction throughput per chip",
            "value": None,
            "unit": "GVox/s",
            "vs_baseline": None,
            "error": "tpu unreachable: device probe timed out repeatedly "
            "(axon tunnel down); no measurement was possible this run",
            "configs": [],
        }), flush=True)
        return

    # Headline FIRST (best-first geometries, stop at the first that
    # measures) — the throughput number is the record that must survive
    # a timeout kill, so nothing runs before it.
    for geom in GEOMETRIES if used is None else []:
        payload, timed_out = tracked_child(
            ["--geom", ",".join(map(str, geom))], child_timeout()
        )
        if payload is None and timed_out and remaining() > CHILD_TIMEOUT_S:
            # Compile-queue stall: the killed client's compile drains
            # server-side; the retry warm-starts from the shared cache.
            payload, _ = tracked_child(
                ["--geom", ",".join(map(str, geom))], child_timeout()
            )
        if payload is None:
            continue
        value = payload["vox_per_s"] / 1e9
        out_zyx = payload["out_shape"]
        used = geom
        print(f"# geometry {geom}: {value:.4f} GVox/s", file=sys.stderr)
        break

    headline = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": round(value, 4),
        "unit": "GVox/s",
        "vs_baseline": round(value / 1.0, 4),
        "raw_shape": used,
        "out_shape": out_zyx,
        "parity_err": None,
        "floor_note": FLOOR_NOTE,
    }
    # First insurance line: the throughput record is on stdout before
    # any further work (parity_err still null here).
    print(json.dumps({**headline, "configs": []}), flush=True)

    # Parity in a BOUNDED child: a wedged device tunnel must not hang
    # the parent (round 2's record was lost to exactly that). A timeout
    # leaves parity_err null in the record rather than no record.
    # Full child cap, not a shorter one: on a congested tunnel (probe
    # starvation behind queued compiles, 2026-08-20) even this small
    # child needs minutes of startup; a 180 s cap lost parity in a run
    # where every geometry child succeeded at 300 s.
    payload, timed_out = tracked_child(["--parity"], child_timeout())
    if payload is None and timed_out and remaining() > CHILD_TIMEOUT_S:
        payload, _ = tracked_child(["--parity"], child_timeout())
    if payload is not None and payload.get("parity_err") is not None:
        headline["parity_err"] = round(payload["parity_err"], 8)
    # Second insurance line, now carrying parity.
    print(json.dumps({**headline, "configs": []}), flush=True)

    # RL-20-EQUIVALENT headline: the same deskew+RL pipeline at the
    # Biggs-accelerated RL-10 budget (matched output quality — the
    # trajectory-equivalence contract; see _run_headline). The plain
    # RL-20 number above stays the comparable-across-rounds headline
    # `value`; this field records what a user actually gets.
    # Bounded like parity: the equivalent figure must not starve the
    # config sweep (one full-cap shot — a 240 s cap starved it on the
    # congested tunnel while 300 s children succeeded; a stall retry
    # only with plenty of budget left — the warm compile cache makes
    # retries cheap).
    if used is not None:
        payload, timed_out = tracked_child(
            ["--geom-accel", ",".join(map(str, used))], child_timeout()
        )
        if payload is None and timed_out and remaining() > 2 * CHILD_TIMEOUT_S:
            payload, _ = tracked_child(
                ["--geom-accel", ",".join(map(str, used))], child_timeout()
            )
        if payload is not None:
            eq = payload["vox_per_s"] / 1e9
            headline["rl20_equivalent"] = {
                "gvox_per_s": round(eq, 4),
                "iterations": 10,
                "acceleration": "biggs",
                "note": "same pipeline/geometry, Biggs-accelerated "
                "RL-10 = RL-20-equivalent restoration (accel-10 lands "
                "between plain-20 and plain-30 on the convergence "
                "trajectory; tests/test_deconv.py biggs trajectory tests, bench_rl "
                "parity_biggs)",
            }
            print(
                f"# rl20-equivalent (biggs-10): {eq:.4f} GVox/s",
                file=sys.stderr,
            )
            # Third insurance line with the equivalent throughput.
            print(json.dumps({**headline, "configs": []}), flush=True)

    # Config scheduling is FAIR-SHARE over the remaining budget: each
    # config's total spend (all variants + the one stall retry) is
    # capped at max(90 s, remaining/configs_left), with unused share
    # rolling over to later configs. On a healthy tunnel every config
    # finishes well inside its share and the expensive tail (nonsep at
    # the production carry) inherits the accumulated leftovers; on a
    # degraded tunnel (the r4 run-4 failure: one slow deskew child +
    # its retry starved ALL six configs) each config still gets a shot
    # — in particular `replay`, which runs on CPU and is immune to
    # tunnel state. Execution is cheapest/most-robust first; the
    # record's configs array keeps the canonical order.
    run_order = (
        "replay", "register", "rl20", "accel", "plate", "deskew", "nonsep",
        "nonsep_hybrid", "nonsep_hybrid_accel",
    )
    record_order = (
        "deskew", "rl20", "accel", "register", "plate", "replay", "nonsep",
        "nonsep_hybrid", "nonsep_hybrid_accel",
    )
    results: dict[str, dict] = {}
    for idx, name in enumerate(run_order):
        pace()
        if remaining() < 60.0:
            results[name] = {"name": name, "skipped": "budget"}
            continue
        share = max(90.0, (remaining() - 30.0) / (len(run_order) - idx))
        config_deadline = time.monotonic() + share

        def config_timeout() -> float:
            return min(
                CHILD_TIMEOUT_S,
                remaining() - 30.0,
                config_deadline - time.monotonic(),
            )

        payload = None
        for variant in _CONFIG_VARIANTS[name]:
            args = ["--config", name] + ([variant] if variant else [])
            payload, timed_out = tracked_child(args, config_timeout())
            if (
                payload is None
                and timed_out
                and timeout_streak < 2
                and config_deadline - time.monotonic() > 60.0
            ):
                # Compile-queue stall retry (headline rationale), still
                # inside this config's share — but only for a one-off
                # stall: at streak >=2 the tunnel is degraded and the
                # retry would burn the share for nothing (pace()
                # handles that state between configs).
                payload, _ = tracked_child(args, config_timeout())
            if payload is not None:
                break
            if config_timeout() < 30.0:
                break
        if payload is not None:
            print(f"# config {name}: {payload}", file=sys.stderr)
            results[name] = payload
        elif remaining() < 60.0:
            results[name] = {"name": name, "skipped": "budget"}
        else:
            results[name] = {"name": name, "error": "failed"}

    # Second-chance pass: configs that failed or were skipped get the
    # leftover budget (fair-share again). A transiently degraded tunnel
    # (the documented 70 s-readback state) can eat one config's 90 s
    # share and recover minutes later — r4 run-4 lost deskew+register
    # exactly this way while 300+ s of budget went unused.
    retry = [
        n for n in run_order
        if "gvox_per_s" not in results[n]
        and "volumes_per_min" not in results[n]
        and "session_volumes_per_min" not in results[n]
        and "apply_gvox_per_s" not in results[n]
    ]
    for idx, name in enumerate(retry):
        pace()
        if remaining() < 90.0:
            break
        share = max(90.0, (remaining() - 30.0) / (len(retry) - idx))
        config_deadline = time.monotonic() + share

        def retry_timeout() -> float:
            return min(
                CHILD_TIMEOUT_S,
                remaining() - 30.0,
                config_deadline - time.monotonic(),
            )

        for variant in _CONFIG_VARIANTS[name]:
            args = ["--config", name] + ([variant] if variant else [])
            payload, _ = tracked_child(args, retry_timeout())
            if payload is not None:
                print(f"# config {name} (retry): {payload}", file=sys.stderr)
                results[name] = payload
                break
            if retry_timeout() < 30.0:
                break

    configs = [results[name] for name in record_order]
    record = {**headline, "environment": _environment(), "configs": configs}
    if value > 0:
        _save_last_good(record)
    else:
        # Probe passed but every headline geometry failed (degraded
        # tunnel): a cached complete record is strictly better than a
        # zero headline.
        cached = _load_last_good()
        if cached is not None:
            record = _stale_record(
                cached,
                "headline measurement failed this run (degraded tunnel)",
            )
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] in CHILD_FLAGS:
        _child_main(sys.argv[1:])
    else:
        main()
