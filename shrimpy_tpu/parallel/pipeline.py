"""Sharded fused reconstruction step: deskew -> phase -> deconvolve.

The per-volume kernels (:mod:`shrimpy_tpu.ops`) compose into one
jit-compiled program, vmapped over a batch of independent volumes and
sharded over a :func:`shrimpy_tpu.parallel.mesh.make_mesh` device mesh:
the batch axis spans (position, timepoint, channel) volumes — the
reference's HPC fan-out axis (SURVEY.md §2.9) — and the optional
``space`` axis shards each volume's X extent so FFT stages ride XLA's
collective FFT over ICI.

XLA fuses the stage boundaries (deskew output feeds the RL ratio
pipeline without round-tripping HBM more than the FFTs require), which
is exactly the reason the stages live in one jit program instead of
separate dispatches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shrimpy_tpu.config.schemas import ReconstructSettings
from shrimpy_tpu.ops.deconv import _padded_grid_shape
from shrimpy_tpu.ops.deskew import _deskew_xla, get_deskewed_shape
from shrimpy_tpu.ops.phase import _apply_inverse_jit, compute_transfer_function


def _deconv_fn(
    settings: ReconstructSettings,
    psf: np.ndarray | None,
):
    """Per-volume RL stage with the PSF baked at build time.

    The separable fast path turns the PSF into circulant matrices —
    host-side, data-dependent work — so the pipeline needs the concrete
    PSF when the program is built, not at call time.
    """
    deconv = settings.deconvolve
    if deconv is None:
        return None
    if psf is None:
        raise ValueError("deconvolve stage enabled but no PSF provided")
    from shrimpy_tpu.ops.deconv import _crop_psf_support, _pad_psf_to_odd

    psf_np = _pad_psf_to_odd(
        _crop_psf_support(np.asarray(psf, dtype=np.float32), deconv.psf_crop_tol)
    )

    terms = None
    hybrid_terms = None
    if settings.shard_volumes:
        # >HBM volumes stay X-sharded through the volumetric stages:
        # only the pure-XLA FFT path partitions under GSPMD (the
        # Pallas/separable kernels are volume-local).
        if deconv.algorithm == "hybrid":
            raise ValueError(
                "shard_volumes runs the plain sharded RL update; "
                "algorithm='hybrid' (separable warm phase on volume-"
                "local kernels) is not supported on the distributed "
                "slab path"
            )
    elif deconv.algorithm in ("auto", "separable"):
        from shrimpy_tpu.ops.deconv import plan_separable_terms

        terms = plan_separable_terms(psf_np, deconv)
        if terms is None and deconv.algorithm == "separable":
            raise ValueError("PSF not separable within separable_tol")
    elif deconv.algorithm == "hybrid" and deconv.hybrid_separable_iters:
        from shrimpy_tpu.ops.deconv import plan_hybrid_terms

        hybrid_terms, _ = plan_hybrid_terms(psf_np, deconv)

    if hybrid_terms is not None:

        def rl_h(vol, terms=hybrid_terms):
            # Same warm-start dispatch as richardson_lucy — the warm
            # separable phase and exact tail both resolve their backend
            # per the (device-local) volume shape.
            from shrimpy_tpu.ops.deconv import rl_hybrid

            return rl_hybrid(vol, psf_np, terms, deconv, deconv.iterations)

        return rl_h

    if terms is not None:

        def rl(vol):
            # Backend resolution sees the per-volume (per-device-local
            # under shard_map) shape, so the fast Pallas backends run
            # on the mesh path too (round-1 forced "matmul" there).
            # One shared dispatch with richardson_lucy (ops/deconv.py).
            from shrimpy_tpu.ops.deconv import rl_separable

            return rl_separable(vol, psf_np, terms, deconv, deconv.iterations)

        return rl

    def rl(vol):
        # Non-separable fallback through the SAME fft-backend dispatch
        # as richardson_lucy (fft_backend/fft_z_chunk honored — the
        # fft2z path is what fits production carries single-chip).
        from shrimpy_tpu.ops.deconv import rl_fft

        return rl_fft(vol, psf_np, deconv, deconv.iterations)

    return rl


def _register_fn(settings: ReconstructSettings):
    """Affine-apply stage from a pre-estimated transform JSON.

    The transform is estimated once via the ``register`` verb
    (:func:`shrimpy_tpu.ops.register.estimate_registration`) and applied
    per volume in the fused pipeline — the label-free <-> fluorescence
    alignment step of BASELINE.json configs[2].
    """
    reg = settings.registration
    if reg is None or reg.transform_path is None:
        return None
    import json

    with open(reg.transform_path) as f:
        transform = json.load(f)
    matrix = jnp.asarray(np.asarray(transform["matrix_zyx"], np.float32))
    offset = jnp.asarray(np.asarray(transform["offset_zyx"], np.float32))

    from shrimpy_tpu.ops.register import affine_apply

    def apply(vol):
        # Concrete (build-time) matrix: identity transforms dispatch to
        # the gather-free translation warp.
        return affine_apply(vol, matrix, offset, tuple(vol.shape))

    return apply


def _stage_fns(
    settings: ReconstructSettings, psf: np.ndarray | None, mesh: Mesh | None = None
):
    """(deskew_fn | None, fft_fn | None) traced per-volume stages.

    The pipeline is split at the deskew boundary so the sharded build
    can reshard between them: the deskew resample is pointwise in X
    (stays X-sharded), while the volumetric stages (phase inverse, RL)
    run volume-local after a reshard to whole volumes per device.
    """
    desk = settings.deskew
    phase = settings.phase

    deskew_fn = None
    if desk is not None:
        # The manual-DMA Pallas kernel runs per volume; both the
        # single-device lax.map path and the shard_map mesh path call
        # it on whole local volumes (the mesh path shards X, in which
        # the deskew resample is pointwise).
        use_pallas = (
            desk.backend == "pallas"
            or (desk.backend == "auto" and jax.default_backend() == "tpu")
        )

        def deskew_fn(raw):
            if use_pallas:
                from shrimpy_tpu.ops.deskew_pallas import _deskew_pallas_jit

                return _deskew_pallas_jit(
                    raw.astype(jnp.float32),
                    ls_angle_deg=desk.ls_angle_deg,
                    px_to_scan_ratio=desk.require_ratio(),
                    keep_overhang=desk.keep_overhang,
                    average_n_slices=desk.average_n_slices,
                    interpret=jax.default_backend() != "tpu",
                )
            return _deskew_xla(
                raw.astype(jnp.float32),
                ls_angle_deg=desk.ls_angle_deg,
                px_to_scan_ratio=desk.require_ratio(),
                keep_overhang=desk.keep_overhang,
                average_n_slices=desk.average_n_slices,
            )

    reg_fn = _register_fn(settings)
    rl_fn = _deconv_fn(settings, psf)
    fft_fn = None
    if phase is not None or rl_fn is not None or reg_fn is not None:

        def fft_fn(vol, tf_ri):
            vol = vol.astype(jnp.float32)
            if phase is not None:
                from shrimpy_tpu.ops.phase import _resolve_transform

                vol = _apply_inverse_jit(
                    vol,
                    tf_ri,
                    phase.transfer_function.z_padding,
                    phase.apply_inverse.regularization_strength,
                    _resolve_transform(phase.apply_inverse),
                )
            if reg_fn is not None:
                vol = reg_fn(vol)
            if rl_fn is not None:
                vol = rl_fn(vol)
            return vol

    return deskew_fn, fft_fn


def _fft_stages_sharded(settings: ReconstructSettings, psf, mesh: Mesh):
    """Volumetric stages on X-sharded volumes: distributed slab FFTs.

    The >HBM ``shard_volumes`` path: the FFT-based stages (phase
    inverse, FFT RL) run inside ``shard_map`` over the mesh with
    :mod:`shrimpy_tpu.parallel.fft` slab transforms — Z/Y local, the X
    transform via two ``all_to_all`` transposes over ICI. No device
    ever materializes a whole volume; grid pads/crops happen outside
    the shard_map where GSPMD handles sharded-axis halos.
    """
    phase = settings.phase
    deconv = settings.deconvolve
    if settings.registration is not None and settings.registration.transform_path:
        raise ValueError(
            "shard_volumes does not support the registration-apply stage "
            "(affine gathers span shards); register on whole volumes"
        )
    if phase is None and deconv is None:
        return None
    psf_np = None
    if deconv is not None:
        if psf is None:
            raise ValueError("deconvolve stage enabled but no PSF provided")
        if deconv.acceleration != "none":
            raise ValueError(
                "shard_volumes runs the plain sharded RL update; "
                f"acceleration='{deconv.acceleration}' is not supported "
                "on the distributed slab path (single-chip FFT RL only)"
            )
        if deconv.algorithm == "hybrid":
            raise ValueError(
                "shard_volumes runs the plain sharded RL update; "
                "algorithm='hybrid' (separable warm phase on volume-"
                "local kernels) is not supported on the distributed "
                "slab path"
            )
        # Same PSF conditioning as the unsharded path (_deconv_fn):
        # support cropping shrinks the padded grid — which matters MOST
        # here, on the memory-critical >HBM route — and psf_crop_tol
        # must not be silently inert on one path.
        from shrimpy_tpu.ops.deconv import _crop_psf_support, _pad_psf_to_odd

        psf_np = _pad_psf_to_odd(
            _crop_psf_support(
                np.asarray(psf, dtype=np.float32), deconv.psf_crop_tol
            )
        )
    n_space = mesh.devices.shape[1]
    spec_x = NamedSharding(mesh, P("batch", None, None, "space"))

    from jax import shard_map

    from shrimpy_tpu.parallel.fft import fft3_sharded, ifft3_sharded

    def _constrain(x):
        return jax.lax.with_sharding_constraint(x, spec_x)

    def _local_otf_block(psf_arr, grid, axis_name, n_shards):
        """This device's X slab of ``fftn(embed_psf(psf, grid))``.

        The embedded PSF is nonzero on only ``kz*ky*kx`` voxels, so the
        full OTF is a rank-structured DFT sum:
        ``OTF[i,j,l] = sum_abc psf[a,b,c] Az[i,a] Ay[j,b] Ax[l,c]`` with
        ``A_N[i,a] = exp(-2j pi i (a - c_axis) / N)`` (the ``- c`` phase
        is the origin roll of ``_embed_psf``). Computing the local
        ``l`` range directly costs ~Gz*Gy*Gx*kx FLOPs and peaks at one
        (Gz, Gy, kx) temp — never a full-grid array.
        """
        gz, gy, gx = grid
        kz, ky, kx = psf_arr.shape
        cz, cy, cx = kz // 2, ky // 2, kx // 2
        xloc = gx // n_shards
        x0 = jax.lax.axis_index(axis_name) * xloc
        psf_c = jnp.asarray(psf_arr, jnp.complex64) / np.float32(
            psf_arr.sum()
        )

        def factor(i_idx, n, k, c):
            a = jnp.arange(k, dtype=jnp.float32)[None, :] - np.float32(c)
            ph = (-2.0 * np.pi / n) * i_idx[:, None].astype(jnp.float32) * a
            return jnp.exp(1j * ph.astype(jnp.float32)).astype(jnp.complex64)

        az = factor(jnp.arange(gz), gz, kz, cz)
        ay = factor(jnp.arange(gy), gy, ky, cy)
        ax = factor(x0 + jnp.arange(xloc), gx, kx, cx)
        t1 = jnp.einsum("ia,abc->ibc", az, psf_c)
        t2 = jnp.einsum("jb,ibc->ijc", ay, t1)
        return jnp.einsum("lc,ijc->ijl", ax, t2)

    def run(batch, tf_ri):
        vol = batch.astype(jnp.float32)

        if phase is not None:
            zp = phase.transfer_function.z_padding
            reg = phase.apply_inverse.regularization_strength
            if zp:
                vol = _constrain(jnp.pad(
                    vol, ((0, 0), (zp, zp), (0, 0), (0, 0)), mode="reflect"
                ))
            if vol.shape[2] % n_space:
                raise ValueError(
                    f"shard_volumes: Y extent {vol.shape[2]} must be divisible "
                    f"by the space axis ({n_space}) for the slab transpose"
                )

            from shrimpy_tpu.ops.phase import _resolve_transform

            ph_tr = _resolve_transform(phase.apply_inverse)

            def phase_local(block, tf_blk):
                tf = tf_blk[0] + 1j * tf_blk[1]
                mean = jax.lax.pmean(
                    jnp.mean(block, axis=(1, 2, 3), keepdims=True), "space"
                )
                spectrum = fft3_sharded(
                    (block - mean).astype(jnp.complex64), "space", ph_tr
                )
                recon = jnp.conj(tf) * spectrum / (jnp.abs(tf) ** 2 + reg)
                return jnp.real(ifft3_sharded(recon, "space", ph_tr)).astype(
                    jnp.float32
                )

            vol = shard_map(
                phase_local,
                mesh=mesh,
                in_specs=(
                    P("batch", None, None, "space"),
                    P(None, None, None, "space"),
                ),
                out_specs=P("batch", None, None, "space"),
                check_vma=False,
            )(vol, tf_ri)
            if zp:
                vol = _constrain(vol[:, zp:-zp])

        if deconv is not None:
            # The sharded RL honors the fft_backend knob's transform
            # choice: dft2z -> matmul, fft2z/fft3 -> xla, auto ->
            # platform default (the 2z z-banding itself is moot here —
            # the slab scheme already bounds per-device memory). The
            # grid policy follows the transform (matmul grids round to
            # hardware tiles, not 5-smooth lengths).
            from shrimpy_tpu.ops.dft import default_transform

            rl_tr = {
                "dft2z": "matmul",
                "dftz": "matmul",
                "fft2z": "xla",
                "fft3": "xla",
            }.get(deconv.fft_backend, default_transform())
            grid, pads = _padded_grid_shape(
                tuple(vol.shape[1:]), tuple(psf_np.shape), transform=rl_tr
            )
            if grid[1] % n_space or grid[2] % n_space:
                raise ValueError(
                    f"shard_volumes: padded RL grid {grid} must be divisible by "
                    f"the space axis ({n_space}) on Y and X"
                )
            eps = deconv.epsilon
            iterations = deconv.iterations
            padded = _constrain(
                jnp.pad(vol, ((0, 0), *pads), mode=deconv.pad_mode)
            )

            def rl_local(block):
                # Each device builds ITS X slab of the OTF analytically
                # (small-factor DFT einsum over the tiny PSF) — a
                # whole-grid fftn here would materialize a full-volume
                # complex operator per device on exactly the path whose
                # contract is that no device holds a whole volume.
                otf_blk = _local_otf_block(psf_np, grid, "space", n_space)
                data = jnp.maximum(block, 0.0)
                est0 = jnp.maximum(block, eps)

                def conv(u, kernel):
                    f = fft3_sharded(u.astype(jnp.complex64), "space", rl_tr)
                    return jnp.real(
                        ifft3_sharded(f * kernel, "space", rl_tr)
                    )

                def step(est, _):
                    ratio = data / jnp.maximum(conv(est, otf_blk), eps)
                    return est * conv(ratio, jnp.conj(otf_blk)), None

                est, _ = jax.lax.scan(step, est0, None, length=iterations)
                return est

            est = shard_map(
                rl_local,
                mesh=mesh,
                in_specs=(P("batch", None, None, "space"),),
                out_specs=P("batch", None, None, "space"),
                check_vma=False,
            )(padded)
            crop = tuple(
                slice(lo, lo + n) for (lo, _), n in zip(pads, vol.shape[1:])
            )
            vol = _constrain(est[(slice(None), *crop)])

        return vol

    return run


def build_reconstruct_step(
    settings: ReconstructSettings,
    *,
    psf: np.ndarray | None = None,
    mesh: Mesh | None = None,
    donate: bool = True,
):
    """Compile-ready batched step ``fn(batch_raw, tf) -> batch_out``.

    ``batch_raw`` is ``(B, S/Z, T/Y, X)``; ``tf`` is the phase transfer
    function (replicated; pass a shape-(1,1,1) dummy when the phase
    stage is disabled). The PSF is baked into the program at build time
    (see :func:`_deconv_fn`).

    Sharding layout with a mesh: inputs arrive ``P('batch', None, None,
    'space')`` (volumes over batch, X over space — the deskew stage is
    pointwise in X so it runs fully sharded). Before the volumetric
    stages the volumes reshard to one-whole-volume-per-device
    (``P(('batch','space'))`` when the batch divides the device count,
    else ``P('batch')``): per-volume FFT/matmul stages never span
    chips, the reshard is one all-to-all over ICI.
    """
    deskew_fn, fft_fn = _stage_fns(settings, psf, mesh)

    if settings.shard_volumes and (mesh is None or mesh.devices.shape[1] < 2):
        # Without a space axis the >HBM flag would silently run whole
        # volumes (and OOM with an opaque allocator error on exactly
        # the volumes the flag exists for).
        raise ValueError(
            "shard_volumes requires a device mesh with space > 1 "
            "(pass --devices N --space S to the CLI, or make_mesh(n, "
            "space=s))"
        )

    def batched(raw, tf):
        vol = raw
        if mesh is None:
            # Single-device: process volumes sequentially. A vmapped
            # batch (even B=1) forces batched einsum layouts that run
            # ~2.4x slower than the per-volume programs on TPU.
            if deskew_fn is not None:
                vol = jax.lax.map(deskew_fn, vol)
            if fft_fn is not None:
                vol = jax.lax.map(lambda v: fft_fn(v, tf), vol)
            return vol
        # Mesh path: shard_map runs the per-volume kernels (incl. the
        # manual-DMA Pallas deskew/RL) on each device's local block —
        # vmap cannot trace through pallas_call with manual DMAs, which
        # in round 1 forced the slow XLA fallbacks here. (Shard-
        # evenness is validated by the caller-facing wrapper below.)
        from jax import shard_map

        if deskew_fn is not None:
            # Deskew is pointwise in X: runs fully sharded over
            # ('batch', 'space') with no communication.
            spec_in = P("batch", None, None, "space")
            vol = shard_map(
                lambda block: jax.lax.map(deskew_fn, block),
                mesh=mesh,
                in_specs=(spec_in,),
                out_specs=spec_in,
                check_vma=False,  # pallas_call outputs carry no replication info
            )(vol)
        if settings.shard_volumes:
            # >HBM volumes: no whole-volume reshard — X stays sharded
            # over 'space' and the volumetric stages run as distributed
            # slab FFTs inside shard_map (SURVEY §5.7).
            sharded_fft = _fft_stages_sharded(settings, psf, mesh)
            if sharded_fft is not None:
                vol = sharded_fft(vol, tf)
            return vol
        if fft_fn is not None:
            # Volumetric stages run per whole volume: reshard so each
            # device owns complete volumes (one all-to-all over ICI),
            # flattening batch over both axes when it divides evenly.
            n_dev = mesh.devices.size
            b = vol.shape[0]
            spec = (
                P(("batch", "space"))
                if mesh.devices.shape[1] > 1 and b % n_dev == 0
                else P("batch")
            )
            vol = jax.lax.with_sharding_constraint(
                vol, NamedSharding(mesh, spec)
            )
            vol = shard_map(
                lambda block, tf_: jax.lax.map(
                    lambda v: fft_fn(v, tf_), block
                ),
                mesh=mesh,
                in_specs=(spec, P()),
                out_specs=spec,
                check_vma=False,  # pallas_call outputs carry no replication info
            )(vol, tf)
        return vol

    if mesh is None:
        return jax.jit(batched, donate_argnums=(0,) if donate else ())

    in_sharding = NamedSharding(mesh, P("batch", None, None, "space"))
    # The transfer function is replicated for the per-whole-volume FFT
    # stages — EXCEPT on the shard_volumes path with a phase stage,
    # where a replicated full-volume TF would cost ~2x volume bytes on
    # every device (the path exists because a volume exceeds one HBM):
    # there it arrives X-sharded, matching _fft_stages_sharded's
    # P(None, None, None, 'space') in_spec.
    tf_sharding = (
        NamedSharding(mesh, P(None, None, None, "space"))
        if settings.shard_volumes and settings.phase is not None
        else NamedSharding(mesh, P())
    )
    jitted = jax.jit(
        batched,
        in_shardings=(in_sharding, tf_sharding),
        donate_argnums=(0,) if donate else (),
    )

    def checked(raw, tf):
        # shard_map/pjit require even shards; raise actionable errors
        # before their opaque ones.
        n_batch_ax, n_space_ax = mesh.devices.shape
        if raw.shape[0] % n_batch_ax:
            raise ValueError(
                f"batch size {raw.shape[0]} must be divisible by the mesh "
                f"batch axis ({n_batch_ax}); pad the work list or pick a mesh "
                "with --devices/--batch so volumes shard evenly"
            )
        if raw.shape[3] % n_space_ax:
            raise ValueError(
                f"X extent {raw.shape[3]} must be divisible by the mesh space "
                f"axis ({n_space_ax}); use a space factor that divides "
                "X (or space=1)"
            )
        return jitted(raw, tf)

    return checked


def reconstruct_batch(
    batch_raw,
    settings: ReconstructSettings,
    *,
    psf=None,
    mesh: Mesh | None = None,
) -> jax.Array:
    """One-shot convenience: build, (cached) compile, and run the step.

    Computes the phase transfer function host-side when the phase stage
    is enabled (cached per shape+settings, reference
    ``preprocessing.py:188-218`` split).
    """
    batch_raw = jnp.asarray(batch_raw)
    dummy = jnp.zeros((2, 1, 1, 1), jnp.float32)

    tf_arr = dummy
    if settings.phase is not None:
        from shrimpy_tpu.ops.phase import tf_as_real

        vol_shape = _stage_input_shape_for_phase(tuple(batch_raw.shape[1:]), settings)
        tfs = settings.phase.transfer_function
        tf_arr = jnp.asarray(
            tf_as_real(
                # compute_transfer_function pads by z_padding itself;
                # passing a pre-padded shape double-padded the TF and
                # broke every z_padding > 0 phase reconstruction.
                compute_transfer_function(vol_shape, tfs)
            )
        )

    step = build_reconstruct_step(settings, psf=psf, mesh=mesh, donate=False)
    return step(batch_raw, tf_arr)


def _stage_input_shape_for_phase(
    raw_shape: tuple[int, int, int], settings: ReconstructSettings
) -> tuple[int, int, int]:
    """Shape of the volume entering the phase stage (post-deskew if any)."""
    if settings.deskew is not None:
        shape, _ = get_deskewed_shape(raw_shape, settings.deskew)
        return shape
    return raw_shape


def output_shape(
    raw_shape: tuple[int, int, int], settings: ReconstructSettings
) -> tuple[int, int, int]:
    """Static output ZYX shape of the reconstruction for ``raw_shape``."""
    return _stage_input_shape_for_phase(raw_shape, settings)
