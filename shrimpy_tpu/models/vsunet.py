"""Virtual staining UNet (the cytoland ``VSUNet`` role, TPU-native).

The reference delegates virtual staining to the external cytoland/VisCy
``VSUNet`` (torch Lightning, reference
``shrimpy/dynatrack/preprocessing.py:319-416``: jsonargparse-validated
model config, checkpoint load, sliding-window inference over z). This
is the first-party flax equivalent:

* named, config-validated architectures (the reference validates its
  ``model`` block against cytoland's ``VSUNet`` signature via
  jsonargparse so bad keys error early, ``preprocessing.py:393-416``;
  here each architecture name carries a strict pydantic sub-schema):

  - ``unet25d`` — encoder/decoder 2.5-D UNet (a z-window of phase
    slices in, one fluorescence plane out per target channel), built
    MXU-first: channels-last NHWC convs in bfloat16 compute / float32
    params, channel widths multiples of 64;
  - ``unext2`` — ConvNeXt-style variant mirroring the cytoland
    UNeXt2/fcmae parameter surface (``encoder_blocks``, ``dims``,
    ``decoder_conv_blocks`` — reference ``dynatrack_demo.yaml``
    virtual_staining.model.init_args.model_config): patchify stem,
    depthwise-7x7 + pointwise-MLP residual blocks, stage downsamples;

* sliding-window inference over z expressed as one ``lax.scan`` under
  jit (the reference slides a torch window per step,
  ``preprocessing.py:343-352``);
* orbax checkpoints carry a ``vs_model.json`` sidecar with the full
  architecture schema, so ``ckpt_path`` alone reconstructs the right
  net and a mismatched explicit config errors early instead of loading
  garbage weights (the reference routes ckpt_path into the model init
  for the same reason, ``preprocessing.py:400-416``). Without a
  checkpoint the net runs deterministically seeded — numerically
  meaningless for biology but shape/pipeline-exact, which is what the
  demo/replay and test tiers need (the reference's tests inject fakes
  at the same seam, ``manager.py:62-68``).
"""

from __future__ import annotations

import json
import logging
from functools import partial
from pathlib import Path
from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict, model_validator

from shrimpy_tpu.config.vs_sidecar import (  # noqa: F401 (re-export)
    CKPT_SIDECAR,
    DEFAULT_OUT_CHANNELS,
    read_vs_sidecar,
)

logger = logging.getLogger(__name__)


class UNet25DConfig(BaseModel):
    """Architecture knobs for the ``unet25d`` variant."""

    model_config = ConfigDict(extra="forbid")

    base_width: int = 64
    depth: int = 3


class UNeXt2Config(BaseModel):
    """Architecture knobs for the ``unext2`` variant (cytoland's
    UNeXt2 surface, reference ``dynatrack_demo.yaml``
    ``model_config`` block)."""

    model_config = ConfigDict(extra="forbid")

    encoder_blocks: list[int] = [2, 2, 4]
    dims: list[int] = [48, 96, 192]
    decoder_conv_blocks: int = 1

    @model_validator(mode="after")
    def _check(self):
        if len(self.encoder_blocks) != len(self.dims):
            raise ValueError(
                f"encoder_blocks ({len(self.encoder_blocks)}) and dims "
                f"({len(self.dims)}) must have the same number of stages"
            )
        if len(self.dims) < 2:
            raise ValueError("unext2 needs at least 2 stages")
        return self


_ARCH_CONFIGS = {"unet25d": UNet25DConfig, "unext2": UNeXt2Config}


class VSModelSettings(BaseModel):
    """Model config (the ``virtual_staining`` block of DynaTrackConfig)."""

    model_config = ConfigDict(extra="forbid")

    architecture: Literal["unet25d", "unext2"] = "unet25d"
    # Architecture-specific knobs, validated against the named
    # variant's schema (unknown keys error early).
    arch_config: dict | None = None
    in_slices: int = 5  # z-window (2.5-D input depth)
    out_channels: list[str] = DEFAULT_OUT_CHANNELS
    # unet25d shorthand knobs (kept at the top level for config
    # compatibility; merged into arch_config).
    base_width: int = 64
    depth: int = 3
    ckpt_path: str | None = None
    seed: int = 0
    batch_slices: int = 8  # z-planes inferred per device step

    def resolved_arch_config(self) -> BaseModel:
        """Validate ``arch_config`` against the architecture's schema."""
        schema = _ARCH_CONFIGS[self.architecture]
        cfg = dict(self.arch_config or {})
        if self.architecture == "unet25d":
            cfg.setdefault("base_width", self.base_width)
            cfg.setdefault("depth", self.depth)
        return schema(**cfg)


class _ConvBlock(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.width, (3, 3), dtype=jnp.bfloat16)(x)
        x = nn.gelu(x)
        x = nn.Conv(self.width, (3, 3), dtype=jnp.bfloat16)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        return nn.gelu(x)


class VSUNet(nn.Module):
    """2.5-D UNet: (B, H, W, in_slices) -> (B, H, W, n_out)."""

    n_out: int
    base_width: int = 64
    depth: int = 3

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        skips = []
        width = self.base_width
        for _ in range(self.depth):
            x = _ConvBlock(width)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            width *= 2
        x = _ConvBlock(width)(x)
        for skip in reversed(skips):
            width //= 2
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = _ConvBlock(width)(x)
        return nn.Conv(self.n_out, (1, 1), dtype=jnp.float32)(
            x.astype(jnp.float32)
        )


class _NeXtBlock(nn.Module):
    """ConvNeXt residual block: depthwise 7x7 + pointwise 4x MLP.

    Depthwise convs keep the HBM traffic low; the 4x pointwise pair is
    two dense matmuls that tile straight onto the MXU.
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (7, 7), feature_group_count=self.dim, dtype=jnp.bfloat16
        )(x)
        y = nn.LayerNorm(dtype=jnp.float32)(y.astype(jnp.float32))
        y = nn.Dense(4 * self.dim, dtype=jnp.bfloat16)(y.astype(jnp.bfloat16))
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=jnp.bfloat16)(y)
        return x + y.astype(x.dtype)


class VSUNeXt2(nn.Module):
    """ConvNeXt-style 2.5-D UNet: (B, H, W, in_slices) -> (B, H, W, n_out).

    Mirrors cytoland's UNeXt2 structure (patchify stem, staged NeXt
    blocks, upsample decoder with skip concats) at the parameter surface
    of the reference's ``model_config`` block (``dynatrack_demo.yaml``).
    """

    n_out: int
    encoder_blocks: tuple[int, ...]
    dims: tuple[int, ...]
    decoder_conv_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.bfloat16)
        # Patchify stem: 2x2 non-overlapping (stem_kernel_size analog).
        x = nn.Conv(self.dims[0], (2, 2), strides=(2, 2), dtype=jnp.bfloat16)(x)
        skips = []
        for i, (n_blocks, dim) in enumerate(zip(self.encoder_blocks, self.dims)):
            if i > 0:
                x = nn.LayerNorm(dtype=jnp.float32)(
                    x.astype(jnp.float32)
                ).astype(jnp.bfloat16)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=jnp.bfloat16)(x)
            for _ in range(n_blocks):
                x = _NeXtBlock(dim)(x)
            skips.append(x)
        x = skips.pop()
        for skip in reversed(skips):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            for _ in range(self.decoder_conv_blocks):
                x = _ConvBlock(skip.shape[-1])(x)
        # Head: undo the stem's 2x patchify, then project.
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        x = _ConvBlock(self.dims[0])(x)
        return nn.Conv(self.n_out, (1, 1), dtype=jnp.float32)(
            x.astype(jnp.float32)
        )


def build_model(settings: VSModelSettings) -> tuple[nn.Module, int]:
    """(flax module, pad_exp): YX must be divisible by 2**pad_exp."""
    arch = settings.resolved_arch_config()
    n_out = len(settings.out_channels)
    if settings.architecture == "unet25d":
        return (
            VSUNet(n_out=n_out, base_width=arch.base_width, depth=arch.depth),
            arch.depth,
        )
    return (
        VSUNeXt2(
            n_out=n_out,
            encoder_blocks=tuple(arch.encoder_blocks),
            dims=tuple(arch.dims),
            decoder_conv_blocks=arch.decoder_conv_blocks,
        ),
        len(arch.dims),  # stem 2x + (stages-1) downsamples
    )


@partial(jax.jit, static_argnames=("apply_fn", "in_slices", "batch"))
def _infer_volume_jit(params, vol_zyx, *, apply_fn, in_slices: int, batch: int):
    """Sliding z-window inference over a ZYX volume as one lax.scan.

    Output plane z uses the centered window [z - k//2, z + k//2]
    (edge-clamped), n_out channels per plane -> (n_out, Z, Y, X).
    """
    vol = vol_zyx.astype(jnp.float32)
    nz, ny, nx = vol.shape
    mean = jnp.mean(vol)
    std = jnp.std(vol) + 1e-6
    vol = (vol - mean) / std
    half = in_slices // 2
    padded = jnp.pad(vol, ((half, half), (0, 0), (0, 0)), mode="edge")

    n_steps = -(-nz // batch)
    pad_z = n_steps * batch - nz
    starts = jnp.arange(n_steps * batch).clip(0, nz - 1)

    def window(z0):
        return jax.lax.dynamic_slice(
            padded, (z0, 0, 0), (in_slices, ny, nx)
        ).transpose(1, 2, 0)

    def step(_, zs):
        x = jax.vmap(window)(zs)  # (batch, H, W, in_slices)
        y = apply_fn(params, x)  # (batch, H, W, n_out)
        return None, y

    _, out = jax.lax.scan(step, None, starts.reshape(n_steps, batch))
    out = out.reshape(n_steps * batch, ny, nx, -1)[:nz]
    return out.transpose(3, 0, 1, 2)  # (n_out, Z, Y, X)


class VirtualStainer:
    """Loaded (or seeded) VS model applying sliding-window inference."""

    def __init__(self, settings: VSModelSettings):
        if settings.ckpt_path:
            settings = self._reconcile_with_sidecar(settings)
        self.settings = settings
        self.model, self.pad_exp = build_model(settings)
        sample = jnp.zeros((1, 64, 64, settings.in_slices), jnp.float32)
        if settings.ckpt_path:
            self.params = self._load_ckpt(Path(settings.ckpt_path))
            logger.info("virtual staining weights from %s", settings.ckpt_path)
        else:
            self.params = self.model.init(
                jax.random.key(settings.seed), sample
            )
            logger.warning(
                "virtual staining running with seeded (untrained) weights; "
                "set ckpt_path for real predictions"
            )

    @classmethod
    def from_ckpt(cls, ckpt_path: str | Path) -> "VirtualStainer":
        """Build entirely from a checkpoint's vs_model.json sidecar."""
        return cls(VSModelSettings(ckpt_path=str(ckpt_path)))

    # -- checkpointing -------------------------------------------------------
    @staticmethod
    def _reconcile_with_sidecar(settings: VSModelSettings) -> VSModelSettings:
        """Adopt the checkpoint's architecture schema; reject conflicts.

        Fields the user explicitly set must match the sidecar — loading
        weights into a differently-shaped net would either crash deep in
        orbax or silently mis-predict. Unset fields take the sidecar's
        values, so ``ckpt_path`` alone reconstructs the trained net.
        """
        sidecar_path = Path(settings.ckpt_path) / CKPT_SIDECAR
        sidecar = read_vs_sidecar(settings.ckpt_path)
        if sidecar is None:
            return settings  # pre-schema checkpoint: trust the config
        merged = settings.model_dump()
        for field in (
            "architecture", "arch_config", "in_slices", "out_channels",
            "base_width", "depth",
        ):
            if field not in sidecar:
                continue
            if field in settings.model_fields_set:
                user_val = merged[field]
                if field == "arch_config" and user_val is not None:
                    # The sidecar stores the RESOLVED config (defaults
                    # filled in); resolve the user's partial dict the
                    # same way so a consistent-but-partial arch_config
                    # is not a false conflict.
                    arch = sidecar.get("architecture", settings.architecture)
                    try:
                        user_val = _ARCH_CONFIGS[arch](**user_val).model_dump()
                    except Exception:
                        pass  # let the mismatch error below explain it
                if user_val != sidecar[field]:
                    raise ValueError(
                        f"virtual_staining.{field}={merged[field]!r} "
                        f"conflicts with the checkpoint's "
                        f"{field}={sidecar[field]!r} ({sidecar_path}); drop "
                        "the explicit setting or point ckpt_path at a "
                        "matching checkpoint"
                    )
            merged[field] = sidecar[field]
        # unet25d shorthand knobs live inside the sidecar's arch_config.
        side_arch = sidecar.get("arch_config") or {}
        for field in ("base_width", "depth"):
            if (
                field in settings.model_fields_set
                and field in side_arch
                and getattr(settings, field) != side_arch[field]
            ):
                raise ValueError(
                    f"virtual_staining.{field}={getattr(settings, field)!r} "
                    f"conflicts with the checkpoint's arch_config "
                    f"{field}={side_arch[field]!r} ({sidecar_path})"
                )
        return VSModelSettings(**merged)

    def _load_ckpt(self, path: Path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            sample = jnp.zeros((1, 64, 64, self.settings.in_slices), jnp.float32)
            target = jax.eval_shape(
                lambda: self.model.init(jax.random.key(0), sample)
            )
            return ckptr.restore(path.resolve(), target)

    def save_ckpt(self, path: str | Path) -> None:
        """Write the orbax checkpoint + the vs_model.json schema sidecar."""
        import orbax.checkpoint as ocp

        path = Path(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path.resolve(), self.params)
        arch = self.settings.resolved_arch_config()
        (path / CKPT_SIDECAR).write_text(json.dumps({
            "format_version": 1,
            "architecture": self.settings.architecture,
            "arch_config": arch.model_dump(),
            "in_slices": self.settings.in_slices,
            "out_channels": list(self.settings.out_channels),
        }, indent=2))

    # -- inference -----------------------------------------------------------
    def predict(self, vol_zyx) -> dict[str, jnp.ndarray]:
        """ZYX phase volume -> per-target-channel ZYX predictions."""
        vol = jnp.asarray(vol_zyx)
        ny, nx = vol.shape[1:]
        m = 2**self.pad_exp
        assert ny % m == 0 and nx % m == 0, (
            f"YX extent {(ny, nx)} must be divisible by {m} "
            "(pad or crop upstream)"
        )
        out = _infer_volume_jit(
            self.params,
            vol,
            apply_fn=self.model.apply,
            in_slices=self.settings.in_slices,
            batch=min(self.settings.batch_slices, vol.shape[0]),
        )
        return {
            name: out[i] for i, name in enumerate(self.settings.out_channels)
        }
