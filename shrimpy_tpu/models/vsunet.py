"""Virtual staining UNet (the cytoland ``VSUNet`` role, TPU-native).

The reference delegates virtual staining to the external cytoland/VisCy
``VSUNet`` (torch Lightning, reference
``shrimpy/dynatrack/preprocessing.py:319-416``: jsonargparse-validated
model config, checkpoint load, sliding-window inference over z). This
is the first-party flax equivalent:

* a 2.5-D UNet (a z-window of phase slices in, one fluorescence plane
  out per target channel) built MXU-first: channels-last NHWC convs in
  bfloat16 compute / float32 params, channel widths multiples of 64;
* sliding-window inference over z expressed as one ``lax.scan`` under
  jit (the reference slides a torch window per step,
  ``preprocessing.py:343-352``);
* orbax checkpoint load/save for trained weights; without a checkpoint
  the net runs deterministically seeded — numerically meaningless for
  biology but shape/pipeline-exact, which is what the demo/replay and
  test tiers need (the reference's tests inject fakes at the same seam,
  ``manager.py:62-68``).
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

logger = logging.getLogger(__name__)


class VSModelSettings(BaseModel):
    """Model config (the ``virtual_staining`` block of DynaTrackConfig)."""

    model_config = ConfigDict(extra="forbid")

    in_slices: int = 5  # z-window (2.5-D input depth)
    out_channels: list[str] = ["vs_nuclei", "vs_membrane"]
    base_width: int = 64
    depth: int = 3
    ckpt_path: str | None = None
    seed: int = 0
    batch_slices: int = 8  # z-planes inferred per device step


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
        self.settings = settings
        self.model = VSUNet(
            n_out=len(settings.out_channels),
            base_width=settings.base_width,
            depth=settings.depth,
        )
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

    # -- checkpointing -------------------------------------------------------
    def _load_ckpt(self, path: Path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            sample = jnp.zeros((1, 64, 64, self.settings.in_slices), jnp.float32)
            target = jax.eval_shape(
                lambda: self.model.init(jax.random.key(0), sample)
            )
            return ckptr.restore(path.resolve(), target)

    def save_ckpt(self, path: str | Path) -> None:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(Path(path).resolve(), self.params)

    # -- inference -----------------------------------------------------------
    def predict(self, vol_zyx) -> dict[str, jnp.ndarray]:
        """ZYX phase volume -> per-target-channel ZYX predictions."""
        vol = jnp.asarray(vol_zyx)
        ny, nx = vol.shape[1:]
        assert ny % (2**self.settings.depth) == 0 and nx % (
            2**self.settings.depth
        ) == 0, (
            f"YX extent {(ny, nx)} must be divisible by "
            f"2^depth={2**self.settings.depth} (pad or crop upstream)"
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
