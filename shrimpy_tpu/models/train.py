"""Virtual-staining UNet training (paired phase -> fluorescence).

The reference only LOADS cytoland checkpoints (reference
``preprocessing.py:359-416``); training lives in the external VisCy
project. This module closes the loop first-party: fit the
:class:`~shrimpy_tpu.models.vsunet.VSUNet` on paired channels of an
OME-Zarr store (random z-window crops, optax AdamW, MSE), save orbax
checkpoints consumable by ``VSModelSettings.ckpt_path``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shrimpy_tpu.models.vsunet import VirtualStainer, VSModelSettings

logger = logging.getLogger(__name__)


@dataclass
class TrainReport:
    steps: int
    final_loss: float
    losses: list


def _sample_batch(
    rng: np.random.Generator,
    vols_in: list[np.ndarray],
    vols_out: list[np.ndarray],
    *,
    in_slices: int,
    patch: int,
    batch: int,
):
    """Random (z-window, y, x) crops -> (x NHWC, y NHWC) arrays."""
    xs, ys = [], []
    half = in_slices // 2
    for _ in range(batch):
        i = rng.integers(len(vols_in))
        vin, vout = vols_in[i], vols_out[i]
        nz, ny, nx = vin.shape[1:]
        z = int(rng.integers(half, max(nz - half, half + 1)))
        y0 = int(rng.integers(0, max(ny - patch + 1, 1)))
        x0 = int(rng.integers(0, max(nx - patch + 1, 1)))
        window = vin[0, z - half : z + half + 1, y0 : y0 + patch, x0 : x0 + patch]
        target = vout[:, z, y0 : y0 + patch, x0 : x0 + patch]
        xs.append(np.moveaxis(window, 0, -1))  # (H, W, in_slices)
        ys.append(np.moveaxis(target, 0, -1))  # (H, W, n_out)
    return np.stack(xs), np.stack(ys)


def train_vsunet(
    store_path: str | Path,
    *,
    input_channel: str,
    target_channels: list[str],
    settings: VSModelSettings | None = None,
    steps: int = 200,
    batch: int = 4,
    patch: int = 64,
    learning_rate: float = 1e-3,
    seed: int = 0,
    ckpt_path: str | Path | None = None,
) -> tuple[VirtualStainer, TrainReport]:
    """Fit VS weights on paired channels of ``store_path``.

    Inputs/targets are z-score normalized per volume (matching the
    inference-time normalization). Returns the trained stainer and a
    loss report; saves an orbax checkpoint when ``ckpt_path`` is given.
    """
    from shrimpy_tpu.io.ngff import open_ngff

    settings = settings or VSModelSettings(out_channels=target_channels)
    assert list(settings.out_channels) == list(target_channels)
    store = open_ngff(store_path)

    vols_in, vols_out = [], []
    for pos in store.positions().values():
        names = pos.channel_names
        ci = names.index(input_channel)
        cts = [names.index(c) for c in target_channels]
        for t in range(pos.shape[0]):
            vin = pos.volume(t, ci).astype(np.float32)[None]
            vin = (vin - vin.mean()) / (vin.std() + 1e-6)
            outs = []
            for ct in cts:
                v = pos.volume(t, ct).astype(np.float32)
                outs.append((v - v.mean()) / (v.std() + 1e-6))
            vols_in.append(vin)
            vols_out.append(np.stack(outs))
    if not vols_in:
        raise ValueError("no training volumes found")

    stainer = VirtualStainer(settings)
    model = stainer.model
    params = stainer.params
    opt = optax.adamw(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply(p, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        x, y = _sample_batch(
            rng, vols_in, vols_out,
            in_slices=settings.in_slices, patch=patch, batch=batch,
        )
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
        losses.append(float(loss))
        if i % max(steps // 5, 1) == 0:
            logger.info("vs train step %d/%d loss=%.5f", i, steps, losses[-1])

    stainer.params = params
    if ckpt_path is not None:
        stainer.save_ckpt(ckpt_path)
        logger.info("saved VS checkpoint to %s", ckpt_path)
    return stainer, TrainReport(steps, losses[-1], losses)
