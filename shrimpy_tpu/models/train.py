"""Virtual-staining UNet training (paired phase -> fluorescence).

The reference only LOADS cytoland checkpoints (reference
``preprocessing.py:359-416``); training lives in the external VisCy
project. This module closes the loop first-party: fit a named
:mod:`~shrimpy_tpu.models.vsunet` architecture on paired channels of an
OME-Zarr store (random z-window crops with flip augmentation, optax
AdamW, MSE), with a held-out validation split and early stopping on the
validation loss, and save orbax checkpoints (+ architecture sidecar)
consumable by ``VSModelSettings.ckpt_path``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
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
    val_losses: list = field(default_factory=list)
    best_val_loss: float | None = None
    stopped_early: bool = False


def _sample_batch(
    rng: np.random.Generator,
    vols_in: list[np.ndarray],
    vols_out: list[np.ndarray],
    *,
    in_slices: int,
    patch: int,
    batch: int,
    augment: bool = False,
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
        x = np.moveaxis(window, 0, -1)  # (H, W, in_slices)
        y = np.moveaxis(target, 0, -1)  # (H, W, n_out)
        if augment:
            # In-plane flips are exact symmetries of the staining task.
            if rng.integers(2):
                x, y = x[::-1], y[::-1]
            if rng.integers(2):
                x, y = x[:, ::-1], y[:, ::-1]
        xs.append(x)
        ys.append(y)
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
    val_fraction: float = 0.2,
    val_every: int = 25,
    early_stop_patience: int = 4,
    augment: bool = True,
) -> tuple[VirtualStainer, TrainReport]:
    """Fit VS weights on paired channels of ``store_path``.

    Inputs/targets are z-score normalized per volume (matching the
    inference-time normalization). ``val_fraction`` of the volumes is
    held out (when only one volume exists, a y-split of that volume);
    validation MSE is evaluated every ``val_every`` steps on fixed
    crops, and training stops after ``early_stop_patience`` evaluations
    without improvement. The returned stainer carries the
    best-validation parameters; ``ckpt_path`` saves them with the
    architecture sidecar.
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
    if not 0.0 <= val_fraction < 1.0:
        raise ValueError(f"val_fraction={val_fraction} must be in [0, 1)")

    # Validation split: whole volumes when we can afford it, else a
    # y-halved split of the single volume.
    rng = np.random.default_rng(seed)
    n_val = min(
        int(round(len(vols_in) * val_fraction)), len(vols_in) - 1
    )
    if n_val >= 1 and len(vols_in) > 1:
        order = rng.permutation(len(vols_in))
        val_idx = set(order[:n_val].tolist())
        train_in = [v for i, v in enumerate(vols_in) if i not in val_idx]
        train_out = [v for i, v in enumerate(vols_out) if i not in val_idx]
        val_in = [v for i, v in enumerate(vols_in) if i in val_idx]
        val_out = [v for i, v in enumerate(vols_out) if i in val_idx]
    elif val_fraction > 0:
        ny = vols_in[0].shape[2]
        split = max(patch, int(ny * (1 - val_fraction)))
        split = min(split, ny - 1)
        train_in = [v[:, :, :split] for v in vols_in]
        train_out = [v[:, :, :split] for v in vols_out]
        val_in = [v[:, :, split:] for v in vols_in]
        val_out = [v[:, :, split:] for v in vols_out]
        if val_in[0].shape[2] < patch:  # too small to crop: no val tier
            train_in, train_out = vols_in, vols_out
            val_in, val_out = [], []
    else:
        train_in, train_out = vols_in, vols_out
        val_in, val_out = [], []

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

    @jax.jit
    def eval_fn(params, x, y):
        return jnp.mean((model.apply(params, x) - y) ** 2)

    # Fixed validation crops so the early-stop signal is comparable
    # across evaluations.
    val_xy = None
    if val_in:
        vrng = np.random.default_rng(seed + 1)
        vx, vy = _sample_batch(
            vrng, val_in, val_out,
            in_slices=settings.in_slices, patch=patch,
            batch=max(batch * 4, 8), augment=False,
        )
        val_xy = (jnp.asarray(vx), jnp.asarray(vy))

    losses: list[float] = []
    val_losses: list[float] = []
    best_val = np.inf
    best_params = params
    stale = 0
    stopped_early = False
    for i in range(steps):
        x, y = _sample_batch(
            rng, train_in, train_out,
            in_slices=settings.in_slices, patch=patch, batch=batch,
            augment=augment,
        )
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
        losses.append(float(loss))
        if i % max(steps // 5, 1) == 0:
            logger.info("vs train step %d/%d loss=%.5f", i, steps, losses[-1])
        if val_xy is not None and (i + 1) % val_every == 0:
            v = float(eval_fn(params, *val_xy))
            val_losses.append(v)
            if v < best_val - 1e-7:
                best_val = v
                best_params = params
                stale = 0
            else:
                stale += 1
                if stale >= early_stop_patience:
                    logger.info(
                        "early stop at step %d: val loss %.5f has not "
                        "improved for %d evaluations (best %.5f)",
                        i + 1, v, stale, best_val,
                    )
                    stopped_early = True
                    break

    # best_params only exists once a validation eval has actually run;
    # with steps < val_every the trained params must win (an untrained
    # init would otherwise be saved silently).
    stainer.params = best_params if val_losses else params
    if ckpt_path is not None:
        stainer.save_ckpt(ckpt_path)
        logger.info("saved VS checkpoint to %s", ckpt_path)
    return stainer, TrainReport(
        steps=len(losses),
        final_loss=losses[-1],
        losses=losses,
        val_losses=val_losses,
        best_val_loss=None if np.isinf(best_val) else best_val,
        stopped_early=stopped_early,
    )
