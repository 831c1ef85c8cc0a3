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


class _VolumeBank:
    """Lazily-read, per-volume-normalized training volumes.

    A production store's volumes (positions x timepoints x channels)
    would OOM the host if materialized up front; the bank reads each
    (input, targets) pair from the store on demand and keeps a bounded
    LRU of normalized volumes, so small stores behave like the old
    eager path while big ones stream with eviction.
    """

    def __init__(self, entries: list, budget_bytes: int = 2 << 30):
        from shrimpy_tpu.utils.cache import LruCache

        self.entries = entries  # (pos, t, ci, cts, y_slice)
        self.budget_bytes = budget_bytes
        self._cache = LruCache(maxsize=8)  # resized on first load

    def __len__(self) -> int:
        return len(self.entries)

    def load(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(vin (1, Z, Y, X), vout (C, Z, Y, X)), z-score normalized."""
        pos, t, ci, cts, ysl = self.entries[i]
        key = (id(pos), t, ysl.start, ysl.stop)
        if key in self._cache:
            return self._cache[key]
        vin = pos.volume(t, ci).astype(np.float32)[None][:, :, ysl]
        vin = (vin - vin.mean()) / (vin.std() + 1e-6)
        outs = []
        for ct in cts:
            v = pos.volume(t, ct).astype(np.float32)[:, ysl]
            outs.append((v - v.mean()) / (v.std() + 1e-6))
        pair = (vin, np.stack(outs))
        nbytes = pair[0].nbytes + pair[1].nbytes
        self._cache.maxsize = max(1, int(self.budget_bytes // max(nbytes, 1)))
        self._cache[key] = pair
        return pair


def _sample_batch(
    rng: np.random.Generator,
    bank: _VolumeBank,
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
        i = int(rng.integers(len(bank)))
        vin, vout = bank.load(i)
        nz, ny, nx = vin.shape[1:]
        # Window [z0, z0 + in_slices) with target plane z0 + half —
        # exactly in_slices planes for BOTH parities of in_slices (the
        # old z-half:z+half+1 slice always produced an odd count).
        z0 = int(rng.integers(0, nz - in_slices + 1))
        z = z0 + half
        y0 = int(rng.integers(0, max(ny - patch + 1, 1)))
        x0 = int(rng.integers(0, max(nx - patch + 1, 1)))
        window = vin[0, z0 : z0 + in_slices, y0 : y0 + patch, x0 : x0 + patch]
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
    if (
        settings.architecture == "unext2"
        and settings.resolved_arch_config().out_stack_depth > 1
    ):
        raise ValueError(
            "training targets single center planes; voxel-stack heads "
            "(out_stack_depth > 1) are inference/import-only — train "
            "with out_stack_depth=1 or import a trained cytoland "
            "checkpoint"
        )
    store = open_ngff(store_path)

    # Lazy entries: volumes are read (and normalized) on demand through
    # a bounded cache — a production store's full residency would OOM
    # the host while crops are tiny.
    full = slice(None)
    entries: list = []
    nz_min = None
    ny0 = None
    for pos in store.positions().values():
        names = pos.channel_names
        ci = names.index(input_channel)
        cts = [names.index(c) for c in target_channels]
        nz_min = pos.shape[2] if nz_min is None else min(nz_min, pos.shape[2])
        ny0 = pos.shape[3] if ny0 is None else ny0
        for t in range(pos.shape[0]):
            entries.append((pos, t, ci, cts, full))
    if not entries:
        raise ValueError("no training volumes found")
    if nz_min < settings.in_slices:
        raise ValueError(
            f"volumes have only {nz_min} z planes but in_slices="
            f"{settings.in_slices}; use a thicker store or fewer slices"
        )
    if not 0.0 <= val_fraction < 1.0:
        raise ValueError(f"val_fraction={val_fraction} must be in [0, 1)")

    # Validation split: whole volumes when we can afford it, else a
    # y-halved split of the single volume.
    rng = np.random.default_rng(seed)
    n_val = min(int(round(len(entries) * val_fraction)), len(entries) - 1)
    if n_val >= 1 and len(entries) > 1:
        order = rng.permutation(len(entries))
        val_idx = set(order[:n_val].tolist())
        train_e = [e for i, e in enumerate(entries) if i not in val_idx]
        val_e = [e for i, e in enumerate(entries) if i in val_idx]
    elif val_fraction > 0:
        ny = ny0
        split = max(patch, int(ny * (1 - val_fraction)))
        split = min(split, ny - 1)
        train_e = [
            (pos, t, ci, cts, slice(0, split))
            for pos, t, ci, cts, _ in entries
        ]
        val_e = [
            (pos, t, ci, cts, slice(split, None))
            for pos, t, ci, cts, _ in entries
        ]
        if ny - split < patch:  # too small to crop: no val tier
            train_e, val_e = entries, []
    else:
        train_e, val_e = entries, []
    train_bank = _VolumeBank(train_e)
    val_bank = _VolumeBank(val_e) if val_e else None

    stainer = VirtualStainer(settings)
    m = 2**stainer.pad_exp
    if patch % m:
        raise ValueError(
            f"patch={patch} must be divisible by {m} "
            f"(2**pad_exp of the {settings.architecture} architecture)"
        )
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
    if val_bank is not None:
        vrng = np.random.default_rng(seed + 1)
        vx, vy = _sample_batch(
            vrng, val_bank,
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
            rng, train_bank,
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
