"""Torch (cytoland) VSUNet checkpoint import -> flax params.

The reference loads trained cytoland ``VSUNet`` Lightning checkpoints
directly into torch (reference
``shrimpy/dynatrack/preprocessing.py:359-416``). This module converts a
cytoland-style UNeXt2 state dict to the parameter tree of
:class:`shrimpy_tpu.models.vsunet.VSUNeXt2` so mantis-trained weights
run on the TPU inference path:

* layout transforms: Conv2d ``(O, I, kh, kw)`` -> ``(kh, kw, I, O)``,
  Conv3d ``(O, I, kd, kh, kw)`` -> ``(kd, kh, kw, I, O)``, depthwise
  Conv2d ``(C, 1, kh, kw)`` -> ``(kh, kw, 1, C)``, Linear ``(O, I)`` ->
  ``(I, O)``, LayerNorm ``weight/bias`` -> ``scale/bias``, GRN
  ``(1, 1, 1, C)`` -> ``(C,)``;
* Lightning ``state_dict`` unwrap + ``model.`` prefix strip;
* every target parameter must be matched and shape-checked — missing,
  unexpected, or mis-shaped keys error loudly with the full lists
  (loading garbage into a correctly-shaped net is the failure mode the
  sidecar reconciliation guards against for orbax checkpoints).

The expected torch naming follows cytoland's module structure
(``stem.conv``, ``encoder.stages.{i}.blocks.{j}.{dwconv,norm,pwconv1,
grn,pwconv2}``, ``encoder.stages.{i}.downsample.{0,1}``,
``decoder.stages.{i}.{upsample,proj,blocks.j}``, ``head.{upsample,
proj}``); the golden test in ``tests/test_torch_import.py`` pins the
layout against a torch twin oracle.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Load a torch ``.ckpt``/``.pt`` file into numpy arrays.

    Lightning checkpoints nest the weights under ``state_dict`` with a
    ``model.`` prefix (the reference routes ``ckpt_path`` into
    cytoland's own loader for the same layout,
    ``preprocessing.py:400-416``); both are unwrapped here.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out: dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if k.startswith("model."):
            k = k[len("model."):]
        # .float() first: .numpy() raises on bfloat16 tensors (full-bf16
        # trained checkpoints are common for cytoland-scale nets).
        out[k] = np.asarray(
            v.detach().cpu().float().numpy(), dtype=np.float32
        )
    return out


def _t_conv2d(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv3d(w):  # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t_linear(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


def _block_entries(torch_prefix: str, flax_name: str):
    """(torch key, flax path, transform) triples for one NeXt-V2 block."""
    p, f = torch_prefix, flax_name
    return [
        (f"{p}.dwconv.weight", (f, "dwconv", "kernel"), _t_conv2d),
        (f"{p}.dwconv.bias", (f, "dwconv", "bias"), None),
        (f"{p}.norm.weight", (f, "norm", "scale"), None),
        (f"{p}.norm.bias", (f, "norm", "bias"), None),
        (f"{p}.pwconv1.weight", (f, "pwconv1", "kernel"), _t_linear),
        (f"{p}.pwconv1.bias", (f, "pwconv1", "bias"), None),
        (f"{p}.grn.gamma", (f, "grn", "gamma"), np.ravel),
        (f"{p}.grn.beta", (f, "grn", "beta"), np.ravel),
        (f"{p}.pwconv2.weight", (f, "pwconv2", "kernel"), _t_linear),
        (f"{p}.pwconv2.bias", (f, "pwconv2", "bias"), None),
    ]


def _mapping_for(settings) -> list[tuple[str, tuple, object]]:
    """The full (torch key, flax path, transform) table for ``settings``."""
    arch = settings.resolved_arch_config()
    entries: list[tuple[str, tuple, object]] = [
        ("stem.conv.weight", ("stem", "kernel"), _t_conv3d),
        ("stem.conv.bias", ("stem", "bias"), None),
    ]
    n_stages = len(arch.dims)
    for i, n_blocks in enumerate(arch.encoder_blocks):
        if i > 0:
            entries += [
                (
                    f"encoder.stages.{i}.downsample.0.weight",
                    (f"downsample_norm_{i}", "scale"),
                    None,
                ),
                (
                    f"encoder.stages.{i}.downsample.0.bias",
                    (f"downsample_norm_{i}", "bias"),
                    None,
                ),
                (
                    f"encoder.stages.{i}.downsample.1.weight",
                    (f"downsample_conv_{i}", "kernel"),
                    _t_conv2d,
                ),
                (
                    f"encoder.stages.{i}.downsample.1.bias",
                    (f"downsample_conv_{i}", "bias"),
                    None,
                ),
            ]
        for j in range(n_blocks):
            entries += _block_entries(
                f"encoder.stages.{i}.blocks.{j}", f"stage_{i}_block_{j}"
            )
    for i in range(n_stages - 1):
        p = f"decoder.stages.{i}"
        f = f"up_{i}"
        entries += [
            (f"{p}.upsample.weight", (f, "upsample", "kernel"), _t_conv2d),
            (f"{p}.upsample.bias", (f, "upsample", "bias"), None),
            (f"{p}.proj.weight", (f, "proj", "kernel"), _t_conv2d),
            (f"{p}.proj.bias", (f, "proj", "bias"), None),
        ]
        for j in range(arch.decoder_conv_blocks):
            entries += [
                (tk, (f, *fp), tr)
                for tk, fp, tr in _block_entries(
                    f"{p}.blocks.{j}", f"blocks_{j}"
                )
            ]
    entries += [
        ("head.upsample.weight", ("head_upsample", "kernel"), _t_conv2d),
        ("head.upsample.bias", ("head_upsample", "bias"), None),
        ("head.proj.weight", ("head_proj", "kernel"), _t_conv2d),
        ("head.proj.bias", ("head_proj", "bias"), None),
    ]
    return entries


def convert_unext2_state_dict(state_dict: dict, settings):
    """cytoland-style UNeXt2 torch state dict -> flax param tree.

    ``settings`` is a :class:`shrimpy_tpu.models.vsunet.VSModelSettings`
    with ``architecture='unext2'``. Returns ``{'params': {...}}``
    matching ``VSUNeXt2.init``. Raises ``ValueError`` listing missing /
    unexpected / mis-shaped keys.
    """
    from shrimpy_tpu.models.vsunet import build_model

    if settings.architecture != "unext2":
        raise ValueError(
            "torch import supports architecture='unext2' (cytoland "
            f"UNeXt2/fcmae), got {settings.architecture!r}"
        )
    model, _ = build_model(settings)
    sample = jnp.zeros((1, 64, 64, settings.in_slices), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.key(0), sample)
    )["params"]

    entries = _mapping_for(settings)
    missing = [tk for tk, _, _ in entries if tk not in state_dict]
    mapped_keys = {tk for tk, _, _ in entries}
    unexpected = sorted(set(state_dict) - mapped_keys)
    if missing or unexpected:
        raise ValueError(
            "torch state dict does not match the unext2 architecture: "
            f"missing keys {missing[:8]}{'...' if len(missing) > 8 else ''}; "
            f"unexpected keys {unexpected[:8]}"
            f"{'...' if len(unexpected) > 8 else ''} "
            f"({len(missing)} missing / {len(unexpected)} unexpected of "
            f"{len(entries)} expected)"
        )

    params: dict = {}
    for tk, fpath, transform in entries:
        w = np.asarray(state_dict[tk], dtype=np.float32)
        if transform is not None:
            w = transform(w)
        node = template
        for part in fpath:
            node = node[part]
        if tuple(node.shape) != tuple(w.shape):
            raise ValueError(
                f"shape mismatch for {tk} -> {'/'.join(fpath)}: torch "
                f"{tuple(w.shape)} (after layout transform) vs flax "
                f"{tuple(node.shape)}"
            )
        cur = params
        for part in fpath[:-1]:
            cur = cur.setdefault(part, {})
        cur[fpath[-1]] = jnp.asarray(w, dtype=node.dtype)
    logger.info(
        "converted %d torch tensors to flax unext2 params", len(entries)
    )
    return {"params": params}


def import_torch_vsunet(path: str | Path, settings):
    """Load + convert a cytoland UNeXt2 checkpoint file."""
    return convert_unext2_state_dict(load_torch_state_dict(path), settings)
