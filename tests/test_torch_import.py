"""Golden test: cytoland-style torch UNeXt2 state dict -> flax params.

A torch twin of :class:`shrimpy_tpu.models.vsunet.VSUNeXt2` (cytoland
module naming: ``stem.conv``, ``encoder.stages.{i}.blocks.{j}``,
``decoder.stages.{i}``, ``head``) generates the oracle: random torch
weights, forward in f64-exactness-free f32, then the converted flax
net must reproduce the output <= 1e-4 (VERDICT round-2 item 7's done
criterion). This pins every layout transform (conv OIHW->HWIO, conv3d,
depthwise, linear transpose, GRN flatten, pixel-shuffle channel order,
GELU variant, LayerNorm eps).
"""

import numpy as np
import pytest

# Heavyweight module (big compiles / end-to-end): excluded from the
# quick review-loop tier (docs/testing.md).
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from shrimpy_tpu.models.torch_import import (  # noqa: E402
    convert_unext2_state_dict,
    load_torch_state_dict,
)
from shrimpy_tpu.models.vsunet import VSModelSettings, VSUNeXt2  # noqa: E402


class _TGRN(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.zeros(1, 1, 1, dim))
        self.beta = tnn.Parameter(torch.zeros(1, 1, 1, dim))

    def forward(self, x):  # (B, H, W, C)
        gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class _TBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, 4 * dim)
        self.grn = _TGRN(4 * dim)
        self.pwconv2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):  # (B, C, H, W)
        y = self.dwconv(x)
        y = y.permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.pwconv1(y)
        y = F.gelu(y)  # erf-exact
        y = self.grn(y)
        y = self.pwconv2(y)
        return x + y.permute(0, 3, 1, 2)


class _TStage(tnn.Module):
    def __init__(self, in_dim, dim, n_blocks, first):
        super().__init__()
        if not first:
            self.downsample = tnn.Sequential(
                tnn.LayerNorm(in_dim, eps=1e-6),
                tnn.Conv2d(in_dim, dim, 2, stride=2),
            )
        else:
            self.downsample = None
        self.blocks = tnn.ModuleList([_TBlock(dim) for _ in range(n_blocks)])

    def forward(self, x):
        if self.downsample is not None:
            x = x.permute(0, 2, 3, 1)
            x = self.downsample[0](x)
            x = x.permute(0, 3, 1, 2)
            x = self.downsample[1](x)
        for b in self.blocks:
            x = b(x)
        return x


class _TStem(tnn.Module):
    def __init__(self, dim0, kz, z_levels):
        super().__init__()
        self.conv = tnn.Conv3d(
            1, dim0 // z_levels, (kz, 4, 4), stride=(kz, 4, 4)
        )

    def forward(self, x):  # (B, 1, D, H, W)
        x = self.conv(x)  # (B, C, D', H', W')
        # cytoland rearrange 'b c d h w -> b (c d) h w'
        return x.flatten(1, 2)


class _TUpStage(tnn.Module):
    def __init__(self, in_dim, skip_dim, out_dim, conv_blocks):
        super().__init__()
        self.upsample = tnn.Conv2d(in_dim, out_dim * 4, 3, padding=1)
        self.proj = tnn.Conv2d(out_dim + skip_dim, out_dim, 3, padding=1)
        self.blocks = tnn.ModuleList(
            [_TBlock(out_dim) for _ in range(conv_blocks)]
        )

    def forward(self, x, skip):
        x = self.upsample(x)
        x = F.pixel_shuffle(x, 2)
        x = torch.cat([x, skip], dim=1)
        x = self.proj(x)
        for b in self.blocks:
            x = b(x)
        return x


class _TEncoder(tnn.Module):
    def __init__(self, blocks, dims):
        super().__init__()
        self.stages = tnn.ModuleList(
            [
                _TStage(dims[max(i - 1, 0)], d, n, first=(i == 0))
                for i, (n, d) in enumerate(zip(blocks, dims))
            ]
        )


class _TDecoder(tnn.Module):
    def __init__(self, dims, conv_blocks):
        super().__init__()
        # Bottom-up: stage i upsamples from dims[-1-i] to dims[-2-i].
        self.stages = tnn.ModuleList(
            [
                _TUpStage(dims[-1 - i], dims[-2 - i], dims[-2 - i], conv_blocks)
                for i in range(len(dims) - 1)
            ]
        )


class _THead(tnn.Module):
    def __init__(self, in_dim, hw, n_out, out_stack_depth=1):
        super().__init__()
        self.n_out = n_out
        self.d = out_stack_depth
        self.upsample = tnn.Conv2d(in_dim, hw * 16, 3, padding=1)
        self.proj = tnn.Conv2d(hw, n_out * out_stack_depth, 1)

    def forward(self, x):
        x = self.upsample(x)
        x = F.pixel_shuffle(x, 4)
        x = F.gelu(x)
        x = self.proj(x)
        if self.d == 1:
            return x  # (B, n_out, H, W)
        b, _, h, w = x.shape
        # cytoland voxel-stack head: 'b (c d) h w -> b c d h w'
        return x.reshape(b, self.n_out, self.d, h, w)


class TorchUNeXt2(tnn.Module):
    """The oracle twin: cytoland-style naming + structure."""

    def __init__(self, n_out, blocks, dims, conv_blocks, in_slices, kz, expansion,
                 out_stack_depth=1):
        super().__init__()
        z_levels = in_slices // kz
        self.stem = _TStem(dims[0], kz, z_levels)
        self.encoder = _TEncoder(blocks, dims)
        self.decoder = _TDecoder(dims, conv_blocks)
        hw = max(n_out, dims[0] // expansion)
        self.head = _THead(dims[0], hw, n_out, out_stack_depth)

    def forward(self, x):  # (B, D, H, W) z-window
        x = self.stem(x[:, None])  # (B, dims0, H/4, W/4)
        skips = []
        for stage in self.encoder.stages:
            x = stage(x)
            skips.append(x)
        x = skips.pop()
        for stage in self.decoder.stages:
            x = stage(x, skips.pop())
        return self.head(x)  # (B, n_out, H, W)


SETTINGS = VSModelSettings(
    architecture="unext2",
    arch_config={
        "encoder_blocks": [1, 2],
        "dims": [16, 32],
        "decoder_conv_blocks": 1,
        "stem_kernel_z": 2,
        "head_conv_expansion_ratio": 4,
    },
    in_slices=4,
    out_channels=["nuclei", "membrane"],
)


def _twin():
    torch.manual_seed(0)
    return TorchUNeXt2(
        n_out=2, blocks=[1, 2], dims=[16, 32], conv_blocks=1,
        in_slices=4, kz=2, expansion=4,
    )


def test_convert_unext2_golden(rng):
    twin = _twin().eval()
    x = rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        oracle = twin(torch.from_numpy(x)).numpy()  # (1, 2, 32, 32)

    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    variables = convert_unext2_state_dict(sd, SETTINGS)

    arch = SETTINGS.resolved_arch_config()
    model = VSUNeXt2(
        n_out=2,
        encoder_blocks=tuple(arch.encoder_blocks),
        dims=tuple(arch.dims),
        decoder_conv_blocks=arch.decoder_conv_blocks,
        stem_kernel_z=arch.stem_kernel_z,
        head_expansion=arch.head_conv_expansion_ratio,
        compute_dtype=jnp.float32,
    )
    # flax input is (B, H, W, D); output (B, H, W, n_out).
    ours = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    err = np.abs(ours - oracle).max()
    scale = np.abs(oracle).max()
    assert err <= 1e-4 * max(scale, 1.0), (err, scale)


def test_convert_rejects_mismatched_dict():
    twin = _twin()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    # Missing key
    broken = dict(sd)
    del broken["head.proj.weight"]
    with pytest.raises(ValueError, match="missing"):
        convert_unext2_state_dict(broken, SETTINGS)
    # Unexpected key
    broken = dict(sd)
    broken["extra.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unexpected"):
        convert_unext2_state_dict(broken, SETTINGS)
    # Shape mismatch
    broken = dict(sd)
    broken["head.proj.weight"] = np.zeros((3, 4, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_unext2_state_dict(broken, SETTINGS)


def test_lightning_checkpoint_roundtrip(tmp_path, rng):
    """A .ckpt file (Lightning layout: state_dict + model. prefix)
    loads through the file loader and runs through VirtualStainer."""
    twin = _twin().eval()
    ckpt = {
        "state_dict": {f"model.{k}": v for k, v in twin.state_dict().items()},
        "epoch": 3,
    }
    path = tmp_path / "epoch=3-step=100.ckpt"
    torch.save(ckpt, path)

    sd = load_torch_state_dict(path)
    assert "stem.conv.weight" in sd
    variables = convert_unext2_state_dict(sd, SETTINGS)

    from shrimpy_tpu.models.vsunet import VirtualStainer

    settings = SETTINGS.model_copy(update={"ckpt_path": str(path)})
    stainer = VirtualStainer(settings)
    # The loaded params are the converted ones (spot-check one leaf).
    got = np.asarray(stainer.params["params"]["stem"]["kernel"])
    want = np.asarray(variables["params"]["stem"]["kernel"])
    np.testing.assert_array_equal(got, want)
    out = stainer.predict(rng.random((6, 32, 32), dtype=np.float32))
    assert set(out) == {"nuclei", "membrane"}
    assert out["nuclei"].shape == (6, 32, 32)


def _torch_sliding_windows(twin, vol, in_slices, d, step):
    """Torch oracle of cytoland's predict_sliding_windows assembly
    (reference preprocessing.py:341-358): z-score normalize, edge-pad
    so output window z0 covers planes [z0, z0+d), slide by `step` with
    a clamped tail, average overlaps. Mirrors the contract of
    _infer_volume_stack_jit exactly (clamped-tail duplicates included)."""
    nz, ny, nx = vol.shape
    v = (vol - vol.mean()) / (vol.std(ddof=0) + 1e-6)
    off = (in_slices - d) // 2
    padded = np.pad(
        v, ((off, in_slices - d - off), (0, 0), (0, 0)), mode="edge"
    )
    last = nz - d
    n_win = -(-last // step) + 1 if last else 1
    starts = np.minimum(np.arange(n_win) * step, last)
    n_out = twin.head.n_out
    acc = np.zeros((n_out, nz, ny, nx), np.float64)
    cnt = np.zeros(nz, np.float64)
    for z0 in starts:
        win = padded[z0 : z0 + in_slices]
        with torch.no_grad():
            y = twin(torch.from_numpy(win[None].astype(np.float32)))
        y = y.numpy()[0]  # (n_out, d, H, W)
        acc[:, z0 : z0 + d] += y
        cnt[z0 : z0 + d] += 1.0
    return (acc / cnt[None, :, None, None]).astype(np.float32)


STACK_SETTINGS = VSModelSettings(
    architecture="unext2",
    arch_config={
        "encoder_blocks": [1, 2],
        "dims": [16, 32],
        "decoder_conv_blocks": 1,
        "stem_kernel_z": 2,
        "head_conv_expansion_ratio": 4,
        "out_stack_depth": 2,
    },
    in_slices=4,
    out_channels=["nuclei", "membrane"],
    window_step=1,
)


def _stack_twin():
    torch.manual_seed(1)
    return TorchUNeXt2(
        n_out=2, blocks=[1, 2], dims=[16, 32], conv_blocks=1,
        in_slices=4, kz=2, expansion=4, out_stack_depth=2,
    )


def test_voxel_stack_head_full_volume_golden(tmp_path, rng):
    """VERDICT r4 #4 done criterion: an imported checkpoint's FULL 3-D
    output matches the torch twin's sliding-window voxel-stack
    assembly <= 1e-4 — not just the center-plane trajectory."""
    twin = _stack_twin().eval()
    vol = rng.standard_normal((7, 32, 32)).astype(np.float32) * 3.0 + 1.5
    oracle = _torch_sliding_windows(twin, vol, in_slices=4, d=2, step=1)

    ckpt = {
        "state_dict": {f"model.{k}": v for k, v in twin.state_dict().items()}
    }
    path = tmp_path / "stack.ckpt"
    torch.save(ckpt, path)

    from shrimpy_tpu.models.vsunet import VirtualStainer

    settings = STACK_SETTINGS.model_copy(update={"ckpt_path": str(path)})
    stainer = VirtualStainer(settings)
    # bf16 inference would swamp the 1e-4 budget; parity runs f32.
    stainer.model = stainer.model.clone(compute_dtype=jnp.float32)
    got = stainer.predict(vol)
    assert set(got) == {"nuclei", "membrane"}
    ours = np.stack([np.asarray(got["nuclei"]), np.asarray(got["membrane"])])
    assert ours.shape == oracle.shape == (2, 7, 32, 32)
    err = np.abs(ours - oracle).max()
    scale = np.abs(oracle).max()
    assert err <= 1e-4 * max(scale, 1.0), (err, scale)


def test_voxel_stack_step_and_depth_variants(tmp_path, rng):
    """step=d (non-overlapping) and step<d (overlap averaging) both
    reproduce the torch assembly; uncovered-plane configs are rejected.
    nz=10 with the default batch of 8 forces a padded final window
    batch, pinning the zero-weight masking of clamped duplicates (an
    unmasked duplicate would skew overlapping planes toward the tail
    window)."""
    twin = _stack_twin().eval()
    vol = rng.standard_normal((10, 32, 32)).astype(np.float32)
    ckpt = {"state_dict": {f"model.{k}": v for k, v in twin.state_dict().items()}}
    path = tmp_path / "stack.ckpt"
    torch.save(ckpt, path)

    from shrimpy_tpu.models.vsunet import VirtualStainer

    for step in (1, 2):
        oracle = _torch_sliding_windows(twin, vol, in_slices=4, d=2, step=step)
        settings = STACK_SETTINGS.model_copy(
            update={"ckpt_path": str(path), "window_step": step}
        )
        stainer = VirtualStainer(settings)
        stainer.model = stainer.model.clone(compute_dtype=jnp.float32)
        got = stainer.predict(vol)
        ours = np.stack(
            [np.asarray(got["nuclei"]), np.asarray(got["membrane"])]
        )
        err = np.abs(ours - oracle).max()
        assert err <= 1e-4 * max(np.abs(oracle).max(), 1.0), (step, err)

    settings = STACK_SETTINGS.model_copy(
        update={"ckpt_path": str(path), "window_step": 3}
    )
    stainer = VirtualStainer(settings)
    with pytest.raises(ValueError, match="window_step"):
        stainer.predict(vol)
