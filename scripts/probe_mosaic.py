"""Device probes for fused-kernel design decisions (run on TPU).

probe 1: dynamic 128-aligned lane slicing of a VMEM buffer
probe 2: VMEM capacity (scratch sizes until compile/run failure)
probe 3: bf16 dot with f32 accumulation (manual 3-pass HIGH building block)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_dynamic_lane_slice():
    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        j = jnp.where(i > 0, i - 1, 0)
        blk = x_ref[:, pl.ds(pl.multiple_of(j * 128, 128), 128)]
        o_ref[...] = blk * 2.0

    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((8, 512), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(x)
    host = np.asarray(out)
    xr = np.asarray(x)
    expect = np.concatenate(
        [2 * xr[:, 0:128], 2 * xr[:, 0:128], 2 * xr[:, 128:256], 2 * xr[:, 256:384]],
        axis=1,
    )
    ok = np.array_equal(host, expect)
    print(f"dynamic_lane_slice: {'OK' if ok else 'WRONG RESULT'}")


def probe_vmem(mb: int):
    n_rows = mb * 2**20 // (4 * 512)

    def kernel(o_ref, scratch):
        scratch[0, :] = jnp.ones((512,), jnp.float32)
        o_ref[...] = scratch[0:8, :] + 1.0

    out = pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, 512), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=512 * 2**20),
    )()
    float(jnp.sum(out))
    print(f"vmem {mb} MB scratch: OK")


def probe_bf16_dot():
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[...] = dot(a_hi, b_hi) + dot(a_lo, b_hi) + dot(a_hi, b_lo)

    k = jax.random.key(0)
    a = jax.random.normal(k, (128, 160), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (160, 512), jnp.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32),
    )(a, b)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    ref32 = (
        np.asarray(jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST), np.float64)
    )
    err32 = np.abs(ref32 - ref).max() / np.abs(ref).max()
    print(f"bf16 3-pass dot: rel err {err:.2e} (f32 HIGHEST err {err32:.2e})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "slice"):
        try:
            probe_dynamic_lane_slice()
        except Exception as e:  # noqa: BLE001
            print(f"dynamic_lane_slice: FAIL {type(e).__name__}: {str(e)[:200]}")
    if which in ("all", "dot"):
        try:
            probe_bf16_dot()
        except Exception as e:  # noqa: BLE001
            print(f"bf16_dot: FAIL {type(e).__name__}: {str(e)[:200]}")
    if which in ("all", "vmem"):
        for mb in (16, 24, 32, 48, 64, 96):
            try:
                probe_vmem(mb)
            except Exception as e:  # noqa: BLE001
                print(f"vmem {mb} MB scratch: FAIL {type(e).__name__}: {str(e)[:160]}")
                break
