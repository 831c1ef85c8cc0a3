import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from shrimpy_tpu.config.schemas import RegistrationSettings
from shrimpy_tpu.ops.register import estimate_registration
rng = np.random.default_rng(0)
base = rng.random((32,128,128)).astype(np.float32)*100
mov = np.roll(base, (1,3,-2), (0,1,2))
res = estimate_registration(base, mov, RegistrationSettings())
print("noise-roll: offset", np.round(res.offset,3), "diag", np.round(np.diag(res.matrix),3), "loss", round(res.final_loss,4), flush=True)

from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.register import affine_apply
shape=(32,128,128)
fixed = sum(gaussian_blob(shape, tuple(rng.uniform(10,s-10) for s in shape), (3.,6.,6.), amplitude=100.) for _ in range(8)) + rng.normal(0,.5,shape).astype(np.float32)
true = np.array([1.6,-3.3,2.1],np.float32)
moving = np.asarray(affine_apply(jnp.asarray(fixed), jnp.eye(3,dtype=jnp.float32), jnp.asarray(true)))
res2 = estimate_registration(fixed, moving, RegistrationSettings())
print("blobs: offset", np.round(res2.offset,3), "err", round(float(np.abs(res2.offset+true).max()),4), "diag", np.round(np.diag(res2.matrix),4), flush=True)
