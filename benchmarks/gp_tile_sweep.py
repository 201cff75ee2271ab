"""Tile-size sweep for the fused GP predict kernel on TPU."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import numpy as np
import jax, jax.numpy as jnp
import safe_learning_tpu as sl
from safe_learning_tpu.ops.gp_kernel import fused_gp_predict

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
cap, d, p, Q = 128, 3, 2, 1_048_576
x = jnp.asarray(rng.uniform(-1, 1, (cap, d)).astype(np.float32))
chol_inv = jnp.asarray(np.tril(rng.normal(size=(cap, cap))).astype(np.float32))
alpha = jnp.asarray(rng.normal(size=(cap, p)).astype(np.float32))
mask = jnp.ones((cap,), dtype=jnp.float32)
q = jnp.asarray(rng.uniform(-1, 1, (Q, d)).astype(np.float32))

for tile in [512, 1024, 2048, 4096]:
    for fast in [False, True]:
        @jax.jit
        def chain(q, carry, tile=tile, fast=fast):
            mean, var = fused_gp_predict(q + carry * 1e-9, x, chol_inv,
                                         alpha, mask, 1.0, kind="rbf",
                                         tile=tile, fast_matmul=fast)
            return jnp.sin(carry + mean[0, 0]), mean
        carry = jnp.zeros((), jnp.float32)
        carry, mean = chain(q, carry)
        mean.block_until_ready()
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, mean = chain(q, carry)
        float(carry)
        dt = time.perf_counter() - t0
        print(f"tile={tile} fast={fast}: {Q*iters/dt:.3e} queries/s "
              f"({dt/iters*1e3:.2f} ms/sweep)")
