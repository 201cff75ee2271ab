"""Composite-kernel GP predict: fused Pallas program vs XLA fallback.

The flagship notebooks model dynamics with composite kernels
(``Linear + Matern32 x Linear`` over active dims). Round 1 left those on
the pure-XLA path (measured within 1.8x of the specialized Pallas RBF
kernel); round 2 compiles the kernel structure into a covariance program
executed inside the fused Pallas kernel. This script measures both paths
and their agreement on TPU.

Run: python benchmarks/composite_kernel_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import safe_learning_tpu as sl
from safe_learning_tpu.config import config

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
cap, d, Q = 128, 3, 1_048_576

kernel = (sl.LinearKernel(variances=[0.3, 0.1, 0.5], input_dim=3)
          + sl.ActiveDims(sl.Matern32(variance=1.0, lengthscales=0.8,
                                      input_dim=1), dims=[0])
          * sl.ActiveDims(sl.LinearKernel(variances=0.4, input_dim=1),
                          dims=[0]))
x = rng.uniform(-1, 1, size=(cap, d))
y = np.sin(x @ [1.0, 0.5, 0.2])[:, None]
gp = sl.GaussianProcess(kernel, x, y, noise_variance=1e-4)
q = jnp.asarray(rng.uniform(-1, 1, size=(Q, d)), dtype=config.dtype)


def timed(label):
    @jax.jit
    def chain(q, carry):
        mean, var = gp.predict(q + carry * 1e-9)
        return jnp.sin(carry + mean[0, 0]), mean, var

    carry = jnp.zeros((), config.dtype)
    carry, mean, var = chain(q, carry)
    jax.block_until_ready(mean)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, mean, var = chain(q, carry)
    float(carry)
    dt = time.perf_counter() - t0
    print(f"{label}: {Q * iters / dt:.3e} queries/s "
          f"({dt / iters * 1e3:.2f} ms / 1M)")
    return np.asarray(mean), np.asarray(var)


config.use_pallas = False
mean_xla, var_xla = timed("XLA fallback      ")
config.use_pallas = True
mean_pl, var_pl = timed("fused Pallas (gen.)")

print("agreement: |dmean|={:.2e} |dvar|={:.2e}".format(
    np.abs(mean_pl - mean_xla).max(), np.abs(var_pl - var_xla).max()))
