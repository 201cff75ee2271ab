"""MXU precision modes for the fused GP predict on TPU.

Outcome of the original question ("is a 3-pass f32 mode safe to
adopt?"): **there is no 3-pass mode.** Mosaic cannot lower
``jax.lax.Precision.HIGH`` inside a Pallas ``dot_general``
(NotImplementedError at lowering) — an earlier version of this sweep
appeared to "measure" it because changing ``config.pallas_precision``
between configurations hit the stale jit cache of the first one; with
the cache cleared, the HIGH configuration crashes at compile time. The
kernel now validates the knob (``ops/gp_kernel._resolve_precision``).

What CAN be traded is the 6-pass exact-f32 default vs the explicit
bf16 ``fast_matmul`` opt-in. This script measures both on the bench
instance's GP (capacity 128, 1M queries): throughput and worst-case
posterior mean / variance-numerator error vs a float64 host oracle.

Run: python benchmarks/precision_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from safe_learning_tpu.config import config
from safe_learning_tpu.ops.gp_kernel import fused_gp_predict
from bench import _build_instance

print("backend:", jax.default_backend())
(grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train,
 y_train, params) = _build_instance()
ls = gp.kernel.lengthscales
n_q = 1 << 20
rng = np.random.default_rng(0)
q = jnp.asarray(rng.uniform(-1, 1, size=(n_q, 3)),
                dtype=config.dtype) / ls
args = (gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
        gp.kernel.variance * gp.scale ** 2)

# float64 host oracle on a slice.
q64 = np.asarray(q, np.float64)[:4096]
x64 = np.asarray(gp.X_buf / ls, np.float64)
d64 = x64[:, None, :] - q64[None, :, :]
k64 = (np.exp(-0.5 * np.sum(d64 ** 2, axis=2))
       * np.asarray(gp._mask(), np.float64)[:, None])
a64 = np.asarray(gp.chol_inv, np.float64) @ k64
mean64 = a64.T @ np.asarray(gp.alpha, np.float64)
pvar64 = np.sum(a64 * a64, axis=0)

for name, fast in (("highest (6-pass f32, default)", False),
                   ("fast_matmul (bf16, opt-in)", True)):
    def fn(qs, fast=fast):
        return fused_gp_predict(qs, *args, kind="rbf", tile=4096,
                                fast_matmul=fast)

    g = jax.jit(lambda qs, c, fn=fn: (lambda m, pv: (
        m, pv, jnp.sin(m[0, 0] + c)))(*fn(qs + c * 1e-9)))
    mean, pvar, carry = g(q, jnp.zeros((), config.dtype))
    jax.block_until_ready(carry)
    err_m = np.abs(np.asarray(mean)[:4096] - mean64).max()
    err_v = np.abs(np.asarray(pvar)[:4096] - pvar64).max()
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        mean, pvar, carry = g(q, carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / iters
    print("{}: {:6.2f} ms / 1M predict ({:.3e} pts/s), "
          "|mean err| = {:.2e}, |var-num err| = {:.2e}".format(
              name, dt * 1e3, n_q / dt, err_m, err_v))
