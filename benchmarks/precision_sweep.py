"""MXU precision sweep for the fused verification pipeline on TPU.

Measures, on the bench instance (discriminating certificate, 1000^2
grid), throughput and certification accuracy of the fused GP predict at:

- ``highest``: 6-pass exact-f32 matmuls (the default),
- ``high``: 3-pass (~16-bit effective mantissa),

against the float64 NumPy oracle's margins and certified level. Decides
whether the 3-pass mode is safe to adopt for the decrease check.

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
from safe_learning_tpu.lyapunov import Lyapunov, _fused_update, \
    _negative_batch
from bench import _build_instance, _oracle_c_max, _oracle_margins

print("backend:", jax.default_backend())
(grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
 params) = _build_instance()
lyap = Lyapunov(grid, v, gp, lf, lv, tau, policy, initial_set=initial_set)
points = jnp.asarray(grid.all_points)
exempt = jnp.asarray(lyap.initial_safe_set)

margin64, vals64 = _oracle_margins(grid, a, x_train, y_train, params, lf,
                                   tau)
c_ref, frac_ref = _oracle_c_max(grid, a, x_train, y_train, params, lf,
                                tau, initial_set)
print(f"oracle: c_max={c_ref:.6f} safe_frac={frac_ref:.4f}")

for prec in ["highest", "high"]:
    config.pallas_precision = prec

    def sweep(pts, carry):
        shifted = pts + carry * 1e-9
        safe, c_max, values, any_safe = _fused_update(
            lyap.policy, lyap.dynamics, lyap.lyapunov_function,
            lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
            shifted, exempt)
        return jnp.sin(values[0] + carry), c_max, safe

    sweep_jit = jax.jit(sweep)
    carry = jnp.zeros((), dtype=points.dtype)
    carry, c_max, safe = sweep_jit(points, carry)
    c_dev, frac_dev = float(c_max), float(jnp.mean(safe))

    neg, dec, thr = map(np.asarray, _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, tau, points))
    err = np.abs(dec.astype(np.float64) - thr.astype(np.float64)
                 - margin64)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, c_max, safe = sweep_jit(points, carry)
    float(c_max)
    dt = time.perf_counter() - t0
    rate = grid.nindex * iters / dt

    print(f"{prec:8s}: {rate:.3e} checks/s ({dt / iters * 1e3:.2f} "
          f"ms/sweep)  c_max={c_dev:.6f} (|dc|={abs(c_dev - c_ref):.2e})  "
          f"safe_frac={frac_dev:.4f}  margin err max={err.max():.2e} "
          f"p99.9={np.quantile(err, 0.999):.2e}")

config.pallas_precision = "highest"
