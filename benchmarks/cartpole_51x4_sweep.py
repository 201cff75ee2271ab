"""Reference's largest workload: 51^4 cart-pole grid verification on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
import safe_learning_tpu as sl
from safe_learning_tpu.config import config

print("backend:", jax.default_backend())
m, M, L, b = 0.175, 1.732, 0.28, 0.01
x_max, th_max = 0.5, np.deg2rad(30)
u_max = (m + M) * 4.0 / x_max
norms = ((x_max, th_max, 2.0, np.deg2rad(30)), (u_max,))
cp = sl.CartPole(m, M, L, b, 0.01, normalization=norms)
a, bb = map(np.asarray, cp.linearize())
k, p = sl.utils.dlqr(a, bb, 0.1*np.eye(4), 0.1*np.eye(1))
policy = sl.Saturation(sl.LinearSystem(-k), -1., 1.)
v = sl.QuadraticFunction(p / np.abs(p).max())

rng = np.random.default_rng(0)
x_train = rng.uniform(-1, 1, size=(128, 5))
y_train = np.asarray(cp(jnp.asarray(x_train[:, :4]), jnp.asarray(x_train[:, 4:])))
gp = sl.GaussianProcess(sl.RBF(1e-10, [0.4]*5, input_dim=5), x_train, y_train,
                        noise_variance=1e-12, mean_function=sl.LinearSystem([a, bb]))

grid = sl.GridWorld([[-1., 1.]]*4, 51)
print("grid:", grid.nindex)
lv = float(2*np.linalg.norm(p/np.abs(p).max(), 2))
lf = float(np.linalg.norm(a - bb@k, 2))
tau = float(np.min(grid.unit_maxes)) * 1e-3
vals = np.asarray(v(jnp.asarray(grid.all_points.astype(np.float32)))).ravel()
init = np.where(vals <= np.quantile(vals, 0.001))[0]

lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy, initial_set=init)

t0 = time.perf_counter()
lyap.update_safe_set()  # one fused device program over all 6.8M points
t1 = time.perf_counter()
print(f"first sweep (compile+run): {t1-t0:.1f}s")
t0 = time.perf_counter()
lyap.update_safe_set()
t1 = time.perf_counter()
n = grid.nindex
print(f"end-to-end update_safe_set: {t1-t0:.2f}s -> {n/(t1-t0):.3e} "
      "checks/s (includes relay dispatch latency + 6.8MB safe-set D2H "
      "+ host state update)")
print(f"c_max={lyap.c_max:.4f} safe_frac={lyap.safe_set.mean():.4f}")

# Device-only sweep rate, relay effects amortized by a data-dependent
# carry chain (same methodology as bench.py / flagship_3m_sweep.py).
from safe_learning_tpu.lyapunov import _fused_update

pts = lyap._device_points()
exempt = jnp.asarray(lyap.initial_safe_set)

@jax.jit
def sweep(p_, carry):
    safe, c_max, values, any_safe = _fused_update(
        policy, gp, v, lv, lf, tau, p_ + carry * 1e-9, exempt)
    return jnp.sin(values[0] + carry), c_max, safe

carry = jnp.zeros((), jnp.float32)
carry, c_max, safe = sweep(pts, carry)
float(c_max)
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    carry, c_max, safe = sweep(pts, carry)
float(c_max)
dt = (time.perf_counter() - t0) / iters
print(f"device sweep: {dt*1e3:.1f} ms -> {n/dt:.3e} checks/s")
