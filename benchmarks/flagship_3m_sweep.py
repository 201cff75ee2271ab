"""The NeurIPS-17 flagship verification at reference scale on TPU:
2001x1501 = 3M grid, FunctionStack of two composite-kernel GPs."""
import time
import numpy as np
import jax, jax.numpy as jnp
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import safe_learning_tpu as sl
from safe_learning_tpu.lyapunov import _fused_update
from examples.inverted_pendulum import build_gp_dynamics

print("backend:", jax.default_backend())
gravity, length = 9.81, 0.5
x_max = np.deg2rad(30)
u_max = gravity * 0.15 * length * np.sin(x_max)
norms = ((x_max, np.sqrt(gravity / length)), (u_max,))
true_dyn = sl.InvertedPendulum(0.15, length, 0.1, 1/80, normalization=norms)
wrong = sl.InvertedPendulum(0.1, length, 0.0, 1/80, normalization=norms)
a, b = map(np.asarray, wrong.linearize())
a_t, b_t = map(np.asarray, true_dyn.linearize())
dynamics = build_gp_dynamics(a, b, a_t, b_t)
# add a few measurements so both GPs carry data
rng = np.random.default_rng(0)
xu = np.column_stack([rng.uniform(-1, 1, (32, 2)) * 0.3,
                      rng.uniform(-0.5, 0.5, (32, 1))])
meas = np.asarray(true_dyn(jnp.asarray(xu[:, :2]), jnp.asarray(xu[:, 2:])))
dynamics = dynamics.add_data_point(xu, meas)

k, s = sl.utils.dlqr(a, b, np.diag([1., 2.]), 1.2*np.eye(1))
policy = sl.Saturation(sl.LinearSystem(-k), -1., 1.)
v = sl.QuadraticFunction(s)
grid = sl.GridWorld([[-2., 2.], [-1.5, 1.5]], [2001, 1501])
print("grid:", grid.nindex)
lv = float(2*np.linalg.norm(s, 2))
lf = float(np.linalg.norm(a - b@k, 2))
tau = float(np.min(grid.unit_maxes))

pts = jnp.asarray(grid.all_points.astype(np.float32))
vals = np.asarray(v(pts)).ravel()
exempt = jnp.asarray(vals <= np.quantile(vals, 0.001))

@jax.jit
def sweep(p_, carry):
    safe, c_max, values, any_safe = _fused_update(
        policy, dynamics, v, lv, lf, tau, p_ + carry*1e-9, exempt)
    return jnp.sin(values[0] + carry), c_max, safe

carry = jnp.zeros((), jnp.float32)
carry, c_max, safe = sweep(pts, carry)
print("warmup: c_max={:.4f} safe_frac={:.4f}".format(
    float(c_max), float(jnp.mean(safe))))
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    carry, c_max, safe = sweep(pts, carry)
float(c_max)
dt = time.perf_counter() - t0
print(f"3M-point flagship sweep: {dt/iters*1e3:.1f} ms "
      f"({grid.nindex*iters/dt:.3e} checks/s)")
