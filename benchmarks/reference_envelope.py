"""The reference's two heaviest implied workloads, at exact scale.

BASELINE.md's envelope names two ceilings the reference only gestures
at on its 4-core CPU:

1. The adaptive notebook justifies its machinery against a
   "3001^2 ~ 9.0M-point uniform grid" it cannot afford to sweep
   (``adaptive_safety_verification.ipynb`` cells 3/20): here the
   uniform-equivalent sweep runs outright — full GP-dynamics decrease
   check over all 9M points.
2. The cart-pole notebook evaluates ROA on a 51^4 ~ 6.8M grid with a
   2000-step closed-loop horizon (``reinforcement_learning_cartpole.
   ipynb`` cells 20/24): here that exact rollout is one whole-grid
   ``lax.scan``.

Run:  python benchmarks/reference_envelope.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import safe_learning_tpu as sl

print("backend:", jax.default_backend())

# ---------------------------------------------------------------------
# 1. Uniform 3001^2 pendulum verification sweep (adaptive notebook's
#    strawman), GP dynamics with the wrong-parameter linearized prior.
# ---------------------------------------------------------------------
dt, g = 0.01, 9.81
theta_max = np.deg2rad(30)
omega_max = np.sqrt(g / 0.5)
u_max = g * 0.15 * 0.5 * np.sin(theta_max)
norms = ((theta_max, omega_max), (u_max,))
true_pendulum = sl.InvertedPendulum(0.15, 0.5, 0.1, dt,
                                    normalization=norms)
a_true, b_true = (np.asarray(m) for m in true_pendulum.linearize())
wrong = sl.InvertedPendulum(0.1, 0.4, 0.0, dt, normalization=norms)
a, b = (np.asarray(m) for m in wrong.linearize())

prior_var = np.clip((np.hstack([a_true, b_true])
                     - np.hstack([a, b])) ** 2, 1e-3, None)
kernels, means = [], []
for dim in range(2):
    kernels.append(
        sl.LinearKernel(variances=prior_var[dim], input_dim=3)
        + sl.ActiveDims(sl.Matern32(lengthscales=1.0, input_dim=1),
                        dims=[0])
        * sl.ActiveDims(sl.LinearKernel(variances=prior_var[dim, 1],
                                        input_dim=1), dims=[0]))
    means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
rng = np.random.default_rng(0)
x_train = rng.uniform(-1, 1, (64, 3))
y_train = np.asarray(true_pendulum(jnp.asarray(x_train[:, :2]),
                                   jnp.asarray(x_train[:, 2:])))
dynamics = sl.StackedGaussianProcess(
    kernels, x_train, y_train, noise_variances=1e-6, betas=2.0,
    mean_functions=means, capacity=64)

grid = sl.GridWorld([[-1.0, 1.0]] * 2, 3001)
print("uniform grid:", grid.nindex)
tau = float(np.sum(grid.unit_maxes) / 2)
q = np.diag([1.0, 2.0])
r = 1.2 * np.identity(1)
k, p = sl.utils.dlqr(a_true, b_true, q, r)
p = p / np.abs(p).max()
policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
l_pol = np.linalg.norm(-k, 1)
l_dyn = np.linalg.norm(a_true, 1) + np.linalg.norm(b_true, 1) * l_pol
grad_v = sl.LinearSystem([2 * p])
l_v = sl.LambdaFunction(lambda x: jnp.abs(grad_v(x)),
                        input_dim=2, output_dim=2)
initial = np.where(np.linalg.norm(grid.all_points, ord=2,
                                  axis=1) <= 0.1)[0]
lyap = sl.Lyapunov(grid, sl.QuadraticFunction(p), dynamics, l_dyn,
                   l_v, tau, policy, initial_set=initial)

t0 = time.perf_counter()
lyap.update_safe_set()
t_first = time.perf_counter() - t0
print("first 9M sweep (compile+run): {:.1f}s".format(t_first))

t0 = time.perf_counter()
lyap.update_safe_set()
t_e2e = time.perf_counter() - t0
print("end-to-end update_safe_set: {:.2f}s -> {:.3e} checks/s".format(
    t_e2e, grid.nindex / t_e2e))
print("c_max={:.4f} safe_frac={:.4f}".format(
    float(lyap.c_max), float(np.asarray(lyap.safe_set).mean())))

# Median of 5 end-to-end sweeps (includes relay dispatch + D2H).
times = []
for _ in range(5):
    t0 = time.perf_counter()
    lyap.update_safe_set()
    times.append(time.perf_counter() - t0)
t_med = sorted(times)[2]
print("median update_safe_set: {:.2f}s -> {:.3e} checks/s".format(
    t_med, grid.nindex / t_med))

# ---------------------------------------------------------------------
# 2. Cart-pole 51^4 ROA, horizon 2000 (the notebook's exact evaluation).
# ---------------------------------------------------------------------
m, M, L, b_fric = 0.175, 1.732, 0.28, 0.01
x_max = 0.5
u_max = (m + M) * 4.0 / x_max
cp_norms = ((x_max, np.deg2rad(30), 2.0, np.deg2rad(30)), (u_max,))
cartpole = sl.CartPole(m, M, L, b_fric, 0.01, normalization=cp_norms)
a4, b4 = map(np.asarray, cartpole.linearize())
k4, _ = sl.utils.dlqr(a4, b4, 0.1 * np.eye(4), 0.1 * np.eye(1))
policy4 = sl.Saturation(sl.LinearSystem(-k4), -1.0, 1.0)

roa_grid = sl.GridWorld([[-1.0, 1.0]] * 4, 51)
print("ROA grid:", roa_grid.nindex, " horizon: 2000")


@jax.jit
def closed_loop(x):
    return cartpole(x, policy4(x))


# One 51^4 x 2000 dispatch (~90 s device time) exceeds the TPU
# worker's single-dispatch limit; 500-step segments compose to the
# identical result (tests/test_dynamics.py) within the limit.
t0 = time.perf_counter()
roa = sl.compute_roa(roa_grid, closed_loop, horizon=2000, tol=0.1,
                     segment_steps=500)
t_first = time.perf_counter() - t0
print("first ROA rollout (compile+run): {:.1f}s".format(t_first))

t0 = time.perf_counter()
roa = sl.compute_roa(roa_grid, closed_loop, horizon=2000, tol=0.1,
                     segment_steps=500)
t_roa = time.perf_counter() - t0
steps = roa_grid.nindex * 2000
print("51^4 x 2000-step ROA: {:.2f}s -> {:.3e} state-steps/s  "
      "(fraction {:.3f})".format(t_roa, steps / t_roa,
                                 float(np.asarray(roa).mean())))
