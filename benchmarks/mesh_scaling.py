"""Sharded verification sweep vs mesh size.

Runs the fused ``update_safe_set`` over 1, 2, 4, ... device meshes and
reports wall-clock per sweep plus equality of the certified result with
the single-device sweep. On real multi-chip hardware this measures weak
scaling of the grid-sharded sweep (one certified-level collective per
sweep rides the ICI); on a single-chip machine set
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
to validate the mechanics on a virtual CPU mesh (wall-clock is then NOT
a performance signal — all virtual devices share one host).
"""
import os
import sys
import time

if len(os.environ.get("JAX_PLATFORMS", "")) == 0 and \
        "--virtual" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.parallel import (make_mesh,  # noqa: E402
                                        sharded_safe_set_update)

print("backend:", jax.default_backend(), "devices:", jax.device_count())

rng = np.random.default_rng(0)
grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], [1024, 1024])
av = np.array([[0.25, 0.05], [0.0, 0.3]])
policy = sl.LinearSystem(np.zeros((1, 2)))
vq = sl.QuadraticFunction(np.eye(2))
lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
lf = float(np.linalg.norm(av, 2))
x_inner = np.column_stack([rng.uniform(-0.4, 0.4, 64),
                           rng.uniform(-0.4, 0.4, 64), np.zeros(64)])
gp = sl.StackedGaussianProcess(
    [sl.RBF(1.0, [0.3] * 3, input_dim=3),
     sl.RBF(1.0, [0.35] * 3, input_dim=3)],
    x_inner, x_inner[:, :2] @ av.T, noise_variances=1e-4,
    mean_functions=[sl.LinearSystem([av[[d]], np.zeros((1, 1))])
                    for d in range(2)])
tau = float(np.min(grid.unit_maxes))
vvals = np.sum(grid.all_points ** 2, axis=1)
initial = np.where(vvals <= 0.02)[0]


def make_lyap():
    return sl.Lyapunov(grid, vq, gp, lf, lv, tau, policy,
                       initial_set=initial)


baseline = make_lyap()
baseline.update_safe_set()
ref_safe, ref_cmax = baseline.safe_set.copy(), baseline.c_max
print("single device: safe_frac {:.4f} c_max {:.4f}".format(
    ref_safe.mean(), ref_cmax))

n = 1
while n <= jax.device_count():
    lyap = make_lyap()
    mesh = make_mesh(n)
    safe, c_max = sharded_safe_set_update(lyap, mesh)  # compile + warm
    assert np.array_equal(safe, ref_safe) and c_max == ref_cmax, \
        "sharded result diverged at n={}".format(n)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        # Fresh sweep each iteration (the safe-set state forces real work;
        # results stay identical so the assert above remains valid).
        sharded_safe_set_update(lyap, mesh)
    dt = (time.perf_counter() - t0) / iters
    print("mesh {:d}: {:7.2f} ms/sweep ({:.3e} checks/s)".format(
        n, dt * 1e3, grid.nindex / dt))
    n *= 2
