"""End-to-end safe-learning smoke test + kernel accuracy on real TPU.

Runs (on whatever backend ``jax.devices()`` provides):

1. the full 1-D ROA active-learning loop — GP prior, posterior sampling,
   verification sweeps, argmax-variance exploration, online data updates;
2. an on-hardware accuracy measurement of the fused Pallas GP-predict
   kernel against the plain XLA path, including the ``fast_matmul=True``
   bf16 mode, on the bench workload's shapes.

Use after any change to the GP/verification stack to confirm the
hardware path:

    python scripts/tpu_smoke.py

The output of the latest TPU run is recorded in
``scripts/TPU_SMOKE_OUTPUT.txt``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
import safe_learning_tpu as sl
from safe_learning_tpu.config import config

print("backend:", jax.default_backend())
print("dtype:", np.dtype(config.np_dtype).name)

# ---------------------------------------------------------------------
# 1. Flagship active-learning loop.
# ---------------------------------------------------------------------
disc = sl.GridWorld([[-1.0, 1.0]], 201)
tau = 1.0 / disc.nindex
kernel = (sl.ActiveDims(sl.Matern32(variance=0.16, lengthscales=1.0,
                                    input_dim=1), [0])
          * sl.ActiveDims(sl.LinearKernel(variances=1.0, input_dim=1), [0]))
gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                        noise_variance=1e-4, beta=2.0,
                        mean_function=sl.LinearSystem([[0.25, 0.0]]))
key = jax.random.PRNGKey(7)
sample_disc = np.hstack([np.linspace(-1, 1, 201)[:, None],
                         np.zeros((201, 1))])
true_dyn = sl.sample_gp_function(sample_disc, gp, key)[0]

v = sl.Triangulation(sl.GridWorld([[-1.0, 1.0]], 3), [1.0, 0.0, 1.0])
policy = sl.LinearSystem([[0.0]])
lyap = sl.Lyapunov(disc, v, gp, 0.25, 1.0, tau, policy)
lyap.initial_safe_set = np.abs(disc.all_points.squeeze()) < 0.2
lyap.safe_set |= lyap.initial_safe_set
lyap.update_safe_set()
print("initial safe fraction: {:.3f}".format(lyap.safe_set.mean()))

grid_pts = disc.all_points
acts = np.asarray(lyap.policy(jnp.asarray(grid_pts)))
xu_all = np.hstack([grid_pts, acts])
fracs = []
for i in range(8):
    _, std = map(np.asarray, lyap.dynamics.evaluate(xu_all))
    mid = int(np.argmax(np.where(lyap.safe_set, std[:, 0], -np.inf)))
    meas = np.asarray(true_dyn(jnp.asarray(xu_all[[mid]])))
    lyap.dynamics = lyap.dynamics.add_data_point(xu_all[[mid]], meas)
    lyap.update_safe_set()
    fracs.append(float(lyap.safe_set.mean()))
print("safe fraction history:", " ".join(f"{f:.3f}" for f in fracs))
print("c_max: {:.4f}  data: {}".format(lyap.c_max, int(lyap.dynamics.count)))
assert fracs[-1] >= fracs[0]
assert int(lyap.dynamics.count) == 8
print("1. END-TO-END LOOP OK")

# ---------------------------------------------------------------------
# 2. Pallas kernel accuracy on hardware (bench shapes: capacity 128,
#    RBF, 2 outputs, 64k queries).
# ---------------------------------------------------------------------
from safe_learning_tpu.ops.gp_kernel import fused_gp_predict, \
    pallas_supported

rng = np.random.default_rng(0)
x_train = rng.uniform(-1, 1, size=(128, 3))
y_train = np.column_stack([np.sin(x_train @ [1.0, 0.5, 0.2]),
                           np.cos(x_train @ [0.3, -0.7, 0.1])])
gp_k = sl.GaussianProcess(sl.RBF(1.0, [0.3, 0.3, 0.3], input_dim=3),
                          x_train, y_train, noise_variance=1e-4)
q = jnp.asarray(rng.uniform(-1, 1, size=(65536, 3)),
                dtype=config.dtype)

config.use_pallas = False
mean_xla, var_xla = map(np.asarray, gp_k.predict(q))
config.use_pallas = True

if pallas_supported():
    ls = gp_k.kernel.lengthscales
    args = (q / ls, gp_k.X_buf / ls, gp_k.chol_inv, gp_k.alpha,
            gp_k._mask(), gp_k.kernel.variance)
    for fast in (False, True):
        mean_num, var_num = fused_gp_predict(*args, kind="rbf", tile=4096,
                                             fast_matmul=fast)
        mean_p = np.asarray(mean_num)
        var_p = np.maximum(np.asarray(gp_k.kernel.diag(q))
                           - np.asarray(var_num), 1e-12)[:, None]
        dm = np.abs(mean_p - mean_xla).max()
        dv = np.abs(var_p - var_xla[:, :1]).max()
        ds = np.abs(np.sqrt(var_p) - np.sqrt(var_xla[:, :1])).max()
        print("2. pallas vs XLA (fast_matmul={}): |dmean|={:.2e} "
              "|dvar|={:.2e} |dstd|={:.2e}".format(fast, dm, dv, ds))
        if not fast:
            assert dm < 5e-5 and ds < 5e-4, "precise kernel drifted"
    print("2. PALLAS KERNEL ACCURACY OK")
else:
    print("2. pallas kernel skipped (backend {} unsupported)".format(
        jax.default_backend()))

# ---------------------------------------------------------------------
# 3. Stacked per-dimension GP (flagship dynamics form): the single fused
#    stacked kernel vs the per-output XLA path, and gradient flow THROUGH
#    the fused predict (the policy-training path on TPU).
# ---------------------------------------------------------------------
kernels = []
for dim in range(2):
    kernels.append(
        sl.LinearKernel(variances=[0.3, 0.1, 0.5], input_dim=3)
        + sl.ActiveDims(sl.Matern32(variance=1.0,
                                    lengthscales=0.8 + 0.1 * dim,
                                    input_dim=1), [0])
        * sl.ActiveDims(sl.LinearKernel(variances=0.4, input_dim=1), [0]))
stacked = sl.StackedGaussianProcess(kernels, x_train, y_train,
                                    noise_variances=[1e-4, 2e-4])

config.use_pallas = False
mean_s_xla, var_s_xla = map(np.asarray, stacked.predict(q))
config.use_pallas = True
mean_s, var_s = map(np.asarray, stacked.predict(q))


def _host_f64_stacked_mean(stacked, q):
    """Float64 host oracle for the stacked posterior mean, using the SAME
    (f32-derived) cached solves — isolates the covariance-path error."""
    q64 = np.asarray(q, np.float64)
    x64 = np.asarray(stacked.X_buf, np.float64)
    mask = np.asarray(stacked._mask(), np.float64)
    means = []
    for s in range(stacked.num_fun):
        k64 = np.asarray(stacked.kernels[s](x64, q64), np.float64)
        kx = k64 * mask[:, None]
        a = np.asarray(stacked.chol_inv[s], np.float64) @ kx
        mean = a.T @ np.asarray(stacked.alpha[s], np.float64)
        prior = stacked.mean_functions[s]
        if prior is not None:
            mean = mean + np.asarray(prior(q64), np.float64)
        means.append(mean[:, 0])
    return np.stack(means, axis=1)


mean_ref = _host_f64_stacked_mean(stacked, q)
err_pallas = np.abs(mean_s - mean_ref).max()
err_xla = np.abs(mean_s_xla - mean_ref).max()
dv = np.abs(var_s - var_s_xla).max()
print("3. stacked mean vs f64 oracle: pallas {:.2e}, xla fallback {:.2e}"
      "; |dvar fused-vs-xla|={:.2e}".format(err_pallas, err_xla, dv))
if pallas_supported():
    # Both paths are dominated by the same f32 covariance-assembly
    # rounding amplified through the noise-1e-4 solve (measured ~1e-3 on
    # O(1) means, within 2x of each other); variances agree to ~1e-6.
    assert err_pallas < max(2.0 * err_xla, 5e-4), "stacked kernel drifted"
    assert dv < 5e-4


def explore_score(points):
    mean, err = stacked(points)
    return jnp.sum(mean ** 2) + jnp.sum(err)


g = np.asarray(jax.grad(explore_score)(q[:4096]))
assert np.isfinite(g).all(), "gradient through fused predict not finite"
print("3. STACKED PREDICT + GRADIENT OK (|g| max {:.3f})".format(
    np.abs(g).max()))

print("TPU SMOKE OK")
