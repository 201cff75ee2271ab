"""End-to-end safe-learning smoke test on real TPU hardware.

Runs the full 1-D ROA active-learning loop — GP prior, posterior
sampling, verification sweeps, argmax-variance exploration, online data
updates — on whatever backend ``jax.devices()`` provides. Use after any
change to the GP/verification stack to confirm the hardware path:

    python scripts/tpu_smoke.py
"""
import numpy as np
import jax, jax.numpy as jnp
import safe_learning_tpu as sl

print("backend:", jax.default_backend())
disc = sl.GridWorld([[-1.0, 1.0]], 201)
tau = 1.0 / disc.nindex
kernel = (sl.ActiveDims(sl.Matern32(variance=0.16, lengthscales=1.0,
                                    input_dim=1), [0])
          * sl.ActiveDims(sl.LinearKernel(variances=1.0, input_dim=1), [0]))
gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                        noise_variance=1e-4, beta=2.0,
                        mean_function=sl.LinearSystem([[0.25, 0.0]]))
key = jax.random.PRNGKey(5)
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
fracs = []
for i in range(8):
    safe_grid = grid_pts[lyap.safe_set]
    acts = np.asarray(lyap.policy(jnp.asarray(safe_grid)))
    xu = np.hstack([safe_grid, acts])
    _, std = map(np.asarray, lyap.dynamics.evaluate(jnp.asarray(xu)))
    mid = int(np.argmax(std[:, 0]))
    meas = np.asarray(true_dyn(jnp.asarray(xu[[mid]])))
    lyap.dynamics = lyap.dynamics.add_data_point(xu[[mid]], meas)
    lyap.update_safe_set()
    fracs.append(float(lyap.safe_set.mean()))
print("safe fraction history:", " ".join(f"{f:.3f}" for f in fracs))
print("c_max: {:.4f}  data: {}".format(lyap.c_max, int(lyap.dynamics.count)))
assert fracs[-1] >= fracs[0]
assert int(lyap.dynamics.count) == 8
print("TPU END-TO-END LOOP OK")
