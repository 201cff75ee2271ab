"""Miniature end-to-end safe-learning loop (the 1-D ROA example in CI).

Guards the full pipeline the examples exercise: GP prior over
state-action space, posterior sampling for a hidden true system, PWL
Lyapunov candidate, certified-level verification, argmax-variance safe
exploration, and online GP updates.
"""

import jax
import jax.numpy as jnp
import numpy as np

import safe_learning_tpu as sl


def test_safe_learning_loop_grows_certified_set():
    disc = sl.GridWorld([[-1.0, 1.0]], 101)
    tau = 1.0 / disc.nindex
    kernel = (sl.ActiveDims(sl.Matern32(variance=0.4 ** 2,
                                        lengthscales=1.0, input_dim=1),
                            dims=[0])
              * sl.ActiveDims(sl.LinearKernel(variances=1.0, input_dim=1),
                              dims=[0]))
    gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                            noise_variance=1e-4, beta=2.0,
                            mean_function=sl.LinearSystem([[0.25, 0.0]]))

    sample_disc = np.hstack([np.linspace(-1, 1, 101)[:, None],
                             np.zeros((101, 1))])
    true_dyn = sl.sample_gp_function(sample_disc, gp,
                                     jax.random.PRNGKey(0))[0]

    v = sl.Triangulation(sl.GridWorld([[-1.0, 1.0]], 3), [1.0, 0.0, 1.0])
    lyap = sl.Lyapunov(disc, v, gp, 0.25, 1.0, tau,
                       sl.LinearSystem([[0.0]]))
    lyap.initial_safe_set = np.abs(disc.all_points.squeeze()) < 0.2
    lyap.safe_set |= lyap.initial_safe_set
    lyap.update_safe_set()
    start_fraction = lyap.safe_set.mean()
    assert 0.15 < start_fraction < 0.3

    grid_pts = disc.all_points
    stds = []
    for _ in range(10):
        safe_grid = grid_pts[lyap.safe_set]
        actions = np.asarray(lyap.policy(jnp.asarray(safe_grid)))
        xu = np.hstack([safe_grid, actions])
        _, std = map(np.asarray, lyap.dynamics.evaluate(jnp.asarray(xu)))
        mid = int(np.argmax(std[:, 0]))
        stds.append(float(std[mid, 0]))
        measurement = np.asarray(true_dyn(jnp.asarray(xu[[mid]])))
        lyap.dynamics = lyap.dynamics.add_data_point(xu[[mid]],
                                                     measurement)
        lyap.update_safe_set()

    # Uncertainty at the selected points collapses and the certified set
    # never shrinks; with a stable sampled system it grows.
    assert lyap.safe_set.mean() >= start_fraction
    assert stds[-1] < 0.5 * stds[0]
    assert int(lyap.dynamics.count) == 10
    # The initial set stays certified throughout.
    assert lyap.safe_set[lyap.initial_safe_set].all()
