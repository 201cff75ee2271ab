"""The flagship safe-learning loop must WORK in float32.

Round-1 regression: the 1-D ROA active-learning loop (reference
``examples/1d_region_of_attraction_estimate.ipynb``) silently produced a
NaN hidden system in f32 and the certified set never grew. This is the
strict f32 regression test demanded by that failure: the loop runs in the
TPU-default dtype and the certified region must GROW beyond the initial
set for a stable sampled system.
"""

import jax
import jax.numpy as jnp
import numpy as np

import safe_learning_tpu as sl


def _run_loop(seed, n=201, updates=12):
    disc = sl.GridWorld([[-1.0, 1.0]], n)
    tau = 1.0 / disc.nindex
    kernel = (sl.ActiveDims(sl.Matern32(variance=0.4 ** 2,
                                        lengthscales=1.0, input_dim=1),
                            dims=[0])
              * sl.ActiveDims(sl.LinearKernel(variances=1.0, input_dim=1),
                              dims=[0]))
    gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                            noise_variance=1e-4, beta=2.0,
                            mean_function=sl.LinearSystem([[0.25, 0.0]]))
    sample_disc = np.hstack([np.linspace(-1, 1, 201)[:, None],
                             np.zeros((201, 1))])
    true_dyn = sl.sample_gp_function(sample_disc, gp,
                                     jax.random.PRNGKey(seed))[0]
    v = sl.Triangulation(sl.GridWorld([[-1.0, 1.0]], 3), [1.0, 0.0, 1.0])
    lyap = sl.Lyapunov(disc, v, gp, 0.25, 1.0, tau,
                       sl.LinearSystem([[0.0]]))
    initial = np.abs(disc.all_points.squeeze()) < 0.2
    lyap.initial_safe_set = initial
    lyap.safe_set |= initial
    lyap.update_safe_set()
    start = lyap.safe_set.mean()

    grid = disc.all_points
    actions = np.asarray(lyap.policy(jnp.asarray(grid)))
    xu_all = np.hstack([grid, actions])
    for _ in range(updates):
        _, std = map(np.asarray, lyap.dynamics.evaluate(xu_all))
        mid = int(np.argmax(np.where(lyap.safe_set, std[:, 0], -np.inf)))
        meas = np.asarray(true_dyn(jnp.asarray(xu_all[[mid]])))
        assert np.isfinite(meas).all()
        lyap.dynamics = lyap.dynamics.add_data_point(xu_all[[mid]], meas)
        lyap.update_safe_set()
    return start, lyap.safe_set.mean(), lyap


def test_flagship_loop_grows_in_f32():
    """Stable sampled system (seed 7): the certified set must grow."""
    start, end, lyap = _run_loop(seed=7)
    assert np.isfinite(lyap.c_max)
    assert end > start, (
        "f32 safe set did not grow: {} -> {}".format(start, end))
    # The initial set stays certified throughout.
    assert lyap.safe_set[lyap.initial_safe_set].all()


def test_flagship_loop_never_shrinks_below_initial():
    """Any seed: the loop must stay finite and keep the initial set."""
    start, end, lyap = _run_loop(seed=0, updates=6)
    assert np.isfinite(lyap.c_max)
    assert end >= start - 1e-9
    assert lyap.safe_set[lyap.initial_safe_set].all()
