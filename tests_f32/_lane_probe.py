"""Cross-lane probe: sample a hidden system and certify a 1-D ROA.

Run as a subprocess by ``test_f32_sampling.py`` once per dtype lane
(``--x64`` toggles float64). Builds the SAME instance from
f32-representable constants in both lanes, draws the hidden dynamics
with ``sample_gp_function`` (key 0), runs one certification sweep, and
prints a JSON line with the sampled values and certified results so the
parent test can assert the two lanes drew the same system and certified
matching trajectories.
"""

import json
import os
import sys

x64 = "--x64" in sys.argv
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1" if x64 else "0"

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", x64)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402


def main():
    """Sample, certify, and print the lane's results as one JSON line."""
    # Everything f32-representable so the f64 island sees identical
    # inputs in both lanes (0.875 = 7/8, 0.0625 = 2**-4, ...).
    grid = sl.GridWorld([[-1.0, 1.0]], 1001)
    # Prior-only GP (no data): mean = stable linear model, uncertainty
    # from a composite kernel over (state, action) vanishing at 0.
    a = np.array([[0.875]])
    b = np.array([[0.5]])
    mean_fn = sl.LinearSystem([a, b])
    kernel = (sl.Matern32(0.00390625, [0.5, 0.5], input_dim=2)
              * sl.LinearKernel([1.0, 1.0], input_dim=2))
    gp = sl.GaussianProcess(kernel, np.zeros((0, 2)), np.zeros((0, 1)),
                            noise_variance=0.0009765625,
                            mean_function=mean_fn, capacity=8)

    sample_grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], [251, 9])
    fn = sl.sample_gp_function(sample_grid, gp, jax.random.PRNGKey(0))[0]

    probe = np.linspace(-1.0, 1.0, 101)[:, None].astype(np.float64)
    probe_sa = np.column_stack([probe, -0.25 * probe])
    hidden_vals = np.asarray(fn(probe_sa), dtype=np.float64).ravel()

    policy = sl.LinearSystem(-np.array([[0.25]]))
    v = sl.QuadraticFunction(np.array([[1.0]]))
    vals = np.sum(grid.all_points_f64 ** 2, axis=1)
    initial = np.where(vals <= 0.0625)[0]
    lyap = sl.Lyapunov(grid, v, fn, 1.0, 2.0,
                       float(grid.unit_maxes[0]), policy,
                       initial_set=initial)
    lyap.update_safe_set()

    print(json.dumps({
        "x64": x64,
        "hidden": hidden_vals.tolist(),
        "safe_frac": float(lyap.safe_set.mean()),
        "c_max": float(lyap.c_max),
    }))


if __name__ == "__main__":
    main()
