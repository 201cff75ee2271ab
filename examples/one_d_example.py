"""Safe policy optimization for an uncertain 1-D linear system.

Mirrors ``/root/reference/examples/1d_example.ipynb``: GP dynamics over
state-action space with a stable prior mean, a piecewise-linear policy
optimized by exact PWL dynamic programming (value solve + discrete policy
improvement over an action grid), and safe exploration that keeps the
certified safe set from shrinking while the GP learns the true dynamics
``x+ = 1.2 x + u``.

Run:  python examples/one_d_example.py [--full --plot]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from examples._common import Timer, example_args, maybe_save_plot  # noqa: E402


def main():
    args = example_args(__doc__)
    num_states = 1000 if args.full else 251
    num_actions = 101 if args.full else 51
    n_updates = 20 if args.full else 10

    state_limits = np.array([[-1.0, 1.0]])
    action_limits = np.array([[-0.5, 0.5]])
    safety_disc = sl.GridWorld(state_limits, num_states)
    action_disc = sl.GridWorld(action_limits, num_actions)
    tau = float(np.max(safety_disc.unit_maxes))
    print("Grid size: {}".format(safety_disc.nindex))

    # PWL policy on a coarser grid (notebook cell 3).
    policy_disc = sl.GridWorld(state_limits, 51)
    policy = sl.Triangulation(policy_disc, np.zeros(policy_disc.nindex),
                              project=True)

    # GP dynamics: Matern32 x Linear kernel over (x, u), stable prior mean
    # x+ = x + 0.1 u; true dynamics x+ = 1.2 x + u (notebook cell 5).
    kernel = (sl.Matern32(lengthscales=1.0, input_dim=2)
              * sl.LinearKernel(variances=[0.2, 1.0], input_dim=2))
    mean_function = sl.LinearSystem([[1.0, 0.1]])
    true_dynamics = sl.LinearSystem([[1.2, 1.0]])
    # capacity hint: the loop adds n_updates points; preallocating keeps
    # every program on one compiled shape (no retrace at 8->16->32).
    gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                            noise_variance=0.01 ** 2, beta=2.0,
                            mean_function=mean_function,
                            capacity=max(32, n_updates))
    lipschitz_dynamics = 0.8 + 0.5

    # PWL Lyapunov candidate |x| (notebook cell 7).
    lyapunov_function = sl.Triangulation(sl.GridWorld(state_limits, 3),
                                         [1.0, 0.0, 1.0])
    lyap = sl.Lyapunov(safety_disc, lyapunov_function, gp,
                       lipschitz_dynamics, 1.0, tau, policy)
    lyap.initial_safe_set = np.abs(
        safety_disc.all_points.squeeze()) < 0.05
    lyap.safe_set |= lyap.initial_safe_set
    lyap.update_safe_set()
    print("initial safe fraction: {:.3f}".format(lyap.safe_set.mean()))

    # RL problem: quadratic reward, PWL value function (notebook cell 11).
    reward = sl.QuadraticFunction(linalg.block_diag(-1.0, -1.0))
    value_function = sl.Triangulation(policy_disc,
                                      np.zeros(policy_disc.nindex),
                                      project=True)
    rl = sl.PolicyIteration(policy, gp.to_mean_function(), reward,
                            value_function)

    action_space = action_disc.all_points
    action_variation = sl.GridWorld(action_limits / 20, 11).all_points
    rng = np.random.default_rng(args.seed)

    with Timer("initial policy optimization"):
        for _ in range(3):
            rl.optimize_value_function()
            rl.discrete_policy_optimization(action_space)
        lyap.policy = rl.policy
        lyap.update_safe_set()

    def update_gp():
        """One safe active-learning step (notebook cell 15)."""
        rl.optimize_value_function()
        rl.discrete_policy_optimization(action_space)
        lyap.policy = rl.policy
        lyap.update_safe_set(can_shrink=False)
        xu, _ = sl.get_safe_sample(lyap, action_variation, action_limits,
                                   rng=rng)
        measurement = np.asarray(true_dynamics(jnp.asarray(xu)))
        new_gp = lyap.dynamics.add_data_point(xu, measurement)
        lyap.dynamics = new_gp
        rl.dynamics = new_gp.to_mean_function()

    history = []
    with Timer("online learning ({} updates)".format(n_updates)):
        for _ in range(n_updates):
            update_gp()
            history.append(lyap.safe_set.mean())

    lyap.update_safe_set(can_shrink=False)
    print("safe fraction history:",
          " ".join("{:.3f}".format(h) for h in history))
    print("c_max: {:.4f}  GP data points: {}".format(
        lyap.c_max, int(lyap.dynamics.count)))
    assert history[-1] >= history[0], "safe set must not shrink"
    assert int(lyap.dynamics.count) == n_updates

    # The optimized policy must stabilize the true system from inside the
    # safe set: x+ = 1.2 x + pi(x) with |pi| <= 0.5.
    safe_states = safety_disc.all_points[lyap.safe_set]
    x0 = np.array([[float(safe_states.max())]])
    states, _ = sl.utils.compute_trajectory(true_dynamics, rl.policy, x0,
                                            50)
    print("closed-loop from x0={:.3f}: final |x| = {:.4f}".format(
        float(x0[0, 0]), float(np.abs(states[-1]).max())))
    assert np.abs(states[-1]).max() < 0.1

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        sl.plotting.plot_lyapunov_1d(lyap, true_dynamics, legend=True)
        maybe_save_plot(args, "one_d_example")


if __name__ == "__main__":
    main()
