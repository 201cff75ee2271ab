"""Dynamic programming with piecewise-linear value function and policy.

Mirrors ``/root/reference/examples/basic_dynamic_programming.ipynb``:
mountain car with a PWL value function solved exactly (the reference's
cvxpy LP is an on-device fixed-point iteration here) and a saturated PWL
policy improved by gradient ascent on the one-step lookahead values.

Run:  python examples/basic_dynamic_programming.py [--full --plot]
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from examples._common import Timer, example_args, maybe_save_plot  # noqa: E402


def main():
    args = example_args(__doc__)
    n_points = [20, 20] if not args.full else [30, 30]
    domain = [[-1.2, 0.7], [-0.07, 0.07]]
    gamma = 0.99
    terminal_reward = 1 - gamma

    discretization = sl.GridWorld(domain, n_points)
    value_function = sl.Triangulation(discretization,
                                      np.zeros(discretization.nindex),
                                      project=True)
    policy_tri = sl.Triangulation(discretization,
                                  np.zeros(discretization.nindex),
                                  project=True)
    policy = sl.Saturation(policy_tri, -1.0, 1.0)

    def dynamics_fn(xu):
        """Mountain-car update (notebook cell 2)."""
        x0 = xu[:, 0] + xu[:, 1]
        x1 = (xu[:, 1] + 0.001 * xu[:, 2]
              - 0.0025 * jnp.cos(3 * xu[:, 0]))
        return jnp.stack((x0, x1), axis=1)

    def reward_fn(xu):
        """Terminal reward beyond the goal position x > 0.6."""
        return jnp.where(xu[:, :1] > 0.6, terminal_reward, 0.0)

    dynamics = sl.LambdaFunction(dynamics_fn, input_dim=3, output_dim=2)
    reward = sl.LambdaFunction(reward_fn, input_dim=3, output_dim=1)

    rl = sl.PolicyIteration(policy, dynamics, reward, value_function,
                            gamma=gamma)

    # The WHOLE policy iteration — every exact PWL value solve, every
    # 200-step policy-ascent round, and the convergence test — is ONE
    # compiled device program (the notebook runs one session.run per
    # SGD step and syncs the convergence check on the host each round).
    with Timer("policy iteration"):
        info = rl.policy_iteration(outer_iters=30, ascent_steps=200,
                                   learning_rate=1.0,
                                   convergence_tol=1e-1)

    print("{} after {} iterations (value change {:.3g}, policy change "
          "{:.3g})".format(
              "converged" if info["converged"] else "didn't converge",
              info["iterations"], info["value_change"],
              info["policy_change"]))

    # Closed-loop rollout from x0 = (-0.5, 0): must reach the goal.
    traj = [np.array([[-0.5, 0.0]])]
    for _ in range(999):
        state = jnp.asarray(traj[-1])
        nxt = np.asarray(dynamics(state, rl.policy(state)))
        traj.append(nxt)
        if nxt[0, 0] >= 0.6:
            break
    traj = np.concatenate(traj, axis=0)
    reached = traj[-1, 0] >= 0.6
    print("trajectory: {} steps, final x = {:.3f}, reached goal: {}".format(
        len(traj), traj[-1, 0], reached))
    assert reached, "learned policy should drive the car up the mountain"

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ax, _ = sl.plotting.plot_triangulation_2d(rl.value_function)
        ax.plot(traj[:, 0], traj[:, 1], lw=2, color="k")
        ax.axvline(0.6, color="r")
        plt.xlabel("position")
        plt.ylabel("velocity")
        maybe_save_plot(args, "basic_dynamic_programming")


if __name__ == "__main__":
    main()
