"""Approximate policy iteration on the 4-D cart-pole.

Mirrors ``/root/reference/examples/reinforcement_learning_cartpole.ipynb``:
the same actor-critic machinery as the pendulum notebook, scaled to the
4-dimensional cart-pole, with ROA evaluation over a 4-D grid. ``--full``
runs the reference's exact evaluation scale — a 51^4 ~ 6.8M-point grid
with a 2000-step closed-loop horizon (notebook cells 20/24), the rollout
segmented to stay under the TPU worker's single-dispatch duration limit
— while the quick mode uses a 13^4 grid.

Run:  python examples/reinforcement_learning_cartpole.py [--full --plot]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import block_diag

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from examples._common import (Timer, example_args,  # noqa: E402
                              make_actor_critic_scan, maybe_save_plot)


def main():
    args = example_args(__doc__)
    if args.full:
        grid_points, joint_iters, value_iters, policy_iters = 51, 400, 50, 10
        roa_horizon, roa_segment = 2000, 500
    else:
        grid_points, joint_iters, value_iters, policy_iters = 13, 300, 50, 10
        roa_horizon, roa_segment = 400, None

    # Cart-pole with notebook cell 7 parameters.
    dt = 0.01
    m, cart_mass, length, rot_friction = 0.175, 1.732, 0.28, 0.01
    x_max, theta_max = 0.5, np.deg2rad(30)
    x_dot_max, theta_dot_max = 2.0, np.deg2rad(30)
    u_max = (m + cart_mass) * x_dot_max ** 2 / x_max
    norms = ((x_max, theta_max, x_dot_max, theta_dot_max), (u_max,))
    cartpole = sl.CartPole(m, cart_mass, length, rot_friction, dt,
                           normalization=norms)
    a, b = map(np.asarray, cartpole.linearize())

    q = 0.1 * np.eye(4)
    r = 0.1 * np.eye(1)
    # Same deviation as the pendulum example: longer effective horizon so
    # the discounted optimum stabilizes (notebook uses 0.965 at dt=0.01).
    gamma = 0.995
    reward_function = sl.QuadraticFunction(block_diag(-q, -r))
    r_max = 0.5

    k, _ = sl.utils.dlqr(a, b, q, r)
    policy_lqr = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    policy = sl.NeuralNetwork([4, 64, 64, 1], ["relu", "relu", "tanh"],
                              use_bias=False, key=k1)
    value_function = sl.NeuralNetwork([4, 64, 64, 1],
                                      ["relu", "relu", None],
                                      use_bias=False, key=k2)

    # Joint actor-critic via the shared one-dispatch harness
    # (examples/_common.py).
    actor_critic_scan = make_actor_critic_scan(
        policy, value_function, cartpole, reward_function, gamma, r_max,
        state_dim=4, value_iters=value_iters, policy_iters=policy_iters,
        joint_iters=joint_iters)

    with Timer("joint actor-critic ({} iterations)".format(joint_iters)):
        key, sub = jax.random.split(key)
        pol_params, vf_params = jax.block_until_ready(actor_critic_scan(
            policy.parameters_dict, value_function.parameters_dict, sub))
        policy = policy.with_parameters(pol_params)
        value_function = value_function.with_parameters(vf_params)

    # Closed-loop responses (notebook: compute_closedloop_response).
    states_new, _ = sl.utils.compute_trajectory(
        cartpole, policy, np.array([[0.2, 0.2, 0.0, 0.0]]), 800)
    states_lqr, _ = sl.utils.compute_trajectory(
        cartpole, policy_lqr, np.array([[0.2, 0.2, 0.0, 0.0]]), 800)
    final_new = float(np.linalg.norm(states_new[-1]))
    final_lqr = float(np.linalg.norm(states_lqr[-1]))
    print("final state norm from (0.2, 0.2, 0, 0): learned {:.4f}  "
          "LQR {:.4f}".format(final_new, final_lqr))
    assert final_new < 0.1, "learned policy should balance the cart-pole"

    # 4-D grid ROA comparison (notebook cells 20, 24).
    grid = sl.GridWorld([[-1.0, 1.0]] * 4, grid_points)
    print("ROA grid size: {}".format(grid.nindex))

    @jax.jit
    def closed_loop_new(x):
        return cartpole(x, policy(x))

    @jax.jit
    def closed_loop_lqr(x):
        return cartpole(x, policy_lqr(x))

    with Timer("4-D ROA sweeps"):
        new_roa = sl.compute_roa(grid, closed_loop_new,
                                 horizon=roa_horizon, tol=0.1,
                                 segment_steps=roa_segment)
        lqr_roa = sl.compute_roa(grid, closed_loop_lqr,
                                 horizon=roa_horizon, tol=0.1,
                                 segment_steps=roa_segment)
    print("learned-policy ROA fraction: {:.3f} (LQR: {:.3f})".format(
        new_roa.mean(), lqr_roa.mean()))
    assert new_roa.mean() > 0.005

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.arange(len(states_new)) * dt
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for dim, label in [(0, "cart position"), (1, "pole angle")]:
            axes[0].plot(t, states_new[:, dim], label="new " + label)
            axes[0].plot(t, states_lqr[:, dim], "--",
                         label="LQR " + label)
        axes[0].legend()
        axes[0].set_xlabel("time [s]")
        # theta-omega ROA slice at x = x_dot = 0.
        mid = grid_points // 2
        z = new_roa.reshape(grid.shape)[mid, :, mid, :]
        axes[1].imshow(z.T, origin="lower", extent=[-1, 1, -1, 1])
        axes[1].set_xlabel(r"$\theta$")
        axes[1].set_ylabel(r"$\dot\theta$")
        maybe_save_plot(args, "reinforcement_learning_cartpole")


if __name__ == "__main__":
    main()
