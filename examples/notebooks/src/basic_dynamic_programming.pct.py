# %% [markdown]
# # Dynamic programming with piecewise-linear functions
#
# A warm-up without safety: solve the classic mountain-car problem
# with a piecewise-linear value function and policy. The point of the
# PWL class is that policy evaluation becomes *exact*: a
# `Triangulation`'s value at the next states is linear in its
# parameters, so the Bellman equation is a sparse linear system — no
# function-approximation error inside the solve.
#
# Mirrors the reference notebook `basic_dynamic_programming.ipynb`
# (which solves that linear system with a cvxpy LP on the host; here
# it is an on-device fixed-point iteration — the same unique solution,
# since the Bellman operator is a $\gamma$-contraction). Script form:
# `examples/basic_dynamic_programming.py`.

# %%
# %matplotlib inline
import jax
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt

import safe_learning_tpu as sl

n_points = [20, 20]
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

# %% [markdown]
# ## Mountain car
#
# State is (position, velocity); the engine is too weak to climb
# directly, so the optimal policy swings back first. Reward is
# terminal-only past the goal position $x > 0.6$.

# %%
def dynamics_fn(xu):
    x0 = xu[:, 0] + xu[:, 1]
    x1 = (xu[:, 1] + 0.001 * xu[:, 2]
          - 0.0025 * jnp.cos(3 * xu[:, 0]))
    return jnp.stack((x0, x1), axis=1)

def reward_fn(xu):
    return jnp.where(xu[:, :1] > 0.6, terminal_reward, 0.0)

dynamics = sl.LambdaFunction(dynamics_fn, input_dim=3, output_dim=2)
reward = sl.LambdaFunction(reward_fn, input_dim=3, output_dim=1)

rl = sl.PolicyIteration(policy, dynamics, reward, value_function,
                        gamma=gamma)

# %% [markdown]
# ## Policy iteration — one device program
#
# `PolicyIteration.policy_iteration` alternates the exact PWL value
# solve with 200-step policy-ascent rounds until both the value
# parameters and the policy outputs stop changing — and the WHOLE
# loop, convergence test included, is a single compiled device
# program (`lax.while_loop` nesting a fixed-point `while_loop` and an
# ascent `scan`). The reference pays one `session.run` per SGD step
# plus a host sync per convergence check; here the entire
# optimization is one dispatch.

# %%
info = rl.policy_iteration(outer_iters=30, ascent_steps=200,
                           learning_rate=1.0, convergence_tol=1e-1)
print("converged after {} iterations (value change {:.3g}, policy "
      "change {:.3g})".format(info["iterations"],
                              info["value_change"],
                              info["policy_change"]))

# %% [markdown]
# ## Rollout
#
# The learned policy must drive the car up the mountain from the
# valley floor.

# %%
traj = [np.array([[-0.5, 0.0]])]
for _ in range(999):
    state = jnp.asarray(traj[-1])
    nxt = np.asarray(dynamics(state, rl.policy(state)))
    traj.append(nxt)
    if nxt[0, 0] >= 0.6:
        break
traj = np.concatenate(traj, axis=0)
print("{} steps, final x = {:.3f}, reached goal: {}".format(
    len(traj), traj[-1, 0], traj[-1, 0] >= 0.6))

# %%
ax, _ = sl.plotting.plot_triangulation_2d(rl.value_function)
ax.plot(traj[:, 0], traj[:, 1], lw=2, color="k")
ax.axvline(0.6, color="r")
plt.xlabel("position"); plt.ylabel("velocity"); plt.tight_layout()

# %% [markdown]
# The value function's PWL surface shows the spiral structure of the
# swing-up: value accumulates along the back-and-forth trajectory the
# weak engine must follow (black line) before crossing the goal (red).
