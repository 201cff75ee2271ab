# %% [markdown]
# # Safe policy optimization for an uncertain 1-D system
#
# The previous notebook *verified* a fixed policy. Here the policy is
# *learned* at the same time: a piecewise-linear (PWL) policy is
# optimized by exact dynamic programming on the GP's mean dynamics,
# while safe exploration keeps the certified safe set from shrinking
# as the GP learns the true plant $x_{t+1} = 1.2\,x_t + u_t$ — an
# unstable system that the prior mean ($x_{t+1} = x_t + 0.1 u_t$)
# does not reveal.
#
# Mirrors the reference notebook `1d_example.ipynb`; script form:
# `examples/one_d_example.py`.

# %%
# %matplotlib inline
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt
from scipy import linalg

import safe_learning_tpu as sl

num_states, num_actions, n_updates = 251, 51, 10
state_limits = np.array([[-1.0, 1.0]])
action_limits = np.array([[-0.5, 0.5]])
safety_disc = sl.GridWorld(state_limits, num_states)
action_disc = sl.GridWorld(action_limits, num_actions)
tau = float(np.max(safety_disc.unit_maxes))
print("verification grid:", safety_disc.nindex, " action grid:",
      action_disc.nindex)

# %% [markdown]
# ## Policy, GP dynamics, Lyapunov candidate
#
# The policy is a `Triangulation` — a PWL interpolant whose parameters
# are its values at the grid vertices, differentiable in both inputs
# and parameters (here via Kuhn-triangulation simplex location done
# with in-graph integer math, not a host call). The GP prior over
# $(x, u)$ combines a Matérn-3/2 kernel with a linear one, with a
# *stable* prior mean; the true plant is unstable, so everything the
# policy learns about instability comes from safely collected data.

# %%
policy_disc = sl.GridWorld(state_limits, 51)
policy = sl.Triangulation(policy_disc, np.zeros(policy_disc.nindex),
                          project=True)

kernel = (sl.Matern32(lengthscales=1.0, input_dim=2)
          * sl.LinearKernel(variances=[0.2, 1.0], input_dim=2))
mean_function = sl.LinearSystem([[1.0, 0.1]])
true_dynamics = sl.LinearSystem([[1.2, 1.0]])
gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                        noise_variance=0.01 ** 2, beta=2.0,
                        mean_function=mean_function,
                        capacity=max(32, n_updates))
lipschitz_dynamics = 0.8 + 0.5

lyapunov_function = sl.Triangulation(sl.GridWorld(state_limits, 3),
                                     [1.0, 0.0, 1.0])
lyap = sl.Lyapunov(safety_disc, lyapunov_function, gp,
                   lipschitz_dynamics, 1.0, tau, policy)
lyap.initial_safe_set = np.abs(safety_disc.all_points.squeeze()) < 0.05
lyap.safe_set |= lyap.initial_safe_set
lyap.update_safe_set()
print("initial safe fraction: {:.3f}".format(lyap.safe_set.mean()))

# %% [markdown]
# ## The RL problem
#
# Quadratic reward $-x^2 - u^2$, PWL value function. `PolicyIteration`
# solves the PWL Bellman equation *exactly*: because the value
# function is linear in its parameters, policy evaluation is a linear
# fixed point, computed on-device by contraction iteration (the
# reference solves the same system with a cvxpy LP on the host).
# Policy improvement is a vmapped discrete argmax over the action
# grid.

# %%
reward = sl.QuadraticFunction(linalg.block_diag(-1.0, -1.0))
value_function = sl.Triangulation(policy_disc,
                                  np.zeros(policy_disc.nindex),
                                  project=True)
rl = sl.PolicyIteration(policy, gp.to_mean_function(), reward,
                        value_function)

action_space = action_disc.all_points
action_variation = sl.GridWorld(action_limits / 20, 11).all_points
rng = np.random.default_rng(0)

for _ in range(3):
    rl.optimize_value_function()
    rl.discrete_policy_optimization(action_space)
lyap.policy = rl.policy
lyap.update_safe_set()
print("after initial optimization: safe fraction {:.3f}".format(
    lyap.safe_set.mean()))

# %% [markdown]
# ## Safe learning loop
#
# Each round: re-optimize the policy on the current model, re-verify
# with `can_shrink=False` (monotone safe set — data never *removes*
# certified states), then measure at the state-action pair chosen by
# `get_safe_sample`: the most uncertain pair whose predicted successor
# stays inside the certified level set. On TPU the whole selection is
# one fused dispatch.

# %%
history = []
for _ in range(n_updates):
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
    history.append(lyap.safe_set.mean())

lyap.update_safe_set(can_shrink=False)
print("safe fraction history:",
      " ".join("{:.3f}".format(h) for h in history))
print("c_max: {:.4f}   GP data points: {}".format(
    lyap.c_max, int(lyap.dynamics.count)))

# %% [markdown]
# ## Does the learned policy actually stabilize the true plant?
#
# Roll out the true (unstable) dynamics under the learned policy from
# the edge of the certified region. `compute_trajectory` runs the
# whole rollout as one `lax.scan`.

# %%
safe_states = safety_disc.all_points[lyap.safe_set]
x0 = np.array([[float(safe_states.max())]])
states, _ = sl.utils.compute_trajectory(true_dynamics, rl.policy, x0, 50)
print("from x0 = {:.3f}: final |x| = {:.4f}".format(
    float(x0[0, 0]), float(np.abs(states[-1]).max())))

plt.figure(figsize=(6, 3))
plt.plot(np.asarray(states).squeeze())
plt.xlabel("step"); plt.ylabel("$x$"); plt.tight_layout()

# %%
sl.plotting.plot_lyapunov_1d(lyap, true_dynamics, legend=True)
plt.tight_layout()

# %% [markdown]
# The certified region (where the GP confidence bound proves the
# decrease condition) grows as safely collected data reveals the true
# gain, and the optimized PWL policy counteracts the instability the
# prior mean never modeled.
