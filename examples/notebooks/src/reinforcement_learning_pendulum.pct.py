# %% [markdown]
# # Approximate policy iteration on the inverted pendulum
#
# Neural-network actor-critic on the torque-limited pendulum: TD(0)
# policy evaluation with a stop-gradient target, policy improvement on
# the one-step lookahead, starting from the LQR solution. The learned
# policy is compared to LQR by *region of attraction* — the set of
# states from which the closed loop actually returns to the origin.
#
# Mirrors the reference notebook
# `reinforcement_learning_pendulum.ipynb`; script form:
# `examples/reinforcement_learning_pendulum.py`. One documented
# deviation (also in the script): $\gamma = 0.995$ instead of the
# notebook's $0.965$ — at $dt = 0.01$ the notebook's discount gives a
# 0.2 s effective horizon, for which weak torque is genuinely the
# discounted optimum; the longer horizon makes the discounted optimum
# a stabilizing policy.

# %%
# %matplotlib inline
import jax
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt
from scipy.linalg import block_diag

import safe_learning_tpu as sl
from examples._common import make_actor_critic_scan

num_states = 51
eval_iters, joint_iters, value_iters, policy_iters = 300, 150, 50, 10
roa_horizon, roa_tol = 400, 0.1

dt, g = 0.01, 9.81
m, length, friction = 0.15, 0.5, 0.1
theta_max, omega_max = np.deg2rad(180), np.deg2rad(360)
u_max = g * m * length * np.sin(np.deg2rad(60))
norms = ((theta_max, omega_max), (u_max,))
pendulum = sl.InvertedPendulum(m, length, friction, dt,
                               normalization=norms)
a, b = map(np.asarray, pendulum.linearize())

q = 0.1 * np.eye(2)
r = 0.1 * np.eye(1)
gamma = 0.995
reward_function = sl.QuadraticFunction(block_diag(-q, -r))
r_max = float((np.ones((1, 2)) @ q @ np.ones((2, 1))
               + np.ones((1, 1)) @ r @ np.ones((1, 1))).item())

k, _ = sl.utils.dlqr(a, b, q, r)
policy_lqr = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)

# %% [markdown]
# ## Networks
#
# The policy network has no biases (so $\pi(0) = 0$ — the origin
# stays an equilibrium) and a tanh output scaled to the torque limit.

# %%
key = jax.random.PRNGKey(0)
key, k1, k2 = jax.random.split(key, 3)
policy = sl.NeuralNetwork([2, 64, 64, 1], ["relu", "relu", "tanh"],
                          use_bias=False, key=k1)
value_function = sl.NeuralNetwork([2, 64, 64, 1],
                                  ["relu", "relu", None], key=k2)

# %% [markdown]
# ## Stage 1: evaluate the LQR policy
#
# TD(0) with a stop-gradient target, random minibatches of states.
# The whole loop — sampling included — is ONE compiled `lax.scan`
# (the reference runs one `session.run` per TD step).

# %%
def _sample(k, n=100):
    return jax.random.uniform(k, (n, 2), minval=-1.0, maxval=1.0)

def eval_step_lqr(vf, states):
    actions = policy_lqr(states)
    rewards = reward_function(states, actions)
    future = pendulum(states, actions)

    def loss(p):
        v = value_function.with_parameters(p)
        target = jax.lax.stop_gradient(rewards + gamma * v(future))
        return jnp.mean(jnp.abs(v(states) - target)) / r_max

    return jax.tree_util.tree_map(lambda w, grad: w - 0.005 * grad,
                                  vf, jax.grad(loss)(vf))

@jax.jit
def eval_scan(vf, key):
    def body(carry, _):
        vf, k = carry
        k, k_batch = jax.random.split(k)
        return (eval_step_lqr(vf, _sample(k_batch)), k), None

    (vf, _), _ = jax.lax.scan(body, (vf, key), None, length=eval_iters)
    return vf

key, sub = jax.random.split(key)
value_function = value_function.with_parameters(
    jax.block_until_ready(eval_scan(value_function.parameters_dict, sub)))

# %% [markdown]
# ## Ground truth: ROA and discounted returns by rollout
#
# `compute_roa` forward-simulates every grid point under the closed
# loop as a whole-grid `lax.scan`; `reward_rollout` accumulates the
# discounted rewards the same way. Together they give the true value
# function to validate the TD fit against.

# %%
grid = sl.GridWorld([[-1.0, 1.0]] * 2, num_states)

@jax.jit
def closed_loop_lqr(x):
    return pendulum(x, policy_lqr(x))

roa = sl.compute_roa(grid, closed_loop_lqr, horizon=roa_horizon,
                     tol=roa_tol)
true_values = sl.reward_rollout(
    grid, closed_loop_lqr,
    lambda x: reward_function(x, policy_lqr(x)), gamma,
    horizon=roa_horizon)
value_err = np.mean(np.abs(
    np.asarray(value_function(grid.all_points)).ravel()
    - np.asarray(true_values).ravel())) / r_max
print("LQR ROA fraction: {:.3f}   TD value fit error: {:.3f}".format(
    roa.mean(), value_err))

# %% [markdown]
# ## Stage 2: joint actor-critic
#
# Alternating blocks of TD value steps and policy-gradient ascent on
# the one-step lookahead, with on-device minibatch sampling and
# global-norm gradient clipping — all `joint_iters` iterations in one
# compiled program (`make_actor_critic_scan` in
# `examples/_common.py`, shared with the cart-pole notebook).

# %%
actor_critic_scan = make_actor_critic_scan(
    policy, value_function, pendulum, reward_function, gamma, r_max,
    state_dim=2, value_iters=value_iters, policy_iters=policy_iters,
    joint_iters=joint_iters)

key, sub = jax.random.split(key)
pol_params, vf_params = jax.block_until_ready(actor_critic_scan(
    policy.parameters_dict, value_function.parameters_dict, sub))
policy = policy.with_parameters(pol_params)
value_function = value_function.with_parameters(vf_params)

# %% [markdown]
# ## Compare regions of attraction

# %%
@jax.jit
def closed_loop_new(x):
    return pendulum(x, policy(x))

new_roa = sl.compute_roa(grid, closed_loop_new, horizon=roa_horizon,
                         tol=roa_tol)
print("learned-policy ROA fraction: {:.3f} (LQR: {:.3f})".format(
    new_roa.mean(), roa.mean()))

states_new, _ = sl.utils.compute_trajectory(
    pendulum, policy, np.array([[0.15, 0.0]]), 600)
print("final state norm (learned policy): {:.4f}".format(
    float(np.linalg.norm(states_new[-1]))))

# %%
z = roa.reshape(grid.shape).astype(int) \
    + new_roa.reshape(grid.shape).astype(int)
plt.figure(figsize=(5, 4))
plt.imshow(z.T, origin="lower", extent=[-1, 1, -1, 1])
plt.colorbar(label="ROA overlap (2 = both policies)")
plt.xlabel(r"$\theta$ (normalized)")
plt.ylabel(r"$\omega$ (normalized)")
plt.tight_layout()

# %% [markdown]
# At full scale (`--full` in the script form, 101² grid, horizon 600,
# run on a v5e TPU chip) the 44k-step joint training completes in
# ~2.7 s as one scan dispatch, and the learned policy's ROA matches
# LQR's while stabilizing exactly.
