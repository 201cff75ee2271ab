# %% [markdown]
# # Safe model-based RL on the inverted pendulum
#
# The NeurIPS-17 headline experiment (Berkenkamp, Turchetta, Schoellig,
# Krause: *Safe Model-based Reinforcement Learning with Stability
# Guarantees*): learn a neural-network policy for a pendulum whose
# model is wrong, **without ever leaving the region where stability is
# certified**. The ingredients:
#
# - GP dynamics with a wrong-parameter linearized prior mean,
# - a neural policy trained by dynamic programming with the Lyapunov
#   decrease condition as a Lagrangian penalty,
# - the negated PWL value function as the Lyapunov candidate,
# - safe exploration that only measures state-actions whose predicted
#   successor stays inside the certified level set.
#
# Mirrors the reference notebook `inverted_pendulum.ipynb`; script
# form: `examples/inverted_pendulum.py` (whose `--full` mode runs the
# 2001×1501 verification grid on the real TPU).

# %%
# %matplotlib inline
import jax
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt
from scipy import linalg

import safe_learning_tpu as sl

num_states, policy_points = [201, 151], [25, 25]
pretrain_iters, policy_iters = 600, 100
outer_iters, data_per_iter = 3, 10

# %% [markdown]
# ## True vs. wrong pendulum
#
# The "wrong" model has 2/3 of the true mass and no friction. States
# and actions are normalized so the verification domain is the unit
# box — on TPU that keeps every sweep well-conditioned in float32.

# %%
gravity, length = 9.81, 0.5
x_max = np.deg2rad(30)
u_max = gravity * 0.15 * length * np.sin(x_max)
norms = ((x_max, np.sqrt(gravity / length)), (u_max,))
true_dynamics = sl.InvertedPendulum(0.15, length, 0.1, 1 / 80,
                                    normalization=norms)
wrong_pendulum = sl.InvertedPendulum(0.1, length, 0.0, 1 / 80,
                                     normalization=norms)

q = np.diag([1.0, 2.0])
r = 1.2 * np.ones((1, 1))
gamma = 0.98
reward_function = sl.QuadraticFunction(linalg.block_diag(-q, -r))

state_limits = np.array([[-2.0, 2.0], [-1.5, 1.5]])
action_limits = np.array([[-1.0, 1.0]])
safety_disc = sl.GridWorld(state_limits, num_states)
policy_disc = sl.GridWorld(state_limits, policy_points)
tau = float(np.min(safety_disc.unit_maxes))
print("verification grid: {}  tau: {:.1e}".format(safety_disc.nindex,
                                                  tau))

# %% [markdown]
# ## GP dynamics around the wrong linearization
#
# Per-dimension GPs whose prior variances are sized by the gap between
# the true and wrong linearizations, batched as a
# `StackedGaussianProcess`: all output dimensions run through ONE
# fused TPU predict per sweep (identical results to a `FunctionStack`
# of per-member GPs — tested in `tests/test_gp.py`).

# %%
a, b = map(np.asarray, wrong_pendulum.linearize())
a_true, b_true = map(np.asarray, true_dynamics.linearize())
variances = np.clip((np.hstack([a_true, b_true])
                     - np.hstack([a, b])) ** 2, 1e-5, None)
kernels, means = [], []
for dim in range(2):
    kernels.append(
        sl.LinearKernel(variances=variances[dim], input_dim=3)
        + sl.ActiveDims(sl.Matern32(lengthscales=1.0, input_dim=1),
                        dims=[0])
        * sl.ActiveDims(sl.LinearKernel(variances=variances[dim, 1],
                                        input_dim=1), dims=[0]))
    means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
dynamics = sl.StackedGaussianProcess(
    kernels, np.empty((0, 3)), np.empty((0, 2)),
    noise_variances=0.001 ** 2, betas=2.0, mean_functions=means,
    capacity=max(64, outer_iters * data_per_iter))

# %% [markdown]
# ## Policy, value function, and pre-training
#
# The neural policy starts from the LQR solution of the *wrong* model:
# `optimize_policy` runs the whole pretrain as one compiled scan.

# %%
k, s = sl.utils.dlqr(a, b, q, r)
init_policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
init_lyapunov = sl.QuadraticFunction(s)

policy = sl.NeuralNetwork(
    layers=[2, 32, 32, 1], nonlinearities=["relu", "relu", "tanh"],
    output_scale=float(action_limits[0, 1]), key=jax.random.PRNGKey(0))
value_function = sl.Triangulation(
    policy_disc,
    -np.asarray(init_lyapunov(policy_disc.all_points)).ravel(),
    project=True)

rl = sl.PolicyIteration(policy, dynamics, reward_function,
                        value_function, gamma=gamma)
key = jax.random.PRNGKey(0)
key, sub = jax.random.split(key)
rl.optimize_policy(steps=pretrain_iters, learning_rate=0.1,
                   batch_size=1000, key=sub, sample_space=policy_disc)

# %% [markdown]
# ## The Lyapunov candidate is the (negated) value function
#
# Dynamic programming already builds a function that *decreases* along
# optimal trajectories — so $v = -V$ is the natural Lyapunov
# candidate, and its PWL gradient gives a local (state-dependent)
# Lipschitz constant via `GradientNorm`.

# %%
def lipschitz_dynamics_const():
    lip_pol = float(np.asarray(rl.policy.lipschitz()))
    return float(np.max(np.abs(a_true))
                 + np.max(np.abs(b_true)) * lip_pol)

lyap = sl.Lyapunov(safety_disc, -rl.value_function, dynamics,
                   lipschitz_dynamics_const(),
                   sl.GradientNorm(rl.value_function, ord=np.inf),
                   tau, rl.policy)
init_values = np.asarray(init_lyapunov(safety_disc.all_points)).ravel()
lyap.initial_safe_set = init_values <= np.max(init_values) * 0.005
lyap.safe_set |= lyap.initial_safe_set
lyap.update_safe_set()
print("initial safe fraction: {:.3f}  c_max: {:.4f}".format(
    lyap.safe_set.mean(), lyap.c_max))

# %% [markdown]
# ## Safe policy optimization
#
# `optimize_policy(..., lyapunov=lyap, lagrange_multiplier=1.0)` adds
# the decrease-condition violation as a penalty to the DP objective —
# the policy is pushed to make the certified region *grow*. After each
# optimization the Lyapunov pieces are refreshed from the new value
# function and the grid re-verified.

# %%
def rl_optimize_policy(num_iter):
    global key
    rl.optimize_value_function()
    lyap.lyapunov_function = -rl.value_function
    lyap._lipschitz_lyapunov = sl.GradientNorm(rl.value_function,
                                               ord=np.inf)
    lyap._lipschitz_dynamics = lipschitz_dynamics_const()
    key, sub = jax.random.split(key)
    rl.optimize_policy(steps=num_iter, learning_rate=0.01,
                       batch_size=1000, key=sub, lyapunov=lyap,
                       lagrange_multiplier=1.0,
                       sample_space=safety_disc)
    lyap.policy = rl.policy

action_variation = np.array([[-0.02], [0.0], [0.02]])
rng = np.random.default_rng(0)

def update_gp():
    xu, _ = sl.get_safe_sample(lyap, action_variation, action_limits,
                               num_samples=1000, rng=rng)
    measurement = np.asarray(true_dynamics(
        jnp.asarray(xu[:, :2]), jnp.asarray(xu[:, 2:])))
    new_dyn = lyap.dynamics.add_data_point(xu, measurement)
    lyap.dynamics = new_dyn
    rl.dynamics = new_dyn

rl_optimize_policy(policy_iters)
rl_optimize_policy(policy_iters)
lyap.update_values()
lyap.update_safe_set()
print("after policy opt: safe fraction {:.3f}  c_max {:.4f}".format(
    lyap.safe_set.mean(), lyap.c_max))

history = [lyap.safe_set.mean()]
for it in range(outer_iters):
    for _ in range(data_per_iter):
        update_gp()
    rl_optimize_policy(policy_iters)
    lyap.update_values()
    lyap.update_safe_set()
    history.append(lyap.safe_set.mean())
    print("iteration {}: safe fraction {:.3f}  c_max {:.4f}  data {}"
          .format(it + 1, history[-1], lyap.c_max,
                  int(lyap.dynamics.count)))

# %% [markdown]
# ## Old vs. new policy on the true plant
#
# The learned policy should beat the initial LQR-of-the-wrong-model
# both in accumulated reward and in stabilization.

# %%
x0 = np.array([[1.0, -0.5]])
states_new, actions_new = sl.utils.compute_trajectory(
    true_dynamics, rl.policy, x0, 100)
states_old, actions_old = sl.utils.compute_trajectory(
    true_dynamics, init_policy, x0, 100)
reward_old = float(np.sum(np.asarray(reward_function(
    jnp.asarray(states_old[:-1]), jnp.asarray(actions_old)))))
reward_new = float(np.sum(np.asarray(reward_function(
    jnp.asarray(states_new[:-1]), jnp.asarray(actions_new)))))
print("total reward old: {:.3f}   new: {:.3f}".format(reward_old,
                                                      reward_new))
print("final state norm (new policy): {:.4f}".format(
    float(np.linalg.norm(states_new[-1]))))

# %%
fig, axes = plt.subplots(1, 2, figsize=(10, 4))
axes[0].imshow(lyap.safe_set.reshape(safety_disc.shape).T,
               origin="lower", extent=state_limits.ravel(),
               aspect="auto")
x_data = lyap.dynamics.X
axes[0].plot(x_data[:, 0], x_data[:, 1], "rx", ms=4)
axes[0].set_title("certified safe set + measurements")
t = np.arange(len(states_new)) * true_dynamics.dt
axes[1].plot(t, states_new[:, 0], label="learned policy")
axes[1].plot(t, states_old[:, 0], label="initial (wrong-model LQR)")
axes[1].set_xlabel("time [s]")
axes[1].set_ylabel("angle (normalized)")
axes[1].legend()
plt.tight_layout()

# %% [markdown]
# Every red cross — every interaction with the true plant — lies
# inside the certified region: the agent improved its policy without
# once risking instability. That is the paper's claim, reproduced
# end-to-end.
