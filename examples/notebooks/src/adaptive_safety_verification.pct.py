# %% [markdown]
# # Adaptive safety verification for the inverted pendulum
#
# Verifying at a fine uniform discretization is wasteful: the decrease
# condition is easy to certify far from the level-set boundary and
# only genuinely tight near it. This notebook verifies the pendulum on
# a coarse grid and **adaptively refines** only the cells that fail:
# a failing cell at discretization $\tau$ is re-verified on an
# $N(x)^d$ sub-grid at $\tau / N(x)$, doubling $N(x)$ until the cell
# certifies or the refinement cap is reached.
#
# Mirrors the reference notebook `adaptive_safety_verification.ipynb`;
# script form: `examples/adaptive_safety_verification.py` (whose
# `--full` mode runs the 501² grid on the real TPU).

# %%
# %matplotlib inline
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt

import safe_learning_tpu as sl

num_states, n_max = 201, 16
updates, data_per_update = 6, 10

# %% [markdown]
# ## A GP model of the pendulum with wrong physical parameters
#
# The model's prior mean is the linearization of a pendulum with the
# *wrong* mass, length, and friction; per-dimension GPs (stacked with
# `FunctionStack`) put uncertainty over the difference to the true
# plant. The kernel per output dimension is linear over $(x, u)$ plus
# a Matérn × linear correction in the angle — enough structure that
# confidence bounds shrink quickly along trajectories.

# %%
dt, g = 0.01, 9.81
m_true, length_true, b_fric_true = 0.15, 0.5, 0.1
theta_max = np.deg2rad(30)
omega_max = np.sqrt(g / length_true)
u_max = g * m_true * length_true * np.sin(theta_max)
norms = ((theta_max, omega_max), (u_max,))

true_pendulum = sl.InvertedPendulum(m_true, length_true, b_fric_true,
                                    dt, normalization=norms)
a_true, b_true = (np.asarray(m) for m in true_pendulum.linearize())
wrong = sl.InvertedPendulum(0.1, 0.4, 0.0, dt, normalization=norms)
a, b = (np.asarray(m) for m in wrong.linearize())

noise_var = 0.001 ** 2
prior_variances = np.clip((np.hstack([a_true, b_true])
                           - np.hstack([a, b])) ** 2, 1e-3, None)
kernels, means = [], []
for dim in range(2):
    kernels.append(
        sl.LinearKernel(variances=prior_variances[dim], input_dim=3)
        + sl.ActiveDims(sl.Matern32(lengthscales=1.0, input_dim=1),
                        dims=[0])
        * sl.ActiveDims(sl.LinearKernel(
            variances=prior_variances[dim, 1], input_dim=1), dims=[0]))
    means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
capacity = max(64, 1 + updates * data_per_update)
dynamics = sl.FunctionStack([
    sl.GaussianProcess(kern, np.zeros((1, 3)), np.zeros((1, 1)),
                       noise_variance=noise_var, beta=2.0,
                       mean_function=mean, capacity=capacity)
    for kern, mean in zip(kernels, means)])

# %% [markdown]
# ## LQR policy, quadratic candidate, local Lipschitz constants
#
# The Lyapunov Lipschitz constant is *state-dependent* here
# ($L_v(x) = |2 P x|$ via a `LambdaFunction`), which makes the
# threshold $-L(x)\tau$ tight where $v$ is flat and loose where it is
# steep — the information the adaptive refinement exploits.

# %%
grid = sl.GridWorld([[-1.0, 1.0]] * 2, num_states)
tau = float(np.sum(grid.unit_maxes) / 2)
initial_safe_set = np.linalg.norm(grid.all_points, ord=2, axis=1) <= 0.2

q = np.diag([1.0, 2.0])
r = 1.2 * np.identity(1)
k, p = sl.utils.dlqr(a_true, b_true, q, r)
p = p / np.abs(p).max()
policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
l_pol = np.linalg.norm(-k, 1)
l_dyn = np.linalg.norm(a_true, 1) + np.linalg.norm(b_true, 1) * l_pol
grad_v = sl.LinearSystem([2 * p])
l_v = sl.LambdaFunction(lambda x: jnp.abs(grad_v(x)),
                        input_dim=2, output_dim=2)

lyap = sl.Lyapunov(grid, sl.QuadraticFunction(p), dynamics, l_dyn,
                   l_v, tau, policy,
                   initial_set=np.where(initial_safe_set)[0],
                   adaptive=True)
print("grid:", grid.nindex, " tau: {:.2e}".format(tau))
lyap.update_safe_set(can_shrink=False, max_refinement=n_max)
print("initial certified fraction: {:.3f}".format(lyap.safe_set.mean()))

# %% [markdown]
# ## Safe active learning with adaptive re-verification
#
# Measurements are taken one at a time at the most informative safe
# state-action pair; the grid is re-verified (with refinement) only
# after each round of `data_per_update` measurements — the loop shape
# of the reference notebook. The fused k-step variant
# (`get_safe_sample_batch`) collapses a whole round into a single
# device program; see `docs/performance.md` for the measured latency
# (0.52 s per 15-sample round at the 501² scale on a v5e chip).

# %%
action_variation = np.array([[0.0]])
action_limits = np.array([[-1.0, 1.0]])
rng = np.random.default_rng(0)

history = []
for it in range(updates):
    for _ in range(data_per_update):
        xu, _ = sl.get_safe_sample(
            lyap, action_variation, action_limits, positive=True,
            num_samples=1000, rng=rng)
        measurement = np.asarray(true_pendulum(
            jnp.asarray(xu[:, :2]), jnp.asarray(xu[:, 2:])))
        lyap.dynamics = lyap.dynamics.add_data_point(xu, measurement)
    lyap.update_safe_set(can_shrink=False, max_refinement=n_max)
    history.append(lyap.safe_set.mean())
    print("round {}: safe fraction {:.3f}  c_max {:.4f}  max N(x) {}"
          .format(it + 1, history[-1], lyap.c_max,
                  int(lyap._refinement.max())))

# %% [markdown]
# ## Where did the refinement go?
#
# $N(x)$ is largest along the certified level-set boundary — exactly
# the cells where the uniform-grid margin is tightest. Everywhere else
# one coarse cell sufficed, which is why adaptive verification
# certifies the same region at a fraction of the uniform-grid cost.

# %%
refinement = np.copy(lyap._refinement).astype(float)
refinement[refinement == 0] = np.nan
plt.figure(figsize=(5, 4))
plt.imshow(refinement.reshape(grid.shape).T, origin="lower",
           extent=[-1, 1, -1, 1], cmap="viridis")
plt.colorbar(label="$N(x)$")
plt.xlabel(r"$\theta$ (normalized)")
plt.ylabel(r"$\omega$ (normalized)")
plt.tight_layout()

# %%
plt.figure(figsize=(6, 3))
plt.plot(np.arange(1, len(history) + 1), history, "o-")
plt.xlabel("measurement round"); plt.ylabel("certified safe fraction")
plt.tight_layout()
