# %% [markdown]
# # Learning a neural-network Lyapunov function
#
# The CoRL-18 experiment (Richards, Berkenkamp, Krause: *The Lyapunov
# Neural Network*): instead of hand-picking a Lyapunov candidate, use
# a network that is **positive-definite by construction**
# ($v(x) = \|\phi(x)\|^2$ with $W_0^\top W_0 + \varepsilon I$ input
# layers) and *train* it so its certified level set fills the true
# region of attraction. The training signal is ROA classification:
# states just outside the current certified set are forward-simulated;
# those that fall back in become positive labels for a weighted
# perceptron loss with a Lagrangian decrease penalty.
#
# The learned certificate is compared against two classical baselines:
# the LQR quadratic and a degree-3 SOS (sum-of-squares) candidate.
#
# Mirrors the reference notebook `lyapunov_function_learning.ipynb`;
# script form: `examples/lyapunov_function_learning.py`.

# %%
# %matplotlib inline
import jax
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt

import safe_learning_tpu as sl
from examples.lyapunov_function_learning import _SOS_Q

num_states, outer_iters, inner_iters = 101, 16, 10
roa_horizon, gap_horizon, pretrain_iters = 300, 100, 200

# %% [markdown]
# ## Pendulum with full swing-up normalization and LQR baseline

# %%
dt, g = 0.01, 9.81
m, length, friction = 0.15, 0.5, 0.1
theta_max, omega_max = np.deg2rad(180), np.deg2rad(360)
u_max = g * m * length * np.sin(np.deg2rad(60))
norms = ((theta_max, omega_max), (u_max,))
pendulum = sl.InvertedPendulum(m, length, friction, dt,
                               normalization=norms)
a, b = map(np.asarray, pendulum.linearize())

grid = sl.GridWorld([[-1.0, 1.0]] * 2, num_states)
tau = 0.0      # zero-threshold mode: certify the *model*, no GP error
initial_safe_set = np.linalg.norm(grid.all_points, ord=2, axis=1) <= 0.1

k, p_lqr = sl.utils.dlqr(a, b, np.eye(2), np.eye(1))
policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
l_pol = np.linalg.norm(-k, 1)
l_dyn = np.linalg.norm(a, 1) + np.linalg.norm(b, 1) * l_pol

lyap_lqr = sl.Lyapunov(grid, sl.QuadraticFunction(p_lqr), pendulum,
                       l_dyn,
                       sl.GradientNorm(sl.QuadraticFunction(p_lqr),
                                       ord=1),
                       tau, policy,
                       initial_set=np.where(initial_safe_set)[0])
lyap_lqr.update_safe_set()
print("LQR baseline safe fraction: {:.3f}".format(
    lyap_lqr.safe_set.mean()))

# %% [markdown]
# ## SOS baseline
#
# A degree-3 SOS candidate (coefficients computed offline with
# SOSTOOLS for this plant), certified in continuous time:
# $\dot v = \nabla v \cdot f < 0$ along the true vector field, using
# the framework's `monomials` / `derivative_monomials` feature maps.

# %%
x_denorm = grid.all_points * np.array([theta_max, omega_max])
m_feats = np.asarray(sl.utils.monomials(x_denorm, 3))
values_sos = np.sum((m_feats @ _SOS_Q) * m_feats, axis=1)
d_feats = np.asarray(sl.utils.derivative_monomials(x_denorm, 3))
dvdx = 2.0 * np.einsum("nf,nfd->nd", m_feats @ _SOS_Q, d_feats)
u_denorm = np.asarray(policy(grid.all_points)) * u_max
f_cont = np.asarray(pendulum.ode(jnp.asarray(x_denorm),
                                 jnp.asarray(u_denorm)))
dvdt = np.sum(dvdx * f_cont, axis=1)
order = np.argsort(values_sos)
certificate = dvdt[order][1:] < 0
ordered_idx = (len(certificate) + 1 if certificate.all()
               else int(np.argmin(certificate)) + 1)
sos_safe = values_sos <= values_sos[order[ordered_idx - 1]]
print("SOS baseline safe fraction: {:.3f}".format(sos_safe.mean()))

# %% [markdown]
# ## Ground truth, and the network candidate

# %%
@jax.jit
def closed_loop(x):
    return pendulum(x, policy(x))

roa = sl.compute_roa(grid, closed_loop, horizon=roa_horizon, tol=0.1)
print("true ROA fraction: {:.3f}".format(roa.mean()))

net = sl.LyapunovNetwork(2, [64, 64, 64], ["tanh", "tanh", "tanh"],
                         eps=1e-8, key=jax.random.PRNGKey(0))

# %% [markdown]
# Pre-train the network to match a small spherical quadratic on the
# initial set (so training starts from a sane, certifiable shape);
# the whole pre-training is one compiled scan.

# %%
p_sphere = 0.1 * np.eye(2)
sphere = sl.QuadraticFunction(p_sphere)
level_states = grid.all_points[initial_safe_set]

def pretrain_step(params, states):
    target = sphere(states)

    def loss(p):
        return jnp.mean(jnp.abs(net.with_parameters(p)(states) - target))

    return jax.tree_util.tree_map(lambda w, grad: w - 0.1 * grad,
                                  params, jax.grad(loss)(params))

@jax.jit
def pretrain_scan(params, key):
    states_all = jnp.asarray(level_states)

    def body(carry, _):
        p, k = carry
        k, kb = jax.random.split(k)
        idx = jax.random.randint(kb, (1000,), 0, states_all.shape[0])
        return (pretrain_step(p, states_all[idx]), k), None

    (params, _), _ = jax.lax.scan(body, (params, key), None,
                                  length=pretrain_iters)
    return params

net = net.with_parameters(jax.block_until_ready(pretrain_scan(
    net.parameters_dict, jax.random.PRNGKey(0))))

lyap_nn = sl.Lyapunov(grid, net, pendulum, l_dyn,
                      sl.GradientNorm(net, ord=1), tau, policy,
                      initial_set=np.where(initial_safe_set)[0])
lyap_nn.update_safe_set()
print("pre-trained NN safe fraction: {:.3f} ({:.1f}% of ROA)".format(
    lyap_nn.safe_set.mean(), 100 * lyap_nn.safe_set.sum() / roa.sum()))

# %% [markdown]
# ## ROA classification training
#
# Each outer iteration: (1) forward-simulate the states in the *gap*
# between the certified level set and a 1.3× larger one; states that
# fall back in are positive labels; (2) run `inner_iters` weighted
# classifier steps (per-batch class balancing in-graph) with a
# Lagrangian penalty on decrease violations; (3) re-certify.

# %%
safe_level = 1.0

@jax.jit
def train_step(params, states, labels, weights):
    def loss(p):
        nn = net.with_parameters(p)
        values = nn(states)
        future = nn(closed_loop(states))
        class_labels = 2.0 * labels - 1.0
        decision = safe_level - values
        classifier = weights * jnp.maximum(-class_labels * decision, 0.0)
        decrease = labels * jnp.maximum(future - values, 0.0) \
            / (jax.lax.stop_gradient(values) + 1e-8)
        return jnp.mean(classifier + 1000.0 * decrease)

    return jax.tree_util.tree_map(lambda w, grad: w - 5e-3 * grad,
                                  params, jax.grad(loss)(params))

@jax.jit
def classifier_scan(params, states_all, labels_all, n_valid, key):
    def body(carry, _):
        p, k = carry
        k, kb = jax.random.split(k)
        idx = jax.random.randint(kb, (1000,), 0, n_valid)
        batch, labels = states_all[idx], labels_all[idx]
        y = labels > 0.5
        n_pos = jnp.maximum(jnp.sum(y), 1)
        n_neg = jnp.maximum(y.size - jnp.sum(y), 1)
        weights = jnp.where(y, y.size / n_pos,
                            y.size / n_neg).astype(labels.dtype)
        return (train_step(p, batch, labels, weights), k), None

    (params, _), _ = jax.lax.scan(body, (params, key), None,
                                  length=inner_iters)
    return params

key = jax.random.PRNGKey(1)
roa_estimate = np.copy(lyap_nn.safe_set)
frac_history = [lyap_nn.safe_set.mean()]
for k_out in range(outer_iters):
    c = lyap_nn.c_max
    values = lyap_nn.values.ravel()
    idx_gap = (values <= 1.3 * c) & ~(values <= c)
    gap_states = jnp.asarray(grid.all_points[idx_gap])
    if gap_states.shape[0]:
        def step(x, _):
            return closed_loop(x), None

        gap_states, _ = jax.lax.scan(step, gap_states, None,
                                     length=gap_horizon)
        roa_estimate[idx_gap] |= \
            np.asarray(net(gap_states)).ravel() <= c

    target_idx = (values <= 1.3 * c) | roa_estimate
    target_set = grid.all_points[target_idx]
    target_labels = roa_estimate[target_idx].astype(
        np.float64).reshape(-1, 1)
    n_valid = len(target_set)
    padded = 1 << max(8, (n_valid - 1).bit_length())
    if padded - n_valid:
        target_set = np.vstack([
            target_set, np.zeros((padded - n_valid, 2))])
        target_labels = np.vstack([target_labels,
                                   np.zeros((padded - n_valid, 1))])
    key, sub = jax.random.split(key)
    net = net.with_parameters(classifier_scan(
        net.parameters_dict, jnp.asarray(target_set),
        jnp.asarray(target_labels),
        jnp.asarray(n_valid, dtype=jnp.int32), sub))

    lyap_nn.lyapunov_function = net
    lyap_nn._lipschitz_lyapunov = sl.GradientNorm(net, ord=1)
    lyap_nn.update_values()
    lyap_nn.update_safe_set()
    roa_estimate |= lyap_nn.safe_set
    frac_history.append(lyap_nn.safe_set.mean())

print("safe-fraction history:",
      " ".join("{:.3f}".format(f) for f in frac_history))

# %% [markdown]
# ## The comparison

# %%
nn_vs_roa = lyap_nn.safe_set.sum() / roa.sum()
lqr_vs_roa = lyap_lqr.safe_set.sum() / roa.sum()
sos_vs_roa = sos_safe.sum() / roa.sum()
print("NN {:.1f}%  vs  LQR {:.1f}%  vs  SOS {:.1f}%  of the true ROA"
      .format(100 * nn_vs_roa, 100 * lqr_vs_roa, 100 * sos_vs_roa))

fig, ax = plt.subplots(figsize=(5, 5))
for z, color, label in [
        (roa, "green", "true ROA"),
        (lyap_nn.safe_set, "orange", "NN"),
        (lyap_lqr.safe_set, "blue", "LQR"),
        (sos_safe, "gold", "SOS")]:
    ax.contour(z.reshape(grid.shape).T, origin="lower",
               extent=[-1, 1, -1, 1], colors=color, linewidths=1.5)
    ax.plot([], [], color=color, label=label)
ax.legend(loc="upper right")
ax.set_xlabel(r"$\theta$ (normalized)")
ax.set_ylabel(r"$\omega$ (normalized)")
plt.tight_layout()

# %% [markdown]
# The learned candidate's level set hugs the true ROA far more closely
# than either fixed-form baseline — the network can bend its level
# sets around the saturation-induced non-ellipsoidal shape. At the
# script's `--full` scale (251² grid) the NN certifies ~85% of the
# true ROA vs ~70% for LQR and ~10% for the SOS candidate.
