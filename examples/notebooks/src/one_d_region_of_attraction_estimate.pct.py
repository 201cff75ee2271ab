# %% [markdown]
# # Safely estimating the region of attraction of a 1-D system
#
# This notebook walks through the core safe-learning loop of the
# framework on the simplest possible instance: a one-dimensional
# uncertain system with a fixed policy. We model the closed-loop
# dynamics with a Gaussian process, certify a region of attraction
# (ROA) from the GP's confidence bounds, and *actively learn*: we only
# ever measure the system at states already proven safe, and each
# measurement shrinks the GP's uncertainty so the certified region
# grows.
#
# It mirrors the reference notebook
# `1d_region_of_attraction_estimate.ipynb` (befelix/safe_learning);
# the runnable script form with full-scale sizes lives at
# `examples/one_d_region_of_attraction_estimate.py`.
#
# **The system.** Discrete-time, scalar:
#
# $$x_{t+1} = f(x_t) = 0.25\,x_t + g(x_t),$$
#
# where $g$ is unknown. We place a GP prior on $f$ with mean
# $0.25\,x$ and a Matérn-3/2 × linear kernel (the linear factor pins
# the origin: draws satisfy $f(0)=0$, so the equilibrium is known).
#
# **The certificate.** With Lyapunov candidate $v(x)=|x|$ and
# discretization constant $\tau$, a state is verified when the GP's
# upper confidence bound on $v(f(x)) - v(x)$ is below
# $-L \tau$ — then the decrease condition holds *between* grid points
# too, and the largest sub-level set of $v$ inside the verified region
# is an ROA (Berkenkamp et al., NeurIPS 2017).

# %%
# %matplotlib inline
import jax
import numpy as np
import matplotlib.pyplot as plt

import safe_learning_tpu as sl

num_states = 501       # verification grid (the script's --full uses 1001)
n_updates = 20
discretization = sl.GridWorld([[-1.0, 1.0]], num_states)
tau = 1.0 / discretization.nindex
print("grid:", discretization.nindex, "points, tau =", tau)

# %% [markdown]
# ## The GP prior over the closed-loop dynamics
#
# Inputs are state-action pairs $(x, u)$; the policy here is fixed at
# $u \equiv 0$, so the action column only matters for API symmetry
# with the later notebooks. `ActiveDims` restricts each kernel factor
# to the state column.

# %%
kernel = (sl.ActiveDims(sl.Matern32(variance=0.4 ** 2, lengthscales=1.0,
                                    input_dim=1), dims=[0])
          * sl.ActiveDims(sl.LinearKernel(variances=1.0, input_dim=1),
                          dims=[0]))
mean_function = sl.LinearSystem([[0.25, 0.0]])
noise_var = 0.01 ** 2

# capacity= preallocates the data buffers: every jitted program keeps
# one compiled shape for the whole run instead of retracing at each
# append (XLA compiles static shapes).
gp = sl.GaussianProcess(kernel, np.empty((0, 2)), np.empty((0, 1)),
                        noise_variance=noise_var, beta=2.0,
                        mean_function=mean_function,
                        capacity=max(32, n_updates))

# %% [markdown]
# ## A hidden "true" system
#
# We draw one sample from the prior and treat it as the real plant.
# `sample_gp_function` draws in a float64 island with a
# lane-independent spectral cut, so the same seed gives the same
# hidden system in float32 (TPU) and float64 (CPU) sessions.

# %%
key = jax.random.PRNGKey(0)
sample_disc = np.hstack([np.linspace(-1, 1, 201)[:, None],
                         np.zeros((201, 1))])
true_dynamics = sl.sample_gp_function(sample_disc, gp, key)[0]

xs_plot = np.linspace(-1, 1, 201)[:, None]
xu_plot = np.hstack([xs_plot, np.zeros_like(xs_plot)])
plt.figure(figsize=(6, 3))
plt.plot(xs_plot, np.asarray(true_dynamics(xu_plot)), label="true $f$")
plt.plot(xs_plot, 0.25 * xs_plot, "--", label="prior mean $0.25x$")
plt.plot(xs_plot, xs_plot, ":", color="gray", label="$x_{t+1}=x_t$")
plt.xlabel("$x$"); plt.ylabel("$f(x)$"); plt.legend(); plt.tight_layout()

# %% [markdown]
# ## The Lyapunov object
#
# `Triangulation` over a 3-point grid with parameters `[1, 0, 1]` is
# exactly $v(x) = |x|$ as a piecewise-linear function. The `Lyapunov`
# object owns the verification state: the grid, the candidate, the
# (uncertain) dynamics, the Lipschitz constants, and the certified
# safe set.

# %%
lyapunov_function = sl.Triangulation(sl.GridWorld([[-1.0, 1.0]], 3),
                                     [1.0, 0.0, 1.0])
policy = sl.LinearSystem([[0.0]])
lyap = sl.Lyapunov(discretization, lyapunov_function, gp,
                   lipschitz_dynamics=0.25, lipschitz_lyapunov=1.0,
                   tau=tau, policy=policy)

initial = np.abs(discretization.all_points.squeeze()) < 0.2
lyap.initial_safe_set = initial
lyap.safe_set |= initial
lyap.update_safe_set()
print("initial safe fraction: {:.3f}".format(lyap.safe_set.mean()))

# %% [markdown]
# ## The active-learning loop
#
# Each iteration measures the true system at the *most uncertain state
# that is currently certified safe* — learning where it helps most
# while never leaving the proven region — then re-runs the whole-grid
# verification sweep. On TPU that sweep is a single fused device
# program (GP predict + decrease check + certified-level reduction);
# here it runs on CPU at quick sizes through exactly the same code.

# %%
grid_pts = discretization.all_points
actions_all = np.asarray(lyap.policy(grid_pts))
xu_all = np.hstack([grid_pts, actions_all])

fractions = []
for _ in range(n_updates):
    _, std = lyap.dynamics.evaluate(xu_all)
    std = np.asarray(std)[:, 0]
    max_id = int(np.argmax(np.where(lyap.safe_set, std, -np.inf)))
    arg = xu_all[[max_id]]
    measurement = np.asarray(true_dynamics(arg))
    lyap.dynamics = lyap.dynamics.add_data_point(arg, measurement)
    lyap.update_safe_set()
    fractions.append(lyap.safe_set.mean())

print("safe fraction:",
      " ".join("{:.3f}".format(f) for f in fractions))
print("certified level c_max = {:.4f}".format(lyap.c_max))

# %% [markdown]
# The certified region grows monotonically as measurements accumulate:
# the GP's confidence bound on the decrease tightens, more states pass
# the margin-guarded check, and the largest certified sub-level set
# expands. At full scale (`--full` in the script form) the loop
# certifies the entire stable domain.

# %%
plt.figure(figsize=(6, 3))
plt.plot(np.arange(1, len(fractions) + 1), fractions, "o-")
plt.xlabel("measurements"); plt.ylabel("certified safe fraction")
plt.tight_layout()

# %%
sl.plotting.plot_lyapunov_1d(lyap, true_dynamics, legend=True)
plt.tight_layout()

# %% [markdown]
# ## Notes on the TPU-first design
#
# - The verification sweep batches the *whole grid* into one fused
#   device program; there is no per-point Python. The certified level
#   is an $O(n)$ masked reduction, not a sorted early-exit loop.
# - In float32 (the TPU-native dtype) every certificate comparison is
#   margin-guarded (`config.certificate_margin`) so the float32 safe
#   set is provably a *subset* of the exact-arithmetic one — see
#   `docs/performance.md` and `tests_f32/test_f32_certificate.py`.
# - `GaussianProcess.add_data_point` is functional (returns a new GP
#   with updated Cholesky caches, appended in $O(n^2)$) — state lives
#   in pytrees, not a global graph.

# %% [markdown]
# ## Rigor modes (round 5)
#
# The same loop runs with *certified-arithmetic* sweeps: the script
# form accepts `--extended` (double-word float32 pipeline with a
# DERIVED conservative margin — usable even when the plain-f32 bound
# exceeds the threshold) and `--hybrid` (the band-filtered two-pass
# sweep: a plain f32 pass decides every unambiguous point and only the
# ambiguity band re-runs in double words — the identical certificate
# at near-plain cost; `docs/performance.md` records the measured
# tiers). Below: the derived extended margin for the current posterior,
# and the hybrid sweep reproducing the extended certificate exactly.

# %%
from safe_learning_tpu.ops.extended_verify import (
    extended_certificate_margin)

margin_ext = extended_certificate_margin(lyap)
print("derived extended margin: {:.3e}".format(margin_ext))
lyap.update_safe_set(extended=True)
safe_ext, c_ext = np.array(lyap.safe_set), lyap.c_max

lyap.safe_set = np.zeros(discretization.nindex, dtype=bool)
lyap.safe_set |= lyap.initial_safe_set
lyap.update_safe_set(extended="hybrid")
print("hybrid == extended:",
      bool((np.array(lyap.safe_set) == safe_ext).all()
           and lyap.c_max == c_ext),
      " band fraction: {:.4f}".format(lyap.last_band_fraction))

# %% [markdown]
# ## Inspecting the compiled program
#
# `profiling.show_program` renders what the compiler made of a traced
# function — the jaxpr, the optimized HLO, and XLA's cost analysis —
# inline in the notebook (the TPU-idiomatic counterpart of the
# reference's TensorBoard `show_graph` iframe).

# %%
from safe_learning_tpu import profiling

program = profiling.show_program(
    lambda pts: lyap.lyapunov_function(pts).sum(),
    jax.numpy.asarray(discretization.all_points))
program
