"""Adaptive safety verification for the inverted pendulum.

Mirrors ``/root/reference/examples/adaptive_safety_verification.ipynb``:
a GP model of the pendulum with *wrong* physical parameters (linearized
prior mean + per-dimension GPs stacked with :class:`FunctionStack`), an LQR
policy with saturation, local (state-dependent) Lyapunov Lipschitz
constants, and safe active learning with an **adaptively refined** grid:
coarse cells that fail the decrease check at discretization ``tau`` are
re-verified on ``N(x)^d`` sub-grids at ``tau / N(x)``.

Run:  python examples/adaptive_safety_verification.py [--full --plot]
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from examples._common import Timer, example_args, maybe_save_plot  # noqa: E402


def pendulum_gp_model(a_true, b_true, a, b, noise_var, capacity=None,
                      stacked=False):
    """Per-dimension GPs with linearized prior mean (notebook cell 9).

    ``stacked=True`` batches them as a ``StackedGaussianProcess`` (one
    fused TPU predict per sweep) instead of the notebook's
    ``FunctionStack`` fan-out — identical results (tested).
    """
    m_true = np.hstack([a_true, b_true])
    m = np.hstack([a, b])
    prior_variances = np.clip((m_true - m) ** 2, 1e-3, None)

    kernels, means = [], []
    for dim in range(2):
        kernels.append(
            sl.LinearKernel(variances=prior_variances[dim], input_dim=3)
            + sl.ActiveDims(sl.Matern32(lengthscales=1.0, input_dim=1),
                            dims=[0])
            * sl.ActiveDims(
                sl.LinearKernel(variances=prior_variances[dim, 1],
                                input_dim=1), dims=[0]))
        means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
    if stacked:
        return sl.StackedGaussianProcess(
            kernels, np.zeros((1, 3)), np.zeros((1, 2)),
            noise_variances=[noise_var] * 2, betas=2.0,
            mean_functions=means, capacity=capacity)
    return sl.FunctionStack([
        sl.GaussianProcess(kernel, np.zeros((1, 3)), np.zeros((1, 1)),
                           noise_variance=noise_var, beta=2.0,
                           mean_function=mean, capacity=capacity)
        for kernel, mean in zip(kernels, means)])


def build_instance(num_states=501, capacity=None, stacked=False,
                   noise_var=0.001 ** 2):
    """The adaptive notebook's verification instance (cells 3-17):
    wrong-parameter GP pendulum model, LQR policy + saturation, local
    Lipschitz constants, adaptive Lyapunov object.

    Returns ``(lyap, true_pendulum)``. Shared with
    ``benchmarks/exploration_loop.py`` so the benchmark times exactly
    the example's instance.
    """
    dt = 0.01
    g = 9.81
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

    dynamics = pendulum_gp_model(a_true, b_true, a, b,
                                 noise_var=noise_var, capacity=capacity,
                                 stacked=stacked)

    grid = sl.GridWorld([[-1.0, 1.0]] * 2, num_states)
    tau = float(np.sum(grid.unit_maxes) / 2)
    initial_safe_set = np.linalg.norm(grid.all_points, ord=2,
                                      axis=1) <= 0.2

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
    return lyap, true_pendulum


def _extra_args(p):
    p.add_argument(
        "--sequential", action="store_true",
        help="per-sample host loop instead of the fused k-step "
             "program (identical trajectory on record; see "
             "tests/test_explore.py)")
    p.add_argument(
        "--extended", action="store_true",
        help="double-word sweeps (incl. the refined checks) with the "
             "derived conservative margin re-derived per update")
    p.add_argument(
        "--hybrid", action="store_true",
        help="run the rigor sweeps in the hybrid band-filtered mode (extended-identical certificate, near-plain-f32 cost; see docs/performance.md)")


def main():
    args = example_args(__doc__, extra=_extra_args)
    if args.hybrid:
        # "hybrid" is truthy: every `if args.extended` margin guard and
        # `extended=args.extended` sweep call routes through unchanged.
        args.extended = "hybrid"
    num_states = 501 if args.full else 201
    n_max = 16
    updates = 12 if args.full else 6
    data_per_update = 15 if args.full else 10

    # capacity hint: 1 prior point + updates*data_per_update appends;
    # preallocating keeps every program on one compiled shape.
    # stacked=True batches the per-dimension GPs as a
    # StackedGaussianProcess (one fused TPU predict per sweep, and the
    # form the fused k-step sampler advances on device) — identical
    # results to the notebook's FunctionStack fan-out (tested); pass
    # --sequential to run the per-sample host loop instead.
    lyap, true_pendulum = build_instance(
        num_states, capacity=max(64, 1 + updates * data_per_update),
        stacked=not args.sequential)
    grid = lyap.discretization
    print("Grid size: {}  tau: {:.2e}".format(grid.nindex, lyap.tau))

    def update_margin(lyap):
        """Re-derive the extended margin (covers the refined checks).

        ``per_point=True`` installs each state's OWN derived bound
        instead of the grid-wide worst case, so the frontier cells the
        loop is actively learning are not trimmed by the worst cell's
        error (the scalar margin cost ~30x in certified growth on the
        recorded 501^2 run).
        """
        if args.extended:
            from safe_learning_tpu.ops.extended_verify import (
                extended_certificate_margin)

            # lv = |x (2P)^T| is auto-derived: the callable is probed
            # against the quadratic candidate's row-wise linear form
            # (ops.extended_verify._auto_lv_matrix) — no hand-installed
            # matrix needed.
            extended_certificate_margin(lyap, refinement=n_max,
                                        per_point=True)

    update_margin(lyap)
    lyap.update_safe_set(can_shrink=False, max_refinement=n_max,
                         safety_factor=1.0, extended=args.extended)
    print("initial certified fraction: {:.3f}".format(
        lyap.safe_set.mean()))

    action_variation = np.array([[0.0]])
    action_limits = np.array([[-1.0, 1.0]])
    rng = np.random.default_rng(args.seed)

    # The measurement system as one Function over (x, u) rows — the shape
    # get_safe_sample_batch measures (the reference re-verifies only
    # after each round of data_per_update samples, cell 23, so all
    # samples of a round run as ONE fused device program).
    measure = sl.LambdaFunction(
        lambda sa: true_pendulum(sa[:, :2], sa[:, 2:]),
        input_dim=3, output_dim=2)

    history = []
    for it in range(updates):
        with Timer("update {} ({} measurements + verify)".format(
                it + 1, data_per_update)):
            if args.sequential or args.extended:
                # Extended rigor scores candidates with the double-word
                # pipeline and a per-call derived margin — the fused
                # k-step sampler is the plain-f32 scorer and (correctly)
                # refuses the extended-tagged certificate margin.
                for _ in range(data_per_update):
                    xu, _ = sl.get_safe_sample(
                        lyap, action_variation, action_limits,
                        positive=True, num_samples=1000, rng=rng,
                        extended=args.extended)
                    measurement = np.asarray(true_pendulum(
                        jnp.asarray(xu[:, :2]), jnp.asarray(xu[:, 2:])))
                    lyap.dynamics = lyap.dynamics.add_data_point(
                        xu, measurement)
            else:
                sl.get_safe_sample_batch(
                    lyap, measure, data_per_update, action_variation,
                    action_limits, positive=True, num_samples=1000,
                    rng=rng)
            update_margin(lyap)
            lyap.update_safe_set(can_shrink=False, max_refinement=n_max,
                                 safety_factor=1.0,
                                 extended=args.extended)
        history.append(lyap.safe_set.mean())
        print("  safe fraction: {:.3f}  c_max: {:.4f}  max N(x): {}"
              .format(history[-1], lyap.c_max,
                      int(lyap._refinement.max())))

    assert history[-1] >= history[0] > 0, "safe set should not shrink"
    print("safe-set growth:",
          " ".join("{:.3f}".format(h) for h in history))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        refinement = np.copy(lyap._refinement).astype(float)
        refinement[refinement == 0] = np.nan
        plt.imshow(refinement.reshape(grid.shape).T, origin="lower",
                   extent=[-1, 1, -1, 1], cmap="viridis")
        plt.colorbar(label="N(x)")
        plt.xlabel(r"$\theta$ (normalized)")
        plt.ylabel(r"$\omega$ (normalized)")
        maybe_save_plot(args, "adaptive_safety_verification")


if __name__ == "__main__":
    main()
