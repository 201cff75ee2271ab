"""Safe model-based RL on the inverted pendulum (NeurIPS-17 headline).

Mirrors ``/root/reference/examples/inverted_pendulum.ipynb``: GP dynamics
with a wrong-parameter linearized prior, a neural-network policy trained by
dynamic programming with the Lyapunov decrease condition as a Lagrangian
penalty, the negated PWL value function as the Lyapunov candidate, and safe
exploration that only measures state-actions mapping back into the
certified level set.

Run:  python examples/inverted_pendulum.py [--full --plot]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from examples._common import Timer, example_args, maybe_save_plot  # noqa: E402


def build_gp_dynamics(a, b, a_true, b_true, noise_var=0.001 ** 2,
                      capacity=None):
    """Per-dimension GPs with wrong linearized prior (notebook cell 6),
    batched as a StackedGaussianProcess so all outputs run through ONE
    fused TPU predict per sweep (FunctionStack of per-member GPs gives
    identical results; see tests/test_gp.py)."""
    m_true = np.hstack([a_true, b_true])
    m = np.hstack([a, b])
    variances = np.clip((m_true - m) ** 2, 1e-5, None)
    kernels, means = [], []
    for dim in range(2):
        kernels.append(
            sl.LinearKernel(variances=variances[dim], input_dim=3)
            + sl.ActiveDims(sl.Matern32(lengthscales=1.0,
                                        input_dim=1), dims=[0])
            * sl.ActiveDims(sl.LinearKernel(
                variances=variances[dim, 1], input_dim=1), dims=[0]))
        means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
    return sl.StackedGaussianProcess(
        kernels, np.empty((0, 3)), np.empty((0, 2)),
        noise_variances=noise_var, betas=2.0, mean_functions=means,
        capacity=capacity)


def _extra_args(p):
    p.add_argument(
        "--extended", action="store_true",
        help="double-word decrease sweeps and exploration scoring with "
             "derived conservative margins re-derived per update "
             "(ops/extended_verify)")
    p.add_argument(
        "--hybrid", action="store_true",
        help="run the rigor sweeps in the hybrid band-filtered mode (extended-identical certificate, near-plain-f32 cost; see docs/performance.md)")


def main():
    args = example_args(__doc__, extra=_extra_args)
    if args.hybrid:
        # "hybrid" is truthy: every `if args.extended` margin guard and
        # `extended=args.extended` sweep call routes through unchanged.
        args.extended = "hybrid"
    if args.full:
        num_states, policy_points = [2001, 1501], [55, 55]
        pretrain_iters, policy_iters = 3000, 200
        outer_iters, data_per_iter = 5, 10
    else:
        num_states, policy_points = [201, 151], [25, 25]
        pretrain_iters, policy_iters = 600, 100
        outer_iters, data_per_iter = 3, 10

    # True vs wrong pendulum (notebook cell 2).
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
    print("Grid size: {}  tau: {:.1e}".format(safety_disc.nindex, tau))

    a, b = map(np.asarray, wrong_pendulum.linearize())
    a_true, b_true = map(np.asarray, true_dynamics.linearize())
    # capacity hint: outer_iters*data_per_iter appends; one compiled
    # shape for the whole run.
    dynamics = build_gp_dynamics(
        a, b, a_true, b_true,
        capacity=max(64, outer_iters * data_per_iter))

    # Initial LQR policy / Lyapunov candidate for the wrong model.
    k, s = sl.utils.dlqr(a, b, q, r)
    init_policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
    init_lyapunov = sl.QuadraticFunction(s)

    # Neural-network policy (notebook cell 9).
    policy = sl.NeuralNetwork(
        layers=[2, 32, 32, 1], nonlinearities=["relu", "relu", "tanh"],
        output_scale=float(action_limits[0, 1]),
        key=jax.random.PRNGKey(args.seed))
    value_function = sl.Triangulation(
        policy_disc,
        -np.asarray(init_lyapunov(policy_disc.all_points)).ravel(),
        project=True)

    rl = sl.PolicyIteration(policy, dynamics, reward_function,
                            value_function, gamma=gamma)

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    with Timer("pretrain policy on mean dynamics"):
        # One compiled scan for the whole pretrain (notebook cell 9 runs
        # one session.run per SGD step).
        key, sub = jax.random.split(key)
        rl.optimize_policy(steps=pretrain_iters, learning_rate=0.1,
                           batch_size=1000, key=sub,
                           sample_space=policy_disc)

    # Lyapunov candidate = -value function; local L_v from its gradient
    # (notebook cell 14).
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

    def rl_optimize_policy(num_iter):
        nonlocal key
        rl.optimize_value_function()
        # Refresh the Lyapunov pieces from the new value function, then
        # run the whole Lagrangian-penalized ascent (notebook cell 17) as
        # one compiled scan.
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

    def update_gp():
        xu, _ = sl.get_safe_sample(lyap, action_variation, action_limits,
                                   num_samples=1000, rng=rng,
                                   extended=args.extended)
        measurement = np.asarray(true_dynamics(
            jnp.asarray(xu[:, :2]), jnp.asarray(xu[:, 2:])))
        new_dyn = lyap.dynamics.add_data_point(xu, measurement)
        lyap.dynamics = new_dyn
        rl.dynamics = new_dyn

    band_mode = {"measured": False}

    def certify():
        """Margin-guarded sweep: derived extended margin, or plain f32.

        When the derived extended margin's GradientNorm-of-PWL model
        runs out of trigger-band headroom (full scale, once the GP's
        input uncertainty grows past the inflated-program argument),
        fall back to the MEASURED extended margin
        (``oracle.calibrate_extended_margin``) — same pipeline, same
        U_EFF tagging, measurement-grade instead of derived.

        ``--hybrid`` on this instance always takes the CALIBRATED-band
        tier: the GradientNorm-of-PWL L_v has no f32 rounding model
        for the plain pass-1 realization (the derived band refuses),
        so the measured ``calibrate_certificate_margin`` band is
        installed — re-measured at every certify so the growing GP
        never runs on a stale band — keeping band points on the exact
        double-word verdicts at measurement-grade band soundness (the
        tier ``benchmarks/hybrid_sweep_bench.py`` prices).
        """
        if args.extended:
            from safe_learning_tpu.ops.extended_verify import (
                extended_certificate_margin)

            try:
                extended_certificate_margin(lyap)
            except RuntimeError as exc:
                from safe_learning_tpu.oracle import (
                    calibrate_extended_margin)

                m = calibrate_extended_margin(lyap)
                print("  derived extended margin refused ({}); using "
                      "the measured one: {:.3e}".format(
                          str(exc).split(":")[0], m))
        if band_mode["measured"]:
            from safe_learning_tpu.oracle import (
                calibrate_certificate_margin)

            lyap.hybrid_band_margin = calibrate_certificate_margin(
                lyap, set_margin=False)
        try:
            lyap.update_safe_set(extended=args.extended)
        except NotImplementedError as exc:
            if args.extended != "hybrid" or band_mode["measured"]:
                raise
            from safe_learning_tpu.oracle import (
                calibrate_certificate_margin)

            band_mode["measured"] = True
            lyap.hybrid_band_margin = calibrate_certificate_margin(
                lyap, set_margin=False)
            print("  derived band margin refused ({}); using the "
                  "measured f32 band: {:.3e}".format(
                      str(exc).split(":")[0],
                      float(lyap.hybrid_band_margin)))
            lyap.update_safe_set(extended=args.extended)

    with Timer("initial safe policy optimization"):
        rl_optimize_policy(policy_iters)
        rl_optimize_policy(policy_iters)
        lyap.update_values()
        certify()
    print("after policy opt: safe fraction {:.3f}  c_max {:.4f}".format(
        lyap.safe_set.mean(), lyap.c_max))

    history = [lyap.safe_set.mean()]
    for it in range(outer_iters):
        with Timer("iteration {}".format(it + 1)):
            for _ in range(data_per_iter):
                update_gp()
            rl_optimize_policy(policy_iters)
            lyap.update_values()
            certify()
        history.append(lyap.safe_set.mean())
        print("  safe fraction {:.3f}  c_max {:.4f}  data {}".format(
            history[-1], lyap.c_max,
            int(lyap.dynamics.count)))

    # Closed-loop comparison old vs new policy (notebook cells 24-27).
    x0 = np.array([[1.0, -0.5]])
    states_new, actions_new = sl.utils.compute_trajectory(
        true_dynamics, rl.policy, x0, 100)
    states_old, actions_old = sl.utils.compute_trajectory(
        true_dynamics, init_policy, x0, 100)
    reward_old = float(np.sum(np.asarray(reward_function(
        jnp.asarray(states_old[:-1]), jnp.asarray(actions_old)))))
    reward_new = float(np.sum(np.asarray(reward_function(
        jnp.asarray(states_new[:-1]), jnp.asarray(actions_new)))))
    print("reward old: {:.3f}  reward new: {:.3f}".format(reward_old,
                                                          reward_new))
    final_norm = np.linalg.norm(states_new[-1])
    print("final state norm (new policy): {:.4f}".format(final_norm))
    assert final_norm < 0.5, "learned policy should stabilize the pendulum"

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].imshow(lyap.safe_set.reshape(safety_disc.shape).T,
                       origin="lower", extent=state_limits.ravel())
        x_data = lyap.dynamics.X
        axes[0].plot(x_data[:, 0], x_data[:, 1], "rx", ms=4)
        axes[0].set_title("safe set + measurements")
        t = np.arange(len(states_new)) * true_dynamics.dt
        axes[1].plot(t, states_new[:, 0], label="new")
        axes[1].plot(t, states_old[:, 0], label="old")
        axes[1].set_xlabel("time [s]")
        axes[1].set_ylabel("angle (normalized)")
        axes[1].legend()
        maybe_save_plot(args, "inverted_pendulum")


if __name__ == "__main__":
    main()
