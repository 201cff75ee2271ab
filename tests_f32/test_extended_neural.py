"""Extended-precision rigor over the neural / flagship family.

Round-3 verdict item 1: the double-word pipeline must reach exactly the
configurations the two headline papers run — the NeurIPS-17 pendulum
(NeuralNetwork policy, negated-Triangulation candidate,
GradientNorm(PWL) local ``L_v``, stacked-GP dynamics; reference
``examples/inverted_pendulum.ipynb``) and the CoRL-18 Lyapunov-network
learner (LyapunovNetwork candidate, deterministic pendulum, ``tau = 0``;
reference ``examples/lyapunov_function_learning.ipynb``). These tests
pin the new compile paths against the float64 oracle at realization
level and end to end through ``update_safe_set(extended=True)``.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.ops.extended_verify import (  # noqa: E402
    ExtendedSweep, _compile_candidate, _compile_policy, _split_np)
from safe_learning_tpu.oracle import (_oracle_env, lift64,  # noqa: E402
                                      oracle_margins, oracle_safe_set)


def _mlp_policy(key=0, layers=(2, 16, 1), acts=("relu", "tanh"),
                scale=0.8):
    return sl.NeuralNetwork(layers=list(layers), nonlinearities=list(acts),
                            output_scale=scale,
                            key=jax.random.PRNGKey(key))


def _gp_dynamics(rng, noise=1e-6):
    """Small stacked GP over (x1, x2, u) like the NeurIPS-17 prior."""
    a = np.array([[0.9, 0.05], [-0.1, 0.85]])
    b = np.array([[0.02], [0.1]])
    kernels, means = [], []
    for dim in range(2):
        kernels.append(
            sl.LinearKernel(variances=[1e-3, 1e-3, 1e-3], input_dim=3)
            + sl.ActiveDims(sl.Matern32(lengthscales=1.0, input_dim=1),
                            [0])
            * sl.ActiveDims(sl.LinearKernel(1e-3, input_dim=1), [0]))
        means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
    nt = 25
    xt = np.column_stack([rng.uniform(-0.8, 0.8, (nt, 2)),
                          rng.uniform(-0.5, 0.5, (nt, 1))])
    yt = xt[:, :2] @ a.T + xt[:, 2:] @ b.T + 0.01 * np.sin(2 * xt[:, :2])
    return sl.StackedGaussianProcess(kernels, xt, yt,
                                     noise_variances=noise, betas=2.0,
                                     mean_functions=means)


def _neurips_like_instance(seed=0, n_grid=(21, 15)):
    """NeurIPS-17 flagship shape: NN policy, -Triangulation candidate,
    GradientNorm(PWL, inf) local L_v, stacked-GP dynamics."""
    rng = np.random.default_rng(seed)
    grid = sl.GridWorld([[-1.0, 1.0], [-0.8, 0.8]], list(n_grid))
    # Coarser candidate grid with different limits, like the flagship's
    # policy_disc vs safety_disc: generic sweep points sit strictly
    # inside simplices, so the GradientNorm inflation stays rare.
    value_grid = sl.GridWorld([[-1.05, 1.05], [-0.85, 0.85]], [19, 13])
    value_function = sl.Triangulation(
        value_grid,
        -np.sum(value_grid.all_points ** 2, axis=1).astype(np.float32),
        project=True)
    policy = _mlp_policy(seed)
    dyn = _gp_dynamics(rng)
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, -value_function, dyn, 1.0,
                       sl.GradientNorm(value_function, ord=np.inf),
                       tau, policy, initial_set=initial)


def _corl_like_instance(seed=0, n_grid=25, layer_dims=(16, 16)):
    """CoRL-18 flagship shape: LyapunovNetwork candidate, deterministic
    normalized pendulum, saturated linear policy, tau = 0."""
    x_max = np.deg2rad(30)
    norms = ((x_max, np.sqrt(9.81 / 0.5)), (0.7,))
    pend = sl.InvertedPendulum(0.15, 0.5, 0.1, 1 / 80,
                               normalization=norms)
    a, b = pend.linearize()
    k, _ = sl.utils.dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
    net = sl.LyapunovNetwork(2, list(layer_dims),
                             ["tanh"] * len(layer_dims), eps=1e-6,
                             key=jax.random.PRNGKey(seed))
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n_grid)
    l_pol = float(np.max(np.abs(k)))
    l_dyn = float(np.linalg.norm(a, 1) + np.linalg.norm(b, 1) * l_pol)
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, net, pend, l_dyn,
                       sl.GradientNorm(net, ord=1), 0.0, policy,
                       initial_set=initial)


def test_mlp_policy_compile_matches_oracle():
    """The df MLP forward pass agrees with the float64 lift to extended
    precision (tanh/sigmoid/relu chain, biases, output scaling)."""
    policy = sl.NeuralNetwork(layers=[3, 16, 8, 2],
                              nonlinearities=["relu", "sigmoid", "tanh"],
                              output_scale=1.3,
                              key=jax.random.PRNGKey(7))
    params = []
    fn, sig = _compile_policy(policy, params)
    assert sig[0] == "mlp"
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2.0, 2.0, (256, 3)).astype(np.float32)
    uh, ul = jax.jit(lambda pp, xh: fn(pp, xh, jnp.zeros_like(xh)))(
        tuple(params), jnp.asarray(pts))
    got = np.asarray(uh, np.float64) + np.asarray(ul, np.float64)
    with _oracle_env():
        want = np.asarray(lift64(policy)(jnp.asarray(pts, jnp.float64)),
                          np.float64)
    assert np.max(np.abs(got - want)) < 1e-9 * max(
        1.0, float(np.max(np.abs(want))))


def test_lyapunov_network_candidate_matches_oracle():
    """The df LyapunovNetwork program (host-f64 posdef kernels + df
    matmul/tanh chain + squared norm) agrees with the float64 lift."""
    net = sl.LyapunovNetwork(2, [8, 12], ["tanh", "tanh"], eps=1e-5,
                             key=jax.random.PRNGKey(3))
    params = []
    fn, sig = _compile_candidate(net, params)
    assert sig[0] == "lyapnet"
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.5, 1.5, (256, 2)).astype(np.float32)
    vh, vl = jax.jit(lambda vp, x: fn(vp, x))(
        tuple(params), (jnp.asarray(pts), jnp.zeros_like(pts)))
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    with _oracle_env():
        want = np.asarray(lift64(net)(
            jnp.asarray(pts, jnp.float64)).reshape(-1), np.float64)
    assert np.max(np.abs(got - want)) < 1e-9 * max(
        1.0, float(np.max(np.abs(want))))


def test_scaled_candidate_and_nn_candidate_compile():
    """-Triangulation folds into an exact df multiply; a scalar-output
    NeuralNetwork candidate reuses the MLP program."""
    rng = np.random.default_rng(2)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 9)
    tri = sl.Triangulation(
        grid, rng.normal(size=(grid.nindex,)).astype(np.float32))
    neg = -tri
    params = []
    fn, sig = _compile_candidate(neg, params)
    assert sig[0] == "scaled"
    pts = rng.uniform(-0.9, 0.9, (128, 2)).astype(np.float32)
    vh, vl = jax.jit(lambda vp, x: fn(vp, x))(
        tuple(params), (jnp.asarray(pts), jnp.zeros_like(pts)))
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    with _oracle_env():
        want = np.asarray(lift64(neg)(
            jnp.asarray(pts, jnp.float64)).reshape(-1), np.float64)
    assert np.max(np.abs(got - want)) < 1e-6

    nn = sl.NeuralNetwork(layers=[2, 8, 1], nonlinearities=["tanh", None],
                          key=jax.random.PRNGKey(1))
    params = []
    fn, sig = _compile_candidate(nn, params)
    assert sig[0] == "nncand"
    vh, vl = jax.jit(lambda vp, x: fn(vp, x))(
        tuple(params), (jnp.asarray(pts), jnp.zeros_like(pts)))
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    with _oracle_env():
        want = np.asarray(lift64(nn)(
            jnp.asarray(pts, jnp.float64)).reshape(-1), np.float64)
    assert np.max(np.abs(got - want)) < 1e-9


def test_neurips_flagship_sweep_vs_oracle():
    """The full NeurIPS-17-shaped margin sweep: one-sided agreement with
    the oracle everywhere (GradientNorm inflation is conservative near
    simplex faces), tight two-sided agreement on the vast majority."""
    lyap = _neurips_like_instance()
    sweep = ExtendedSweep(lyap)
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    # Conservative direction only: df margin >= exact margin - tol.
    assert float(np.min(got - want)) > -1e-6
    # Tight agreement away from the face-ambiguity band. GP posterior
    # means are NOT generic points — near the equilibrium they cluster
    # around the candidate grid's central vertex, so a noticeable
    # minority of states evaluates L_v in the (conservative) inflated
    # branch; the bulk must still agree to extended precision.
    tight = np.abs(got - want) < 1e-6
    assert tight.mean() > 0.8, tight.mean()


def test_corl_flagship_sweep_vs_oracle_and_containment():
    """The CoRL-18-shaped sweep (deterministic pendulum, tau = 0,
    LyapunovNetwork candidate): extended-precision agreement with the
    oracle, and update_safe_set(extended=True) containment."""
    lyap = _corl_like_instance()
    sweep = lyap._get_extended_sweep()
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    assert float(np.max(np.abs(got - want))) < 1e-6

    # End to end with a caller-installed margin (derived margins for the
    # neural family are exercised in test_extended_neural_margins).
    lyap.certificate_margin = 1e-6
    lyap.level_margin = 1e-6
    lyap.update_safe_set(extended=True)
    safe64, c64 = oracle_safe_set(lyap)
    assert lyap.safe_set.any()
    assert not (lyap.safe_set & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


@pytest.mark.parametrize("dyn_cls", ["vdp", "cartpole", "linear"])
def test_deterministic_dynamics_compile_matches_oracle(dyn_cls):
    """Each deterministic dynamics family (Euler chains with df trig, or
    a plain matmul) agrees with the float64 oracle through the sweep."""
    rng = np.random.default_rng(4)
    if dyn_cls == "vdp":
        dyn = sl.VanDerPol(damping=1.0, dt=0.01)
        grid = sl.GridWorld([[-1.2, 1.2], [-1.2, 1.2]], 15)
        policy = sl.LinearSystem(np.zeros((0, 2)))  # no actions
        v = sl.QuadraticFunction(np.eye(2))
    elif dyn_cls == "cartpole":
        norms = ((0.5, np.deg2rad(20), 1.0, 1.0), (5.0,))
        dyn = sl.CartPole(0.1, 1.0, 0.5, rot_friction=0.01, dt=0.01,
                          normalization=norms)
        grid = sl.GridWorld([[-1.0, 1.0]] * 4, 5)
        a, b = dyn.linearize()
        k, p = sl.utils.dlqr(a, b, np.eye(4), np.eye(1))
        policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
        v = sl.QuadraticFunction(p)
    else:
        a = rng.normal(size=(2, 2)) * 0.4
        b = rng.normal(size=(2, 1)) * 0.2
        dyn = sl.LinearSystem([a, b])
        grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 15)
        policy = sl.LinearSystem(-0.3 * np.ones((1, 2)))
        v = sl.QuadraticFunction(np.eye(2))
    tau = float(np.min(grid.unit_maxes))
    lyap = sl.Lyapunov(grid, v, dyn, 0.5, 1.5, tau, policy)
    sweep = ExtendedSweep(lyap)
    pts = np.asarray(grid.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    scale = max(1.0, float(np.max(np.abs(want))))
    assert float(np.max(np.abs(got - want))) < 1e-6 * scale


def test_gradnorm_pwl_lf_and_lf_matrix():
    """Callable L_f: a GradientNorm of a scalar PWL compiles directly; a
    generic callable needs (and spot-checks) the lf_matrix model."""
    rng = np.random.default_rng(6)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 13)
    # Convex bowl -> its gradient-norm is a valid local L_f stand-in.
    # Offset PWL grid: generic sweep points sit strictly inside
    # simplices (on-vertex points are conservatively inflated).
    lf_grid = sl.GridWorld([[-1.1, 1.1], [-1.1, 1.1]], 11)
    lf_tri = sl.Triangulation(
        lf_grid, (0.5 * np.sum(lf_grid.all_points ** 2, axis=1)
                  ).astype(np.float32), project=True)
    a = rng.normal(size=(2, 2)) * 0.3
    dyn = sl.LinearSystem([a, np.zeros((2, 1))])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    tau = float(np.min(grid.unit_maxes))

    lyap = sl.Lyapunov(grid, v, dyn,
                       sl.GradientNorm(lf_tri, ord=np.inf), 2.0, tau,
                       policy)
    sweep = ExtendedSweep(lyap)
    pts = np.asarray(grid.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    # L_f only enlarges the threshold's magnitude: inflation near faces
    # makes the threshold more negative -> margin larger (conservative).
    assert float(np.min(got - want)) > -1e-6
    assert (np.abs(got - want) < 1e-6).mean() > 0.9

    # Linear-abs model path with spot-check.
    h = np.array([[1.5, 0.5]])
    lf_fun = sl.LambdaFunction(
        lambda x: jnp.abs(x @ jnp.asarray(h, x.dtype).T))
    lyap2 = sl.Lyapunov(grid, v, dyn, lf_fun, 2.0, tau, policy)
    lyap2.extended_lf_matrix = h
    sweep2 = lyap2._get_extended_sweep()
    got2 = sweep2.margins(pts)
    want2 = oracle_margins(lyap2, pts)
    assert float(np.max(np.abs(got2 - want2))) < 1e-6

    lyap3 = sl.Lyapunov(grid, v, dyn, lf_fun, 2.0, tau, policy)
    with pytest.raises(ValueError, match="lf_matrix"):
        ExtendedSweep(lyap3, lf_matrix=2.0 * h)
    with pytest.raises(NotImplementedError, match="lf_matrix"):
        ExtendedSweep(lyap3)


def test_unsupported_activation_raises():
    policy = sl.NeuralNetwork(layers=[2, 8, 1],
                              nonlinearities=["swish", "tanh"],
                              key=jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError, match="activation"):
        _compile_policy(policy, [])
    cb = sl.NeuralNetwork(layers=[2, 8, 1],
                          nonlinearities=[jnp.tanh, None],
                          key=jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError, match="callable"):
        _compile_policy(cb, [])


def test_zero_tau_sweep_refuses_nonzero_tau():
    """A sweep compiled with L_v elided (tau == 0, deterministic) must
    refuse refined/tau-overridden checks instead of mis-certifying."""
    lyap = _corl_like_instance()
    sweep = lyap._get_extended_sweep()
    pts = np.asarray(lyap.discretization.all_points[:8], np.float32)
    with pytest.raises(ValueError, match="tau"):
        sweep.negative_batch(pts, tau=0.01)
    # Deterministic dynamics cannot rank exploration candidates.
    with pytest.raises(NotImplementedError, match="variance"):
        sweep.score_candidates(np.zeros((4, 3), np.float32), 1.0, 0.0)


def test_corl_derived_margin_dominates_and_contains():
    """extended_certificate_margin on the CoRL-18 shape (deterministic
    pendulum, tau = 0, LyapunovNetwork candidate): the derived margin
    dominates the measured full-grid df-vs-oracle deviation and the
    margined extended sweep stays inside the oracle's safe set."""
    from safe_learning_tpu.ops.extended_verify import (
        extended_certificate_margin)

    lyap = _corl_like_instance()
    margin = extended_certificate_margin(lyap)
    assert lyap._certificate_margin_unit is not None
    sweep = lyap._get_extended_sweep()
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    worst = float(np.max(np.abs(sweep.margins(pts)
                                - oracle_margins(lyap, pts))))
    assert margin >= worst, (margin, worst)
    # The margin is extended-precision small relative to the decrease
    # scale (usability: certification survives the guard).
    lyap.update_safe_set(extended=True)
    safe64, c64 = oracle_safe_set(lyap)
    assert lyap.safe_set.any()
    assert not (lyap.safe_set & ~safe64).any()
    assert safe64.mean() - lyap.safe_set.mean() < 0.05


def test_neurips_derived_margin_dominates_and_contains():
    """extended_certificate_margin on the NeurIPS-17 shape (NN policy,
    -PWL candidate, GradientNorm(PWL, inf) L_v, stacked GP): one-sided
    domination (the inflated L_v program only ever strengthens the
    condition) plus end-to-end containment."""
    from safe_learning_tpu.ops.extended_verify import (
        extended_certificate_margin)

    lyap = _neurips_like_instance()
    margin = extended_certificate_margin(lyap)
    sweep = lyap._get_extended_sweep()
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    # The unsound direction (exact margin above the df margin) must be
    # covered by the derived margin.
    assert float(np.max(want - got)) <= margin
    lyap.update_safe_set(extended=True)
    safe64, _ = oracle_safe_set(lyap)
    assert not (lyap.safe_set & ~safe64).any()


def test_f32_derived_margin_deterministic_dynamics():
    """The f32-lane derived margin (default unit) now covers
    deterministic dynamics: containment through the PLAIN sweep on the
    CoRL shape with a quadratic candidate."""
    from safe_learning_tpu.errorbounds import analytic_certificate_margin

    x_max = np.deg2rad(30)
    norms = ((x_max, np.sqrt(9.81 / 0.5)), (0.7,))
    pend = sl.InvertedPendulum(0.15, 0.5, 0.1, 1 / 80,
                               normalization=norms)
    a, b = pend.linearize()
    k, p = sl.utils.dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
    grid = sl.GridWorld([[-0.5, 0.5], [-0.5, 0.5]], 21)
    v = sl.QuadraticFunction(p)
    l_dyn = float(np.linalg.norm(a - b @ k, 2))
    vals = np.asarray(v(grid.all_points)).ravel()
    init = np.where(vals <= np.quantile(vals, 0.04))[0]
    lyap = sl.Lyapunov(grid, v, pend, l_dyn,
                       2.0 * float(np.linalg.norm(p, 2)), 0.0, policy,
                       initial_set=init)
    margin = analytic_certificate_margin(lyap)
    assert margin > 0.0 and np.isfinite(margin)
    from safe_learning_tpu.lyapunov import _negative_batch
    _, dec, thr = _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
        jnp.asarray(grid.all_points, dtype=np.float32))
    margins_dev = (np.asarray(dec, np.float64)
                   - np.asarray(thr, np.float64)).ravel()
    worst = float(np.max(np.abs(
        margins_dev - oracle_margins(lyap, grid.all_points))))
    assert margin >= worst, (margin, worst)
    lyap.update_safe_set()
    safe64, _ = oracle_safe_set(lyap)
    assert lyap.safe_set.any()
    assert not (lyap.safe_set & ~safe64).any()


def test_mlp_policy_f32_derived_margin():
    """The f32-lane derived margin accepts an MLP policy (GP dynamics,
    quadratic candidate): domination on a measured subsample."""
    from safe_learning_tpu.errorbounds import analytic_certificate_margin
    from safe_learning_tpu.lyapunov import _negative_batch

    rng = np.random.default_rng(3)
    grid = sl.GridWorld([[-1.0, 1.0], [-0.8, 0.8]], 15)
    dyn = _gp_dynamics(rng, noise=1e-3)  # well-conditioned
    policy = _mlp_policy(1)
    v = sl.QuadraticFunction(np.eye(2))
    tau = float(np.min(grid.unit_maxes))
    lyap = sl.Lyapunov(grid, v, dyn, 1.0, 2.0, tau, policy)
    margin = analytic_certificate_margin(lyap, set_margin=False)
    assert np.isfinite(margin) and margin > 0.0
    pts = grid.all_points[::7]
    _, dec, thr = _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
        jnp.asarray(pts, dtype=np.float32))
    margins_dev = (np.asarray(dec, np.float64)
                   - np.asarray(thr, np.float64)).ravel()
    worst = float(np.max(np.abs(margins_dev - oracle_margins(lyap, pts))))
    assert margin >= worst, (margin, worst)


def test_zero_tau_sweep_accepts_any_lf():
    """At ``tau == 0`` (deterministic) the threshold is exactly zero, so
    L_f multiplies nothing: the sweep must accept a callable L_f — the
    form the CoRL-18 flagship naturally passes — without demanding a
    scalar or an lf_matrix model (round-4 review)."""
    lyap = _corl_like_instance()
    pts = np.asarray(lyap.discretization.all_points[:32], np.float32)
    dec_scalar = np.asarray(lyap._get_extended_sweep().negative_batch(pts))
    lyap._lipschitz_dynamics = sl.LambdaFunction(
        lambda x: jnp.ones_like(x[:, :1]))
    dec_callable = np.asarray(
        lyap._get_extended_sweep().negative_batch(pts))
    np.testing.assert_array_equal(dec_scalar, dec_callable)


def _bowl_net():
    """Exact ``||x||_1`` as a bias-free ReLU MLP — a genuine Lyapunov
    candidate whose spectral product (sqrt(2) * 2) stays a small
    constant factor above the true ``max |grad| = 1``."""
    net = sl.NeuralNetwork(layers=[2, 4, 1], nonlinearities=["relu", None],
                           use_bias=False, key=jax.random.PRNGKey(0))
    w1 = np.array([[1.0, -1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0, -1.0]], np.float32)
    net.weights = (jnp.asarray(w1),
                   jnp.asarray(np.ones((4, 1), np.float32)))
    return net


def _nn_instance(seed=0, ord=np.inf):
    """NN-candidate shape exercising the spectral L_v model: ReLU-bowl
    candidate, GradientNorm(MLP) local L_v, contracting stacked-GP
    dynamics (residual-free mean function, so the instance certifies a
    nonempty region under the conservative constant)."""
    rng = np.random.default_rng(seed)
    grid = sl.GridWorld([[-1.0, 1.0], [-0.8, 0.8]], [17, 13])
    v_net = _bowl_net()
    a = 0.5 * np.eye(2)
    b = np.array([[0.02], [0.1]])
    kernels, means = [], []
    for dim in range(2):
        kernels.append(
            sl.LinearKernel(variances=[1e-3, 1e-3, 1e-3], input_dim=3)
            + sl.ActiveDims(sl.Matern32(lengthscales=1.0, input_dim=1),
                            [0])
            * sl.ActiveDims(sl.LinearKernel(1e-3, input_dim=1), [0]))
        means.append(sl.LinearSystem([a[[dim]], b[[dim]]]))
    nt = 25
    xt = np.column_stack([rng.uniform(-0.8, 0.8, (nt, 2)),
                          rng.uniform(-0.5, 0.5, (nt, 1))])
    yt = xt[:, :2] @ a.T + xt[:, 2:] @ b.T
    dyn = sl.StackedGaussianProcess(kernels, xt, yt,
                                    noise_variances=1e-6, betas=2.0,
                                    mean_functions=means)
    policy = sl.LinearSystem(np.zeros((1, 2)))
    tau = 0.02 * float(np.min(grid.unit_maxes))
    vals = np.asarray(v_net(grid.all_points)).ravel()
    initial = np.where(vals <= np.quantile(vals, 0.1))[0]
    return sl.Lyapunov(grid, v_net, dyn, 1.0,
                       sl.GradientNorm(v_net, ord=ord), tau, policy,
                       initial_set=initial)


@pytest.mark.parametrize("ordv", [None, 1, np.inf])
@pytest.mark.parametrize("acts", [("tanh", "tanh", None),
                                  ("relu", "sigmoid", "tanh")])
def test_spectral_bound_dominates_callable(ordv, acts):
    """The baked spectral constant dominates the autodiff callable at
    every ord reduction, including beyond the grid domain (next-state
    means can exit it) and through the sigmoid 1/4 derivative factor."""
    from safe_learning_tpu.ops.extended_verify import _spectral_ord

    net = sl.NeuralNetwork(layers=[3, 24, 12, 1],
                           nonlinearities=list(acts), output_scale=1.7,
                           key=jax.random.PRNGKey(5))
    lv = sl.GradientNorm(net, ord=ordv)
    dv, cord = _spectral_ord(lv)
    assert dv == (3 if ordv is None else 1)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3.0, 3.0, (512, 3)).astype(np.float32)
    got = np.asarray(lv(jnp.asarray(pts)), np.float64)
    assert got.shape[1] == dv
    assert float(np.max(got)) <= cord * (1.0 + 1e-4), (
        float(np.max(got)), cord)


def test_spectral_lv_sweep_dominates_and_contains():
    """GradientNorm(NeuralNetwork) L_v with zero hand-installed
    matrices: the sweep compiles the baked spectral constant, its
    margins dominate the oracle's (callable-L_v) margins one-sidedly,
    the derived margin resolves, and update_safe_set(extended=True)
    stays inside the oracle's safe set."""
    from safe_learning_tpu.ops.extended_verify import (
        extended_certificate_margin)

    lyap = _nn_instance()
    margin = extended_certificate_margin(lyap)
    assert np.all(np.isfinite(margin))
    sweep = lyap._get_extended_sweep()
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    # Constant >= callable everywhere: the df margin can only sit above
    # the exact one (conservative direction).
    assert float(np.min(got - want)) > -1e-6
    lyap.update_safe_set(extended=True)
    safe64, c64 = oracle_safe_set(lyap)
    assert np.isfinite(c64)  # the instance certifies a nonempty region
    assert lyap.safe_set.any()
    assert not (lyap.safe_set & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


def test_spectral_lv_ord_none_columns():
    """ord=None keeps one bounded column per state dim through the
    error-term contraction (dv == n_out for the stacked GP)."""
    lyap = _nn_instance(seed=1, ord=None)
    sweep = lyap._get_extended_sweep()
    pts = np.asarray(lyap.discretization.all_points[::5], np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    assert float(np.min(got - want)) > -1e-6


def test_spectral_lf_dominates():
    """A GradientNorm(NeuralNetwork) local L_f rides the same constant:
    threshold-side domination on a deterministic linear instance."""
    rng = np.random.default_rng(7)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 13)
    lf_net = sl.NeuralNetwork(layers=[2, 12, 1],
                              nonlinearities=["tanh", "sigmoid"],
                              output_scale=2.0,
                              key=jax.random.PRNGKey(2))
    a = rng.normal(size=(2, 2)) * 0.3
    dyn = sl.LinearSystem([a, np.zeros((2, 1))])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    tau = float(np.min(grid.unit_maxes))
    lyap = sl.Lyapunov(grid, v, dyn,
                       sl.GradientNorm(lf_net, ord=np.inf), 2.0, tau,
                       policy)
    sweep = ExtendedSweep(lyap)
    pts = np.asarray(grid.all_points, np.float32)
    got = sweep.margins(pts)
    want = oracle_margins(lyap, pts)
    assert float(np.min(got - want)) > -1e-6


def test_spectral_refusals():
    """LyapunovNetwork inner functions and callable activations keep
    their named-fallback refusals (the spectral theorem does not cover
    them); vector-output MLPs are refused too."""
    from safe_learning_tpu.ops.extended_verify import (
        _compile_gradnorm_spectral, _spectral_grad_bound)

    lyapnet = sl.LyapunovNetwork(2, [8], ["tanh"],
                                 key=jax.random.PRNGKey(0))
    assert _spectral_grad_bound(lyapnet) is None
    lyap = _corl_like_instance()
    lyap2 = sl.Lyapunov(lyap.discretization, lyap.lyapunov_function,
                        lyap.dynamics, lyap._lipschitz_dynamics,
                        sl.GradientNorm(lyap.lyapunov_function, ord=1),
                        0.1, lyap.policy)
    with pytest.raises(NotImplementedError, match="Triangulation or "
                                                  "NeuralNetwork"):
        lyap2._get_extended_sweep()

    cb = sl.NeuralNetwork(layers=[2, 8, 1],
                          nonlinearities=[jnp.tanh, None],
                          key=jax.random.PRNGKey(1))
    with pytest.raises(NotImplementedError, match="callable"):
        _compile_gradnorm_spectral(sl.GradientNorm(cb, ord=1), [])

    vec = sl.NeuralNetwork(layers=[2, 8, 2],
                           nonlinearities=["tanh", None],
                           key=jax.random.PRNGKey(1))
    with pytest.raises(NotImplementedError, match="scalar-output"):
        _compile_gradnorm_spectral(sl.GradientNorm(vec, ord=1), [])
