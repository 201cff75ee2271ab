"""Tests for PolicyIteration (mirrors reference test_rl.py: DARE
convergence, hand-built transition matrices, Lyapunov-constrained
updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import safe_learning_tpu as sl
from safe_learning_tpu import (GridWorld, LambdaFunction, LinearSystem,
                               OptimizationError, PolicyIteration,
                               QuadraticFunction, Triangulation)
from safe_learning_tpu.utils import dlqr


def _scalar_lq_setup():
    """Scalar linear-quadratic problem with known DARE solution."""
    a, b = np.array([[1.2]]), np.array([[1.0]])
    q, r = np.array([[1.0]]), np.array([[1.0]])
    k, p = dlqr(a, b, q, r)
    return a, b, q, r, k, p


def test_value_iteration_converges_to_dare():
    """10+ rounds of exact PWL value solves under the optimal policy
    converge to the LQR cost-to-go (reference test_rl.py:29-77)."""
    a, b, q, r, k, p = _scalar_lq_setup()
    gamma = 0.98
    grid = GridWorld([[-1, 1]], 41)

    policy = LinearSystem(-k)
    dynamics = LinearSystem([a, b])
    reward = LambdaFunction(
        lambda xu: -(q[0, 0] * xu[:, :1] ** 2 + r[0, 0] * xu[:, 1:] ** 2))
    value = Triangulation(grid, np.zeros(grid.nindex), project=True)

    rl = PolicyIteration(policy, dynamics, reward, value, gamma=gamma)
    rl.optimize_value_function()

    # Analytic discounted LQR cost-to-go for the closed loop
    # x+ = (a - b k) x with stage cost (q + k' r k) x^2:
    # v(x) = -c x^2 with c = (q + k'rk) / (1 - gamma (a - bk)^2).
    acl = float(np.asarray(a - b @ k).item())
    c = float(np.asarray(q + k.T @ r @ k).item()) / (1 - gamma * acl ** 2)
    states = grid.all_points
    expected = -c * states[:, 0] ** 2
    got = np.asarray(rl.value_function(states))[:, 0]
    assert_allclose(got, expected, atol=0.1)


def test_pwl_fixed_point_matches_dense_solve():
    """The gather-based fixed point equals the dense linear solve
    v = (I - gamma B)^{-1} r (what the reference's LP computes;
    reference test_rl.py:82-178 uses a hand-built transition matrix)."""
    rng = np.random.default_rng(0)
    grid = GridWorld([[-1, 1]], 21)
    gamma = 0.9

    # Contracting dynamics keep next states inside the domain.
    dynamics = LinearSystem([np.array([[0.7]]), np.array([[0.1]])])
    policy = LambdaFunction(lambda x: 0.3 * x)
    reward = LambdaFunction(lambda xu: -xu[:, :1] ** 2)
    value = Triangulation(grid, rng.normal(size=grid.nindex), project=True)

    rl = PolicyIteration(policy, dynamics, reward, value, gamma=gamma)
    values = np.asarray(rl.optimize_value_function())

    # Dense oracle.
    states = grid.all_points
    actions = np.asarray(policy(states))
    next_states = np.asarray(dynamics(jnp.asarray(states),
                                      jnp.asarray(actions)))
    rewards = np.asarray(reward(jnp.asarray(
        np.hstack([states, actions]))))
    b = value.parameter_derivative(next_states).toarray()
    oracle = np.linalg.solve(np.eye(grid.nindex) - gamma * b, rewards)
    assert_allclose(values, oracle, atol=1e-6)


def test_optimize_value_function_divergence_raises():
    grid = GridWorld([[-1, 1]], 5)
    dynamics = LinearSystem([np.array([[1.0]]), np.array([[0.0]])])
    policy = LambdaFunction(lambda x: 0.0 * x)
    reward = LambdaFunction(lambda xu: jnp.ones_like(xu[:, :1]))
    value = Triangulation(grid, np.zeros(grid.nindex), project=True)
    # gamma = 1 on an identity map: no contraction, must not "converge".
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=1.0)
    with pytest.raises(OptimizationError):
        rl.optimize_value_function(max_iter=50)


def test_future_values_and_bellman_error():
    grid = GridWorld([[-1, 1]], 11)
    dynamics = LinearSystem([np.array([[0.5]]), np.array([[1.0]])])
    policy = LambdaFunction(lambda x: 0.0 * x)
    reward = LambdaFunction(lambda xu: -xu[:, :1] ** 2)
    value = Triangulation(grid, grid.all_points[:, 0] ** 2, project=True)
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=0.9)

    states = np.array([[0.4]])
    fv = np.asarray(rl.future_values(states))
    # r + gamma v(0.2) = -0.16 + 0.9 * 0.04
    assert_allclose(fv, [[-0.16 + 0.9 * 0.04]], atol=1e-9)

    err = float(rl.bellmann_error(states))
    v_curr = 0.16
    assert_allclose(err, (fv[0, 0] - v_curr) ** 2, atol=1e-9)

    # Gradient flows through value parameters but not the target.
    def loss(params):
        rl2 = PolicyIteration(policy, dynamics, reward,
                              value.with_parameters(params), gamma=0.9)
        return rl2.bellmann_error(states)

    g = jax.grad(loss)(value.parameters_dict)
    assert np.isfinite(np.asarray(g["parameters"])).all()
    assert np.abs(np.asarray(g["parameters"])).sum() > 0


def test_value_iteration_step():
    grid = GridWorld([[-1, 1]], 5)
    dynamics = LinearSystem([np.array([[0.5]]), np.array([[0.0]])])
    policy = LambdaFunction(lambda x: 0.0 * x)
    reward = LambdaFunction(lambda xu: jnp.ones_like(xu[:, :1]))
    value = Triangulation(grid, np.zeros(grid.nindex), project=True)
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=0.5)
    rl.value_iteration()
    # v1 = r + gamma * 0 = 1 everywhere.
    assert_allclose(np.asarray(rl.value_function.parameters), 1.0)
    rl.value_iteration()
    assert_allclose(np.asarray(rl.value_function.parameters), 1.5)


def test_discrete_policy_optimization():
    """Exhaustive argmax over a discrete action set; optimal action drives
    the state toward zero (reference :213-279 semantics)."""
    grid = GridWorld([[-1, 1]], 11)
    dynamics = LinearSystem([np.array([[1.0]]), np.array([[1.0]])])
    reward = LambdaFunction(lambda xu: -(xu[:, :1] + xu[:, 1:]) ** 2)
    policy = Triangulation(grid, np.zeros(grid.nindex), project=True)
    value = Triangulation(grid, -grid.all_points[:, 0] ** 2, project=True)
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=0.9)

    action_space = np.linspace(-1, 1, 21)[:, None]
    best = np.asarray(rl.discrete_policy_optimization(action_space))
    states = grid.all_points[:, 0]
    # Optimal u = -x (drives next state to 0), within action-grid spacing.
    assert_allclose(best[:, 0], -states, atol=0.11)
    assert_allclose(np.asarray(rl.policy.parameters), best)


def test_discrete_policy_optimization_with_constraint():
    grid = GridWorld([[-1, 1]], 5)
    dynamics = LinearSystem([np.array([[1.0]]), np.array([[1.0]])])
    reward = LambdaFunction(lambda xu: -(xu[:, :1] + xu[:, 1:]) ** 2)
    policy = Triangulation(grid, np.zeros(grid.nindex), project=True)
    value = Triangulation(grid, np.zeros(grid.nindex), project=True)
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=0.9)

    action_space = np.array([[-0.5], [0.0], [0.5]])

    def constraint(actions):
        # Only non-negative actions are "safe".
        return jnp.asarray(actions)[:, 0]

    best = np.asarray(rl.discrete_policy_optimization(action_space,
                                                      constraint))
    assert (best >= 0).all()


def test_lyapunov_constrained_future_values():
    """The Lagrangian penalty lowers values where the decrease condition
    is violated (reference :107-112)."""
    from safe_learning_tpu import Lyapunov

    grid = GridWorld([[-1, 1]], 11)
    dynamics = LinearSystem([np.array([[1.5]]), np.array([[0.0]])])
    policy = LambdaFunction(lambda x: 0.0 * x)
    reward = LambdaFunction(lambda xu: jnp.zeros_like(xu[:, :1]))
    value = Triangulation(grid, np.zeros(grid.nindex), project=True)
    v = QuadraticFunction(np.eye(1))
    lyap = Lyapunov(grid, v, dynamics, 1.5, 1.0, 0.0, policy)
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=0.9)

    states = np.array([[0.5]])
    plain = np.asarray(rl.future_values(states))
    constrained = np.asarray(rl.future_values(states, lyapunov=lyap,
                                              lagrange_multiplier=2.0))
    # decrease = (1.5*0.5)^2 - 0.5^2 = 0.3125 > 0 = threshold -> penalty.
    assert_allclose(constrained, plain - 2.0 * 0.3125, atol=1e-9)


def _lp_setup(seed=0, n=11):
    """Small PWL value problem: grid triangulation, contracting dynamics."""
    import jax.numpy as jnp

    import safe_learning_tpu as sl

    rng = np.random.default_rng(seed)
    grid = GridWorld([[-1, 1], [-1, 1]], n)
    value_function = sl.Triangulation(grid, np.zeros(grid.nindex),
                                      project=True)
    a = np.array([[0.6, 0.1], [-0.05, 0.7]])
    dynamics = sl.LinearSystem([a, np.zeros((2, 1))])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    w = rng.normal(size=(2,))
    reward = sl.LambdaFunction(
        lambda xu: -(xu[:, :2] ** 2) @ jnp.asarray(np.abs(w) + 0.1))
    rl = sl.PolicyIteration(policy, dynamics, reward, value_function,
                            gamma=0.9)
    return rl, grid


def _interpolation_matrix(value_function, points):
    """Dense B with B[i, vertices[i]] = weights[i] (ndim+1 nnz per row)."""
    vertices, weights = map(np.asarray,
                            value_function.interpolation_weights(points))
    n, nv = len(points), value_function.nindex
    b = np.zeros((n, nv))
    np.add.at(b, (np.arange(n)[:, None], vertices), weights)
    return b


def test_pwl_fixed_point_matches_scipy_linprog():
    """The on-device contraction solve reaches the exact LP optimum of the
    reference formulation ``max sum(v) s.t. v <= r + gamma B v``
    (reference reinforcement_learning.py:166-176), cross-validated with an
    independent solver (scipy HiGHS)."""
    from scipy.optimize import linprog

    import jax.numpy as jnp

    rl, grid = _lp_setup()
    values = np.asarray(rl.optimize_value_function()).ravel()

    actions = rl.policy(rl.state_space)
    next_states = np.asarray(rl.dynamics(rl.state_space, actions))
    rewards = np.asarray(rl.reward_function(rl.state_space,
                                            actions)).ravel()
    b = _interpolation_matrix(rl.value_function, next_states)
    n = grid.nindex
    # max sum(v)  s.t. (I - gamma B) v <= r   ==  min -sum(v).
    res = linprog(c=-np.ones(n), A_ub=np.eye(n) - rl.gamma * b,
                  b_ub=rewards, bounds=[(None, None)] * n,
                  method="highs")
    assert res.status == 0, res.message
    assert_allclose(values, res.x, atol=1e-6)


def test_pwl_fixed_point_matches_cvxpy_lp():
    """Literal port of the reference's cvxpy LP
    (reinforcement_learning.py:166-176), skipped when cvxpy is missing
    (mirroring reference test_rl.py:21-24)."""
    cvxpy = pytest.importorskip("cvxpy")

    rl, grid = _lp_setup(seed=1)
    values = np.asarray(rl.optimize_value_function()).ravel()

    actions = rl.policy(rl.state_space)
    next_states = np.asarray(rl.dynamics(rl.state_space, actions))
    rewards = np.asarray(rl.reward_function(rl.state_space,
                                            actions)).ravel()
    b = _interpolation_matrix(rl.value_function, next_states)

    v = cvxpy.Variable(grid.nindex)
    constraints = [v <= rewards + rl.gamma * (b @ v)]
    objective = cvxpy.Maximize(cvxpy.sum(v))
    prob = cvxpy.Problem(objective, constraints)
    prob.solve()
    assert prob.status == cvxpy.OPTIMAL
    assert_allclose(values, np.asarray(v.value).ravel(), atol=1e-5)


def test_optimize_policy_scanned_ascent_recovers_lqr_gain():
    """optimize_policy runs K gradient steps as one compiled scan and
    drives a linear policy toward the DARE-optimal gain (reference
    pattern: per-step GradientDescentOptimizer session.runs,
    inverted_pendulum.ipynb cell 9 / test_rl.py:59-69)."""
    a, b, q, r, k, p = _scalar_lq_setup()
    gamma = 0.98
    grid = GridWorld([[-1, 1]], 41)

    dynamics = LinearSystem([a, b])
    reward = LambdaFunction(
        lambda xu: -(q[0, 0] * xu[:, :1] ** 2 + r[0, 0] * xu[:, 1:] ** 2))
    value = Triangulation(grid, np.zeros(grid.nindex), project=True)

    # Solve the value function under the OPTIMAL policy; the ascent from
    # a zero policy against that fixed v* is a policy-improvement step
    # whose maximizer is the DARE gain.
    rl = PolicyIteration(LinearSystem(-k), dynamics, reward, value,
                         gamma=gamma)
    rl.optimize_value_function()
    rl.policy = LinearSystem(np.zeros((1, 1)))
    losses = rl.optimize_policy(steps=200, learning_rate=0.1,
                                batch_size=256,
                                key=jax.random.PRNGKey(0))
    assert losses.shape == (200,)
    gain = -float(np.asarray(rl.policy.matrix).item())
    assert losses[-1] < losses[0]
    assert abs(gain - float(k.item())) < 0.1


def test_optimize_policy_lyapunov_penalty_runs():
    """The Lyapunov-penalized scanned ascent compiles and reduces the
    penalized objective (reference :107-112)."""
    a, b, q, r, k, p = _scalar_lq_setup()
    grid = GridWorld([[-1, 1]], 21)
    dynamics = LinearSystem([a, b])
    reward = LambdaFunction(
        lambda xu: -(q[0, 0] * xu[:, :1] ** 2 + r[0, 0] * xu[:, 1:] ** 2))
    value = Triangulation(grid, -np.abs(grid.all_points[:, 0]),
                          project=True)
    rl = PolicyIteration(LinearSystem(-0.5 * k), dynamics, reward, value,
                         gamma=0.98)
    lyap = sl.Lyapunov(grid, QuadraticFunction(p), dynamics,
                       float(np.abs(a).item() + np.abs(b).item()), 1.0,
                       1e-2, rl.policy)
    losses = rl.optimize_policy(steps=40, learning_rate=0.02,
                                batch_size=128, lyapunov=lyap,
                                lagrange_multiplier=0.5,
                                key=jax.random.PRNGKey(0))
    assert losses.shape == (40,)
    assert np.isfinite(np.asarray(losses)).all()
    assert losses[-1] <= losses[0]


def test_optimize_policy_preserves_saturation_bounds():
    """Gradient ascent must update only TRAINABLE parameters: a
    Saturation-wrapped policy keeps its action limits exactly (the
    reference's trainable-variable-scope semantics — bounds were
    constants there)."""
    a, b = np.array([[1.2]]), np.array([[1.0]])
    grid = GridWorld([[-1, 1]], 21)
    dynamics = LinearSystem([a, b])
    reward = LambdaFunction(lambda xu: -(xu[:, :1] ** 2 + xu[:, 1:] ** 2))
    value = Triangulation(grid, -np.abs(grid.all_points[:, 0]),
                          project=True)
    policy = sl.Saturation(LinearSystem([[-2.0]]), -0.1, 0.1)
    rl = PolicyIteration(policy, dynamics, reward, value, gamma=0.98)
    rl.optimize_policy(steps=50, learning_rate=0.1,
                       key=jax.random.PRNGKey(0))
    assert float(rl.policy.lower) == -0.1
    assert float(rl.policy.upper) == 0.1
    # ... while the wrapped gain did move.
    assert not np.allclose(np.asarray(rl.policy.fun.matrix), -2.0)


def test_optimize_policy_rejects_parameterless_policy():
    grid = GridWorld([[-1, 1]], 11)
    rl = PolicyIteration(
        LambdaFunction(lambda x: -0.5 * x),
        LinearSystem([np.array([[0.8]]), np.array([[1.0]])]),
        LambdaFunction(lambda xu: -xu[:, :1] ** 2),
        Triangulation(grid, np.zeros(grid.nindex), project=True),
        gamma=0.9)
    with pytest.raises(ValueError, match="trainable"):
        rl.optimize_policy(steps=5)


def _mountain_car_setup(n=9):
    """Small mountain-car policy-iteration instance (deterministic)."""
    domain = [[-1.2, 0.7], [-0.07, 0.07]]
    grid = GridWorld(domain, [n, n])
    value_function = Triangulation(grid, np.zeros(grid.nindex),
                                   project=True)
    policy = sl.Saturation(
        Triangulation(grid, np.zeros(grid.nindex), project=True),
        -1.0, 1.0)

    def dynamics_fn(xu):
        x0 = xu[:, 0] + xu[:, 1]
        x1 = (xu[:, 1] + 0.001 * xu[:, 2]
              - 0.0025 * jnp.cos(3 * xu[:, 0]))
        return jnp.stack((x0, x1), axis=1)

    def reward_fn(xu):
        return jnp.where(xu[:, :1] > 0.6, 0.01, 0.0)

    dynamics = LambdaFunction(dynamics_fn, input_dim=3, output_dim=2)
    reward = LambdaFunction(reward_fn, input_dim=3, output_dim=1)
    return PolicyIteration(policy, dynamics, reward, value_function,
                           gamma=0.99)


def test_fused_policy_iteration_matches_manual_loop():
    """The one-dispatch policy_iteration reproduces the host-loop
    alternation (value solve + full-grid ascent) step for step."""
    from safe_learning_tpu.rl import _future_values_core

    rl = _mountain_car_setup()
    gamma = rl.gamma
    states = rl.state_space
    outer, steps, lr = 4, 20, 1.0

    # Manual host loop (the pattern of examples/basic_dynamic_programming
    # before round 3).
    manual = _mountain_car_setup()

    @jax.jit
    def ascent(pol, vf):
        def body(p, _):
            def loss(pp):
                return -1.0 / (1 - gamma) * jnp.mean(_future_values_core(
                    pol.with_parameters(pp), manual.dynamics,
                    manual.reward_function, vf, gamma, states, None))

            return jax.tree_util.tree_map(
                lambda w, g: w - lr * g, p, jax.grad(loss)(p)), None

        params, _ = jax.lax.scan(body, pol.parameters_dict, None,
                                 length=steps)
        return pol.with_parameters(params)

    for _ in range(outer):
        manual.optimize_value_function()
        manual.policy = ascent(manual.policy, manual.value_function)

    info = rl.policy_iteration(outer_iters=outer, ascent_steps=steps,
                               learning_rate=lr, convergence_tol=0.0)
    assert info["iterations"] == outer
    assert_allclose(np.asarray(rl.value_function.parameters),
                    np.asarray(manual.value_function.parameters),
                    rtol=0, atol=1e-10)
    assert_allclose(np.asarray(rl.policy.fun.parameters),
                    np.asarray(manual.policy.fun.parameters),
                    rtol=0, atol=1e-10)


def test_fused_policy_iteration_converges_and_stops_early():
    rl = _mountain_car_setup()
    info = rl.policy_iteration(outer_iters=50, ascent_steps=20,
                               learning_rate=1.0, convergence_tol=0.1)
    assert info["converged"]
    assert info["iterations"] < 50
    assert info["value_change"] <= 0.1
    assert info["policy_change"] <= 0.1


def test_fused_policy_iteration_rejects_parameterless_policy():
    rl = _mountain_car_setup()
    rl.policy = LambdaFunction(lambda x: 0.0 * x[:, :1], input_dim=2,
                               output_dim=1)
    with pytest.raises(ValueError):
        rl.policy_iteration(outer_iters=1)
