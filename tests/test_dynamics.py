"""Tests for the benchmark dynamics and analysis tools."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

import safe_learning_tpu as sl
from safe_learning_tpu import (CartPole, GridWorld, InvertedPendulum,
                               LinearSystem, VanDerPol, compute_roa,
                               compute_closedloop_response, gridify,
                               reward_rollout)
from safe_learning_tpu.utils import compute_trajectory, dlqr


def test_pendulum_linearization_matches_analytic():
    """A = [[0, 1], [g/l, -c/I]] (reference examples/utilities.py:207-240)."""
    import scipy.signal

    pend = InvertedPendulum(mass=0.25, length=0.5, friction=0.1, dt=0.01)
    a, b = pend.linearize()
    g, length = 9.81, 0.5
    inertia = 0.25 * 0.5 ** 2
    a_cont = np.array([[0.0, 1.0], [g / length, -0.1 / inertia]])
    b_cont = np.array([[0.0], [1.0 / inertia]])
    sysd = scipy.signal.StateSpace(a_cont, b_cont, np.eye(2),
                                   np.zeros((2, 1))).to_discrete(0.01)
    assert_allclose(a, sysd.A, atol=1e-10)
    assert_allclose(b, sysd.B, atol=1e-10)


def test_pendulum_euler_close_to_linear_near_origin():
    pend = InvertedPendulum(mass=0.25, length=0.5, friction=0.1, dt=0.01)
    a, b = pend.linearize()
    x = np.array([[0.01, -0.02]])
    u = np.array([[0.005]])
    nonlinear = np.asarray(pend(jnp.asarray(x), jnp.asarray(u)))
    linear = x @ a.T + u @ b.T
    # 10-step Euler vs exact ZOH: O(dt^2 / n) discretization error.
    assert_allclose(nonlinear, linear, atol=1e-5)


def test_pendulum_normalization_roundtrip():
    norm = ([0.5, 2.0], [1.2])
    pend = InvertedPendulum(mass=0.25, length=0.5, friction=0.1, dt=0.01,
                            normalization=norm)
    x = jnp.asarray(np.array([[0.3, -0.4]]))
    u = jnp.asarray(np.array([[0.7]]))
    xd, ud = pend.denormalize(x, u)
    xn, un = pend.normalize(xd, ud)
    assert_allclose(np.asarray(xn), np.asarray(x), atol=1e-12)
    assert_allclose(np.asarray(un), np.asarray(u), atol=1e-12)


def test_pendulum_stabilized_by_lqr():
    pend = InvertedPendulum(mass=0.25, length=0.5, friction=0.1, dt=0.01)
    a, b = pend.linearize()
    k, _ = dlqr(a, b, np.eye(2), np.eye(1))
    policy = LinearSystem(-k)
    states, actions = compute_trajectory(pend, policy,
                                         np.array([[0.2, 0.0]]), 300)
    assert np.linalg.norm(np.asarray(states)[-1]) < 1e-2
    assert actions.shape == (299, 1)


def test_cartpole_linearization_shape_and_stability():
    cp = CartPole(pendulum_mass=0.1, cart_mass=1.0, length=0.5,
                  rot_friction=0.01, dt=0.01)
    a, b = cp.linearize()
    assert a.shape == (4, 4) and b.shape == (4, 1)
    k, _ = dlqr(a, b, np.eye(4), np.eye(1))
    acl = a - b @ k
    assert np.abs(np.linalg.eigvals(acl)).max() < 1.0
    # Closed-loop simulation of the nonlinear system converges.
    policy = LinearSystem(-k)
    states, _ = compute_trajectory(cp, policy,
                                   np.array([[0.05, 0.05, 0.0, 0.0]]), 1500)
    assert np.linalg.norm(np.asarray(states)[-1]) < 1e-2


def test_cartpole_analytic_jacobian():
    """Autodiff linearization equals the hand Jacobian of the actual ODE.

    Note: the reference's hand-written ``A`` (examples/utilities.py:369-375)
    is inconsistent with its own ODE (examples/utilities.py:425-433) — the
    ODE's gravity/friction terms in the cart acceleration carry an extra
    factor ``L`` relative to the claimed ``A[2, :]`` row. We linearize the
    ODE itself (the ODE here matches the reference's), so the comparison
    below uses the ODE-consistent Jacobian.
    """
    m, M, L, b_f = 0.1, 1.0, 0.5, 0.01
    g = 9.81
    cp = CartPole(m, M, L, rot_friction=b_f, dt=0.01)
    a, b = cp.linearize()
    a_cont = np.array([
        [0, 0, 1, 0],
        [0, 0, 0, 1],
        [0, g * m * L / M, 0, -b_f / M],
        [0, g * (m + M) / (L * M), 0, -b_f * (m + M) / (m * M * L ** 2)]])
    b_cont = np.array([0, 0, 1 / M, 1 / (M * L)]).reshape(-1, 1)
    import scipy.signal
    ad, bd, *_ = scipy.signal.cont2discrete(
        (a_cont, b_cont, np.zeros((1, 4)), 0), 0.01, method="zoh")
    assert_allclose(a, ad, atol=1e-9)
    assert_allclose(b, bd, atol=1e-9)


def test_vanderpol_reverse_time_roa():
    """In reverse time the Van der Pol origin is attractive inside the
    limit cycle."""
    vdp = VanDerPol(damping=1.0, dt=0.01)
    ad = vdp.linearize()
    assert ad.shape == (2, 2)
    assert np.abs(np.linalg.eigvals(ad)).max() < 1.0
    grid = GridWorld([[-1, 1], [-1, 1]], 5)
    roa = compute_roa(grid, vdp, horizon=2000, tol=0.05)
    idx = grid.nindex // 2  # origin
    assert roa[idx]
    assert roa.sum() >= 1


def test_compute_roa_with_trajectories():
    dyn = LinearSystem(np.array([[0.5, 0.0], [0.0, 0.5]]))
    grid = GridWorld([[-1, 1], [-1, 1]], 3)
    fun = lambda x: dyn(x)
    roa, traj = compute_roa(grid, fun, horizon=50, tol=1e-3, no_traj=False)
    assert roa.all()
    assert traj.shape == (9, 2, 50)
    assert_allclose(traj[:, :, 0], grid.all_points)


def test_reward_rollout(capsys):
    dyn = LinearSystem(np.array([[0.5]]))
    grid = GridWorld([[-1, 1]], 5)
    rollout = reward_rollout(grid, lambda x: dyn(x),
                             lambda x: jnp.asarray(x)[:, :1] ** 2,
                             discount=0.9, horizon=100)
    # Reference semantics (examples/utilities.py:534-538): accumulate the
    # geometric series 0.9^t (0.25^t x^2) up to AND INCLUDING the first
    # step whose max contribution drops below tol=1e-3, then stop.
    q = 0.9 * 0.25
    steps = next(t for t in range(100) if q ** t < 1e-3) + 1
    expected = (grid.all_points[:, 0] ** 2
                * sum(q ** t for t in range(steps)))
    assert_allclose(rollout, expected, atol=1e-6)
    assert "converged after {} steps".format(steps) \
        in capsys.readouterr().out


def test_compute_closedloop_response():
    pend = InvertedPendulum(mass=0.25, length=0.5, friction=0.1, dt=0.01)
    a, b = pend.linearize()
    k, _ = dlqr(a, b, np.eye(2), np.eye(1))
    policy = LinearSystem(-k)
    states, actions, times, r = compute_closedloop_response(
        pend, policy, 2, steps=50, dt=0.01, reference="step", const=0.1)
    # steps + 1 rows including the initial state (reference layout).
    assert states.shape == (51, 2) and actions.shape == (51, 1)
    assert times.shape == (51, 1)
    assert_allclose(np.asarray(r), 0.1)


def test_gridify():
    grid = gridify([2.0, 4.0], num_points=5)
    assert grid.ndim == 2
    assert_allclose(grid.limits, [[-1, 1], [-1, 1]])


def test_vanderpol_linearization():
    """Reverse-time Van der Pol linearizes to an asymptotically stable
    origin (that's what makes the limit cycle an ROA boundary)."""
    vdp = VanDerPol(damping=1.0, dt=0.01)
    a = np.asarray(vdp.linearize())  # no inputs: single state matrix
    assert a.shape == (2, 2)
    eig = np.linalg.eigvals(a)
    assert (np.abs(eig) < 1).all()  # discrete-time stable


def test_compute_roa_segmented_matches_single_scan():
    """segment_steps composes to exactly the same end states."""
    import safe_learning_tpu as sl

    pend = sl.InvertedPendulum(0.15, 0.5, 0.1, 0.01)
    k, _ = sl.utils.dlqr(*map(np.asarray, pend.linearize()),
                         np.eye(2), np.eye(1))
    pol = sl.LinearSystem(-k)

    @jax.jit
    def closed_loop(x):
        return pend(x, pol(x))

    grid = sl.GridWorld([[-0.5, 0.5]] * 2, 21)
    whole = sl.compute_roa(grid, closed_loop, horizon=97, tol=1e-2)
    segmented = sl.compute_roa(grid, closed_loop, horizon=97, tol=1e-2,
                               segment_steps=25)
    np.testing.assert_array_equal(whole, segmented)
    with pytest.raises(ValueError):
        sl.compute_roa(grid, closed_loop, horizon=97, no_traj=False,
                       segment_steps=25)


def test_compute_roa_rejects_nonpositive_segment_steps():
    """A chunk size < 1 would never consume the horizon (infinite loop);
    it must be rejected up front like the no_traj misuse."""
    import safe_learning_tpu as sl

    pend = sl.InvertedPendulum(0.15, 0.5, 0.1, 0.01)

    @jax.jit
    def closed_loop(x):
        return pend(x, 0.0 * x[:, :1])

    grid = sl.GridWorld([[-0.5, 0.5]] * 2, 5)
    for bad in (0, -3, 0.5):
        with pytest.raises(ValueError, match="segment_steps"):
            sl.compute_roa(grid, closed_loop, horizon=10,
                           segment_steps=bad)
