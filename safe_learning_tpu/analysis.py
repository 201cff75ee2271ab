"""Closed-loop analysis tools: ROA estimation, reward rollouts, responses.

TPU-native equivalents of the reference's example-layer tooling
(``/root/reference/examples/utilities.py:522-686``). The reference forward-
simulates grids with one Python loop step per ``session.run``; here whole
grids roll out inside a single ``lax.fori_loop``/``lax.scan`` program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .grids import GridWorld

__all__ = ["compute_roa", "reward_rollout", "compute_closedloop_response",
           "gridify"]


def _grid_points(grid):
    if isinstance(grid, GridWorld):
        return jnp.asarray(grid.all_points)
    return jnp.atleast_2d(jnp.asarray(grid))


def _simulate(closed_loop_dynamics, points, horizon,
              return_trajectories=False, clip=1e6):
    """Roll every point forward ``horizon - 1`` steps in one scan.

    Divergent trajectories are clamped to ``[-clip, clip]`` so they stay
    finite (inf/NaN propagation is slow on CPU and an overflowing point
    is equally outside the ROA either way).
    """
    def step(states, _):
        nxt = closed_loop_dynamics(states)
        if isinstance(nxt, tuple):
            nxt = nxt[0]
        nxt = jnp.clip(nxt, -clip, clip)
        return nxt, (nxt if return_trajectories else None)

    end_states, traj = jax.lax.scan(step, points, None, length=horizon - 1)
    return end_states, traj


def compute_roa(grid, closed_loop_dynamics, horizon=100, tol=1e-3,
                equilibrium=None, no_traj=True, segment_steps=None):
    """Brute-force region of attraction by forward simulation.

    Simulates every grid point and keeps those ending within ``tol`` of
    the equilibrium (reference ``examples/utilities.py:654-686``).

    ``segment_steps`` splits the rollout into host-sequenced scans of at
    most that many steps each (end states feed the next segment —
    bitwise the same composition as one scan). Use it to bound
    single-dispatch duration on very large (grid x horizon) products:
    one 51^4 x 2000-step dispatch (~90 s of device time) exceeds this
    machine's TPU-worker limit and kills the worker, while 4 x 500-step
    segments run fine. Only valid with ``no_traj=True``.
    """
    points = _grid_points(grid)
    if segment_steps is not None:
        if not no_traj:
            raise ValueError("segment_steps requires no_traj=True "
                             "(segmented trajectories are not stacked)")
        segment_steps = int(segment_steps)
        if segment_steps < 1:
            raise ValueError("segment_steps must be >= 1 (got {}); a "
                             "non-positive chunk would never consume the "
                             "horizon".format(segment_steps))
    if segment_steps is not None and horizon - 1 > int(segment_steps):
        remaining = horizon - 1
        end_states = points
        while remaining > 0:
            chunk = min(int(segment_steps), remaining)
            # _simulate runs `h - 1` steps for `horizon=h`.
            end_states, _ = _simulate(closed_loop_dynamics, end_states,
                                      chunk + 1)
            remaining -= chunk
        traj = None
    else:
        end_states, traj = _simulate(closed_loop_dynamics, points,
                                     horizon,
                                     return_trajectories=not no_traj)
    if equilibrium is None:
        equilibrium = jnp.zeros((1, points.shape[1]), dtype=points.dtype)
    dists = jnp.linalg.norm(end_states - equilibrium, axis=1)
    roa = np.asarray(dists <= tol)
    if no_traj:
        return roa
    # (nindex, ndim, horizon) with the initial states first, matching the
    # reference layout.
    trajectories = jnp.concatenate(
        [points[:, :, None], jnp.moveaxis(traj, 0, 2)], axis=2)
    return roa, np.asarray(trajectories)


def reward_rollout(grid, closed_loop_dynamics, reward_function, discount,
                   horizon=250, tol=1e-3):
    """Discounted finite-horizon reward sums over a discretization.

    (reference ``examples/utilities.py:522-545``).

    The rollout runs fully on device with a convergence flag computed in
    the same program (early exit is not free under ``jit``; the horizon
    bounds the work instead).
    """
    points = _grid_points(grid)

    def step(carry, t):
        """One scan step."""
        states, rollout, done = carry
        contrib = (discount ** t) * reward_function(states).reshape(-1)
        # The reference accumulates the first below-tol contribution and
        # then BREAKS (examples/utilities.py:534-538); freezing the sum
        # once `done` reproduces that exactly under lax.scan.
        rollout = rollout + jnp.where(done, 0.0, contrib)
        max_contrib = jnp.max(jnp.abs(contrib))
        done_next = done | (max_contrib < tol)
        nxt = closed_loop_dynamics(states)
        if isinstance(nxt, tuple):
            nxt = nxt[0]
        return (nxt, rollout, done_next), jnp.where(done, jnp.inf,
                                                    max_contrib)

    init = (points, jnp.zeros(points.shape[0], dtype=points.dtype),
            jnp.asarray(False))
    (_, rollout, _), max_contribs = jax.lax.scan(
        step, init, jnp.arange(horizon))
    below = np.asarray(max_contribs) < tol
    if below.any():
        print("Reward sums converged after {} steps!".format(
            int(np.argmax(below)) + 1))
    else:
        print("Reward sums did not converge!")
    return np.asarray(rollout)


def compute_closedloop_response(dynamics, policy, state_dim, steps, dt,
                                reference="zero", const=1.0, ic=None):
    """Closed-loop response to impulse/step/zero reference signals.

    (reference ``examples/utilities.py:602-636``)."""
    action_dim = policy.output_dim

    if reference == "impulse":
        r = np.zeros((steps + 1, action_dim))
        r[0, :] = 1.0 / dt
    elif reference == "step":
        r = const * np.ones((steps + 1, action_dim))
    elif reference == "zero":
        r = np.zeros((steps + 1, action_dim))
    else:
        raise ValueError("unknown reference {!r}".format(reference))
    r = jnp.asarray(r, dtype=config.dtype)

    x0 = jnp.zeros((1, state_dim), dtype=config.dtype)
    if ic is not None:
        x0 = jnp.asarray(ic, dtype=config.dtype).reshape(1, state_dim)

    def step(state, ref):
        """One scan step."""
        action = policy(state)
        nxt = dynamics(state, action + ref[None, :])
        if isinstance(nxt, tuple):
            nxt = nxt[0]
        return nxt, (state[0], action[0])

    _, (states, actions) = jax.lax.scan(step, x0, r)
    times = dt * np.arange(steps + 1, dtype=config.np_dtype).reshape(-1, 1)
    return (np.asarray(states), np.asarray(actions), times, np.asarray(r))


def gridify(norms, maxes=None, num_points=25):
    """Construct a normalized GridWorld from per-dimension scales.

    (reference ``examples/utilities.py:639-651``)."""
    norms = np.asarray(norms).ravel()
    maxes = norms if maxes is None else np.asarray(maxes).ravel()
    limits = np.column_stack((-maxes / norms, maxes / norms))
    if isinstance(num_points, int):
        num_points = [num_points] * len(norms)
    return GridWorld(limits, num_points)
