"""Approximate dynamic programming / safe policy iteration.

TPU-native re-design of
``/root/reference/safe_learning/reinforcement_learning.py``. Differences by
construction:

- ``optimize_value_function``: the reference ships the sparse interpolation
  matrix to a host cvxpy LP (``reinforcement_learning.py:142-211``). For a
  piecewise-linear value function with discount ``gamma < 1`` the LP
  ``max sum(v) s.t. v <= r + gamma B v`` has the unique fixed point of the
  monotone contraction ``T(v) = r + gamma B v`` as its solution (B has
  nonnegative rows summing to one — barycentric weights), so we solve it
  on device with a ``lax.while_loop`` fixed-point iteration over a gather
  -weighted segment sum. ``OptimizationError`` is raised on non-convergence.
- ``discrete_policy_optimization`` evaluates the whole action space with one
  ``vmap`` instead of a Python loop re-feeding one cached graph
  (``reinforcement_learning.py:213-279``).
- Everything is functional: methods return updated parameters / functions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .functions.base import Function, as_deterministic
from .lyapunov import _decrease_bound, _threshold

__all__ = ["PolicyIteration", "OptimizationError"]


class OptimizationError(Exception):
    """Raised when the value-function solve fails.

    (reference ``reinforcement_learning.py:22``)."""


@jax.jit
def _future_values_core(policy, dynamics, reward_function, value_function,
                        gamma, states, actions):
    """``r + gamma * v(f(x, u))`` (reference ``:65-105``)."""
    if actions is None:
        actions = policy(states)
    next_states = dynamics(states, actions)
    rewards = reward_function(states, actions).reshape(-1, 1)
    if isinstance(next_states, (tuple, list)):
        next_states, _ = next_states
    expected = value_function(next_states).reshape(-1, 1)
    return rewards + gamma * expected


@jax.jit
def _future_values_lyapunov(policy, dynamics, reward_function,
                            value_function, gamma, states, actions,
                            lyapunov_function, lipschitz_lyapunov,
                            lipschitz_dynamics, tau, lagrange_multiplier):
    """Future values with a Lagrangian Lyapunov penalty (ref ``:107-112``)."""
    if actions is None:
        actions = policy(states)
    next_states = dynamics(states, actions)
    rewards = reward_function(states, actions).reshape(-1, 1)
    decrease = _decrease_bound(lyapunov_function, lipschitz_lyapunov,
                               states, next_states)
    if isinstance(next_states, (tuple, list)):
        next_states, _ = next_states
    expected = value_function(next_states).reshape(-1, 1)
    updated = rewards + gamma * expected
    constraint = decrease - _threshold(lipschitz_lyapunov,
                                       lipschitz_dynamics, states, tau)
    return updated - lagrange_multiplier * constraint


@partial(jax.jit, static_argnames=("steps", "batch_size", "space"))
def _policy_ascent(policy, params, dynamics, reward_function,
                   value_function, gamma, lyap, learning_rate, key, *,
                   steps, batch_size, space):
    """Policy-gradient ascent on the mean future value, fully on device.

    All ``steps`` steps run as ONE compiled ``lax.scan`` program with
    minibatches drawn on device.

    Only the policy's TRAINABLE parameters (``parameters_dict`` — the
    analogue of the reference's trainable-variable scopes) receive
    updates; structural leaves such as :class:`Saturation` action bounds
    stay fixed. ``lyap`` is ``None`` or the tuple of Lyapunov-penalty
    pieces (reference ``:107-112``).
    """
    lo = jnp.asarray(np.asarray(space.limits)[:, 0], dtype=config.dtype)
    hi = jnp.asarray(np.asarray(space.limits)[:, 1], dtype=config.dtype)

    def body(carry, _):
        p, k = carry
        k, k_batch = jax.random.split(k)
        states = jax.random.uniform(k_batch, (batch_size, space.ndim),
                                    config.dtype, lo, hi)

        def loss(pp):
            pol = policy.with_parameters(pp)
            if lyap is None:
                return -jnp.mean(_future_values_core(
                    pol, dynamics, reward_function, value_function,
                    gamma, states, None))
            (lyapunov_function, lipschitz_lyapunov, lipschitz_dynamics,
             tau, lagrange_multiplier) = lyap
            return -jnp.mean(_future_values_lyapunov(
                pol, dynamics, reward_function, value_function, gamma,
                states, None, lyapunov_function, lipschitz_lyapunov,
                lipschitz_dynamics, tau, lagrange_multiplier))

        value, grads = jax.value_and_grad(loss)(p)
        p = jax.tree_util.tree_map(lambda w, g: w - learning_rate * g,
                                   p, grads)
        return (p, k), value

    (params, _), losses = jax.lax.scan(body, (params, key), None,
                                       length=steps)
    return params, losses


@partial(jax.jit, static_argnames=("outer_iters", "ascent_steps",
                                   "value_max_iter"))
def _fused_policy_iteration(policy, pparams0, value_function, dynamics,
                            reward_function, gamma, states,
                            learning_rate, value_tol, convergence_tol,
                            *, outer_iters, ascent_steps,
                            value_max_iter):
    """Whole policy iteration (value solves + ascent rounds) on device.

    One ``lax.while_loop`` over outer iterations; each iteration nests
    the PWL value fixed point (``lax.while_loop``) and ``ascent_steps``
    full-grid gradient-ascent steps (``lax.scan``). Convergence — both
    the value parameters and the policy's *outputs* over the state grid
    changing by at most ``convergence_tol`` — is decided on device, so
    the entire optimization is ONE dispatch with no host round-trips.

    Returns ``(values, pparams, iterations, value_change,
    policy_change, worst_delta)`` where ``worst_delta`` is the largest
    final fixed-point residual seen (checked on the host afterwards).
    """
    init_v = jnp.asarray(value_function.parameters[:, :1])

    def outer_cond(carry):
        _, _, it, vc, pc, _ = carry
        return jnp.logical_and(
            it < outer_iters,
            jnp.logical_or(vc > convergence_tol, pc > convergence_tol))

    def outer_body(carry):
        vparams, pparams, it, _, _, worst = carry
        pol = policy.with_parameters(pparams)
        actions = pol(states)
        next_states = dynamics(states, actions)
        if isinstance(next_states, (tuple, list)):
            next_states = next_states[0]
        rewards = reward_function(states, actions).reshape(-1, 1)
        vertices, weights = value_function.interpolation_weights(
            next_states)
        values, delta, _ = _pwl_fixed_point(
            vertices, weights, rewards, gamma, vparams, value_tol,
            value_max_iter)
        vf = value_function.replace(parameters=values)

        def ascent_body(p, _):
            def loss(pp):
                return -1.0 / (1.0 - gamma) * jnp.mean(
                    _future_values_core(policy.with_parameters(pp),
                                        dynamics, reward_function, vf,
                                        gamma, states, None))

            grads = jax.grad(loss)(p)
            return jax.tree_util.tree_map(
                lambda w, g: w - learning_rate * g, p, grads), None

        new_pparams, _ = jax.lax.scan(ascent_body, pparams, None,
                                      length=ascent_steps)
        value_change = jnp.max(jnp.abs(values - vparams))
        policy_change = jnp.max(jnp.abs(
            policy.with_parameters(new_pparams)(states) - pol(states)))
        return (values, new_pparams, it + 1, value_change,
                policy_change, jnp.maximum(worst, delta))

    init = (init_v, pparams0, jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, init_v.dtype),
            jnp.asarray(jnp.inf, init_v.dtype),
            jnp.asarray(0.0, init_v.dtype))
    return jax.lax.while_loop(outer_cond, outer_body, init)


@partial(jax.jit, static_argnames=("max_iter",))
def _pwl_fixed_point(vertices, weights, rewards, gamma, init_values, tol,
                     max_iter):
    """Solve ``v = r + gamma * B v`` on device.

    ``B`` is the sparse barycentric interpolation operator represented as
    ``(vertices, weights)`` with ``ndim + 1`` entries per row — the matvec
    is a gather + weighted sum, never a dense matrix.
    ``tol`` is RELATIVE to ``max(1, max|v|)``: an absolute tolerance
    below the ulp of large values would make a machine-precision-
    converged iterate oscillate forever and report divergence.
    Returns ``(values, delta, iterations)`` with ``delta`` scaled.
    """
    def body(carry):
        v, _, it = carry
        bv = jnp.sum(weights * v[vertices, 0], axis=1, keepdims=True)
        v_new = rewards + gamma * bv
        scale = jnp.maximum(1.0, jnp.max(jnp.abs(v_new)))
        delta = jnp.max(jnp.abs(v_new - v)) / scale
        return v_new, delta, it + 1

    def cond(carry):
        _, delta, it = carry
        return jnp.logical_and(delta > tol, it < max_iter)

    init = (init_values, jnp.asarray(jnp.inf, dtype=init_values.dtype),
            jnp.asarray(0, dtype=jnp.int32))
    values, delta, iterations = jax.lax.while_loop(cond, body, init)
    return values, delta, iterations


class PolicyIteration:
    """Safe approximate policy iteration.

    (reference ``reinforcement_learning.py:26-279``).

    Parameters
    ----------
    policy : Function
    dynamics : Function
    reward_function : Function or callable
    value_function : Triangulation (or any DeterministicFunction with a
        ``discretization``)
    gamma : float
        Discount factor.
    """

    def __init__(self, policy, dynamics, reward_function, value_function,
                 gamma=0.98):
        self.policy = as_deterministic(policy)
        self.dynamics = dynamics if isinstance(dynamics, Function) \
            else as_deterministic(dynamics)
        self.reward_function = as_deterministic(reward_function)
        self.value_function = value_function
        self.gamma = float(gamma)
        self.state_space = jnp.asarray(
            value_function.discretization.all_points)

    # ------------------------------------------------------------------
    def future_values(self, states, policy=None, actions=None,
                      lyapunov=None, lagrange_multiplier=1.0):
        """Expected one-step lookahead values (reference ``:65-114``).

        Optionally penalized by the Lyapunov decrease constraint."""
        states = jnp.atleast_2d(jnp.asarray(states))
        pol = self.policy if policy is None else as_deterministic(policy)
        if actions is not None:
            actions = jnp.atleast_2d(jnp.asarray(actions))
        if lyapunov is None:
            return _future_values_core(pol, self.dynamics,
                                       self.reward_function,
                                       self.value_function, self.gamma,
                                       states, actions)
        return _future_values_lyapunov(
            pol, self.dynamics, self.reward_function, self.value_function,
            self.gamma, states, actions, lyapunov.lyapunov_function,
            lyapunov._lipschitz_lyapunov, lyapunov._lipschitz_dynamics,
            lyapunov.tau, lagrange_multiplier)

    def bellmann_error(self, states):
        """Squared Bellman error with a stop-gradient target.

        (reference ``:116-133``)."""
        states = jnp.atleast_2d(jnp.asarray(states))
        target = jax.lax.stop_gradient(self.future_values(states))
        residual = target - self.value_function(states).reshape(-1, 1)
        return jnp.sum(jnp.square(residual))

    def value_iteration(self):
        """One synchronous value-iteration sweep (reference ``:135-140``).

        Functionally updates the value function's parameters."""
        new_values = self.future_values(self.state_space)
        self.value_function = self.value_function.replace(
            parameters=new_values)
        return new_values

    def optimize_policy(self, steps=100, learning_rate=0.01,
                        batch_size=1000, key=None, lyapunov=None,
                        lagrange_multiplier=1.0, sample_space=None):
        """Run policy-gradient ascent on the mean future value.

        All ``steps`` steps execute as ONE compiled program.

        The reference runs one ``session.run`` of
        ``GradientDescentOptimizer.minimize(-mean(future_values))`` per
        step (``inverted_pendulum.ipynb`` cells 9/17 behind
        ``reinforcement_learning.py:65-114``); here the whole loop is a
        ``lax.scan`` with on-device uniform minibatch sampling, so a
        200-step optimization is one dispatch instead of 200.

        Parameters
        ----------
        steps, batch_size : int (static: one compile per distinct value)
        learning_rate : float (traced; changing it does not recompile)
        key : jax PRNG key for minibatch sampling
        lyapunov : Lyapunov, optional
            Penalize the decrease-condition violation (Lagrangian
            constraint, reference ``:107-112``).
        lagrange_multiplier : float
        sample_space : GridWorld, optional
            Domain to sample minibatches from (default: the value
            function's discretization).

        Returns
        -------
        losses : (steps,) per-step negated mean future values.
        """
        space = (sample_space if sample_space is not None
                 else self.value_function.discretization)
        if key is None:
            # Carry an instance key: repeated calls in an outer loop
            # must draw FRESH minibatches, not replay one sequence.
            if not hasattr(self, "_policy_key"):
                self._policy_key = jax.random.PRNGKey(0)
            self._policy_key, key = jax.random.split(self._policy_key)
        params = self.policy.parameters_dict
        if not params:
            raise ValueError(
                "policy has no trainable parameters (parameters_dict is "
                "empty) — wrap it in a parameterized Function")
        lyap = None
        if lyapunov is not None:
            lyap = (lyapunov.lyapunov_function,
                    lyapunov._lipschitz_lyapunov,
                    lyapunov._lipschitz_dynamics, lyapunov.tau,
                    jnp.asarray(lagrange_multiplier, dtype=config.dtype))
        params, losses = _policy_ascent(
            self.policy, params, self.dynamics, self.reward_function,
            self.value_function, self.gamma, lyap,
            jnp.asarray(learning_rate, dtype=config.dtype), key,
            steps=steps, batch_size=batch_size, space=space)
        self.policy = self.policy.with_parameters(params)
        return losses

    # ------------------------------------------------------------------
    def optimize_value_function(self, tol=None, max_iter=20000):
        """Exact PWL value solve: fixed point of ``v = r + gamma B v``.

        Replaces the reference's host cvxpy LP
        (``reinforcement_learning.py:142-211``) with an on-device
        contraction iteration reaching the same solution. ``tol`` is
        relative to ``max(1, max|v|)``.
        """
        actions = self.policy(self.state_space)
        next_states = self.dynamics(self.state_space, actions)
        if isinstance(next_states, (tuple, list)):
            next_states, _ = next_states
        rewards = self.reward_function(self.state_space,
                                       actions).reshape(-1, 1)

        vertices, weights = self.value_function.interpolation_weights(
            next_states)
        init = jnp.asarray(self.value_function.parameters[:, :1])
        if tol is None:
            tol = 1e-9 if init.dtype == jnp.float64 else 1e-5
        tol = jnp.asarray(tol, dtype=init.dtype)
        values, delta, iterations = _pwl_fixed_point(
            vertices, weights, rewards, self.gamma, init, tol,
            int(max_iter))
        if not bool(np.isfinite(np.asarray(delta))) or \
                float(np.asarray(delta)) > float(np.asarray(tol)):
            raise OptimizationError(
                "PWL value iteration did not converge: delta={} after {} "
                "iterations".format(np.asarray(delta),
                                    int(np.asarray(iterations))))
        self.value_function = self.value_function.replace(parameters=values)
        return values

    # ------------------------------------------------------------------
    def policy_iteration(self, outer_iters=30, ascent_steps=200,
                         learning_rate=1.0, convergence_tol=0.1,
                         value_tol=None, value_max_iter=20000):
        """Run full policy iteration as ONE compiled device program.

        Alternates the exact PWL value solve
        (:meth:`optimize_value_function`) with ``ascent_steps``
        full-state-grid gradient-ascent steps on the one-step lookahead
        value, until both the value parameters and the policy outputs
        over the grid change by at most ``convergence_tol`` (or
        ``outer_iters`` is reached) — the loop the reference's
        ``basic_dynamic_programming.ipynb`` runs cell by cell with one
        ``session.run`` per step. Fusing it removes every host
        round-trip: through a high-latency device link the whole
        optimization costs one dispatch.

        Requires a policy with trainable parameters and deterministic
        dynamics (use :meth:`UncertainFunction.to_mean_function` for
        GPs). Updates ``self.policy`` and ``self.value_function``.

        Returns
        -------
        info : dict
            ``iterations``, ``converged``, ``value_change``,
            ``policy_change`` (diagnostics, device-synced).

        Raises
        ------
        OptimizationError
            If any inner value solve failed to reach its tolerance.
        """
        params = self.policy.parameters_dict
        if not params:
            raise ValueError(
                "policy has no trainable parameters (parameters_dict is "
                "empty) — wrap it in a parameterized Function")
        init = jnp.asarray(self.value_function.parameters[:, :1])
        if value_tol is None:
            value_tol = 1e-9 if init.dtype == jnp.float64 else 1e-5
        values, pparams, iterations, value_change, policy_change, \
            worst_delta = _fused_policy_iteration(
                self.policy, params, self.value_function, self.dynamics,
                self.reward_function, self.gamma, self.state_space,
                jnp.asarray(learning_rate, dtype=config.dtype),
                jnp.asarray(value_tol, dtype=init.dtype),
                jnp.asarray(convergence_tol, dtype=init.dtype),
                outer_iters=int(outer_iters),
                ascent_steps=int(ascent_steps),
                value_max_iter=int(value_max_iter))
        # One combined D2H for every scalar diagnostic: separate
        # float(np.asarray(...)) conversions would each block on their
        # own relay round trip (same fix as the Lyapunov sweep).
        worst, iters, vc, pc = jax.device_get(
            (worst_delta, iterations, value_change, policy_change))
        worst = float(worst)
        if not np.isfinite(worst) or worst > float(value_tol):
            raise OptimizationError(
                "PWL value iteration did not converge inside the fused "
                "policy iteration: worst delta={}".format(worst))
        self.value_function = self.value_function.replace(
            parameters=values)
        self.policy = self.policy.with_parameters(pparams)
        tol = float(convergence_tol)
        return {"iterations": int(iters),
                "converged": bool(float(vc) <= tol and float(pc) <= tol),
                "value_change": float(vc),
                "policy_change": float(pc)}

    # ------------------------------------------------------------------
    def discrete_policy_optimization(self, action_space, constraint=None):
        """Exhaustive policy improvement over a discrete action set.

        One ``vmap`` over the action space replaces the reference's Python
        loop (``reinforcement_learning.py:213-279``); unsafe actions are
        masked to ``-inf`` before the argmax.
        """
        action_space = jnp.atleast_2d(jnp.asarray(action_space,
                                                  dtype=config.dtype))
        states = jnp.asarray(self.policy.discretization.all_points)
        n_states = states.shape[0]

        def values_for(action):
            """Future values under the candidate parameters."""
            actions = jnp.broadcast_to(action, (n_states,
                                                action_space.shape[1]))
            return self.future_values(states, actions=actions)[:, 0]

        values = jax.vmap(values_for)(action_space)  # (n_options, n_states)

        if constraint is not None:
            def slack_for(action):
                actions = jnp.broadcast_to(action,
                                           (n_states,
                                            action_space.shape[1]))
                return jnp.asarray(constraint(actions)).reshape(-1)

            slack = jax.vmap(slack_for)(action_space)
            values = jnp.where(slack < 0, -jnp.inf, values)

        best = jnp.argmax(values, axis=0)  # (n_states,)
        best_actions = action_space[best]
        self.policy = self.policy.replace(parameters=best_actions)
        return best_actions
