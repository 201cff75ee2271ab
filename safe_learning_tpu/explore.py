"""Safe active exploration: pick informative state-action pairs that
provably map back into the certified safe level set.

TPU-native equivalent of reference ``get_safe_sample`` / ``perturb_actions``
(``/root/reference/safe_learning/lyapunov.py:609-797``). The reference runs
three ``session.run`` round-trips per exploration step; here candidate
generation, GP prediction, safety filtering, and the argmax-variance
selection are one fused jitted program over a fixed-size candidate batch.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .lyapunov import _lv_threshold_term

__all__ = ["perturb_actions", "get_safe_sample"]


def perturb_actions(states, actions, perturbations, limits=None):
    """Build the (N*X, n+m) candidate matrix of perturbed state-actions
    (reference ``lyapunov.py:609-651``)."""
    states = np.atleast_2d(states)
    actions = np.atleast_2d(actions)
    perturbations = np.atleast_2d(perturbations)
    num_states, state_dim = states.shape

    states_new = np.repeat(states, len(perturbations), axis=0)
    actions_new = (np.repeat(actions, len(perturbations), axis=0)
                   + np.tile(perturbations, (num_states, 1)))
    state_actions = np.column_stack((states_new, actions_new))

    if limits is not None:
        limits = np.atleast_2d(limits)
        np.clip(state_actions[:, state_dim:], limits[:, 0], limits[:, 1],
                out=state_actions[:, state_dim:])
        state_actions = np.unique(np.ascontiguousarray(state_actions),
                                  axis=0)
    return state_actions


@jax.jit
def _candidate_scores(dynamics, lyapunov_function, lipschitz_lyapunov,
                      c_max, state_actions):
    """Fused candidate scoring (reference ``lyapunov.py:703-732``):
    GP predict, confidence-weighted future value, level-set membership."""
    mean, std = dynamics(state_actions)
    bound = jnp.sum(std, axis=1)
    lv = _lv_threshold_term(lipschitz_lyapunov, mean)
    error = jnp.sum(jnp.atleast_2d(lv) * std, axis=1, keepdims=True)
    future_values = lyapunov_function(mean).reshape(-1, 1) + error
    maps_inside = (future_values < c_max).reshape(-1)
    return mean, bound, maps_inside


def get_safe_sample(lyapunov, perturbations=None, limits=None,
                    positive=False, num_samples=None, actions=None,
                    rng=None):
    """Return the most informative provably safe state-action pair.

    Mirrors reference ``get_safe_sample`` (``lyapunov.py:657-797``)
    including the backup-policy fallback (zero perturbation) with a
    ``RuntimeWarning`` when no candidate is safe.

    Returns
    -------
    state_action : (1, n+m) ndarray
    var : float
        The remaining predictive uncertainty at the chosen pair.
    """
    rng = np.random.default_rng() if rng is None else rng
    grid = lyapunov.discretization
    state_dim = grid.ndim

    # Subsample safe states (reference lyapunov.py:737-742).
    safe_idx = np.where(lyapunov.safe_set)[0]
    safe_states = np.asarray(grid.index_to_state(safe_idx))
    if num_samples is not None and len(safe_states) > num_samples:
        pick = rng.choice(len(safe_states), num_samples, replace=True)
        safe_states = safe_states[pick]

    if perturbations is None:
        if actions is None:
            raise ValueError("provide either perturbations or actions")
        # Full cross product of safe states and candidate actions. (The
        # reference's np.meshgrid ravel at lyapunov.py:750-753 silently
        # produces invalid rows for state_dim > 1 or action_dim > 1.)
        actions = np.atleast_2d(actions)
        state_actions = np.column_stack([
            np.repeat(safe_states, len(actions), axis=0),
            np.tile(actions, (len(safe_states), 1))])
    else:
        safe_actions = np.asarray(lyapunov.policy(jnp.asarray(safe_states)))
        state_actions = perturb_actions(safe_states, safe_actions,
                                        np.atleast_2d(perturbations),
                                        limits=limits)

    mean, bound, maps_inside = _evaluate_candidates(lyapunov, state_actions,
                                                    positive)

    bound_safe = bound[maps_inside]
    if len(bound_safe) == 0:
        # Nothing is safe: fall back to the backup policy (zero
        # perturbation around the current policy, reference
        # lyapunov.py:780-793).
        warnings.warn("No safe state-action pairs found! "
                      "Using backup policy ...", RuntimeWarning)
        safe_actions = np.asarray(lyapunov.policy(jnp.asarray(safe_states)))
        zero = np.zeros((1, state_actions.shape[1] - state_dim),
                        dtype=config.np_dtype)
        state_actions = perturb_actions(safe_states, safe_actions, zero,
                                        limits=limits)
        _, bound, _ = _evaluate_candidates(lyapunov, state_actions,
                                           positive)
        max_id = int(np.argmax(bound))
        return state_actions[[max_id]], float(bound[max_id])

    max_id = int(np.argmax(bound_safe))
    return (state_actions[maps_inside][[max_id]], float(bound_safe[max_id]))


def _evaluate_candidates(lyapunov, state_actions, positive):
    """Predict next-state distributions and safety for candidate pairs.

    The candidate batch is padded to the next power of two so repeated
    exploration steps with varying candidate counts hit one compiled
    program per size bucket instead of retracing every call.
    """
    n = len(state_actions)
    padded = 1 << max(3, (n - 1).bit_length())
    if padded != n:
        state_actions_dev = np.vstack([
            state_actions,
            np.broadcast_to(state_actions[-1:],
                            (padded - n, state_actions.shape[1]))])
    else:
        state_actions_dev = state_actions
    mean, bound, maps_inside = _candidate_scores(
        lyapunov.dynamics, lyapunov.lyapunov_function,
        lyapunov._lipschitz_lyapunov, lyapunov.c_max,
        jnp.asarray(state_actions_dev))
    mean = mean[:n]
    bound = bound[:n]
    maps_inside = maps_inside[:n]
    bound = np.asarray(bound)
    maps_inside = np.array(maps_inside)  # writable copy

    if not positive:
        # Mean next state must lie in the current safe set
        # (reference lyapunov.py:773-776).
        next_idx = np.asarray(
            lyapunov.discretization.state_to_index(mean))
        maps_inside &= lyapunov.safe_set[next_idx]
    return np.asarray(mean), bound, maps_inside
