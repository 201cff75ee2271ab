"""Safe active exploration: pick informative state-action pairs that
provably map back into the certified safe level set.

TPU-native equivalent of reference ``get_safe_sample`` / ``perturb_actions``
(``/root/reference/safe_learning/lyapunov.py:609-797``). The reference runs
three ``session.run`` round-trips per exploration step; here the ENTIRE
step — policy evaluation, candidate generation (perturbation or action
cross-product), action clipping, GP prediction, level-set test, safe-set
membership lookup, and the argmax-variance selection — is one fused jitted
program: a single device dispatch returns the chosen pair. Only the
safe-state subsampling (host RNG) and the rare backup-policy fallback stay
on the host.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .lyapunov import _as_column_batch, _eval_lipschitz

__all__ = ["perturb_actions", "get_safe_sample",
           "get_safe_sample_batch"]


def _pad_pow2(rows, min_bucket=8):
    """Pad a row batch to the next power-of-two bucket.

    Pads by repeating the last row (harmless duplicates), so varying
    candidate counts reuse one compiled program per bucket. Returns
    ``(padded, n_valid)``."""
    n = len(rows)
    if n == 0:
        raise ValueError("cannot pad an empty row batch (no candidate "
                         "rows to repeat)")
    padded = _pow2_pad_len(n, min_bucket)
    if padded != n:
        rows = np.vstack([
            rows, np.broadcast_to(rows[-1:], (padded - n, rows.shape[1]))])
    return rows, n


def perturb_actions(states, actions, perturbations, limits=None):
    """Build the (N*X, n+m) candidate matrix of perturbed state-actions.

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


def _score_candidates(dynamics, lyapunov_function, lipschitz_lyapunov,
                      c_max, state_actions, margin=0.0):
    """THE candidate-safety scoring (reference ``lyapunov.py:703-732``):

    GP predict, confidence-weighted future value, level-set test. The
    single definition shared by the fused selection and the
    backup-fallback path.

    The confidence error is the PER-DIMENSION product
    ``sum_j |L_v_j| sigma_j`` (reference ``:716-717``, identical to
    ``_decrease_bound``) — collapsing L_v with the threshold's L1
    reduction first would inflate it to ``(sum |L_v|)(sum sigma)``."""
    mean, std = dynamics(state_actions)
    bound = jnp.sum(std, axis=1)
    lv = _as_column_batch(_eval_lipschitz(lipschitz_lyapunov, mean))
    error = jnp.sum(jnp.abs(lv) * std, axis=1)
    future_values = lyapunov_function(mean).reshape(-1) + error
    return mean, bound, future_values < c_max - margin


@jax.jit
def _candidate_scores(dynamics, lyapunov_function, lipschitz_lyapunov,
                      c_max, state_actions, margin=0.0):
    """Jitted scoring for the backup-fallback path."""
    return _score_candidates(dynamics, lyapunov_function,
                             lipschitz_lyapunov, c_max, state_actions,
                             margin)


def _select_best(dynamics, lyapunov_function, lipschitz_lyapunov, c_max,
                 grid, safe_set_dev, state_actions, check_membership,
                 margin=0.0):
    """Score every candidate and pick the argmax-variance safe one.

    Shared core of the fused paths: returns the winning row, its
    informativeness (summed predictive std), and whether it is provably
    safe (False only when NO candidate is — safe scores always dominate
    the ``-inf`` given to unsafe ones).
    """
    mean, bound, safe = _score_candidates(
        dynamics, lyapunov_function, lipschitz_lyapunov, c_max,
        state_actions, margin)
    if check_membership:
        # Mean next state must lie in the current safe set
        # (reference lyapunov.py:773-776).
        safe &= safe_set_dev[grid.state_to_index(mean)]
    score = jnp.where(safe, bound, -jnp.inf)
    best = jnp.argmax(score)
    return state_actions[best], bound[best], safe[best]


@functools.partial(jax.jit,
                   static_argnames=("grid", "use_limits",
                                    "check_membership"))
def _fused_sample_perturb(dynamics, policy, lyapunov_function,
                          lipschitz_lyapunov, c_max, safe_set_dev,
                          safe_states, perturbations, limits,
                          margin=0.0, *, grid, use_limits,
                          check_membership):
    """One-dispatch exploration step, perturbation mode.

    Candidates are the current policy's actions at the sampled safe
    states, perturbed
    (reference ``perturb_actions``, ``lyapunov.py:609-651``, fused with
    the scoring of ``:703-797``)."""
    state_actions = _perturb_candidates(policy, safe_states,
                                        perturbations, limits, use_limits)
    return _select_best(dynamics, lyapunov_function, lipschitz_lyapunov,
                        c_max, grid, safe_set_dev, state_actions,
                        check_membership, margin)


def _perturb_candidates(policy, safe_states, perturbations, limits,
                        use_limits):
    """Candidate matrix: policy actions at the states, perturbed and
    clipped (the traced form of :func:`perturb_actions`)."""
    n, d = safe_states.shape
    p, m = perturbations.shape
    actions = _as_column_batch(policy(safe_states))
    acts = actions[:, None, :] + perturbations[None, :, :]
    if use_limits:
        acts = jnp.clip(acts, limits[:, 0], limits[:, 1])
    states = jnp.broadcast_to(safe_states[:, None, :], (n, p, d))
    return jnp.concatenate([states, acts], axis=-1).reshape(n * p, d + m)


@functools.partial(jax.jit,
                   static_argnames=("grid", "check_membership"))
def _fused_sample_actions(dynamics, lyapunov_function, lipschitz_lyapunov,
                          c_max, safe_set_dev, safe_states, actions,
                          margin=0.0, *, grid, check_membership):
    """One-dispatch exploration step, explicit-action mode.

    Candidates are the full cross product of sampled safe states and the
    given actions (reference ``lyapunov.py:748-760``)."""
    n, d = safe_states.shape
    na, m = actions.shape
    states = jnp.broadcast_to(safe_states[:, None, :], (n, na, d))
    acts = jnp.broadcast_to(actions[None, :, :], (n, na, m))
    state_actions = jnp.concatenate(
        [states, acts], axis=-1).reshape(n * na, d + m)
    return _select_best(dynamics, lyapunov_function, lipschitz_lyapunov,
                        c_max, grid, safe_set_dev, state_actions,
                        check_membership, margin)


def get_safe_sample(lyapunov, perturbations=None, limits=None,
                    positive=False, num_samples=None, actions=None,
                    rng=None, extended=False):
    """Return the most informative provably safe state-action pair.

    Mirrors reference ``get_safe_sample`` (``lyapunov.py:657-797``)
    including the backup-policy fallback (zero perturbation) with a
    ``RuntimeWarning`` when no candidate is safe.

    ``extended=True`` scores the candidates with the double-word
    pipeline (``ops/extended_verify``) so the level test can use the
    tiny derived ``exploration_margin``
    (``errorbounds.analytic_exploration_margin`` /
    ``extended_exploration_margin``): every returned pair then
    satisfies the EXACT ``v_future < c_max`` condition. The backup
    fallback (already the documented not-provably-safe escape hatch)
    is unchanged.

    Returns
    -------
    state_action : (1, n+m) ndarray
    var : float
        The remaining predictive uncertainty at the chosen pair.
    """
    rng = np.random.default_rng() if rng is None else rng
    grid = lyapunov.discretization
    state_dim = grid.ndim

    # Subsample safe states (reference lyapunov.py:737-742) — host side:
    # the grid points are static host metadata, so no device round-trip.
    safe_idx = np.where(lyapunov.safe_set)[0]
    if len(safe_idx) == 0:
        raise RuntimeError(
            "the safe set is empty — no state to explore from (provide "
            "an initial_set or verify with a smaller tau first)")
    safe_states = np.asarray(grid.all_points)[safe_idx]
    if num_samples is not None and len(safe_states) > num_samples:
        pick = rng.choice(len(safe_states), num_samples, replace=True)
        safe_states = safe_states[pick]
    # Pad to the next power of two so varying safe-set sizes reuse one
    # compiled program per bucket (padding duplicates the last state —
    # duplicate candidates cannot change the argmax winner's content).
    safe_states, _ = _pad_pow2(safe_states)
    safe_states_dev = jnp.asarray(safe_states, dtype=config.dtype)

    check_membership = not positive

    if extended:
        sweep = lyapunov._get_extended_sweep()
        candidates, action_dim = _build_host_candidates(
            lyapunov, safe_states, safe_states_dev, perturbations,
            actions, limits)
        # Pow-2 padding (duplicate rows): ragged candidate counts
        # would otherwise retrace the scorer every call.
        candidates, n_valid = _pad_pow2(candidates)
        # Derive the per-call margin over EXACTLY these candidate
        # rows (no construction uncertainty: the f32 rows are the
        # model inputs) unless the caller installed a dedicated
        # exploration margin already.
        margin = getattr(lyapunov, "exploration_margin", None)
        if margin is None:
            from .ops.extended_verify import extended_exploration_margin

            margin = extended_exploration_margin(
                lyapunov, candidates=candidates, set_margin=False)
        score, inside, mean_next = jax.device_get(
            sweep.score_candidates(candidates, lyapunov.c_max,
                                   float(margin)))
        candidates = candidates[:n_valid]
        score = np.asarray(score)[:n_valid]
        inside = np.array(inside)[:n_valid]
        mean_next = np.asarray(mean_next)[:n_valid]
        if check_membership:
            idx = np.asarray(grid.state_to_index(mean_next))
            inside &= np.asarray(lyapunov.safe_set)[idx]
        ranked = np.where(inside, score, -np.inf)
        best = int(np.argmax(ranked))
        if inside[best]:
            return (np.asarray(candidates[best],
                               dtype=config.np_dtype)[None],
                    float(score[best]))
        is_safe = False
    else:
        is_safe = None

    safe_set_dev = (_device_safe_set(lyapunov) if check_membership
                    else jnp.zeros(1, dtype=bool))

    # Per-candidate rigor margins (r4 verdict): when the sweep installed
    # PER-POINT margins (and no dedicated exploration margin exists),
    # derive the exploration comparison's own bound over the ACTUAL
    # candidate rows instead of collapsing to the grid-wide max — each
    # candidate is trimmed by its own bound, like the extended scorer.
    margin_vec = None
    if (is_safe is None
            and getattr(lyapunov, "exploration_margin", None) is None
            and np.ndim(getattr(lyapunov, "certificate_margin", None))):
        candidates, action_dim = _build_host_candidates(
            lyapunov, safe_states, safe_states_dev, perturbations,
            actions, limits)
        candidates, n_valid = _pad_pow2(candidates)
        margin_vec = _per_candidate_margin(lyapunov, candidates)

    if is_safe is False:
        pass  # extended scoring found nothing safe: backup fallback
    elif margin_vec is not None:
        mean, bound, inside = jax.device_get(_candidate_scores(
            lyapunov.dynamics, lyapunov.lyapunov_function,
            lyapunov._lipschitz_lyapunov, lyapunov.c_max,
            jnp.asarray(candidates, dtype=config.dtype),
            jnp.asarray(margin_vec, dtype=config.dtype)))
        mean = np.asarray(mean)[:n_valid]
        bound = np.asarray(bound)[:n_valid]
        inside = np.array(inside)[:n_valid]
        if check_membership:
            idx = np.asarray(grid.state_to_index(mean))
            inside &= np.asarray(lyapunov.safe_set)[idx]
        ranked = np.where(inside, bound, -np.inf)
        best = int(np.argmax(ranked))
        if inside[best]:
            return (np.asarray(candidates[best],
                               dtype=config.np_dtype)[None],
                    float(bound[best]))
        is_safe = False
    elif perturbations is None:
        if actions is None:
            raise ValueError("provide either perturbations or actions")
        # Full cross product of safe states and candidate actions. (The
        # reference's np.meshgrid ravel at lyapunov.py:750-753 silently
        # produces invalid rows for state_dim > 1 or action_dim > 1.)
        actions = np.atleast_2d(actions)
        action_dim = actions.shape[1]
        sa_best, bound_best, is_safe = _fused_sample_actions(
            lyapunov.dynamics, lyapunov.lyapunov_function,
            lyapunov._lipschitz_lyapunov, lyapunov.c_max, safe_set_dev,
            safe_states_dev, jnp.asarray(actions, dtype=config.dtype),
            _margin_of(lyapunov), grid=grid,
            check_membership=check_membership)
    else:
        perturbations = np.atleast_2d(perturbations)
        action_dim = perturbations.shape[1]
        use_limits = limits is not None
        limits_dev = jnp.asarray(
            np.atleast_2d(limits) if use_limits
            else np.zeros((1, 2)), dtype=config.dtype)
        sa_best, bound_best, is_safe = _fused_sample_perturb(
            lyapunov.dynamics, lyapunov.policy,
            lyapunov.lyapunov_function, lyapunov._lipschitz_lyapunov,
            lyapunov.c_max, safe_set_dev, safe_states_dev,
            jnp.asarray(perturbations, dtype=config.dtype), limits_dev,
            _margin_of(lyapunov), grid=grid, use_limits=use_limits,
            check_membership=check_membership)

    if is_safe is not False:
        # One combined D2H: separate bool()/np.asarray()/float()
        # conversions would each block on their own relay round trip.
        is_safe, sa_best, bound_best = jax.device_get(
            (is_safe, sa_best, bound_best))
        if bool(is_safe):
            return (np.asarray(sa_best, dtype=config.np_dtype)[None],
                    float(bound_best))

    # Nothing is safe: fall back to the backup policy (zero perturbation
    # around the current policy, reference lyapunov.py:780-793).
    warnings.warn("No safe state-action pairs found! "
                  "Using backup policy ...", RuntimeWarning)
    safe_actions = np.asarray(lyapunov.policy(safe_states_dev))
    zero = np.zeros((1, action_dim), dtype=config.np_dtype)
    state_actions = perturb_actions(safe_states, safe_actions, zero,
                                    limits=limits)
    _, bound, _ = _evaluate_candidates(lyapunov, state_actions, positive,
                                       margin=_fallback_margin(lyapunov))
    max_id = int(np.argmax(bound))
    return state_actions[[max_id]], float(bound[max_id])


def _build_host_candidates(lyapunov, safe_states, safe_states_dev,
                           perturbations, actions, limits):
    """Host-side candidate matrix + action_dim (shared by the extended
    scorer and the per-candidate-margin path; the non-rigor plain path
    constructs the same rows inside its one fused dispatch)."""
    if perturbations is None:
        if actions is None:
            raise ValueError("provide either perturbations or actions")
        acts = np.atleast_2d(np.asarray(actions, dtype=config.np_dtype))
        action_dim = acts.shape[1]
        n, na = len(safe_states), len(acts)
        candidates = np.concatenate(
            [np.repeat(safe_states, na, axis=0),
             np.tile(acts, (n, 1))], axis=1)
    else:
        perturbations = np.atleast_2d(perturbations)
        action_dim = perturbations.shape[1]
        pol_acts = np.asarray(lyapunov.policy(safe_states_dev),
                              dtype=config.np_dtype)
        candidates = perturb_actions(
            safe_states, pol_acts,
            perturbations.astype(config.np_dtype), limits=limits)
    return candidates, action_dim


def _per_candidate_margin(lyapunov, candidates):
    """(N,) plain-pipeline margins over the ACTUAL candidate rows.

    Returns None when the derivation does not apply (the caller then
    falls back to the fused path, whose ``_margin_of`` collapses a
    per-point sweep margin to its conservative grid-wide max — the
    exact conservatism this derivation removes, r4 verdict). The
    margins are derived at the f32 unit via
    :func:`~safe_learning_tpu.errorbounds.analytic_exploration_margin`
    with ``per_candidate=True``: the f32 candidate rows ARE the model
    inputs, so there is no construction-uncertainty term.
    """
    unit = getattr(lyapunov, "_certificate_margin_unit", None)
    consumer_unit = float(np.finfo(config.np_dtype).eps) / 2.0
    if unit is not None and unit < consumer_unit:
        # Extended-unit sweep margin: _margin_of raises the
        # explanatory error on the fused path.
        return None
    try:
        from .errorbounds import analytic_exploration_margin

        return analytic_exploration_margin(
            lyapunov, candidates=candidates, set_margin=False,
            per_candidate=True)
    except (NotImplementedError, RuntimeError, AttributeError):
        # No derivable rounding model for this instance (non-GP
        # dynamics, unmodeled L_v, duck-typed object, non-highest
        # matmul precision): keep the conservative collapse.
        return None


def _margin_of(lyapunov):
    """Conservatism margin for a (possibly duck-typed) Lyapunov object.

    The level test certifies only ``v_future < c_max - margin``. A
    dedicated ``exploration_margin`` (installed by
    ``errorbounds.analytic_exploration_margin``, which bounds exactly
    this comparison's error) takes precedence; otherwise the
    verification sweep's margin is reused (the empirical calibrator's
    measurement covers both pipelines at the same scale — see
    ``config.certificate_margin``).
    """
    consumer_unit = float(np.finfo(config.np_dtype).eps) / 2.0
    margin = getattr(lyapunov, "exploration_margin", None)
    if margin is not None:
        unit = getattr(lyapunov, "_exploration_margin_unit", None)
        if unit is not None and unit < consumer_unit:
            raise RuntimeError(
                "exploration_margin was derived at unit roundoff "
                f"{unit:.2e} (the extended double-word scorer); it "
                "cannot cover the plain scorer's rounding at unit "
                f"{consumer_unit:.2e}. Use get_safe_sample(extended="
                "True), or install a plain-pipeline margin "
                "(errorbounds.analytic_exploration_margin).")
        return float(margin)
    margin = getattr(lyapunov, "certificate_margin", None)
    if margin is None:
        margin = float(getattr(config, "certificate_margin", 0.0))
    else:
        unit = getattr(lyapunov, "_certificate_margin_unit", None)
        if unit is not None and unit < consumer_unit:
            raise RuntimeError(
                "certificate_margin was derived at unit roundoff "
                f"{unit:.2e} (the extended pipeline) and cannot cover "
                "the plain exploration scorer; use get_safe_sample("
                "extended=True) or install a plain-pipeline margin.")
    # A per-grid-point sweep margin collapses to its worst case here:
    # exploration candidates are not grid-indexed. (get_safe_sample
    # avoids this collapse when it can — _per_candidate_margin derives
    # each candidate's own bound; this fallback covers instances with
    # no derivable rounding model and duck-typed callers.)
    return float(np.max(margin)) if np.ndim(margin) else margin


def _fallback_margin(lyapunov):
    """Best untagged margin, for the diagnostic backup-policy path.

    The backup fallback is the documented not-provably-safe escape
    hatch (its pairs are returned under a ``RuntimeWarning``), so a
    finer-unit (extended-only) margin must not make it CRASH — pick the
    first margin not tagged below the plain pipeline's unit, falling
    back to the config default (advisor round-3 finding #2).
    """
    consumer_unit = float(np.finfo(config.np_dtype).eps) / 2.0
    for attr, unit_attr in (
            ("exploration_margin", "_exploration_margin_unit"),
            ("certificate_margin", "_certificate_margin_unit")):
        margin = getattr(lyapunov, attr, None)
        if margin is None:
            continue
        unit = getattr(lyapunov, unit_attr, None)
        if unit is None or unit >= consumer_unit:
            return float(np.max(margin)) if np.ndim(margin) \
                else float(margin)
    return float(getattr(config, "certificate_margin", 0.0))


def _device_safe_set(lyapunov):
    """Device copy of the boolean safe set, cached on the set's VERSION.

    ``Lyapunov.safe_set`` is a property whose setter bumps a version
    counter and stores a :class:`~safe_learning_tpu.utils.TrackedMask`
    that counts its own item/slice/in-place mutations, so
    ``(id, version, mutations)`` is a sound cache key without re-hashing
    the whole mask on every exploration step (O(grid) host work the
    advisor flagged) — and ``lyap.safe_set[i] = False`` cannot leave a
    stale, larger device mask certifying samples. Duck-typed Lyapunov
    objects without the counters fall back to a content digest.
    """
    arr = lyapunov.safe_set
    version = getattr(lyapunov, "_safe_set_version", None)
    mut = getattr(arr, "mutations", None)
    key = ((id(arr), version, mut)
           if version is not None and mut is not None
           else (id(arr), hash(arr.tobytes())))
    cache = getattr(lyapunov, "_safe_set_dev_cache", None)
    if cache is None or cache[0] != key:
        cache = (key, jnp.asarray(arr))
        lyapunov._safe_set_dev_cache = cache
    return cache[1]


def _evaluate_candidates(lyapunov, state_actions, positive,
                         margin=None):
    """Predict next-state distributions and safety for candidate pairs.

    The candidate batch is padded to the next power of two so repeated
    exploration steps with varying candidate counts hit one compiled
    program per size bucket instead of retracing every call.
    ``margin`` overrides the instance margin (the backup-policy path
    passes an untagged fallback so an extended-only margin degrades
    gracefully instead of raising).
    """
    if margin is None:
        margin = _margin_of(lyapunov)
    state_actions_dev, n = _pad_pow2(state_actions)
    mean, bound, maps_inside = _candidate_scores(
        lyapunov.dynamics, lyapunov.lyapunov_function,
        lyapunov._lipschitz_lyapunov, lyapunov.c_max,
        jnp.asarray(state_actions_dev), margin)
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


@functools.partial(jax.jit,
                   static_argnames=("grid", "use_limits",
                                    "check_membership", "use_noise"))
def _fused_sample_batch(gp, true_dynamics, policy, lyapunov_function,
                        lipschitz_lyapunov, c_max, safe_set_dev,
                        states_per_step, perturbations, limits, margin,
                        noise_keys, *, grid, use_limits, check_membership,
                        use_noise):
    """``k`` exploration measurements as ONE device program.

    A ``lax.scan`` over steps: score perturbed candidates at that step's
    safe-state subsample against the CURRENT GP, pick the
    argmax-variance provably-safe pair (when none is safe, the
    argmax-variance ZERO-perturbation backup-policy candidate — the
    same fallback set the sequential path and reference
    ``lyapunov.py:780-793`` use), measure the true dynamics, and append
    the measurement with a working-dtype on-device bordered Cholesky
    update so the next step's variances see it. No host round-trips
    between measurements (the reference re-verifies only after all
    samples of a round — ``adaptive_safety_verification.ipynb`` cell 23
    — so the alternation carries no semantics).

    Returns ``(state_actions (k, n+m), bounds (k,), safe_flags (k,),
    measurements (k, p))``.
    """
    from .functions.gp import _device_border_append

    def step(gp_j, inputs):
        """One sample/measure/append round against the carried GP."""
        states_j, key_j = inputs
        state_actions = _perturb_candidates(policy, states_j,
                                            perturbations, limits,
                                            use_limits)
        mean, bound, safe = _score_candidates(
            gp_j, lyapunov_function, lipschitz_lyapunov, c_max,
            state_actions, margin)
        if check_membership:
            safe &= safe_set_dev[grid.state_to_index(mean)]
        any_safe = jnp.any(safe)
        score = jnp.where(safe, bound, -jnp.inf)
        best = jnp.argmax(score)
        # Backup fallback: when no candidate is provably safe, the
        # sequential path (and reference lyapunov.py:780-793) restricts
        # to the UNperturbed policy actions, not the perturbed set.
        backup_sa = _perturb_candidates(
            policy, states_j, jnp.zeros_like(perturbations[:1]), limits,
            use_limits)
        _, backup_bound, _ = _score_candidates(
            gp_j, lyapunov_function, lipschitz_lyapunov, c_max,
            backup_sa, margin)
        backup_best = jnp.argmax(backup_bound)
        sa = jnp.where(any_safe, state_actions[best],
                       backup_sa[backup_best])
        sel_bound = jnp.where(any_safe, bound[best],
                              backup_bound[backup_best])
        if use_noise:
            y = true_dynamics(sa[None, :], noise_key=key_j)
        else:
            y = true_dynamics(sa[None, :])
        gp_next = _device_border_append(gp_j, sa[None, :], y)
        return gp_next, (sa, sel_bound, any_safe, y[0])

    _, (sas, bounds, safes, ys) = jax.lax.scan(
        step, gp, (states_per_step, noise_keys))
    return sas, bounds, safes, ys


def get_safe_sample_batch(lyapunov, true_dynamics, num_steps,
                          perturbations, limits=None, positive=False,
                          num_samples=None, rng=None, noise_key=None,
                          apply=True):
    """Run ``num_steps`` sample/measure/append rounds in one dispatch.

    The k-step batched form of :func:`get_safe_sample` for active
    learning loops that re-verify only after a round of measurements
    (the reference's shape, ``adaptive_safety_verification.ipynb``
    cell 23): one fused device program performs all k selections and
    measurements — between steps the GP is advanced with a
    working-dtype on-device bordered Cholesky append (selection-grade) —
    and the authoritative float64 cache refresh happens ONCE for the
    whole batch. Through a high-latency link this replaces ~2k host
    round-trips with two.

    Parameters
    ----------
    lyapunov : Lyapunov
    true_dynamics : Function
        The measurable system: called with the chosen ``(1, n+m)`` pair
        (pass ``noise_key`` support via ``noise_key=`` argument when
        ``noise_key`` is given here).
    num_steps : int
    perturbations : (p, m) array
        Action perturbations. The backup fallback (no provably safe
        candidate) is evaluated on the UNperturbed policy actions
        internally, so a zero row is not required.
    limits, positive, num_samples, rng
        As in :func:`get_safe_sample` (``num_samples`` resamples per
        step, like the reference's per-call subsample).
    noise_key : jax PRNG key, optional
        When given, measurements are noisy:
        ``true_dynamics(sa, noise_key=k_j)`` with per-step derived keys.
    apply : bool, optional
        Append all measurements to ``lyapunov.dynamics`` (one bordered
        float64 refresh) before returning.

    Returns
    -------
    state_actions : (k, n+m) ndarray
    measurements : (k, p) ndarray
    bounds : (k,) ndarray
        Predictive-uncertainty score of each chosen pair.
    safe_flags : (k,) ndarray of bool
        False entries used the backup fallback (a RuntimeWarning is
        issued, mirroring the sequential path).

    Notes
    -----
    A per-grid-point sweep margin collapses to its grid-wide max here
    (``_margin_of``): the k-step program constructs its candidates
    inside the fused scan against a GP that advances between steps, so
    the host-side per-candidate derivation :func:`get_safe_sample`
    uses is unavailable. Call the sequential form (or install a
    dedicated ``exploration_margin``) when that conservatism matters.
    """
    rng = np.random.default_rng() if rng is None else rng
    grid = lyapunov.discretization
    k = int(num_steps)
    gp = lyapunov.dynamics
    if int(gp.count) + k > gp.capacity:
        raise ValueError(
            "GP capacity {} cannot hold {} more measurements (count {}); "
            "construct the GP with a larger capacity= (the fused k-step "
            "program writes into the fixed buffers)".format(
                gp.capacity, k, int(gp.count)))

    safe_idx = np.where(lyapunov.safe_set)[0]
    if len(safe_idx) == 0:
        raise RuntimeError(
            "the safe set is empty — no state to explore from (provide "
            "an initial_set or verify with a smaller tau first)")
    all_safe = np.asarray(grid.all_points)[safe_idx]
    if num_samples is not None and len(all_safe) > num_samples:
        picks = rng.choice(len(all_safe), size=(k, int(num_samples)),
                           replace=True)
        states = all_safe[picks]  # (k, num_samples, d)
        states = np.concatenate([states, np.broadcast_to(
            states[:, -1:, :],
            (k, _pow2_pad_len(states.shape[1]) - states.shape[1],
             states.shape[2]))], axis=1)
    else:
        padded, _ = _pad_pow2(all_safe)
        states = np.broadcast_to(padded[None], (k,) + padded.shape)
    states_dev = jnp.asarray(states, dtype=config.dtype)

    check_membership = not positive
    safe_set_dev = (_device_safe_set(lyapunov) if check_membership
                    else jnp.zeros(1, dtype=bool))
    perturbations = np.atleast_2d(perturbations)
    use_limits = limits is not None
    limits_dev = jnp.asarray(
        np.atleast_2d(limits) if use_limits else np.zeros((1, 2)),
        dtype=config.dtype)
    use_noise = noise_key is not None
    noise_keys = (jax.random.split(noise_key, k) if use_noise
                  else jnp.zeros((k, 2), dtype=jnp.uint32))

    sas, bounds, safes, ys = _fused_sample_batch(
        lyapunov.dynamics, true_dynamics, lyapunov.policy,
        lyapunov.lyapunov_function, lyapunov._lipschitz_lyapunov,
        lyapunov.c_max, safe_set_dev, states_dev,
        jnp.asarray(perturbations, dtype=config.dtype), limits_dev,
        _margin_of(lyapunov), noise_keys, grid=grid,
        use_limits=use_limits, check_membership=check_membership,
        use_noise=use_noise)

    # One combined D2H: separate np.asarray conversions would each block
    # on their own relay round trip (same fix as get_safe_sample).
    sas, ys, bounds, safes = jax.device_get((sas, ys, bounds, safes))
    sas = np.asarray(sas, dtype=config.np_dtype)
    ys = np.asarray(ys, dtype=config.np_dtype)
    safes = np.array(safes)
    if not safes.all():
        warnings.warn("No safe state-action pairs found at {} of {} "
                      "steps! Using backup policy ...".format(
                          int((~safes).sum()), k), RuntimeWarning)
    if apply:
        lyapunov.dynamics = lyapunov.dynamics.add_data_point(sas, ys)
    return sas, ys, bounds, safes


def _pow2_pad_len(n, min_bucket=8):
    """Next power-of-two bucket length for ``n`` rows."""
    return 1 << max(min_bucket.bit_length() - 1, (n - 1).bit_length())
