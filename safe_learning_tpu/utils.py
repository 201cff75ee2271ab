"""General utilities: parameter grids, LQR solvers, batching, rollouts.

TPU-native equivalents of ``/root/reference/safe_learning/utilities.py`` and
parts of ``/root/reference/examples/utilities.py``. The TF-bridge machinery
of the reference (``make_tf_fun``, scopes, storage cache, feed dict;
``utilities.py:37-159, 411-493``) has no equivalent here — JAX's functional
``jit`` model makes it unnecessary.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from .config import config
from .functions.base import concatenate_inputs  # noqa: F401  (re-export:
# the reference keeps this in utilities, ``utilities.py:162-208``)

__all__ = [
    "batchify", "combinations", "linearly_spaced_combinations", "lqr",
    "dlqr", "ellipse_bounds", "unique_rows", "compute_trajectory",
    "get_parameter_change", "find_nearest", "balanced_class_weights",
    "balanced_confusion_weights", "constrained_batch_sampler",
    "add_weight_constraint", "gradient_clipping", "monomials",
    "derivative_monomials", "TrackedMask", "tracked_mask",
    "concatenate_inputs",
]


class TrackedMask(np.ndarray):
    """Count in-place mutations of an ndarray view of a boolean mask.

    :class:`~safe_learning_tpu.lyapunov.Lyapunov` stores its safe and
    initial masks as this view so device-resident cache copies can key on
    ``(id, version, mutations)`` and never serve a stale mask after item
    or slice assignment (``mask[i] = True``, ``mask[:] = False``) or an
    in-place logical op through an alias — without re-hashing the whole
    mask on every exploration step. The counter cell is SHARED with every
    view or template-derived array, so mutation through a view still
    invalidates the parent's caches (over-invalidating at worst, never
    under-).

    Escape hatches that bypass tracking (reassign the attribute after
    using them): ``np.asarray(mask)`` strips the subclass but still views
    the same buffer, and raw-buffer mutators (``mask.fill``, ``np.put``,
    writes through ``mask.__array_interface__``) do not go through
    ``__setitem__``. :func:`tracked_mask` copies plain-array input so the
    caller's own reference is never an untracked alias.
    """

    def __array_finalize__(self, obj):
        """Share the mutation-counter cell with the source view."""
        cell = getattr(obj, "_mut_cell", None)
        self._mut_cell = cell if cell is not None else [0]

    @property
    def mutations(self):
        """Count of tracked in-place mutations (shared across views)."""
        return self._mut_cell[0]

    def _bump(self):
        self._mut_cell[0] += 1

    def __setitem__(self, key, value):
        """Assign items/slices, counting the mutation."""
        super().__setitem__(key, value)
        self._bump()

    def __ior__(self, other):
        """In-place OR, counting the mutation."""
        out = super().__ior__(other)
        self._bump()
        return out

    def __iand__(self, other):
        """In-place AND, counting the mutation."""
        out = super().__iand__(other)
        self._bump()
        return out

    def __ixor__(self, other):
        """In-place XOR, counting the mutation."""
        out = super().__ixor__(other)
        self._bump()
        return out


def tracked_mask(value):
    """Return ``value`` as a :class:`TrackedMask`.

    Non-:class:`TrackedMask` inputs are COPIED: wrapping a view of the
    caller's buffer would let writes through the caller's own reference
    bypass the mutation counter (and hence serve a stale device cache) —
    exactly the hazard the counter exists to close. The copy is one
    O(grid) boolean memcpy per attribute assignment, which the sweep it
    guards dwarfs. An existing :class:`TrackedMask` passes through
    unchanged (the ``lyap.safe_set |= m`` idiom hands the property's own
    mask back to the setter).
    """
    if isinstance(value, TrackedMask):
        return value
    return np.array(value, copy=True).view(TrackedMask)


def batchify(arrays, batch_size):
    """Yield ``(start_index, batches)`` slices of the arrays in order.

    Mirrors reference ``utilities.py:224-249``.
    """
    if not isinstance(arrays, (list, tuple)):
        arrays = (arrays,)
    for i in itertools.count(start=0, step=batch_size):
        batches = [array[i:i + batch_size] for array in arrays]
        if len(batches[0]):
            yield i, batches
        else:
            break


def combinations(arrays):
    """All combinations of the input arrays, one per row.

    (reference ``utilities.py:252-264``)."""
    return np.array(np.meshgrid(*arrays)).T.reshape(-1, len(arrays))


def linearly_spaced_combinations(bounds, num_samples):
    """2-D array of all linearly spaced combinations within the bounds.

    (reference ``utilities.py:267-296``)."""
    bounds = np.atleast_2d(bounds)
    num_samples = np.broadcast_to(num_samples, len(bounds))
    inputs = [np.linspace(b[0], b[1], n) for b, n in zip(bounds,
                                                         num_samples)]
    return combinations(inputs)


def lqr(a, b, q, r):
    """Continuous-time LQR: ``u = -k @ x``.

    (reference ``utilities.py:299-324``). Host-side setup code."""
    a, b, q, r = map(np.atleast_2d, (a, b, q, r))
    p = scipy.linalg.solve_continuous_are(a, b, q, r)
    k = np.linalg.solve(r, b.T.dot(p))
    return k, p


def dlqr(a, b, q, r):
    """Discrete-time LQR: ``u = -k @ x``.

    (reference ``utilities.py:327-357``). Host-side setup code."""
    a, b, q, r = map(np.atleast_2d, (a, b, q, r))
    p = scipy.linalg.solve_discrete_are(a, b, q, r)
    bp = b.T.dot(p)
    k = np.linalg.solve(bp.dot(b) + r, bp.dot(a))
    return k, p


def ellipse_bounds(p, level, n=100):
    """Upper/lower bounds of the 2-D ellipse ``x' P x = level``.

    (reference ``utilities.py:360-408``)."""
    n += n % 2
    eigval, eigvec = np.linalg.eig(p)
    eigvec = eigvec * np.sqrt(level / eigval)
    angle = np.linspace(0, 2 * np.pi, n)[:, None]
    angle += np.arctan(eigvec[0, 1] / eigvec[0, 0])
    pos = np.cos(angle) * eigvec[:, 0] + np.sin(angle) * eigvec[:, 1]
    n = n // 2
    return pos[:n, 0], pos[:n, 1], pos[:n - 1:-1, 1]


def unique_rows(array):
    """Unique rows of a 2-D array (reference ``utilities.py:496-516``)."""
    return np.unique(np.ascontiguousarray(array), axis=0)


def compute_trajectory(dynamics, policy, initial_state, num_steps):
    """Roll out a closed-loop system for ``num_steps``.

    The reference loops ``session.run`` one step at a time
    (``utilities.py:519-583``); here the whole rollout is a single
    ``lax.scan`` compiled once.

    Returns
    -------
    states : (num_steps, state_dim)
    actions : (num_steps - 1, action_dim)
    """
    initial_state = jnp.atleast_2d(jnp.asarray(initial_state,
                                               dtype=config.dtype))

    def step(state, _):
        """One scan step."""
        action = policy(state)
        next_state = dynamics(state, action)
        if isinstance(next_state, tuple):
            next_state = next_state[0]
        return next_state, (next_state, action)

    _, (states, actions) = jax.lax.scan(step, initial_state, None,
                                        length=num_steps - 1)
    states = jnp.concatenate([initial_state, states[:, 0, :]], axis=0)
    return states, actions[:, 0, :]


def get_parameter_change(old_params, new_params, ord="inf"):
    """Norm of the flattened parameter difference.

    (reference ``examples/utilities.py:570-599``)."""
    if ord == "inf":
        ord = np.inf
    elif ord == "-inf":
        ord = -np.inf
    old_flat = np.concatenate([np.asarray(p).ravel()
                               for p in jax.tree_util.tree_leaves(old_params)])
    new_flat = np.concatenate([np.asarray(p).ravel()
                               for p in jax.tree_util.tree_leaves(new_params)])
    return np.linalg.norm(new_flat - old_flat, ord=ord)


def find_nearest(array, value, sorted_1d=True):
    """Nearest value and index in a sorted 1-D array.

    (reference ``examples/utilities.py:703-710``)."""
    if not sorted_1d:
        array = np.sort(array)
    idx = np.searchsorted(array, value, side="left")
    if idx > 0 and (idx == len(array)
                    or np.abs(value - array[idx - 1])
                    < np.abs(value - array[idx])):
        idx -= 1
    return idx, array[idx]


def balanced_class_weights(y_true, scale_by_total=True):
    """Per-sample weights balancing class label counts.

    (reference ``examples/utilities.py:737-750``)."""
    y = np.asarray(y_true).astype(bool)
    n_pos = y.sum()
    n_neg = y.size - n_pos
    class_counts = np.array([n_neg, n_pos])
    weights = np.ones_like(y, dtype=float)
    weights[y] /= n_pos
    weights[~y] /= n_neg
    if scale_by_total:
        weights *= y.size
    return weights, class_counts


def balanced_confusion_weights(y, y_true, scale_by_total=True):
    """Per-sample weights from the confusion matrix.

    (reference ``examples/utilities.py:713-734``)."""
    y = np.asarray(y).astype(bool)
    y_true = np.asarray(y_true).astype(bool)
    tp = (y & y_true).sum()
    tn = (~y & ~y_true).sum()
    fp = (y & ~y_true).sum()
    fn = (~y & y_true).sum()
    confusion_counts = np.array([[tn, fn], [fp, tp]])
    weights = np.ones_like(y, dtype=float)
    weights[y & y_true] /= tp
    weights[~y & ~y_true] /= tn
    weights[y & ~y_true] /= fp
    weights[~y & y_true] /= fn
    if scale_by_total:
        weights *= y.size
    return weights, confusion_counts


def add_weight_constraint(params, lower, upper):
    """Clip a parameter pytree to box constraints.

    Functional equivalent of the reference's post-step assign ops
    (``utilities.py:162-186``): apply after an optimizer update to keep
    parameters inside bounds. ``lower``/``upper`` are scalars applied to
    every leaf, or pytrees matching ``params``' structure.
    """
    if np.isscalar(lower) and np.isscalar(upper):
        return jax.tree_util.tree_map(
            lambda w: jnp.clip(w, lower, upper), params)
    return jax.tree_util.tree_map(
        lambda w, lo, hi: jnp.clip(w, lo, hi), params, lower, upper)


def gradient_clipping(grads, lower, upper):
    """Clip a gradient pytree elementwise before an update.

    (reference ``utilities.py:189-221``).

    ``lower``/``upper`` are scalars applied to every leaf, or pytrees
    matching ``grads``' structure.
    """
    return add_weight_constraint(grads, lower, upper)


def constrained_batch_sampler(key, dynamics, policy, state_dim, batch_size,
                              action_limit=None):
    """Sample training states that stay in the unit box and unsaturated.

    Reference ``examples/utilities.py:548-567`` gathers the valid rows into
    a dynamically-sized batch (then zero-pads). Under ``jit`` shapes must
    be static, so here the full ``(batch_size, state_dim)`` uniform sample
    is returned together with a boolean validity mask; consumers weight by
    the mask instead of gathering. Invalid rows are zeroed, matching the
    reference's zero padding.

    Returns
    -------
    batch : (batch_size, state_dim) array, invalid rows zeroed
    mask : (batch_size,) bool array, True where the sampled state maps
        inside the domain (and, if ``action_limit`` is given, the policy
        action is strictly within ``[-|action_limit|, |action_limit|]``).
    """
    batch = jax.random.uniform(key, (int(batch_size), int(state_dim)),
                               dtype=config.dtype, minval=-1.0, maxval=1.0)
    actions = policy(batch)
    future = dynamics(batch, actions)
    if isinstance(future, (tuple, list)):
        future = future[0]
    mask = jnp.all((future >= -1.0) & (future <= 1.0), axis=1)
    if action_limit is not None:
        c = abs(action_limit)
        mask &= jnp.all((actions >= -c) & (actions <= c), axis=1)
    return batch * mask[:, None].astype(batch.dtype), mask


def monomials(x, deg):
    """2-D monomial features up to degree ``deg``.

    (reference ``examples/utilities.py:753-782``)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    feats = [x]
    for d in range(2, deg + 1):
        feats.append(jnp.stack(
            [x[:, 0] ** (d - k) * x[:, 1] ** k for k in range(d + 1)],
            axis=1))
    return jnp.concatenate(feats, axis=1)


def derivative_monomials(x, deg):
    """Derivatives of 2-D monomial features up to degree ``deg``.

    (reference ``examples/utilities.py:785-811``).

    Returns an array of shape ``(N, n_features, 2)``.
    """
    x = jnp.atleast_2d(jnp.asarray(x))
    jac = jax.vmap(jax.jacobian(lambda p: monomials(p[None, :], deg)[0]))
    return jac(x)
