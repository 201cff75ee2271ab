"""Tests for utilities (mirrors reference test_utilities.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from safe_learning_tpu import LinearSystem
from safe_learning_tpu.utils import (balanced_class_weights,
                                     balanced_confusion_weights, batchify,
                                     combinations, compute_trajectory,
                                     derivative_monomials, dlqr,
                                     ellipse_bounds, find_nearest,
                                     get_parameter_change,
                                     linearly_spaced_combinations, lqr,
                                     monomials, unique_rows)


def test_dlqr_fixed_point():
    """Known DARE fixed point (reference test_utilities.py:17-28)."""
    a, b, q, r = 1.0, 1.0, 1.0, 1.0
    k, p = dlqr(a, b, q, r)
    # p solves p = q + p - p^2/(p + r)  =>  p = (1 + sqrt(5)) / 2 * ...
    p_val = float(np.asarray(p).item())
    assert_allclose(p_val, q + p_val - p_val ** 2 / (p_val + r))
    assert_allclose(float(np.asarray(k).item()), p_val / (p_val + 1.0))


def test_lqr_stabilizes():
    a = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([[0.0], [1.0]])
    k, p = lqr(a, b, np.eye(2), np.eye(1))
    eig = np.linalg.eigvals(a - b @ k)
    assert (eig.real < 0).all()
    assert np.linalg.eigvalsh(p).min() > 0


def test_batchify():
    arrays = (np.arange(10), np.arange(10) * 2)
    seen = []
    for i, (a, b) in batchify(arrays, 4):
        seen.append((i, len(a)))
        assert_allclose(b, 2 * a)
    assert seen == [(0, 4), (4, 4), (8, 2)]


def test_combinations():
    out = linearly_spaced_combinations([(0, 1), (0, 2)], [2, 3])
    assert out.shape == (6, 2)
    assert {tuple(r) for r in out} == {
        (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)}


def test_unique_rows():
    arr = np.array([[1, 2], [1, 2], [3, 4]])
    assert unique_rows(arr).shape == (2, 2)


def test_ellipse_bounds():
    p = np.diag([1.0, 4.0])
    x, up, low = ellipse_bounds(p, 1.0, n=100)
    assert len(x) == len(up) == len(low)
    # Both boundaries lie ON the ellipse x^2 + 4 y^2 = 1 and bracket it.
    assert_allclose(x ** 2 + 4 * up ** 2, 1.0, atol=1e-6)
    assert_allclose(x ** 2 + 4 * low ** 2, 1.0, atol=1e-6)
    assert (up >= low).all() and up.max() > 0 > low.min()


def test_compute_trajectory_converges():
    """Closed loop drives state to zero
    (reference test_utilities.py:94-114)."""
    dyn = LinearSystem([np.array([[1.0, 0.1], [0.0, 1.0]]),
                        np.array([[0.0], [0.1]])])
    policy = LinearSystem(-np.array([[1.0, 2.0]]))
    states, actions = compute_trajectory(dyn, policy,
                                         np.array([[1.0, 0.0]]), 200)
    assert states.shape == (200, 2)
    assert actions.shape == (199, 1)
    assert np.linalg.norm(np.asarray(states)[-1]) < 1e-2


def test_get_parameter_change():
    old = {"w": np.zeros(3)}
    new = {"w": np.array([0.5, -2.0, 1.0])}
    assert_allclose(get_parameter_change(old, new, "inf"), 2.0)
    assert_allclose(get_parameter_change(old, new, 2),
                    np.sqrt(0.25 + 4 + 1))


def test_find_nearest():
    arr = np.array([0.0, 1.0, 2.0])
    idx, val = find_nearest(arr, 1.2)
    assert idx == 1 and val == 1.0


def test_balanced_class_weights():
    y = np.array([1, 1, 1, 0])
    w, counts = balanced_class_weights(y)
    assert_allclose(counts, [1, 3])
    assert_allclose(w[3] / w[0], 3.0)


def test_balanced_confusion_weights():
    y = np.array([1, 1, 0, 0])
    y_true = np.array([1, 0, 1, 0])
    w, confusion = balanced_confusion_weights(y, y_true)
    assert confusion.sum() == 4
    assert w.shape == (4,)


def test_monomials():
    x = np.array([[2.0, 3.0]])
    z = np.asarray(monomials(x, 2))
    assert_allclose(z, [[2, 3, 4, 6, 9]])
    z3 = np.asarray(monomials(x, 3))
    assert_allclose(z3[0, 5:], [8, 12, 18, 27])


def test_derivative_monomials():
    x = np.array([[2.0, 3.0]])
    dz = np.asarray(derivative_monomials(x, 2))
    assert dz.shape == (1, 5, 2)
    # d/dx of [x, y, x^2, xy, y^2] at (2, 3).
    assert_allclose(dz[0, :, 0], [1, 0, 4, 3, 0])
    assert_allclose(dz[0, :, 1], [0, 1, 0, 2, 6])


def test_constrained_batch_sampler():
    import jax

    from safe_learning_tpu.utils import constrained_batch_sampler

    # Expanding dynamics x' = 2x: only |x| <= 0.5 stays inside the unit box.
    dynamics = LinearSystem([[2.0, 0.0]])
    policy = LinearSystem([[-3.0]])
    key = jax.random.PRNGKey(0)
    batch, mask = constrained_batch_sampler(key, dynamics, policy, 1, 256)
    batch, mask = np.asarray(batch), np.asarray(mask)
    assert batch.shape == (256, 1) and mask.shape == (256,)
    assert (np.abs(batch[mask]) <= 0.5 + 1e-12).all()
    assert (batch[~mask] == 0).all()
    assert 0 < mask.sum() < 256

    # Action saturation cuts the valid set further: |u| = 3|x| < 1.
    _, mask_sat = constrained_batch_sampler(key, dynamics, policy, 1, 256,
                                            action_limit=1.0)
    assert mask_sat.sum() < mask.sum()
    assert (~mask_sat | mask).all()


def test_add_weight_constraint_and_gradient_clipping():
    from safe_learning_tpu.utils import (add_weight_constraint,
                                         gradient_clipping)

    params = {"w": jnp.array([-2.0, 0.5, 3.0]), "b": jnp.array([[4.0]])}
    clipped = add_weight_constraint(params, -1.0, 1.0)
    assert_allclose(np.asarray(clipped["w"]), [-1.0, 0.5, 1.0])
    assert_allclose(np.asarray(clipped["b"]), [[1.0]])

    # Per-leaf bounds as pytrees.
    lower = {"w": -1.5, "b": 0.0}
    upper = {"w": 0.0, "b": 2.0}
    clipped = add_weight_constraint(params, lower, upper)
    assert_allclose(np.asarray(clipped["w"]), [-1.5, 0.0, 0.0])
    assert_allclose(np.asarray(clipped["b"]), [[2.0]])

    grads = (jnp.array([10.0, -10.0]),)
    assert_allclose(np.asarray(gradient_clipping(grads, -1.0, 1.0)[0]),
                    [1.0, -1.0])


def test_tracked_mask_counts_mutations():
    """TrackedMask counts item/slice assignment and in-place logical ops,
    sharing the counter with views (the cache-key primitive behind the
    safe-set device caches)."""
    from safe_learning_tpu.utils import TrackedMask, tracked_mask

    m = tracked_mask(np.zeros(8, dtype=bool))
    assert isinstance(m, TrackedMask) and m.mutations == 0
    m[2] = True
    m[:4] = False
    m |= np.ones(8, dtype=bool)
    m &= np.ones(8, dtype=bool)
    assert m.mutations == 4
    v = m[1:5]
    v[0] = False  # mutation through a view bumps the shared counter
    assert m.mutations == 5
    assert tracked_mask(m) is m


def test_tracked_mask_copies_plain_input():
    """tracked_mask must COPY a plain ndarray: a no-copy view would let
    writes through the caller's own reference bypass the mutation
    counter and serve a stale device cache."""
    from safe_learning_tpu.utils import TrackedMask, tracked_mask

    src = np.ones(6, dtype=bool)
    m = tracked_mask(src)
    src[2] = False  # alias write through the caller's reference
    assert m[2]  # decoupled: the tracked mask never saw it
    assert m.mutations == 0
    # .copy() of a TrackedMask shares the counter cell (documented
    # over-invalidation) — call sites needing independent scratch masks
    # use np.array(mask).
    c = m.copy()
    c[0] = False
    assert m.mutations == 1 and isinstance(c, TrackedMask)
    plain = np.array(m)
    plain[1] = False
    assert m.mutations == 1 and not isinstance(plain, TrackedMask)


def test_concatenate_inputs_reexported_in_utils():
    """The reference keeps concatenate_inputs in utilities
    (utilities.py:162-208); porters must find it under utils too."""
    import numpy as np
    from safe_learning_tpu import functions, utils
    assert utils.concatenate_inputs is functions.concatenate_inputs
    out = utils.concatenate_inputs(np.zeros((3, 2)), np.ones((3, 1)))
    assert out.shape == (3, 3)
