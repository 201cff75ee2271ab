"""Tests for the Kuhn-triangulation PWL interpolant.

Mirrors the reference's dual-implementation cross-checks
(test_functions.py:454-761): exactness at vertices, exact reproduction of
affine functions, hand-computed 2-D cases, gradient consistency (closed form
vs autodiff), and sparse parameter derivatives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from safe_learning_tpu import GridWorld, PiecewiseConstant, Triangulation


def test_1d_interpolation():
    grid = GridWorld([[0.0, 1.0]], 3)
    fun = Triangulation(grid, np.array([0.0, 1.0, 4.0]))
    x = np.array([[0.0], [0.25], [0.5], [0.75], [1.0]])
    assert_allclose(np.asarray(fun(x)),
                    [[0.0], [0.5], [1.0], [2.5], [4.0]])
    assert fun.nsimplex == 2


def test_1d_extrapolation_and_projection():
    grid = GridWorld([[0.0, 1.0]], 2)
    fun = Triangulation(grid, np.array([0.0, 1.0]))
    x = np.array([[-0.5], [1.5]])
    # Linear extrapolation by default (reference functions.py:1190-1202).
    assert_allclose(np.asarray(fun(x)), [[-0.5], [1.5]])
    proj = Triangulation(grid, np.array([0.0, 1.0]), project=True)
    assert_allclose(np.asarray(proj(x)), [[0.0], [1.0]])


def test_vertex_exactness_random():
    rng = np.random.default_rng(42)
    grid = GridWorld([[-1, 1], [0, 3], [-2, -1]], [3, 4, 3])
    values = rng.normal(size=(grid.nindex, 2))
    fun = Triangulation(grid, values)
    out = np.asarray(fun(grid.all_points))
    assert_allclose(out, values, atol=1e-10)


def test_affine_reproduction():
    """PWL interpolation reproduces affine functions exactly, independent
    of the cell triangulation."""
    rng = np.random.default_rng(1)
    grid = GridWorld([[-1, 1], [0, 2], [5, 6]], [4, 3, 5])
    w = rng.normal(size=(3, 1))
    b = 0.7
    values = grid.all_points @ w + b
    fun = Triangulation(grid, values)
    queries = np.column_stack([
        rng.uniform(lo, hi, 200) for lo, hi in grid.limits])
    assert_allclose(np.asarray(fun(queries)), queries @ w + b, atol=1e-9)


def test_2d_hand_computed():
    """Kuhn triangulation of the unit square: diagonal from (0,0) to (1,1).

    For z1 >= z2 (lower-right triangle) the vertex chain is
    (0,0) -> (1,0) -> (1,1).
    """
    grid = GridWorld([[0, 1], [0, 1]], 2)
    # Vertex order (row-major): (0,0), (0,1), (1,0), (1,1)
    values = np.array([0.0, 10.0, 1.0, 11.0])
    fun = Triangulation(grid, values)
    # Point with x > y: on the lower-right triangle.
    out = float(fun(np.array([[0.75, 0.25]]))[0, 0])
    # w = (1 - 0.75, 0.75 - 0.25, 0.25) on vertices (0,0), (1,0), (1,1)
    assert_allclose(out, 0.25 * 0.0 + 0.5 * 1.0 + 0.25 * 11.0)
    # Point with y > x: upper-left triangle, chain (0,0) -> (0,1) -> (1,1).
    out = float(fun(np.array([[0.25, 0.75]]))[0, 0])
    assert_allclose(out, 0.25 * 0.0 + 0.5 * 10.0 + 0.25 * 11.0)
    # On the diagonal both agree.
    out = float(fun(np.array([[0.5, 0.5]]))[0, 0])
    assert_allclose(out, 0.5 * (0.0 + 11.0))


def test_weights_sum_to_one():
    rng = np.random.default_rng(3)
    grid = GridWorld([[-1, 1], [-1, 1]], [5, 7])
    fun = Triangulation(grid)
    pts = rng.uniform(-1, 1, size=(100, 2))
    vertices, weights = fun.interpolation_weights(pts)
    assert_allclose(np.asarray(weights).sum(axis=1), 1.0, atol=1e-12)
    assert np.asarray(weights).min() >= -1e-12
    assert (np.asarray(vertices) >= 0).all()
    assert (np.asarray(vertices) < grid.nindex).all()


def test_find_simplex_and_simplices_consistency():
    rng = np.random.default_rng(4)
    grid = GridWorld([[0, 1], [0, 1], [0, 1]], 3)
    fun = Triangulation(grid)
    pts = rng.uniform(0, 1, size=(50, 3))
    simplex_ids = fun.find_simplex(pts)
    assert (np.asarray(simplex_ids) < fun.nsimplex).all()
    verts_from_ids = np.asarray(fun.simplices(simplex_ids))
    verts_direct, _ = map(np.asarray, fun.interpolation_weights(pts))
    assert_array_equal(verts_from_ids, verts_direct)


def test_gradient_matches_autodiff():
    rng = np.random.default_rng(5)
    grid = GridWorld([[-1, 1], [0, 2]], [4, 5])
    values = rng.normal(size=(grid.nindex, 1))
    fun = Triangulation(grid, values)
    # Strictly interior points away from simplex boundaries.
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(30, 2))
                      * np.array([1.0, 1.0]) + np.array([0.0, 1.0]))
    closed = np.asarray(fun.gradient(pts))
    auto = np.asarray(jax.vmap(
        jax.grad(lambda p: fun(p[None, :])[0, 0]))(pts))
    assert_allclose(closed, auto, atol=1e-9)


def test_gradient_multi_output_shape():
    grid = GridWorld([[0, 1], [0, 1]], 3)
    values = np.arange(grid.nindex * 3, dtype=float).reshape(-1, 3)
    fun = Triangulation(grid, values)
    grad = np.asarray(fun.gradient(np.array([[0.3, 0.4]])))
    assert grad.shape == (1, 3, 2)


def test_parameter_derivative():
    rng = np.random.default_rng(6)
    grid = GridWorld([[-1, 1], [-1, 1]], [4, 4])
    values = rng.normal(size=(grid.nindex, 1))
    fun = Triangulation(grid, values)
    pts = rng.uniform(-1, 1, size=(40, 2))
    b = fun.parameter_derivative(pts)
    assert b.shape == (40, grid.nindex)
    assert_allclose(b.toarray() @ np.asarray(fun.parameters),
                    np.asarray(fun(pts)), atol=1e-10)


def test_gradient_parameter_derivative():
    rng = np.random.default_rng(7)
    grid = GridWorld([[-1, 1], [-1, 1]], [4, 4])
    values = rng.normal(size=(grid.nindex, 1))
    fun = Triangulation(grid, values)
    pts = rng.uniform(-0.99, 0.99, size=(25, 2))
    b = fun.gradient_parameter_derivative(pts)
    grads = (b.toarray() @ np.asarray(fun.parameters)).reshape(25, 2)
    assert_allclose(grads, np.asarray(fun.gradient(pts)), atol=1e-10)


def test_parameter_gradient_autodiff():
    """Gradients w.r.t. vertex values flow through the gather."""
    grid = GridWorld([[0, 1]], 3)
    values = jnp.array([[0.0], [1.0], [4.0]])
    pts = jnp.array([[0.25]])

    def loss(v):
        return Triangulation(grid, v)(pts).sum()

    g = np.asarray(jax.grad(loss)(values))
    # f(0.25) = 0.5 * v0 + 0.5 * v1
    assert_allclose(g, [[0.5], [0.5], [0.0]])


def test_jit_and_vmap():
    grid = GridWorld([[0, 1], [0, 1]], 4)
    rng = np.random.default_rng(8)
    fun = Triangulation(grid, rng.normal(size=(grid.nindex, 1)))
    pts = jnp.asarray(rng.uniform(0, 1, size=(10, 2)))

    @jax.jit
    def apply(f, x):
        return f(x)

    assert_allclose(np.asarray(apply(fun, pts)), np.asarray(fun(pts)),
                    atol=1e-12)


def test_piecewise_constant():
    grid = GridWorld([[0.0, 1.0]], 3)
    fun = PiecewiseConstant(grid, np.array([1.0, 2.0, 3.0]))
    x = np.array([[0.0], [0.2], [0.3], [0.8], [1.0]])
    assert_allclose(np.asarray(fun(x)), [[1.0], [1.0], [2.0], [3.0], [3.0]])
    assert_allclose(np.asarray(fun.gradient(x)), 0.0)
    b = fun.parameter_derivative(x)
    assert_allclose(b.toarray() @ np.asarray(fun.parameters),
                    np.asarray(fun(x)))


def test_against_explicit_barycentric_solve():
    """Brute-force oracle: solve the barycentric system per point with
    numpy linear algebra on the explicit Kuhn simplex vertices.

    This is the analogue of the reference's numpy-vs-TF dual implementation
    check (test_functions.py:658-761).
    """
    rng = np.random.default_rng(9)
    grid = GridWorld([[-1, 1], [0, 2], [3, 5]], [3, 4, 3])
    values = rng.normal(size=(grid.nindex, 1))
    fun = Triangulation(grid, values)

    pts = np.column_stack([rng.uniform(lo, hi, 100)
                           for lo, hi in grid.limits])
    ours = np.asarray(fun(pts))[:, 0]

    vertices, _ = map(np.asarray, fun.interpolation_weights(pts))
    expected = np.empty(len(pts))
    for i, (p, vtx) in enumerate(zip(pts, vertices)):
        corners = np.asarray(grid.index_to_state(vtx))  # (d+1, d)
        d = corners.shape[1]
        # Solve sum(w_k * corner_k) = p with sum(w) = 1.
        a = np.vstack([corners.T, np.ones(d + 1)])
        rhs = np.concatenate([p, [1.0]])
        w = np.linalg.lstsq(a, rhs, rcond=None)[0]
        # The point must actually lie in its simplex.
        assert w.min() > -1e-9
        expected[i] = w @ values[vtx, 0]
    assert_allclose(ours, expected, atol=1e-9)


def test_onehot_gather_matches_plain():
    """The TPU one-hot matmul gather is exact vs plain indexing."""
    from safe_learning_tpu.functions.simplex import _gather_rows

    rng = np.random.default_rng(0)
    for n_rows, p in [(7, 1), (130, 3), (3025, 2)]:
        table = jnp.asarray(rng.normal(size=(n_rows, p)))
        idx = jnp.asarray(rng.integers(0, n_rows, size=(101, 4)),
                          dtype=jnp.int32)
        plain = np.asarray(table[idx])
        onehot = np.asarray(_gather_rows(table, idx, force_onehot=True))
        np.testing.assert_array_equal(plain, onehot)

    # Gradients flow identically through the one-hot path.
    table = jnp.asarray(rng.normal(size=(50, 1)))
    idx = jnp.asarray(rng.integers(0, 50, size=(32,)), dtype=jnp.int32)

    def loss_plain(t):
        return jnp.sum(t[idx] ** 2)

    def loss_onehot(t):
        return jnp.sum(_gather_rows(t, idx, force_onehot=True) ** 2)

    g1 = np.asarray(jax.grad(loss_plain)(table))
    g2 = np.asarray(jax.grad(loss_onehot)(table))
    np.testing.assert_allclose(g1, g2, atol=1e-12)


def test_4d_affine_reproduction_and_boundaries():
    """4-D Kuhn triangulation (cart-pole value tables): exact affine
    reproduction, partition-of-unity weights, and exactness at cell
    corners and on cell boundaries."""
    rng = np.random.default_rng(0)
    grid = GridWorld([[-1, 1]] * 4, [4, 3, 5, 3])
    coeff = rng.normal(size=(4,))
    bias = 0.7
    vals = grid.all_points @ coeff + bias
    tri = Triangulation(grid, vals)

    q = rng.uniform(-1, 1, size=(300, 4))
    assert_allclose(np.asarray(tri(q)).ravel(), q @ coeff + bias,
                    rtol=1e-10, atol=1e-10)

    # Exact at the vertices themselves.
    assert_allclose(np.asarray(tri(grid.all_points)).ravel(), vals,
                    rtol=1e-10, atol=1e-10)

    # Points exactly on cell boundaries (snap one coordinate per point).
    qb = q.copy()
    disc = grid.discrete_points
    for i in range(len(qb)):
        d = i % 4
        qb[i, d] = disc[d][i % len(disc[d])]
    assert_allclose(np.asarray(tri(qb)).ravel(), qb @ coeff + bias,
                    rtol=1e-10, atol=1e-10)

    # Weights form a partition of unity with d + 1 = 5 entries.
    _, w = tri.interpolation_weights(q)
    w = np.asarray(w)
    assert w.shape == (300, 5)
    assert_allclose(w.sum(axis=1), 1.0, rtol=1e-12)
    assert (w >= -1e-12).all()


def test_reference_pinned_1d():
    """Literal port of the reference's 1-D pinned case
    (``/root/reference/safe_learning/tests/test_functions.py:626-656``):
    values [0, 0.5, 0] on a 3-point grid over [0, 1]; pinned values,
    simplex ids, gradients, and the sparse parameter derivatives."""
    grid = GridWorld([[0, 1]], 3)
    fun = Triangulation(grid, [0.0, 0.5, 0.0])
    pts = np.array([[0.0, 0.2, 0.5, 0.6, 0.9, 1.0]]).T

    assert_array_equal(np.asarray(fun.find_simplex(pts)),
                       [0, 0, 1, 1, 1, 1])

    true_values = np.array([0, 0.2, 0.5, 0.4, 0.1, 0])[:, None]
    assert_allclose(np.asarray(fun(pts)), true_values, atol=1e-12)
    # Sparse parameter derivative reproduces the same values.
    b = fun.parameter_derivative(pts).toarray()
    assert_allclose(b @ np.array([0.0, 0.5, 0.0]),
                    true_values.ravel(), atol=1e-12)

    true_gradient = np.array([1, 1, -1, -1, -1, -1])[:, None]
    assert_allclose(np.asarray(fun.gradient(pts)).reshape(-1, 1),
                    true_gradient, atol=1e-12)
    gb = fun.gradient_parameter_derivative(pts).toarray()
    assert_allclose((gb @ np.array([0.0, 0.5, 0.0])).reshape(-1, 1),
                    true_gradient, atol=1e-12)


def test_reference_pinned_3d_values():
    """Port of the reference's 3-D cube case
    (``test_functions.py:556-580``): v = sum(x)/3 on the unit cube's 8
    vertices, pinned values at corners and edge/center midpoints.
    (The reference's 2-D pinned *gradients*, test_functions.py:582-624,
    are not portable: they encode Qhull's anti-diagonal cell split, while
    the Kuhn triangulation splits along the main diagonal — the
    hand-computed equivalent for our convention is
    test_2d_hand_computed.)"""
    grid = GridWorld([[0, 1]] * 3, 2)
    fun = Triangulation(grid)
    assert fun.nsimplex == 6  # 3! simplices in one cube

    values = np.sum(grid.all_points, axis=1) / 3
    fun = Triangulation(grid, values)
    corner_points = grid.all_points
    test_points = np.vstack([corner_points,
                             np.array([[0, 0, 0.5],
                                       [0.5, 0, 0],
                                       [0, 0.5, 0],
                                       [0.5, 0.5, 0.5]])])
    true_values = np.hstack([np.sum(corner_points, axis=1) / 3,
                             [1 / 6, 1 / 6, 1 / 6, 1 / 2]])
    assert_allclose(np.asarray(fun(test_points)).ravel(), true_values,
                    atol=1e-10)


@pytest.mark.parametrize("ndim", [1, 2, 3, 4])
def test_corner_block_eval_matches_chain_path(ndim):
    """The corner-block evaluation (one 2^d-wide row gather per query)
    equals the per-vertex gather path exactly — values, input gradients,
    and parameter gradients — including extrapolation outside the domain
    (project=False)."""
    from safe_learning_tpu.config import config

    rng = np.random.default_rng(ndim)
    grid = GridWorld([[-1, 1]] * ndim, 5)
    params = rng.normal(size=(grid.nindex, 2))
    points = rng.uniform(-1.4, 1.4, size=(57, ndim))  # includes outside

    for project in (False, True):
        tri = Triangulation(grid, params, project=project)

        def value_sum(p, pts):
            return jnp.sum(jnp.sin(tri.replace(parameters=p)(pts)))

        results = []
        old = config.block_gather_limit
        try:
            for limit in (1 << 30, 1):
                config.block_gather_limit = limit
                vals = np.asarray(tri(points))
                g_params = np.asarray(jax.grad(value_sum)(
                    tri.parameters, jnp.asarray(points)))
                g_points = np.asarray(jax.grad(value_sum, argnums=1)(
                    tri.parameters, jnp.asarray(points)))
                results.append((vals, g_params, g_points))
        finally:
            config.block_gather_limit = old
        for a, b in zip(results[0], results[1]):
            assert_allclose(a, b, atol=1e-11)


@pytest.mark.parametrize("ndim", [2, 3, 4])
def test_partial_fold_eval_matches_full_block(ndim):
    """Partially folded corner tables (2^(d-k) row gathers) give exactly
    the full-block result — values and both gradients — for every fold
    the memory budget can select (round-3 overflow-regime path)."""
    from safe_learning_tpu.config import config

    rng = np.random.default_rng(ndim)
    grid = GridWorld([[-1, 1]] * ndim, 5)
    params = rng.normal(size=(grid.nindex, 2))
    points = rng.uniform(-1.3, 1.3, size=(41, ndim))
    tri = Triangulation(grid, params)

    def value_sum(p, pts):
        return jnp.sum(jnp.sin(tri.replace(parameters=p)(pts)))

    shape = tuple(int(n) for n in grid.shape)
    def entries(k):
        u = ndim - k
        rows = int(np.prod(shape[:u])) * int(
            np.prod([n - 1 for n in shape[u:]]) if u < ndim else 1)
        return rows * (2 ** k) * 2

    old = config.block_gather_limit
    results = {}
    try:
        for k in range(ndim, 0, -1):
            config.block_gather_limit = entries(k)
            jax.clear_caches()
            fold = tri._block_fold()
            if fold is None:
                continue  # chain regime for this budget
            assert fold <= k
            results[k] = (
                np.asarray(tri(points)),
                np.asarray(jax.grad(value_sum)(tri.parameters,
                                               jnp.asarray(points))),
                np.asarray(jax.grad(value_sum, argnums=1)(
                    tri.parameters, jnp.asarray(points))))
    finally:
        config.block_gather_limit = old
        jax.clear_caches()
    assert ndim in results and len(results) >= 2
    ref = results[ndim]
    for k, got in results.items():
        for a, b in zip(ref, got):
            assert_allclose(a, b, atol=1e-11, err_msg=f"fold {k}")
