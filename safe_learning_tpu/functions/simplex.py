"""Piecewise-linear simplex interpolation on regular grids.

TPU-native re-design of the reference's ``_Triangulation``/``Triangulation``
(``/root/reference/safe_learning/functions.py:981-1510``). The reference
Delaunay-triangulates one unit hyperrectangle with scipy Qhull and locates
simplices through a ``tf.py_func`` host round-trip. Here the unit cell is
triangulated with the *Kuhn (Freudenthal) triangulation*, whose containing
simplex for a point is simply the descending ``argsort`` of its fractional
coordinates — so simplex location, barycentric weights, and vertex-index
arithmetic are all branch-free vectorized device ops (gathers + integer
math), differentiable end-to-end with respect to both inputs and the vertex
values.

Semantics notes vs the reference:
- For 1-D and 2-D grids the triangulations coincide up to the choice of cell
  diagonal; values at grid vertices are always exact.
- ``project=False`` extrapolates linearly outside the domain using the
  boundary cell's hyperplane, exactly like the reference
  (``functions.py:1190-1202``); ``project=True`` clips points to the limits.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..grids import GridWorld, row_major_strides
from .base import DeterministicFunction, register_pytree

__all__ = ["Triangulation", "PiecewiseConstant"]

# Tables at most this many rows use the one-hot matmul gather on TPU
# (above it the O(rows) contraction costs more than Mosaic's gather).
_ONEHOT_GATHER_MAX_ROWS = 16384


def _gather_rows(table, indices, force_onehot=False):
    """``table[indices]`` for a small table, TPU-fast.

    TPU has no hardware gather; Mosaic's lowering costs ~25 ns per
    gathered scalar. For small tables a one-hot row-matmul plus a lane
    mask is exact (each output sums exactly one f32 product against 1.0)
    and ~4x faster at 1M queries.

    Parameters
    ----------
    table : (n_rows, p)
    indices : (...,) int32 flat row indices

    Returns
    -------
    (..., p) gathered rows
    """
    n_rows, p = table.shape
    backend = jax.default_backend()
    use_onehot = force_onehot or (backend in ("tpu", "axon")
                                  and n_rows <= _ONEHOT_GATHER_MAX_ROWS)
    if not use_onehot:
        return table[indices]

    r = -(-n_rows // 128)
    padded = jnp.zeros((r * 128, p), table.dtype).at[:n_rows].set(table)
    # (r, 128, p) -> (r, 128 * p) so the row pick is one matmul.
    table2d = padded.reshape(r, 128 * p)

    flat_idx = indices.reshape(-1)
    row = flat_idx // 128
    lane = flat_idx % 128
    row_oh = (row[:, None]
              == jnp.arange(r, dtype=jnp.int32)).astype(table.dtype)
    picked = jax.lax.dot_general(
        row_oh, table2d, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST).reshape(-1, 128, p)
    lane_oh = (lane[:, None] == jnp.arange(128, dtype=jnp.int32))
    vals = jnp.sum(jnp.where(lane_oh[:, :, None], picked, 0.0), axis=1)
    return vals.reshape(indices.shape + (p,))


def _cell_shape(grid):
    return tuple(int(n) - 1 for n in grid.shape)


def _vertex_strides(grid):
    """Flat-index stride of +1 step along each dimension, vertex indexing."""
    return row_major_strides(grid.shape)


@register_pytree
class Triangulation(DeterministicFunction):
    """Efficient piecewise-linear interpolation on a regular grid.

    Parameters
    ----------
    discretization : GridWorld
    vertex_values : array-like, optional
        ``(nindex, output_dim)`` values at the grid vertices (the trainable
        parameters). Defaults to zeros with one output dimension.
    project : bool, optional
        Clip query points onto the domain instead of extrapolating.

    Examples
    --------
    >>> import numpy as np
    >>> from safe_learning_tpu import GridWorld, Triangulation
    >>> grid = GridWorld([[0, 1], [0, 1]], 2)
    >>> tri = Triangulation(grid, np.array([0.0, 1.0, 2.0, 3.0]))
    >>> np.asarray(tri(np.array([[0.5, 0.5]]))).ravel().tolist()
    [1.5]
    >>> int(tri.nsimplex)
    2
    """

    _data_fields = ("parameters",)
    _meta_fields = ("discretization", "project")
    _param_fields = ("parameters",)

    def __init__(self, discretization, vertex_values=None, project=False):
        if not isinstance(discretization, GridWorld):
            raise TypeError("discretization must be a GridWorld")
        self.discretization = discretization
        self.project = bool(project)
        if vertex_values is None:
            vertex_values = jnp.zeros((discretization.nindex, 1),
                                      dtype=config.dtype)
        vertex_values = jnp.asarray(vertex_values)
        self.parameters = vertex_values.reshape(discretization.nindex, -1)

    # -- shape info -------------------------------------------------------
    @property
    def input_dim(self):
        """Dimensionality of the input points."""
        return self.discretization.ndim

    @property
    def output_dim(self):
        """Dimensionality of the output values."""
        return int(self.parameters.shape[1])

    @property
    def nindex(self):
        """Total number of grid vertices."""
        return self.discretization.nindex

    @property
    def nsimplex(self):
        """Total number of simplices: d! per cell."""
        d = self.discretization.ndim
        return math.factorial(d) * self.discretization.nrectangles

    @property
    def limits(self):
        """Domain limits of the underlying grid."""
        return self.discretization.limits

    # -- core geometry ------------------------------------------------------
    def _locate(self, points):
        """Locate points: cell corner index, coordinate order, weights.

        Returns
        -------
        vertices : (N, d+1) int array of flat vertex indices (simplex chain)
        weights : (N, d+1) barycentric weights
        order : (N, d) descending argsort of the fractional coordinates
        """
        vertices, weights, order, _, _ = self._locate_all(points)
        return vertices, weights, order

    def _locate_all(self, points):
        """Full simplex geometry for a batch of query points.

        Also returns the per-coordinate descending rank and the
        containing cell (for the corner-block evaluation path)."""
        grid = self.discretization
        d = grid.ndim
        points = jnp.atleast_2d(jnp.asarray(points))
        grid._check_dimensions(points)

        frac = (points - grid.offset) / grid.unit_maxes
        # Containing cell (clipped to the grid, like the reference's
        # digitize-based state_to_rectangle, functions.py:754-776).
        cell = jnp.clip(jnp.floor(frac), 0, grid.num_points - 2)
        cell = cell.astype(jnp.int32)
        z_raw = frac - cell
        z_clip = jnp.clip(z_raw, 0.0, 1.0)

        # The Kuhn simplex containing z is given by the descending order of
        # its coordinates; ties broken stably (by index) for determinism.
        # For the tiny coordinate axis an O(d^2) comparison network beats
        # XLA's Sort by ~3x on TPU (the sort dominated the whole
        # evaluation at 1M queries).
        dim_idx = jnp.arange(d, dtype=jnp.int32)
        # [n, i, j] comparisons of coordinate j against coordinate i.
        greater = z_clip[:, None, :] > z_clip[:, :, None]  # z_j > z_i
        tie_prior = ((z_clip[:, None, :] == z_clip[:, :, None])
                     & (dim_idx[None, None, :] < dim_idx[None, :, None]))
        # rank[i] = position of coordinate i in the descending order.
        rank = jnp.sum(greater | tie_prior, axis=2, dtype=jnp.int32)
        onehot = (rank[:, :, None] == dim_idx[None, None, :])  # (N, i, k)
        order = jnp.sum(onehot * dim_idx[:, None], axis=1,
                        dtype=jnp.int32)

        z = z_clip if self.project else z_raw
        z_sorted = jnp.sum(onehot * z[:, :, None], axis=1)

        # Barycentric weights along the vertex chain
        # v_0 = corner, v_k = v_{k-1} + e_{order[k-1]}:
        #   w_0 = 1 - z_(1),  w_k = z_(k) - z_(k+1),  w_d = z_(d)
        first = 1.0 - z_sorted[:, :1]
        if d > 1:
            mids = z_sorted[:, :-1] - z_sorted[:, 1:]
        else:
            mids = jnp.zeros((points.shape[0], 0), dtype=z_sorted.dtype)
        last = z_sorted[:, -1:]
        weights = jnp.concatenate([first, mids, last], axis=1)

        strides = jnp.asarray(_vertex_strides(grid), dtype=jnp.int32)
        corner = jnp.sum(cell * strides, axis=-1, keepdims=True)
        # step[k] = stride of the k-th largest coordinate (onehot
        # contraction instead of a per-row gather).
        step = jnp.sum(onehot * strides[:, None], axis=1)
        vertices = jnp.concatenate(
            [corner, corner + jnp.cumsum(step, axis=-1)], axis=1)
        return vertices, weights, order, rank, cell

    def interpolation_weights(self, points):
        """Return the interpolation support ``(vertices, weights)``.

        Satisfies
        ``evaluate(points) == sum(weights * parameters[vertices], axis=1)``.

        Device-side sparse form of the reference's ``parameter_derivative``
        COO matrix (``functions.py:1228-1259``): each row has exactly
        ``ndim + 1`` non-zeros.
        """
        vertices, weights, _ = self._locate(points)
        return vertices, weights

    def _corner_table(self, fold=None):
        """Vertex values regrouped by cell, folding the trailing dims.

        With ``fold = k``, row ``(vertex_{<d-k}, cell_{>=d-k})`` holds the
        ``2^k`` corner values over the k TRAILING dimensions
        (corner-code-major over those dims, then output); ``fold = d``
        (the default) is the classic corner-block table whose row ``c``
        holds all ``2^d`` corners of cell ``c``.

        Evaluation then needs ``2^(d-k)`` contiguous row gathers per
        query instead of ``d + 1`` scalar gathers. Random row reads cost
        ~13.4 ns/row on v5e REGARDLESS of row width (16 -> 256 f32
        measured 13.4 -> 15.4 ms per 1M rows, ``benchmarks/
        gather_probe_r3.py``), so folding as many dims as the
        ``config.block_gather_limit`` memory budget allows directly
        divides the gather count. Built from shifted slices of the
        parameters inside the traced graph, so it stays differentiable
        wrt the vertex values and costs one ``2^k``-fold copy per call.
        """
        grid = self.discretization
        d = grid.ndim
        k = d if fold is None else int(fold)
        u = d - k
        p = self.output_dim
        vals = self.parameters.reshape(tuple(int(n) for n in grid.shape)
                                       + (p,))
        cols = []
        for code in range(2 ** k):
            idx = tuple(slice(None) for _ in range(u)) + tuple(
                slice(1, None) if (code >> j) & 1 else slice(0, -1)
                for j in range(k))
            cols.append(vals[idx].reshape(-1, p))
        return jnp.concatenate(cols, axis=1)  # (rows, 2^k * p)

    def _mixed_shape(self, fold):
        """Row-index shape of the ``fold``-folded corner table: vertex
        counts on the leading dims, cell counts on the trailing ones."""
        shape = tuple(int(n) for n in self.discretization.shape)
        u = self.discretization.ndim - fold
        return shape[:u] + tuple(n - 1 for n in shape[u:])

    def _corner_weights(self, rank, weights, pow2):
        """Scatter the ``d + 1`` chain weights onto the ``2^d`` corners.

        Chain vertex ``k`` sits at the corner whose bit for dimension
        ``i`` is set iff coordinate ``i`` is among the ``k`` largest
        (``rank_i < k``); ``pow2[i]`` is the weight of dimension ``i``'s
        bit in the corner code (layout-dependent: the folded table
        interleaves leading-dim gather index and trailing-dim column)."""
        d = self.discretization.ndim
        k = jnp.arange(d + 1, dtype=jnp.int32)
        bits = (rank[:, :, None] < k[None, None, :]).astype(jnp.int32)
        codes = jnp.sum(bits * pow2[:, None], axis=1)  # (N, d+1)
        onehot = (codes[:, :, None]
                  == jnp.arange(2 ** d, dtype=jnp.int32))
        return jnp.sum(weights[:, :, None] * onehot, axis=1)  # (N, 2^d)

    def _block_fold(self):
        """Largest trailing-dim fold whose corner table fits the budget.

        Returns ``d`` for the classic full corner-block table, a partial
        ``k`` when only a ``2^k``-fold copy fits
        ``config.block_gather_limit`` AND ``2^(d-k)`` row gathers still
        beat the ``d + 1`` chain gathers, else ``None`` (chain path).
        """
        grid = self.discretization
        d = grid.ndim
        p = self.output_dim
        limit = int(getattr(config, "block_gather_limit", 1 << 26))
        shape = tuple(int(n) for n in grid.shape)
        for k in range(d, -1, -1):
            u = d - k
            rows = 1
            for n in shape[:u]:
                rows *= n
            for n in shape[u:]:
                rows *= n - 1
            if rows * (2 ** k) * p <= limit:
                if 2 ** (d - k) < d + 1:
                    return k
                break
        return None

    def evaluate(self, points):
        """Barycentric interpolation (reference ``functions.py:1473-1499``).

        Gather strategy by table size (measured on v5e, see
        ``_corner_table``): full corner-block table (one row gather per
        query) when it fits ``config.block_gather_limit``; a partially
        folded table (``2^(d-k)`` row gathers) when only that fits and it
        still beats the ``d + 1`` chain gathers; per-vertex chain gathers
        otherwise.
        """
        grid = self.discretization
        d = grid.ndim
        p = self.output_dim
        fold = self._block_fold()
        if fold is None:
            vertices, weights, _ = self._locate(points)
            vertex_values = _gather_rows(self.parameters,
                                         vertices)  # (N, d+1, out)
            return jnp.sum(weights[:, :, None] * vertex_values, axis=1)

        _, weights, _, rank, cell = self._locate_all(points)
        u = d - fold
        pow2 = np.zeros(d, dtype=np.int32)
        pow2[u:] = 2 ** np.arange(fold)          # trailing: column bits
        pow2[:u] = 2 ** (fold + np.arange(u))    # leading: gather bits
        w_corner = self._corner_weights(rank, weights,
                                        jnp.asarray(pow2))  # (N, 2^d)
        table = self._corner_table(fold)
        strides = np.asarray(row_major_strides(self._mixed_shape(fold)))
        row_strides = jnp.asarray(strides, dtype=jnp.int32)
        base = jnp.sum(cell * row_strides, axis=-1)
        blocks = []
        for code_u in range(2 ** u):
            offs = np.array([(code_u >> i) & 1 for i in range(u)]
                            + [0] * fold, dtype=np.int32)
            row_idx = base + int(np.sum(offs * strides[: d]))
            blocks.append(_gather_rows(table, row_idx))
        block = jnp.stack(blocks, axis=1).reshape(-1, 2 ** d, p)
        return jnp.sum(w_corner[:, :, None] * block, axis=1)

    def gradient(self, points):
        """Piecewise-constant spatial gradient.

        Shape ``(N, output_dim, ndim)``; squeezed to ``(N, ndim)`` for
        single-output functions (reference ``functions.py:1302-1326``).
        """
        grid = self.discretization
        d = grid.ndim
        vertices, _, order = self._locate(points)
        vals = _gather_rows(self.parameters, vertices)  # (N, d+1, out)
        # Along the vertex chain, moving from v_{k-1} to v_k steps in
        # dimension order[k-1]; the directional derivative is the value
        # difference over the cell edge length.
        diffs = vals[:, 1:, :] - vals[:, :-1, :]  # (N, d, out)
        inv_order = jnp.argsort(order, axis=-1)
        per_dim = jnp.take_along_axis(diffs, inv_order[:, :, None], axis=1)
        grad = per_dim / jnp.asarray(grid.unit_maxes,
                                     dtype=per_dim.dtype)[None, :, None]
        grad = jnp.swapaxes(grad, 1, 2)  # (N, out, d)
        if grad.shape[1] == 1:
            grad = grad[:, 0, :]
        return grad

    # -- simplex bookkeeping (API parity with the reference) ---------------
    def find_simplex(self, points):
        """Global simplex index: ``cell_index * d! + permutation_rank``.

        Mirrors the reference's tiling scheme (``functions.py:1103-1130``)
        with the Kuhn local triangulation.
        """
        grid = self.discretization
        d = grid.ndim
        points = jnp.atleast_2d(jnp.asarray(points))
        rect = grid.state_to_rectangle(points)
        _, _, order = self._locate(points)
        local = _permutation_rank(order, d)
        return rect * math.factorial(d) + local

    def simplices(self, indices):
        """Vertex indices of the given global simplices.

        (reference ``functions.py:1132-1158``)."""
        grid = self.discretization
        d = grid.ndim
        indices = jnp.atleast_1d(jnp.asarray(indices))
        nlocal = math.factorial(d)
        local = indices % nlocal
        rect = indices // nlocal
        order = _permutation_unrank(local, d)
        corner = grid.rectangle_corner_index(rect)[:, None]
        strides = jnp.asarray(_vertex_strides(grid), dtype=jnp.int32)
        step = jnp.take_along_axis(jnp.broadcast_to(strides, order.shape),
                                   order, axis=-1)
        return jnp.concatenate([corner, corner + jnp.cumsum(step, axis=-1)],
                               axis=1)

    # -- host-side sparse matrices (for tests / cross-validation) ----------
    def parameter_derivative(self, points):
        """Sparse matrix ``B`` with ``evaluate(points) == B @ parameters``.

        Host-side scipy COO (reference ``functions.py:1228-1259``); the
        device path is :meth:`interpolation_weights`.
        """
        from scipy import sparse

        vertices, weights = map(np.asarray,
                                self.interpolation_weights(points))
        npoints, nsimp = vertices.shape
        rows = np.repeat(np.arange(npoints), nsimp)
        return sparse.coo_matrix(
            (weights.ravel(), (rows, vertices.ravel())),
            shape=(npoints, self.nindex))

    def gradient_parameter_derivative(self, points):
        """Sparse matrix mapping vertex values to stacked gradients.

        ``grad(points).reshape(-1) == B @ parameters`` with gradients laid
        out point-major, dimension-minor
        (reference ``functions.py:1328-1369``).
        """
        from scipy import sparse

        grid = self.discretization
        d = grid.ndim
        vertices, _, order = map(np.asarray, self._locate(points))
        npoints = len(vertices)
        h = np.asarray(grid.unit_maxes)

        # Gradient weight of vertex k for dimension i:
        #   +1/h_i if order[k-1] == i, -1/h_i if order[k] == i (chain rule
        #   on the telescoping barycentric weights).
        rows, cols, data = [], [], []
        for i in range(d):
            pos = np.argmax(np.asarray(order) == i, axis=-1)  # (N,)
            row = np.arange(npoints) * d + i
            rows.extend([row, row])
            cols.extend([vertices[np.arange(npoints), pos + 1],
                         vertices[np.arange(npoints), pos]])
            data.extend([np.full(npoints, 1.0 / h[i]),
                         np.full(npoints, -1.0 / h[i])])
        return sparse.coo_matrix(
            (np.concatenate(data),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(npoints * d, self.nindex))


def _permutation_rank(order, d):
    """Lexicographic rank of each permutation row (Lehmer code)."""
    rank = jnp.zeros(order.shape[:-1], dtype=jnp.int32)
    for k in range(d - 1):
        smaller_after = jnp.sum(
            (order[..., k + 1:] < order[..., k:k + 1]).astype(jnp.int32),
            axis=-1)
        rank = rank + smaller_after * math.factorial(d - 1 - k)
    return rank


def _permutation_unrank(rank, d):
    """Inverse of :func:`_permutation_rank` (static unroll, d is small)."""
    n = rank.shape[0]
    remaining = jnp.broadcast_to(jnp.arange(d, dtype=jnp.int32),
                                 (n, d)).copy()
    out = []
    r = rank.astype(jnp.int32)
    for k in range(d):
        f = math.factorial(d - 1 - k)
        idx = r // f
        r = r % f
        chosen = jnp.take_along_axis(remaining, idx[:, None], axis=1)[:, 0]
        out.append(chosen)
        # Remove the chosen element by shifting the tail left.
        mask = jnp.arange(d)[None, :] >= idx[:, None]
        shifted = jnp.roll(remaining, -1, axis=1)
        remaining = jnp.where(mask, shifted, remaining)
    return jnp.stack(out, axis=-1)


@register_pytree
class PiecewiseConstant(DeterministicFunction):
    """Nearest-vertex piecewise-constant approximator.

    (reference ``functions.py:820-932``)."""

    _data_fields = ("parameters",)
    _meta_fields = ("discretization",)
    _param_fields = ("parameters",)

    def __init__(self, discretization, vertex_values=None):
        self.discretization = discretization
        if vertex_values is None:
            vertex_values = jnp.zeros((discretization.nindex, 1),
                                      dtype=config.dtype)
        vertex_values = jnp.asarray(vertex_values)
        self.parameters = vertex_values.reshape(discretization.nindex, -1)

    @property
    def input_dim(self):
        """Dimensionality of the input points."""
        return self.discretization.ndim

    @property
    def output_dim(self):
        """Dimensionality of the output values."""
        return int(self.parameters.shape[1])

    @property
    def nindex(self):
        """Total number of grid vertices."""
        return self.discretization.nindex

    def evaluate(self, points):
        """Evaluate the function at ``points``."""
        nodes = self.discretization.state_to_index(points)
        return _gather_rows(self.parameters, nodes)

    def parameter_derivative(self, points):
        """Sparse selection matrix (reference ``functions.py:889-913``)."""
        from scipy import sparse

        points = np.atleast_2d(points)
        npoints = len(points)
        cols = np.asarray(self.discretization.state_to_index(points))
        rows = np.arange(npoints)
        return sparse.coo_matrix(
            (np.ones(npoints), (rows, cols)),
            shape=(npoints, self.nindex))

    def gradient(self, points):
        """Zero gradient (reference ``functions.py:915-932``)."""
        points = jnp.atleast_2d(points)
        return jnp.zeros((points.shape[0], self.input_dim),
                         dtype=points.dtype)
