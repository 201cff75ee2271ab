"""Regular-grid state-space discretizations.

TPU-native re-design of the reference ``GridWorld``
(``/root/reference/safe_learning/functions.py:579-817``). All index/state
conversions are pure vectorized integer/float arithmetic implemented with
``jax.numpy`` so they trace under ``jit`` / ``vmap`` and never leave the
device. The grid itself is *static metadata* (hashable, stored as tuples), so
passing it into jitted functions keys compilation rather than adding traced
operands — grids never change during a learning run.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .config import config

__all__ = ["GridWorld", "DimensionError"]


def row_major_strides(shape):
    """Row-major flat-index strides for ``shape``.

    THE single source of the indexing arithmetic shared by GridWorld and
    the triangulation."""
    return np.concatenate(
        [np.cumprod(np.asarray(shape[1:], dtype=np.int64)[::-1])[::-1],
         [1]])


class DimensionError(Exception):
    """Raised when an input has the wrong dimensionality."""


class GridWorld:
    """A regular rectangular grid over a box domain.

    Parameters
    ----------
    limits : 2d array-like
        A list of limits, e.g. ``[(x_min, x_max), (y_min, y_max)]``.
    num_points : int or 1d array-like
        The number of points per dimension.

    Notes
    -----
    Mirrors the API of reference ``functions.py:579-817`` (``index_to_state``,
    ``state_to_index``, ``state_to_rectangle``, ``rectangle_to_state``,
    ``rectangle_corner_index``, ``all_points``, sampling) but every map is a
    branch-free vectorized computation. Instances are hashable and compare by
    value so they can be closed over by jitted functions.

    Examples
    --------
    >>> import numpy as np
    >>> from safe_learning_tpu import GridWorld
    >>> grid = GridWorld([[-1, 1], [-1, 1]], 3)
    >>> grid.nindex
    9
    >>> np.asarray(grid.index_to_state([4])).tolist()
    [[0.0, 0.0]]
    >>> int(np.asarray(grid.state_to_index(np.array([[0.9, -0.9]])))[0])
    6
    """

    def __init__(self, limits, num_points):
        limits = np.atleast_2d(np.asarray(limits, dtype=np.float64))
        num_points = np.broadcast_to(num_points, len(limits)).astype(int)
        if np.any(num_points < 2):
            raise DimensionError("There must be at least 2 points in each "
                                 "dimension.")

        self._limits = tuple(map(tuple, limits.tolist()))
        self._num_points = tuple(int(n) for n in num_points)
        self._all_points_cache = None

    # -- static metadata ------------------------------------------------
    @property
    def limits(self):
        """Domain limits as an (ndim, 2) numpy array."""
        return np.asarray(self._limits, dtype=config.np_dtype)

    @property
    def num_points(self):
        """Number of grid points per dimension (numpy int array)."""
        return np.asarray(self._num_points, dtype=np.int64)

    @property
    def shape(self):
        """Grid shape as a tuple of ints."""
        return self._num_points

    @property
    def ndim(self):
        """Number of grid dimensions."""
        return len(self._num_points)

    @property
    def nindex(self):
        """Total number of grid vertices."""
        return int(np.prod(self.num_points))

    @property
    def nrectangles(self):
        """Total number of grid cells."""
        return int(np.prod(self.num_points - 1))

    @property
    def offset(self):
        """Lower corner of the domain."""
        return self.limits[:, 0]

    @property
    def unit_maxes(self):
        """Edge lengths of one grid cell per dimension."""
        lim = self.limits
        return ((lim[:, 1] - lim[:, 0])
                / (self.num_points - 1)).astype(config.np_dtype)

    @property
    def offset_limits(self):
        """Domain limits shifted so the lower corner is 0."""
        lim = self.limits
        return np.stack((np.zeros_like(lim[:, 0]), lim[:, 1] - lim[:, 0]),
                        axis=1)

    @property
    def discrete_points(self):
        """Per-dimension coordinate vectors."""
        return [np.linspace(low, up, n, dtype=config.np_dtype)
                for (low, up), n in zip(self._limits, self._num_points)]

    @functools.cached_property
    def strides(self):
        """Row-major flat-index strides per dimension (vertex indexing)."""
        return tuple(int(s) for s in row_major_strides(self.shape))

    def __len__(self):
        """Number of grid vertices."""
        return self.nindex

    def __eq__(self, other):
        """Value equality (same limits and point counts)."""
        return (isinstance(other, GridWorld)
                and self._limits == other._limits
                and self._num_points == other._num_points)

    def __hash__(self):
        """Hash of the static grid metadata."""
        return hash((self._limits, self._num_points))

    def __repr__(self):
        """Debug representation."""
        return "GridWorld(limits={}, num_points={})".format(
            self._limits, self._num_points)

    # -- points ----------------------------------------------------------
    @property
    def all_points(self):
        """All grid vertices, shape ``(nindex, ndim)`` (host numpy array).

        Computed lazily and cached (reference ``functions.py:622-638``).
        """
        if self._all_points_cache is None:
            mesh = np.meshgrid(*self.discrete_points, indexing="ij")
            self._all_points_cache = np.column_stack(
                [col.ravel() for col in mesh]).astype(config.np_dtype)
        return self._all_points_cache

    @functools.cached_property
    def all_points_f64(self):
        """All grid vertices in float64, independent of ``config.dtype``.

        Computed from the grid's exact (float64) metadata, so the float32
        and float64 lanes see IDENTICAL coordinates — the foundation of
        lane-independent posterior draws in ``sample_gp_function``.
        """
        axes = [np.linspace(low, up, n, dtype=np.float64)
                for (low, up), n in zip(self._limits, self._num_points)]
        mesh = np.meshgrid(*axes, indexing="ij")
        return np.column_stack([col.ravel() for col in mesh])

    def sample_continuous(self, num_samples, rng=None):
        """Sample uniformly from the continuous domain (host-side)."""
        rng = np.random.default_rng() if rng is None else rng
        rand = rng.uniform(0, 1, size=(num_samples, self.ndim))
        lim = self.limits
        return (rand * (lim[:, 1] - lim[:, 0])
                + self.offset).astype(config.np_dtype)

    def sample_discrete(self, num_samples, replace=False, rng=None):
        """Sample uniformly from the grid vertices (host-side)."""
        rng = np.random.default_rng() if rng is None else rng
        idx = rng.choice(self.nindex, size=num_samples, replace=replace)
        return np.asarray(self.index_to_state(idx))

    def _check_dimensions(self, states):
        if states.shape[-1] != self.ndim:
            raise DimensionError("the input argument has the wrong "
                                 "dimensions.")

    # -- index maps (jit/vmap-safe) ---------------------------------------
    def index_to_state(self, indices):
        """Convert flat vertex indices to states (reference ``:714-731``)."""
        indices = jnp.atleast_1d(jnp.asarray(indices))
        ijk = jnp.stack(jnp.unravel_index(indices, self.shape), axis=-1)
        dtype = config.dtype
        return ijk.astype(dtype) * self.unit_maxes + self.offset

    def state_to_index(self, states):
        """Convert states to nearest-vertex flat indices (``:733-752``)."""
        states = jnp.atleast_2d(jnp.asarray(states))
        self._check_dimensions(states)
        lim = self.limits
        states = jnp.clip(states, lim[:, 0], lim[:, 1])
        frac = (states - self.offset) / self.unit_maxes
        ijk = jnp.rint(frac).astype(jnp.int32)
        return self._ravel(ijk, self.shape)

    def state_to_rectangle(self, states):
        """Convert states to containing-cell flat indices (``:754-776``)."""
        states = jnp.atleast_2d(jnp.asarray(states))
        frac = (states - self.offset) / self.unit_maxes
        ijk = jnp.clip(jnp.floor(frac).astype(jnp.int32), 0,
                       self.num_points - 2)
        return self._ravel(ijk, tuple(int(n) - 1 for n in self._num_points))

    def rectangle_to_state(self, rectangles):
        """Return the lower-left corner state of each cell (``:778-798``)."""
        rectangles = jnp.atleast_1d(jnp.asarray(rectangles))
        cell_shape = tuple(int(n) - 1 for n in self._num_points)
        ijk = jnp.stack(jnp.unravel_index(rectangles, cell_shape), axis=-1)
        return ijk.astype(config.dtype) * self.unit_maxes + self.offset

    def rectangle_corner_index(self, rectangles):
        """Return the vertex index of each cell's corner (``:800-817``)."""
        rectangles = jnp.atleast_1d(jnp.asarray(rectangles))
        cell_shape = tuple(int(n) - 1 for n in self._num_points)
        ijk = jnp.stack(jnp.unravel_index(rectangles, cell_shape), axis=-1)
        return self._ravel(ijk, self.shape)

    @staticmethod
    def _ravel(ijk, shape):
        strides = row_major_strides(shape)
        return jnp.sum(ijk * jnp.asarray(strides, dtype=ijk.dtype), axis=-1)
