"""Tests for GridWorld (mirrors reference test_functions.py grid tests)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from safe_learning_tpu import DimensionError, GridWorld


@pytest.fixture
def grid():
    return GridWorld([[-1, 1], [0, 2]], [3, 5])


def test_basic_properties(grid):
    assert grid.ndim == 2
    assert grid.nindex == 15
    assert grid.nrectangles == 8
    assert len(grid) == 15
    assert_allclose(grid.unit_maxes, [1.0, 0.5])
    assert_allclose(grid.offset, [-1.0, 0.0])


def test_too_few_points():
    with pytest.raises(DimensionError):
        GridWorld([[0, 1]], 1)


def test_all_points(grid):
    pts = grid.all_points
    assert pts.shape == (15, 2)
    assert_allclose(pts[0], [-1, 0])
    assert_allclose(pts[-1], [1, 2])
    # Row-major (ij) ordering: last dimension varies fastest.
    assert_allclose(pts[1], [-1, 0.5])


def test_index_state_roundtrip(grid):
    indices = np.arange(grid.nindex)
    states = np.asarray(grid.index_to_state(indices))
    assert_allclose(states, grid.all_points)
    back = np.asarray(grid.state_to_index(states))
    assert_array_equal(back, indices)


def test_state_to_index_rounding(grid):
    # Off-grid states map to the nearest vertex.
    states = grid.all_points + np.array([0.2, -0.1])
    idx = np.asarray(grid.state_to_index(states))
    assert_array_equal(idx, np.arange(grid.nindex))
    # Out-of-bound states are clipped.
    assert int(grid.state_to_index(np.array([[10.0, 10.0]]))[0]) == 14


def test_rectangles(grid):
    # Bottom-left cell.
    rect = np.asarray(grid.state_to_rectangle(np.array([[-0.9, 0.1]])))
    assert rect[0] == 0
    # Top-right cell.
    rect = np.asarray(grid.state_to_rectangle(np.array([[0.9, 1.9]])))
    assert rect[0] == grid.nrectangles - 1
    corner_state = np.asarray(grid.rectangle_to_state(np.array([0])))
    assert_allclose(corner_state, [[-1, 0]])
    corner_idx = np.asarray(grid.rectangle_corner_index(np.array([0, 7])))
    assert corner_idx[0] == 0
    # Cell 7 = multi-index (1, 3) in cell shape (2, 4) -> vertex (1, 3)
    # -> flat 1 * 5 + 3 = 8.
    assert corner_idx[1] == 8


def test_sampling(grid):
    rng = np.random.default_rng(0)
    cont = grid.sample_continuous(100, rng=rng)
    assert cont.shape == (100, 2)
    assert (cont >= grid.limits[:, 0]).all()
    assert (cont <= grid.limits[:, 1]).all()
    disc = grid.sample_discrete(10, rng=rng)
    # Every discrete sample is a grid vertex.
    idx = np.asarray(grid.state_to_index(disc))
    assert_allclose(np.asarray(grid.index_to_state(idx)), disc, atol=1e-12)


def test_hashable_and_equality():
    g1 = GridWorld([[0, 1]], 4)
    g2 = GridWorld([[0, 1]], 4)
    g3 = GridWorld([[0, 1]], 5)
    assert g1 == g2 and hash(g1) == hash(g2)
    assert g1 != g3


def test_jit_compatible(grid):
    import jax

    @jax.jit
    def roundtrip(idx):
        return grid.state_to_index(grid.index_to_state(idx))

    idx = jnp.arange(grid.nindex)
    assert_array_equal(np.asarray(roundtrip(idx)), np.arange(grid.nindex))


def test_reference_gridworld_cases():
    """Direct port of the reference's GridWorld cases
    (test_functions.py:298-368): index/rectangle conversions, clipping
    of out-of-domain points, integer num_points, and the 1-D grid."""
    limits = [[-1.1, 1.5], [2.2, 2.4]]
    grid = GridWorld(limits, [7, 8])

    with pytest.raises(DimensionError):
        grid._check_dimensions(np.array([[1.0, 2.0, 3.0]]))
    with pytest.raises(DimensionError):
        grid._check_dimensions(np.array([[1.0]]))

    indices = np.arange(grid.nindex)
    states = grid.index_to_state(indices)
    assert_array_equal(np.asarray(grid.state_to_index(states)), indices)

    # 1-D inputs are accepted.
    grid.state_to_index([0.0, 2.3])
    grid.index_to_state(1)

    rectangles = np.arange(grid.nrectangles)
    states = grid.rectangle_to_state(rectangles)
    rect2 = grid.state_to_rectangle(
        np.asarray(states) + np.asarray(grid.unit_maxes) / 2)
    assert_array_equal(np.asarray(rect2), rectangles)

    # Out-of-domain points clip to the first/last rectangle and index 0.
    assert int(np.asarray(
        grid.state_to_rectangle(100 * np.ones((1, 2)))).ravel()[0]) \
        == grid.nrectangles - 1
    assert int(np.asarray(
        grid.state_to_rectangle(-100 * np.ones((1, 2)))).ravel()[0]) == 0
    assert int(np.asarray(
        grid.state_to_index(np.array([[-1.2, 2.0]]))).ravel()[0]) == 0

    corners = grid.rectangle_corner_index(rectangles)
    corner_states = grid.rectangle_to_state(rectangles)
    assert_array_equal(np.asarray(grid.state_to_index(corner_states)),
                       np.asarray(corners))

    # Integer (scalar) num_points broadcasts.
    grid2 = GridWorld([[1, 2], [3, 4]], 2)
    assert_array_equal(np.asarray(grid2.num_points), [2, 2])

    # 1-D grid (reference test_0d).
    grid1 = GridWorld([[0, 1]], 3)
    test = np.array([[0.1, 0.4, 0.9]]).T
    assert_array_equal(np.asarray(grid1.state_to_index(test)), [0, 1, 2])
    assert_array_equal(np.asarray(grid1.state_to_rectangle(test)),
                       [0, 0, 1])
    assert_allclose(np.asarray(grid1.rectangle_to_state(
        np.array([0, 0, 1]))), np.array([[0.0], [0.0], [0.5]]))
