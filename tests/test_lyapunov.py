"""Tests for Lyapunov verification (mirrors reference test_lyapunov.py
plus coverage the reference lacked: adaptive refinement, c_max semantics,
get_lyapunov_region)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from safe_learning_tpu import (GridWorld, LambdaFunction, LinearSystem,
                               Lyapunov, QuadraticFunction,
                               smallest_boundary_value, get_lyapunov_region)


def _quad_v():
    return LambdaFunction(lambda x: (x ** 2).sum(axis=1, keepdims=True))


def test_safe_set_init():
    """Initial safe set from index list (reference test_lyapunov.py:24-46)."""
    grid = GridWorld([[0, 1], [0, 1]], 3)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[1, 0.01], [0.0, 1.0]]))
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.5, policy,
                    initial_set=[1, 3])
    expected = np.zeros(9, dtype=bool)
    expected[[1, 3]] = True
    assert_array_equal(lyap.safe_set, expected)


def test_update_safe_set_closed_form():
    """3-point 1-D grid, exact expected safe sets
    (reference test_lyapunov.py:48-74)."""
    grid = GridWorld([[-1, 1]], 3)
    policy = LambdaFunction(lambda x: -0.1 * x)
    dyn = LinearSystem(np.array([[1.0, 1.0]]))  # f(x, u) = x + u

    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.5, policy,
                    initial_set=[1])
    lyap.update_safe_set()
    assert_array_equal(lyap.safe_set, [False, True, False])

    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.0, policy,
                    initial_set=[1])
    lyap.update_safe_set()
    assert lyap.safe_set.all()
    assert_allclose(lyap.c_max, 1.0)


def test_update_safe_set_small_batches():
    """Batch size must not change the result."""
    grid = GridWorld([[-1, 1], [-1, 1]], 9)
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    a = np.array([[0.8, 0.0], [0.0, 0.7]])
    dyn = LinearSystem([a, np.zeros((2, 1))])
    v = QuadraticFunction(np.eye(2))
    mid = grid.nindex // 2

    results = []
    for batch in [7, 64, None]:
        lyap = Lyapunov(grid, v, dyn, 0.8, 1.0, 1e-3, policy,
                        initial_set=[mid])
        lyap.update_safe_set(batch_size=batch)
        results.append((lyap.safe_set.copy(), lyap.c_max))
    for safe, c in results[1:]:
        assert_array_equal(safe, results[0][0])
        assert_allclose(c, results[0][1])
    assert results[0][0].sum() > 1  # something besides the initial set


def test_no_safe_prefix_gives_minus_inf():
    grid = GridWorld([[-1, 1]], 3)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[2.0, 0.0]]))  # expanding
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.5, policy)
    lyap.update_safe_set()
    assert not lyap.safe_set.any()
    assert lyap.c_max == -np.inf


def test_can_shrink_false_keeps_previous():
    grid = GridWorld([[-1, 1]], 5)
    policy = LambdaFunction(lambda x: 0.0 * x)
    good = LinearSystem(np.array([[0.5, 0.0]]))
    bad = LinearSystem(np.array([[2.0, 0.0]]))
    lyap = Lyapunov(grid, _quad_v(), good, 0.5, 1.0, 1e-4, policy,
                    initial_set=[2])
    lyap.update_safe_set()
    before = lyap.safe_set.copy()
    assert before.sum() > 1
    lyap.dynamics = bad
    lyap.update_safe_set(can_shrink=False)
    assert_array_equal(lyap.safe_set, before)
    lyap.update_safe_set(can_shrink=True)
    assert lyap.safe_set.sum() == 1  # only the initial set survives


def test_uncertain_dynamics_error_bound():
    """A (mean, error) dynamics tuple shrinks the certified region."""
    from safe_learning_tpu.functions.base import (UncertainFunction,
                                                  register_pytree)
    import jax.numpy as jnp

    a = np.array([[0.5, 0.0]])

    @register_pytree
    class FakeUncertain(UncertainFunction):
        input_dim = 2
        output_dim = 1

        def evaluate(self, points):
            mean = points @ jnp.asarray(a.T)
            return mean, 10.0 * jnp.ones_like(mean)

    grid = GridWorld([[-1, 1]], 5)
    policy = LambdaFunction(lambda x: 0.0 * x)
    lyap = Lyapunov(grid, _quad_v(), FakeUncertain(), 0.5, 1.0, 1e-4,
                    policy, initial_set=[2])
    lyap.update_safe_set()
    # Huge error bound: nothing verifies beyond the initial set.
    assert lyap.safe_set.sum() == 1


def test_threshold_local_lipschitz():
    grid = GridWorld([[-1, 1]], 3)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[0.5, 0.0]]))
    lv = LambdaFunction(lambda x: np.abs(x))  # local, vector-valued
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, lv, 0.5, policy)
    thr = np.asarray(lyap.threshold(np.array([[0.5]])))
    assert_allclose(thr, -0.5 * 1.4 * 0.5)


def test_adaptive_refinement_expands_safe_set():
    """Refinement certifies states the coarse check rejects.

    Setup (hand-computed): f(x) = 0.9 x, v = x^2 on a 21-point grid
    (h = 0.1), tau = 0.02, L_v (1 + L_f) = 1.9. Decrease is -0.19 x^2,
    coarse threshold -0.038, so |x| >= 0.5 passes coarsely, |x| = 0.4
    needs N(x) = 2, and |x| <= 0.3 (initial set) is exempt.
    """
    grid = GridWorld([[-1, 1]], 21)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[0.9, 0.0]]))
    v = _quad_v()
    initial = list(range(7, 14))  # |x| <= 0.3
    tau = 0.02

    coarse = Lyapunov(grid, v, dyn, 0.9, 1.0, tau, policy,
                      initial_set=initial)
    coarse.update_safe_set()
    assert coarse.safe_set.sum() == 7  # prefix stops at |x| = 0.4

    adaptive = Lyapunov(grid, v, dyn, 0.9, 1.0, tau, policy,
                        initial_set=initial, adaptive=True)
    adaptive.update_safe_set(max_refinement=4)

    assert adaptive.safe_set.all()
    # Rescued points record the refinement actually used (full R).
    assert adaptive._refinement.max() == 4
    assert adaptive.c_max >= coarse.c_max


def test_is_safe_and_values():
    grid = GridWorld([[-1, 1]], 3)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[0.5, 0.0]]))
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.0, policy,
                    initial_set=[1])
    lyap.update_safe_set()
    assert lyap.is_safe(np.array([[0.0]]))
    assert_allclose(lyap.values, [1.0, 0.0, 1.0])


def test_smallest_boundary_value():
    """Reference test_lyapunov.py:77-83."""
    fun = LambdaFunction(lambda x: 2 * np.abs(x).sum(axis=1))
    import jax.numpy as jnp
    fun = LambdaFunction(lambda x: 2 * jnp.abs(x).sum(axis=1))
    grid = GridWorld([[-1.5, 1], [-1, 1.5]], [3, 3])
    assert smallest_boundary_value(fun, grid) == 2.5


def test_get_lyapunov_region():
    grid = GridWorld([[-1, 1], [-1, 1]], 11)
    v = QuadraticFunction(np.eye(2))
    region = get_lyapunov_region(v, grid, (5, 5))
    assert region[5, 5]
    # Monotone quadratic: region is a centered blob, not the boundary.
    assert not region[0, :].any()
    assert region.sum() > 1


def test_native_flood_fill_matches_python():
    """The C++ flood fill must reproduce the Python heap expansion
    exactly (dual-implementation cross-check)."""
    import pytest

    from safe_learning_tpu.native import load_flood_fill

    if load_flood_fill() is None:
        pytest.skip("no C++ compiler available")

    rng = np.random.default_rng(0)
    grid = GridWorld([[-1.0, 1.0], [-1.0, 1.0]], [41, 31])
    p = np.array([[1.0, 0.3], [0.3, 2.0]])
    bump = 0.4 * np.exp(-((grid.all_points - 0.5) ** 2).sum(1) / 0.05)
    vals = (np.einsum("ni,ij,nj->n", grid.all_points, p,
                      grid.all_points) + bump)
    fun = LambdaFunction(lambda x: vals.reshape(-1, 1), 2, 1)

    init = (20, 15)
    region_native = get_lyapunov_region(fun, grid, init, use_native=True)
    region_python = get_lyapunov_region(fun, grid, init, use_native=False)
    assert region_native.shape == grid.shape
    assert region_native.any()
    np.testing.assert_array_equal(region_native, region_python)


def test_native_flood_fill_3d():
    import pytest

    from safe_learning_tpu.native import load_flood_fill

    if load_flood_fill() is None:
        pytest.skip("no C++ compiler available")

    grid = GridWorld([[-1.0, 1.0]] * 3, 11)
    fun = QuadraticFunction(np.eye(3))
    init = (5, 5, 5)
    region_native = get_lyapunov_region(fun, grid, init, use_native=True)
    region_python = get_lyapunov_region(fun, grid, init, use_native=False)
    np.testing.assert_array_equal(region_native, region_python)


def test_safety_constraint():
    """Pointwise safety mask for a policy's actions on the grid
    (reference lyapunov.py:378-405)."""
    grid = GridWorld([[-1.0, 1.0]], 5)
    v = _quad_v()
    dynamics = LinearSystem([[0.5, 1.0]])
    policy = LinearSystem([[0.0]])
    lyap = Lyapunov(grid, v, dynamics, 0.5, 1.0, 1e-3, policy,
                    initial_set=[2])
    # Stabilizing candidate actions: u = -0.4 x contracts x+ = 0.1 x.
    good = LinearSystem([[-0.4]])
    mask = lyap.safety_constraint(good)
    assert mask.dtype == bool and mask.shape == (5,)
    assert mask[2]  # initial set always included
    assert mask.sum() >= 3
    # Destabilizing actions: u = +1.0 x gives x+ = 1.5 x (expanding).
    bad = LinearSystem([[1.0]])
    mask_bad = lyap.safety_constraint(bad, include_initial=False)
    assert not mask_bad.any()


def test_adaptive_single_pass_matches_small_batches():
    """The one-device-pass adaptive sweep equals the chunked loop."""
    grid = GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 15)
    p = np.array([[1.0, 0.1], [0.1, 1.5]])
    v = QuadraticFunction(p)
    dynamics = LinearSystem(0.9 * np.eye(2))
    policy = LambdaFunction(lambda x: x[:, :0])
    pts = grid.all_points
    init = np.where(np.einsum("ni,ij,nj->n", pts, p, pts) <= 0.6)[0]

    def run(batch_size):
        lyap = Lyapunov(grid, v, dynamics, 0.9, 1.0, 0.05, policy,
                        initial_set=init, adaptive=True)
        lyap.update_safe_set(max_refinement=4, batch_size=batch_size)
        return lyap.safe_set.copy(), lyap.c_max, lyap._refinement.copy()

    safe_one, c_one, ref_one = run(None)        # single fused-size pass
    safe_small, c_small, ref_small = run(64)    # many small batches
    assert_array_equal(safe_one, safe_small)
    assert_allclose(c_one, c_small)
    assert_array_equal(ref_one, ref_small)
    assert safe_one.sum() > len(init)  # refinement certified more


def _adaptive_instance(n_coarse=41, refine=8):
    """Nonlinear system, genuinely unstable outside |x| ~ 0.73, so the
    certificate has a real outer boundary; near the origin the coarse
    check fails (|dv| < threshold) and only refinement rescues it."""
    grid_c = GridWorld([[-1, 1], [-1, 1]], n_coarse)
    grid_f = GridWorld([[-1, 1], [-1, 1]], (n_coarse - 1) * refine + 1)

    def f(xu):
        x = xu[:, :2]
        return x * (0.25 + 0.9 * jnp.sum(x ** 2, axis=1, keepdims=True))

    dyn = LambdaFunction(f, input_dim=3, output_dim=2)
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    v = QuadraticFunction(np.eye(2))
    lv = LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = 2.05  # |d f / d x| <= 0.25 + 2.7 |x|^2 <= 2.95; 2.05 inside |x|<=0.8
    tau_c = float(np.min(grid_c.unit_maxes))

    def make(grid, tau, adaptive):
        pts = grid.all_points
        initial = np.where(np.linalg.norm(pts, axis=1) <= 0.1)[0]
        return Lyapunov(grid, v, dyn, lf, lv, tau, policy,
                        initial_set=initial, adaptive=adaptive)

    return grid_c, grid_f, make, tau_c, refine


def test_adaptive_matches_uniform_fine_grid():
    """The reference notebook's point (adaptive_safety_verification):
    adaptive refinement on a coarse grid certifies (approximately) the
    same level set as a uniformly fine grid at a fraction of the points."""
    grid_c, grid_f, make, tau_c, refine = _adaptive_instance()

    coarse = make(grid_c, tau_c, adaptive=False)
    coarse.update_safe_set()

    adaptive = make(grid_c, tau_c, adaptive=True)
    adaptive.update_safe_set(max_refinement=refine)

    fine = make(grid_f, tau_c / refine, adaptive=False)
    fine.update_safe_set()

    assert np.isfinite(fine.c_max) and fine.c_max > 0
    # Refinement rescues the near-origin band the coarse tau cannot
    # certify, approaching the fine-grid level from below (sound side).
    assert adaptive.c_max > 2.0 * max(coarse.c_max, 1e-3)
    assert adaptive.c_max <= fine.c_max * 1.02
    assert adaptive.c_max >= fine.c_max * 0.80
    assert adaptive._refinement.max() > 1


def test_adaptive_soundness_cost_vs_reference_formulation():
    """Quantifies the documented deviation (lyapunov.py module docstring):
    our refined check re-evaluates the decrease AT the refined sub-grid
    points (sound); the reference's refined_safety_check compares the
    COARSE-state decrease against the refined threshold
    (/root/reference/safe_learning/lyapunov.py:459-478). The sound check
    certifies no more than the reference's, and on this instance the cost
    is <10% of the certified level."""
    grid_c, grid_f, make, tau_c, refine = _adaptive_instance()

    adaptive = make(grid_c, tau_c, adaptive=True)
    adaptive.update_safe_set(max_refinement=refine)

    # Reference formulation, replicated on the host in float64.
    from safe_learning_tpu.lyapunov import _negative_batch

    lyap = make(grid_c, tau_c, adaptive=False)
    pts = grid_c.all_points
    neg, dec, thr = map(np.asarray, _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, tau_c,
        jnp.asarray(pts)))
    with np.errstate(divide="ignore", invalid="ignore"):
        n_req = np.ceil(thr / dec)
    n_req = np.where(np.isfinite(n_req), n_req, 0.0).astype(int)
    n_req[neg] = 1
    rescued_ref = neg | ((n_req >= 1) & (n_req <= refine)
                        & (dec < thr / np.maximum(n_req, 1)))
    vals = np.asarray(lyap.values)
    exempt = np.zeros(grid_c.nindex, dtype=bool)
    exempt[np.where(np.linalg.norm(pts, axis=1) <= 0.1)[0]] = True
    eligible = rescued_ref | exempt
    v_bad = np.inf if eligible.all() else vals[~eligible].min()
    c_ref = vals[vals < v_bad].max() if (vals < v_bad).any() else -np.inf

    assert np.isfinite(c_ref) and c_ref > 0
    ratio = adaptive.c_max / c_ref
    # Checking the true decrease on the full R^d sub-grid must not cost
    # more than 10% of the reference formulation's certified level (it
    # may exceed it: points the reference deems uncheckable, N(x) > R,
    # can still pass the sound sub-grid check).
    assert ratio >= 0.9, f"soundness cost too large: ratio={ratio:.3f}"


def test_local_lipschitz_1d_return_shape():
    """A callable returning shape (N,) — one constant PER STATE, the
    reference's documented idiom — must give the same certificate as the
    equivalent (N, 1) version (regression: atleast_2d turned (N,) into a
    (1, N) row and summed constants across the batch)."""
    grid = GridWorld([[-1, 1]], 21)
    dyn = LinearSystem([np.array([[0.8]]), np.zeros((1, 1))])
    policy = LambdaFunction(lambda x: 0.0 * x)
    v = QuadraticFunction(np.eye(1))

    def make(lv):
        ly = Lyapunov(grid, v, dyn, 0.8, lv, 5e-3, policy,
                      initial_set=[10])
        ly.update_safe_set()
        return ly

    ly_col = make(LambdaFunction(lambda x: 2.0 * jnp.abs(x)))
    ly_flat = make(lambda x: jnp.max(2.0 * jnp.abs(x), axis=1))
    assert_array_equal(ly_flat.safe_set, ly_col.safe_set)
    assert ly_flat.c_max == ly_col.c_max
    assert ly_col.safe_set.sum() > 1  # certificate is non-trivial


def test_adaptive_refinement_passes_coarse_certified_suffix():
    """Coarse-certified states beyond the first failure keep their
    tau-level certificate (refinement N=1) instead of being re-judged by
    the sub-grid test (regression: a coarse pass could break the
    prefix)."""
    grid = GridWorld([[-1, 1], [-1, 1]], [33, 33])
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    dyn = LinearSystem([np.array([[0.92, 0.0], [0.0, 0.9]]),
                        np.zeros((2, 1))])
    lv = LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    ly = Lyapunov(grid, QuadraticFunction(np.eye(2)), dyn, 0.95, lv,
                  4e-3, policy, initial_set=[grid.nindex // 2],
                  adaptive=True)
    ly.update_safe_set(max_refinement=4)
    safe, ref = ly.safe_set, ly._refinement
    assert safe.sum() > 1
    # Certified states carry BOTH refinement levels: coarse passes (1)
    # interleaved with refined rescues (4) — i.e. the prefix ran through
    # coarse-certified states inside the refinement suffix.
    assert (ref[safe] == 1).any() and (ref[safe] == 4).any()
    values = np.asarray(ly.values).ravel()
    coarse_vals = values[safe & (ref == 1)]
    refined_vals = values[safe & (ref == 4)]
    assert coarse_vals.max() > refined_vals.min()


def test_exempt_cache_tracks_initial_set_inplace_mutation():
    """The fused sweep's cached device exempt mask must refresh when the
    initial safe set is mutated IN PLACE (``lyap.initial_safe_set |=``)
    between sweeps (regression: the cache was keyed on object identity
    only, which in-place mutation preserves)."""
    grid = GridWorld([[-1, 1]], 5)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[2.0, 0.0]]))  # expanding: all fail
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.5, policy,
                    initial_set=[2])
    lyap.update_safe_set()  # populates the device exempt cache
    assert_allclose(lyap.c_max, 0.0)

    # Exempt the two quarter-value states without changing the array id.
    mask = np.zeros(grid.nindex, dtype=bool)
    mask[[1, 3]] = True
    lyap.initial_safe_set |= mask
    lyap.update_safe_set()
    # With the refreshed mask only the boundary states fail: the level
    # set grows to v < 1.
    assert_allclose(lyap.c_max, 0.25)
    assert lyap.safe_set[1] and lyap.safe_set[3]


def test_exempt_cache_tracks_initial_set_item_assignment():
    """Direct ITEM assignment (``lyap.initial_safe_set[i] = True``)
    must also refresh the cached device exempt mask: the mask is a
    TrackedMask whose mutations feed the cache key, so no mutation
    idiom can leave a stale exempt set."""
    grid = GridWorld([[-1, 1]], 5)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[2.0, 0.0]]))  # expanding: all fail
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.5, policy,
                    initial_set=[2])
    lyap.update_safe_set()  # populates the device exempt cache
    assert_allclose(lyap.c_max, 0.0)

    lyap.initial_safe_set[[1, 3]] = True  # no setter, no new object
    lyap.update_safe_set()
    assert_allclose(lyap.c_max, 0.25)
    assert lyap.safe_set[1] and lyap.safe_set[3]


def test_ignored_reference_knobs_warn_once():
    """Non-default safety_factor / parallel_iterations must raise a
    RuntimeWarning instead of silently changing semantics vs the
    reference."""
    grid = GridWorld([[-1, 1]], 3)
    policy = LambdaFunction(lambda x: -0.1 * x)
    dyn = LinearSystem(np.array([[1.0, 1.0]]))
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.5, policy,
                    initial_set=[1], adaptive=True)
    with pytest.warns(RuntimeWarning, match="no effect"):
        lyap.update_safe_set(max_refinement=2, safety_factor=2.0)
    with pytest.warns(RuntimeWarning, match="no effect"):
        lyap.update_safe_set(max_refinement=2, parallel_iterations=8)


def test_pwl_candidate_direct_grid_values():
    """A Triangulation candidate on the verification grid takes its
    vertex values directly (exact; skips one row gather per grid point).
    The sweep must match a wrapped candidate forced through the
    interpolation path, and update_values must return the parameters."""
    rng = np.random.default_rng(0)
    grid = GridWorld([[-1, 1], [-1, 1]], 17)
    pts = grid.all_points
    vals = (pts ** 2).sum(axis=1, keepdims=True)
    tri_candidate = __import__("safe_learning_tpu").Triangulation(
        grid, vals)
    policy = LambdaFunction(lambda x: 0.0 * x[:, :1])
    dyn = LinearSystem([np.array([[0.8, 0.0], [0.0, 0.7]]),
                        np.zeros((2, 1))])
    mid = grid.nindex // 2

    ly_direct = Lyapunov(grid, tri_candidate, dyn, 0.8, 1.0, 1e-3,
                         policy, initial_set=[mid])
    assert ly_direct._direct_grid_values() is not None
    ly_direct.update_safe_set()

    # Same candidate hidden behind a LambdaFunction: interpolation path.
    wrapped = LambdaFunction(lambda x: tri_candidate(x))
    ly_interp = Lyapunov(grid, wrapped, dyn, 0.8, 1.0, 1e-3, policy,
                         initial_set=[mid])
    assert ly_interp._direct_grid_values() is None
    ly_interp.update_safe_set()

    assert_array_equal(ly_direct.safe_set, ly_interp.safe_set)
    assert_allclose(ly_direct.c_max, ly_interp.c_max, rtol=1e-6)
    assert ly_direct.safe_set.sum() > 1
    # update_values returns the parameters themselves.
    assert_allclose(np.asarray(ly_direct.values),
                    vals.ravel(), rtol=0, atol=0)


def test_interleaved_sweeps_do_not_bump_initial_set_counter():
    """update_safe_set(can_shrink=False) builds its exempt scratch mask
    from plain copies: a TrackedMask copy would share the mutation
    counter, and the internal ``|=`` would spuriously invalidate the
    cached device exempt mask on every can_shrink alternation."""
    grid = GridWorld([[-1, 1]], 5)
    policy = LambdaFunction(lambda x: 0.0 * x)
    dyn = LinearSystem(np.array([[0.5, 0.0]]))
    lyap = Lyapunov(grid, _quad_v(), dyn, 0.4, 0.3, 0.1, policy,
                    initial_set=[2])
    lyap.update_safe_set(can_shrink=True)
    before = lyap.initial_safe_set.mutations
    lyap.update_safe_set(can_shrink=False)
    lyap.update_safe_set(can_shrink=True)
    assert lyap.initial_safe_set.mutations == before
