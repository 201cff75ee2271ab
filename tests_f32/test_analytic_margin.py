"""Derived (analytic) certificate margin: rigor and usability.

``errorbounds.analytic_certificate_margin`` derives a rounding-error
bound for the whole f32 decrease pipeline from the standard model of
floating-point arithmetic — no float64 oracle pass, full-grid coverage
by construction. Two properties matter:

1. **Domination** (the rigor claim): the derived bound must exceed the
   *measured* worst f32-vs-f64 margin deviation over the FULL grid on
   randomized instances — including the ill-conditioned ones where
   worst-case analysis overshoots reality by ~1000x (small noise means
   large ``chol_inv`` entries, and the abs-value matvec bound scales
   with the solve's condition number).
2. **Usability in its regime**: on a well-conditioned instance the
   margin is small enough that the certificate still discriminates, and
   containment in the f64 oracle set holds end to end.

The empirical calibrator remains the practical default for tight
instances; the analytic bound is the rigorous option and the documented
explanation of WHY measurement is needed at all (see
``docs/performance.md``).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.config import config  # noqa: E402
from safe_learning_tpu.errorbounds import (ErrorModel,  # noqa: E402
                                           analytic_certificate_margin)
from safe_learning_tpu.lyapunov import _negative_batch  # noqa: E402
from safe_learning_tpu.oracle import (oracle_margins,  # noqa: E402
                                      oracle_safe_set)
from test_f32_certificate import _random_instance  # noqa: E402

# Rounding model of the property instances' L_v = 2|x|: one multiply
# (relative error u) and |.| exact; Lipschitz constant of 2|x| is 2.
_LV_MODEL = ErrorModel(
    lambda x: 2.0 * np.finfo(np.float32).eps / 2 * 4.0 * jnp.abs(x), 2.0)


def _measured_worst_error(lyap):
    """Max |margin_f32 - margin_f64| over the FULL grid."""
    pts = lyap.discretization.all_points
    _, dec, thr = _negative_batch(
        lyap.policy, lyap.dynamics, lyap.lyapunov_function,
        lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics,
        lyap.tau, jnp.asarray(pts, dtype=config.dtype))
    md = np.asarray(dec, np.float64) - np.asarray(thr, np.float64)
    return float(np.max(np.abs(md - oracle_margins(lyap, pts))))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_analytic_bound_dominates_measured_error(seed):
    """safety=1.0 must already dominate the true full-grid error."""
    lyap = _random_instance(seed)
    margin = analytic_certificate_margin(lyap, safety=1.0,
                                         lipschitz_model=_LV_MODEL,
                                         set_margin=False)
    err = _measured_worst_error(lyap)
    assert margin >= err, (margin, err)
    # Worst-case analysis on these ill-conditioned instances (noise
    # ~1e-4) is orders looser than reality — that overshoot is WHY the
    # empirical calibrator exists. Record the ratio stays in the
    # expected regime rather than exploding further.
    assert margin / err < 1e5, (margin, err)


def _well_conditioned_instance(adaptive=False):
    """Strong contraction, moderate noise, smooth kernel: the regime
    where the derived margin is small enough to use end to end."""
    rng = np.random.default_rng(11)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 41)
    a = np.array([[0.22, 0.03], [-0.02, 0.18]])
    b = np.zeros((2, 1))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))

    n_train = 40
    x_train = np.column_stack([
        rng.uniform(-0.9, 0.9, n_train),
        rng.uniform(-0.9, 0.9, n_train),
        np.zeros(n_train)])
    y_train = x_train[:, :2] @ a.T + 0.01 * np.sin(2 * x_train[:, :2])
    gp = sl.GaussianProcess(
        sl.RBF(0.5, [0.8, 0.8, 1.0], input_dim=3), x_train, y_train,
        noise_variance=1e-2, beta=2.0,
        mean_function=sl.LinearSystem([a, b]))

    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial, adaptive=adaptive)


def test_analytic_margin_usable_when_well_conditioned():
    lyap = _well_conditioned_instance()
    margin = analytic_certificate_margin(lyap, lipschitz_model=_LV_MODEL)
    assert margin == lyap.certificate_margin and margin > 0.0
    assert margin >= _measured_worst_error(lyap)

    lyap.update_safe_set()
    safe64, c64 = oracle_safe_set(lyap)
    frac32, frac64 = lyap.safe_set.mean(), safe64.mean()
    # The margin-guarded certificate still discriminates...
    assert 0.02 < frac32 < 0.98, (frac32, frac64, margin)
    # ...is contained in the exact-arithmetic set...
    assert not (lyap.safe_set & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)
    # ...and the conservatism cost of the DERIVED margin stays moderate.
    assert frac64 - frac32 < 0.2, (frac32, frac64, margin)


def test_unsupported_types_raise():
    grid = sl.GridWorld([[-1.0, 1.0]], 11)
    policy = sl.LinearSystem(np.zeros((1, 1)))
    v = sl.QuadraticFunction(np.eye(1))
    # LinearSystem dynamics are now analyzed deterministically; a bare
    # callable is the unsupported case.
    dyn = sl.LambdaFunction(lambda x: 0.5 * x[:, :1], input_dim=2,
                            output_dim=1)
    lyap = sl.Lyapunov(grid, v, dyn, 0.5, 2.0, 0.1, policy)
    with pytest.raises(NotImplementedError, match="dynamics"):
        analytic_certificate_margin(lyap)

    # A 2|Px|-pattern LambdaFunction L_v is auto-probed now (r5); a
    # genuinely nonlinear callable still has no derivable model.
    lyap2 = _random_instance(0)
    lyap2._lipschitz_lyapunov = sl.LambdaFunction(
        lambda x: jnp.abs(jnp.sin(2.0 * x)))
    with pytest.raises(NotImplementedError, match="ErrorModel"):
        analytic_certificate_margin(lyap2)
    # ...and the 2|Px| pattern itself derives without a hand model.
    lyap3 = _random_instance(0)
    assert analytic_certificate_margin(lyap3, set_margin=False) > 0.0


def _stacked_instance():
    """The flagship dynamics form: per-output GPs stacked."""
    rng = np.random.default_rng(21)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 31)
    a = np.array([[0.25, 0.05], [-0.04, 0.2]])
    b = np.zeros((2, 1))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))

    n_train = 36
    x_train = np.column_stack([
        rng.uniform(-0.9, 0.9, n_train),
        rng.uniform(-0.9, 0.9, n_train),
        np.zeros(n_train)])
    y_train = x_train[:, :2] @ a.T + 0.01 * np.cos(2 * x_train[:, :2])
    gps = [
        sl.GaussianProcess(
            sl.RBF(0.4 + 0.1 * s, [0.7, 0.9, 1.0], input_dim=3),
            x_train, y_train[:, s:s + 1], noise_variance=5e-3, beta=2.0,
            mean_function=sl.LinearSystem([a[s:s + 1], b[s:s + 1]]))
        for s in range(2)]
    stacked = sl.StackedGaussianProcess.from_gps(gps)

    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, v, stacked, lf, lv, tau, policy,
                       initial_set=initial)


def test_analytic_margin_supports_stacked_gps():
    """The flagship dynamics form: per-output stacked GPs go through
    the same per-view analysis; the derived bound still dominates the
    measured full-grid error and containment holds end to end."""
    lyap = _stacked_instance()
    margin = analytic_certificate_margin(lyap, lipschitz_model=_LV_MODEL)
    assert margin > 0.0
    assert margin >= _measured_worst_error(lyap)

    lyap.update_safe_set()
    safe64, _ = oracle_safe_set(lyap)
    assert not (lyap.safe_set & ~safe64).any()
    assert 0.02 < lyap.safe_set.mean() < 0.98


def _offset_domain_instance():
    """Domain far from the origin in lengthscale units: the XLA
    squared-distance form xx - 2 cross + zz cancels catastrophically
    (magnitudes ~ |x/ls|^2 >> t), the regime where a bound modeled on
    the small distance itself would under-cover by orders."""
    rng = np.random.default_rng(31)
    grid = sl.GridWorld([[2.0, 4.0], [2.0, 4.0]], 31)
    a = np.array([[0.3, 0.0], [0.0, 0.25]])
    b = np.zeros((2, 1))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    n_train = 30
    x_train = np.column_stack([
        rng.uniform(2.0, 4.0, n_train), rng.uniform(2.0, 4.0, n_train),
        np.zeros(n_train)])
    y_train = x_train[:, :2] @ a.T
    gp = sl.GaussianProcess(
        sl.RBF(0.4, [0.15, 0.15, 1.0], input_dim=3), x_train, y_train,
        noise_variance=5e-3, beta=2.0,
        mean_function=sl.LinearSystem([a, b]))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = 0.3
    tau = float(np.min(grid.unit_maxes))
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=[0])


def test_domination_in_the_cancellation_regime():
    """Per-pair sqdist-form error modeling: the bound must dominate the
    measured error even when xx + 2|cross| + zz >> t (points ~20
    lengthscales from the origin)."""
    lyap = _offset_domain_instance()
    margin = analytic_certificate_margin(lyap, safety=1.0,
                                         lipschitz_model=_LV_MODEL,
                                         set_margin=False)
    err = _measured_worst_error(lyap)
    assert margin >= err, (margin, err)


def test_row_shaped_lipschitz_callable():
    """An L_v callable returning (N,) — one constant per state — must
    become a column, not broadcast to (N, N) (the lyapunov
    _as_column_batch hazard)."""
    lyap = _well_conditioned_instance()
    lyap._lipschitz_lyapunov = sl.LambdaFunction(
        lambda x: 2.0 * jnp.linalg.norm(x, axis=1))
    model = ErrorModel(
        lambda x: 4.0 * np.finfo(np.float32).eps / 2 * 4.0
        * jnp.linalg.norm(x, axis=1), 2.0)
    margin = analytic_certificate_margin(lyap, lipschitz_model=model,
                                         set_margin=False)
    assert np.isfinite(margin) and 0.0 < margin < 1.0


def test_refinement_coverage_and_containment():
    """refinement=R covers the adaptive sweep's sub-grid points; the
    refined margin is at least the base margin, and the REFINED branch
    (adaptive=True, so _refined_negative_batch actually runs) keeps the
    certified set inside the refined f64 truth."""
    lyap = _well_conditioned_instance(adaptive=True)
    base = analytic_certificate_margin(lyap, lipschitz_model=_LV_MODEL,
                                       set_margin=False)
    refined = analytic_certificate_margin(lyap, lipschitz_model=_LV_MODEL,
                                          refinement=3)
    assert refined >= base
    lyap.update_safe_set(max_refinement=3)
    # The refined sweep certifies more than the coarse oracle can
    # confirm, so build the refined f64 truth: a state is truly safe if
    # it passes the exact coarse check OR every refined sub-point
    # passes the exact check at tau / R.
    import itertools

    from safe_learning_tpu.oracle import oracle_margins

    grid = lyap.discretization
    pts = grid.all_points
    coarse_ok = oracle_margins(lyap, pts) < 0
    R = 3
    refined_ok = np.ones(grid.nindex, dtype=bool)
    unit = np.asarray(grid.unit_maxes)
    for combo in itertools.product(range(R), repeat=grid.ndim):
        off = (0.5 * (1 - 1 / R)) * unit * (
            -1.0 + 2.0 * np.array(combo) / (R - 1.0))
        refined_ok &= oracle_margins(
            lyap, pts + off.astype(pts.dtype), tau=lyap.tau / R) < 0
    eligible = coarse_ok | refined_ok
    if lyap.initial_safe_set is not None:
        eligible |= np.asarray(lyap.initial_safe_set, dtype=bool)
    vals = np.asarray(lyap.lyapunov_function(pts)).ravel()
    v_bad = np.inf if eligible.all() else vals[~eligible].min()
    true_safe = vals < v_bad
    if lyap.initial_safe_set is not None:
        true_safe |= np.asarray(lyap.initial_safe_set, dtype=bool)
    assert not (lyap.safe_set & ~true_safe).any()


def test_precision_guard():
    """A non-'highest' Pallas precision voids the rounding model and
    must be rejected loudly."""
    lyap = _well_conditioned_instance()
    old = config.pallas_precision
    try:
        config.pallas_precision = "high"
        with pytest.raises(RuntimeError, match="highest"):
            analytic_certificate_margin(lyap, lipschitz_model=_LV_MODEL)
    finally:
        config.pallas_precision = old


@pytest.mark.parametrize("kernel_cls", ["Matern12", "Matern32", "Matern52"])
def test_matern_family_domination(kernel_cls):
    """The Matern entry-error model (v max|g'| sqrt(c dt)) must
    dominate the measured full-grid error like the RBF model does."""
    rng = np.random.default_rng(41)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 31)
    a = np.array([[0.25, 0.04], [-0.03, 0.2]])
    b = np.zeros((2, 1))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    n_train = 32
    x_train = np.column_stack([
        rng.uniform(-0.9, 0.9, n_train), rng.uniform(-0.9, 0.9, n_train),
        np.zeros(n_train)])
    y_train = x_train[:, :2] @ a.T + 0.01 * np.sin(2 * x_train[:, :2])
    kernel = getattr(sl, kernel_cls)(0.4, [0.6, 0.6, 1.0], input_dim=3)
    gp = sl.GaussianProcess(kernel, x_train, y_train,
                            noise_variance=5e-3, beta=2.0,
                            mean_function=sl.LinearSystem([a, b]))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lyap = sl.Lyapunov(grid, v, gp, 0.3, lv,
                       float(np.min(grid.unit_maxes)), policy,
                       initial_set=[0])
    margin = analytic_certificate_margin(lyap, safety=1.0,
                                         lipschitz_model=_LV_MODEL,
                                         set_margin=False)
    err = _measured_worst_error(lyap)
    assert margin >= err, (kernel_cls, margin, err)


def test_flagship_composite_kernel_domination():
    """The flagship examples' kernel family — Linear + ActiveDims(
    Matern32) * ActiveDims(Linear), stacked per output — goes through
    the recursive entry-error program; the derived bound dominates the
    measured full-grid error and the margins install end to end."""
    rng = np.random.default_rng(51)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 31)
    a = np.array([[0.3, 0.05], [-0.04, 0.25]])
    b = np.array([[0.1], [0.08]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    n_train = 30
    x_train = np.column_stack([
        rng.uniform(-0.9, 0.9, n_train), rng.uniform(-0.9, 0.9, n_train),
        rng.uniform(-0.5, 0.5, n_train)])
    y_train = (x_train[:, :2] @ a.T + x_train[:, 2:] @ b.T
               + 0.01 * np.sin(2 * x_train[:, :2]))
    gps = []
    for dim in range(2):
        kernel = (
            sl.LinearKernel(variances=[0.02, 0.02, 0.05], input_dim=3)
            + sl.ActiveDims(sl.Matern32(0.3, lengthscales=1.0,
                                        input_dim=1), dims=[0])
            * sl.ActiveDims(sl.LinearKernel(variances=0.05,
                                            input_dim=1), dims=[1]))
        gps.append(sl.GaussianProcess(
            kernel, x_train, y_train[:, dim:dim + 1],
            noise_variance=5e-3, beta=2.0,
            mean_function=sl.LinearSystem([a[[dim]], b[[dim]]])))
    stacked = sl.StackedGaussianProcess.from_gps(gps)
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lyap = sl.Lyapunov(grid, v, stacked, 0.35, lv,
                       float(np.min(grid.unit_maxes)), policy,
                       initial_set=[0])
    margin = analytic_certificate_margin(lyap, safety=1.0,
                                         lipschitz_model=_LV_MODEL,
                                         set_margin=False)
    err = _measured_worst_error(lyap)
    assert margin >= err, (margin, err)


def test_composite_kernel_domination_with_nonzero_perturbation():
    """Exercise the perturbation terms the zero-policy flagship test
    leaves at zero: a nonzero linear policy feeds du into every node's
    dpert/ddiag path, and refinement=2 feeds dx through the state dims;
    the derived bound must still dominate the measured refined error."""
    import itertools

    rng = np.random.default_rng(61)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 21)
    a = np.array([[0.3, 0.05], [-0.04, 0.25]])
    b = np.array([[0.1], [0.08]])
    k_pol = np.array([[0.2, -0.1]])
    policy = sl.Saturation(sl.LinearSystem(-k_pol), -1.0, 1.0)
    v = sl.QuadraticFunction(np.eye(2))
    n_train = 26
    x_train = np.column_stack([
        rng.uniform(-0.9, 0.9, n_train), rng.uniform(-0.9, 0.9, n_train),
        rng.uniform(-0.4, 0.4, n_train)])
    y_train = (x_train[:, :2] @ a.T + x_train[:, 2:] @ b.T
               + 0.01 * np.sin(2 * x_train[:, :2]))
    kernel = (
        sl.LinearKernel(variances=[0.02, 0.02, 0.05], input_dim=3)
        + sl.ActiveDims(sl.Matern32(0.3, lengthscales=1.0,
                                    input_dim=1), dims=[0])
        * sl.ActiveDims(sl.LinearKernel(variances=0.05, input_dim=1),
                        dims=[2]))
    gps = [sl.GaussianProcess(kernel, x_train, y_train[:, s:s + 1],
                              noise_variance=5e-3, beta=2.0,
                              mean_function=sl.LinearSystem(
                                  [a[[s]], b[[s]]]))
           for s in range(2)]
    stacked = sl.StackedGaussianProcess.from_gps(gps)
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lyap = sl.Lyapunov(grid, v, stacked, 0.35, lv,
                       float(np.min(grid.unit_maxes)), policy,
                       initial_set=[0], adaptive=True)

    margin = analytic_certificate_margin(lyap, safety=1.0,
                                         lipschitz_model=_LV_MODEL,
                                         refinement=2, set_margin=False)

    # Exhaustive truth over the 2-refined point set at tau / 2.
    from safe_learning_tpu.lyapunov import _negative_batch
    from safe_learning_tpu.oracle import oracle_margins

    R = 2
    unit = np.asarray(grid.unit_maxes)
    base = np.array(grid.all_points, dtype=config.np_dtype)
    worst = 0.0
    offsets = [np.zeros(2)] + [
        (0.5 * (1 - 1 / R)) * unit * (-1.0 + 2.0 * np.array(c) / (R - 1.0))
        for c in itertools.product(range(R), repeat=2)]
    for off in offsets:
        pts = base + off.astype(config.np_dtype)
        tau = lyap.tau if not off.any() else lyap.tau / R
        _, dec, thr = _negative_batch(
            lyap.policy, lyap.dynamics, lyap.lyapunov_function,
            lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics,
            tau, jnp.asarray(pts))
        md = np.asarray(dec, np.float64) - np.asarray(thr, np.float64)
        worst = max(worst, float(np.max(np.abs(
            md - oracle_margins(lyap, pts, tau=tau)))))
    assert margin >= worst, (margin, worst)
