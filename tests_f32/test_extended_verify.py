"""Extended-precision verification: accuracy, domination, containment.

The extended (double-word float32) sweep exists so the DERIVED
certificate margin stays usable on ill-conditioned GP instances, where
the f32 worst-case bound exceeds the threshold itself (VERDICT round 2,
item 1; ``docs/performance.md``). Three properties carry the claim:

1. **Accuracy** — the df GP posterior matches the float64 oracle to
   ~2^-40 relative, about six orders beyond the f32 pipeline.
2. **Domination** — the derived margin at ``U_EFF`` bounds the MEASURED
   full-grid ``|margin_dw - margin_oracle|`` on randomized instances,
   including bordered-append (non-fresh) factor states.
3. **Containment & usability** — ``update_safe_set(extended=True)``
   with the derived margin certifies a subset of the float64 oracle's
   set while still certifying a non-degenerate fraction in exactly the
   noise regime where the f32 derived margin is useless.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.ops.extended_verify import (  # noqa: E402
    U_EFF, ExtendedSweep, extended_certificate_margin,
    extended_gp_evaluate)
from safe_learning_tpu.oracle import (_oracle_env, lift64,  # noqa: E402
                                      oracle_margins, oracle_safe_set)
from test_f32_certificate import _random_instance  # noqa: E402

_LV_MAT = 2.0 * np.eye(2)


def _ill_conditioned_instance(seed=3, noise=(1e-6, 1e-7)):
    """Stacked GP with tiny noise: the f32 derived margin blows up here."""
    rng = np.random.default_rng(seed)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 41)
    raw = rng.normal(size=(2, 2))
    a = raw * (0.5 / np.linalg.norm(raw, 2))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    nt = 70
    xt = np.column_stack([rng.uniform(-0.4, 0.4, nt),
                          rng.uniform(-0.4, 0.4, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T + 0.02 * np.sin(3 * xt[:, :2])
    st = sl.StackedGaussianProcess(
        [sl.RBF(1.0, [0.3] * 3, input_dim=3),
         sl.Matern32(0.9, [0.35] * 3, input_dim=3)],
        xt, yt, list(noise), betas=2.0,
        mean_functions=[sl.LinearSystem([a[0:1], np.zeros((1, 1))]),
                        sl.LinearSystem([a[1:2], np.zeros((1, 1))])])
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, v, st, lf, lv, tau, policy,
                       initial_set=initial)


def test_df_gp_posterior_matches_f64_oracle():
    """Mean and confidence to ~1e-9 absolute — six orders past f32."""
    lyap = _ill_conditioned_instance()
    grid = lyap.discretization
    pts = np.asarray(grid.all_points[::17], np.float32)
    q = np.column_stack([pts, np.zeros(len(pts), np.float32)])
    mean_df, err_df = extended_gp_evaluate(lyap.dynamics, q)
    with _oracle_env():
        g64 = lift64(lyap.dynamics)
        m64, e64 = map(np.asarray, g64(jnp.asarray(q, jnp.float64)))
    scale = max(1.0, float(np.max(np.abs(m64))))
    assert np.max(np.abs(mean_df - m64)) < 1e-9 * scale
    assert np.max(np.abs(err_df - e64)) < 1e-8 * scale


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_extended_margin_dominates_full_grid(seed):
    """Derived U_EFF margin >= measured worst df-vs-oracle deviation."""
    lyap = _random_instance(seed)
    margin = extended_certificate_margin(lyap, lv_matrix=_LV_MAT,
                                         set_margin=False)
    sweep = ExtendedSweep(lyap, lv_matrix=_LV_MAT)
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    worst = float(np.max(np.abs(sweep.margins(pts)
                                - oracle_margins(lyap, pts))))
    assert margin >= worst, (margin, worst)
    # The measured deviation really is extended-precision scale.
    assert worst < 1e-6, worst


def test_extended_usable_where_f32_margin_is_not():
    """The headline property: on a tiny-noise instance the f32 derived
    margin exceeds the threshold scale (kills certification) while the
    extended margin costs almost nothing — and full containment holds
    end to end through update_safe_set(extended=True)."""
    from safe_learning_tpu.errorbounds import (ErrorModel,
                                               analytic_certificate_margin)

    lyap = _ill_conditioned_instance()
    em = ErrorModel(
        lambda x: 2.0 * np.finfo(np.float32).eps / 2 * 4.0 * jnp.abs(x),
        2.0)
    m32 = analytic_certificate_margin(lyap, lipschitz_model=em,
                                      set_margin=False)
    m_ext = extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    # Threshold scale of this instance: L_v (1 + L_f) tau ~ 0.15.
    thr_scale = 2.0 * (1.0 + 0.5) * lyap.tau
    assert m32 > thr_scale, (m32, thr_scale)       # f32 bound useless
    assert m_ext < 0.1 * thr_scale, (m_ext, thr_scale)
    assert m_ext / m32 < 1e-3

    lyap.update_safe_set(extended=True)
    safe64, c64 = oracle_safe_set(lyap)
    assert 0.02 < safe64.mean() < 0.98
    assert not (lyap.safe_set & ~safe64).any()
    # Conservatism cost stays small despite full rigor.
    assert safe64.mean() - lyap.safe_set.mean() < 0.05
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


def test_extended_covers_bordered_append_states():
    """After add_data_point the host factors are bordered (non-fresh);
    the sweep must refactorize so domination still holds."""
    lyap = _ill_conditioned_instance()
    lyap.dynamics = lyap.dynamics.add_data_point(
        np.array([[0.1, 0.1, 0.0]], np.float32),
        np.array([[0.05, 0.05]], np.float32))
    assert not lyap.dynamics._host_caches[0].fresh
    margin = extended_certificate_margin(lyap, lv_matrix=_LV_MAT,
                                         set_margin=False)
    sweep = ExtendedSweep(lyap, lv_matrix=_LV_MAT)
    pts = np.asarray(lyap.discretization.all_points[::3], np.float32)
    worst = float(np.max(np.abs(sweep.margins(pts)
                                - oracle_margins(lyap, pts))))
    assert margin >= worst, (margin, worst)
    assert worst < 1e-6, worst


def test_extended_refined_check_is_sound():
    """Every state the refined df check passes satisfies the exact
    refined condition (tau / R at the same f32 sub-points) — checked
    point by point against the float64 oracle."""
    lyap = _ill_conditioned_instance()
    R = 2
    margin = extended_certificate_margin(lyap, lv_matrix=_LV_MAT,
                                         refinement=R)
    sweep = ExtendedSweep(lyap, lv_matrix=_LV_MAT)
    grid = lyap.discretization
    rng = np.random.default_rng(0)
    states = np.asarray(
        grid.all_points[rng.choice(grid.nindex, 64, replace=False)],
        np.float32)
    ok = np.asarray(sweep.refined_negative_batch(states, R,
                                                 margin=margin))
    # Rebuild the sub-points exactly as the sweep does and ask the
    # oracle at tau / R.
    d = grid.ndim
    combos = np.stack(np.meshgrid(*[np.arange(R)] * d, indexing="ij"),
                      axis=-1).reshape(-1, d).astype(np.float64)
    unit = (-1.0 + 2.0 * combos / (R - 1.0)).astype(np.float32)
    half = ((0.5 * (1.0 - 1.0 / R))
            * np.asarray(grid.unit_maxes)).astype(np.float32)
    pts = (states[:, None, :] + half * unit[None, :, :]).reshape(-1, d)
    exact = oracle_margins(lyap, pts, tau=lyap.tau / R).reshape(
        len(states), -1)
    passed_exact = (exact < 0.0).all(axis=1)
    assert not (ok & ~passed_exact).any()
    assert ok.any()  # non-degenerate: the check certifies something


def test_extended_exploration_certificate_is_exact():
    """get_safe_sample(extended=True) with the derived exploration
    margin returns pairs whose EXACT (float64) confidence-weighted
    future value is below c_max — and the df scoring never accepts a
    candidate the exact check rejects, across the candidate set."""
    import warnings

    from safe_learning_tpu.explore import perturb_actions
    from safe_learning_tpu.ops.extended_verify import (
        extended_exploration_margin)

    lyap = _ill_conditioned_instance()
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    lyap.update_safe_set(extended=True)
    perturb = np.linspace(-0.3, 0.3, 5)[:, None].astype(np.float32)
    limits = np.array([[-0.5, 0.5]])
    m_exp = extended_exploration_margin(lyap, perturbations=perturb,
                                        limits=limits)
    assert 0.0 < m_exp < 0.01

    def exact_future(pairs):
        with _oracle_env():
            dyn64 = lift64(lyap.dynamics)
            v64 = lift64(lyap.lyapunov_function)
            lv64 = lift64(lyap._lipschitz_lyapunov)
            q = jnp.asarray(np.asarray(pairs, np.float64), jnp.float64)
            mean, err = dyn64(q)
            lv = np.abs(np.asarray(lv64(mean)))
            return (np.asarray(v64(mean)).ravel()
                    + np.sum(lv * np.asarray(err), axis=1))

    rng = np.random.default_rng(0)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no backup used
        sa, var = sl.get_safe_sample(lyap, perturbations=perturb,
                                     limits=limits, positive=True,
                                     num_samples=200, rng=rng,
                                     extended=True)
    assert var > 0.0
    assert exact_future(sa)[0] < lyap.c_max

    # Candidate-set sweep: df-accepted implies exactly-safe.
    grid = lyap.discretization
    states = np.asarray(grid.all_points[::13], np.float32)
    acts = np.asarray(lyap.policy(jnp.asarray(states)), np.float32)
    cands = perturb_actions(states, acts, perturb, limits=limits)
    sweep = lyap._get_extended_sweep()
    _, inside, _ = map(np.asarray, sweep.score_candidates(
        cands, lyap.c_max, m_exp))
    fut = exact_future(cands)
    assert inside.any()
    assert not (inside & ~(fut < lyap.c_max)).any()


def test_scalar_lv_and_wrong_lv_matrix():
    """Scalar L_v runs without a model; a wrong lv_matrix fails loudly."""
    lyap = _random_instance(1)
    lyap._lipschitz_lyapunov = 2.0  # constant L_v
    sweep = ExtendedSweep(lyap)
    pts = np.asarray(lyap.discretization.all_points[::29], np.float32)
    worst = float(np.max(np.abs(sweep.margins(pts)
                                - oracle_margins(lyap, pts))))
    assert worst < 1e-6

    bad = _random_instance(1)  # L_v = 2|x| but model says 3|x|
    with pytest.raises(ValueError):
        ExtendedSweep(bad, lv_matrix=3.0 * np.eye(2))


def _pwl_flagship_family_instance(n_grid=51):
    """1-D flagship-shaped instance: PWL candidate on the sweep grid,
    composite Matern/Linear kernel, Saturation policy, tiny noise."""
    rng = np.random.default_rng(5)
    grid = sl.GridWorld([[-1.0, 1.0]], n_grid)
    kernel = (sl.ActiveDims(sl.Matern32(variance=0.4 ** 2,
                                        lengthscales=1.0, input_dim=1),
                            [0])
              * sl.ActiveDims(sl.LinearKernel(0.2, input_dim=1), [1])
              + sl.ActiveDims(sl.Matern32(variance=0.1,
                                          lengthscales=0.8,
                                          input_dim=1), [0]))
    nt = 30
    xt = np.column_stack([rng.uniform(-0.8, 0.8, nt),
                          rng.uniform(-0.5, 0.5, nt)])
    yt = (0.1 * xt[:, :1] + 0.1 * xt[:, 1:2]
          + 0.02 * np.sin(2 * xt[:, :1]))
    gp = sl.GaussianProcess(kernel, xt, yt, noise_variance=1e-7,
                            beta=2.0,
                            mean_function=sl.LinearSystem([[0.1, 0.1]]))
    theta = np.abs(grid.all_points[:, 0])[:, None].astype(np.float32)
    v = sl.Triangulation(grid, theta)
    policy = sl.Saturation(sl.LinearSystem([[-0.3]]), -0.5, 0.5)
    tau = float(np.min(grid.unit_maxes))
    init = np.where(np.abs(grid.all_points[:, 0]) <= 0.1)[0]
    return sl.Lyapunov(grid, v, gp, 0.3, 1.0, tau, policy,
                       initial_set=init)


def test_pwl_candidate_extended_containment():
    """Triangulation candidates (the flagship family): the df PWL
    evaluation + PWL margin rule dominate the measured deviation and
    certify a usable fraction with f64-oracle containment, where the
    f32 derived margin again exceeds the threshold."""
    from safe_learning_tpu.errorbounds import analytic_certificate_margin

    lyap = _pwl_flagship_family_instance()
    m32 = analytic_certificate_margin(lyap, set_margin=False)
    m_ext = extended_certificate_margin(lyap)
    thr_scale = 1.0 * (1.0 + 0.3) * lyap.tau
    assert m32 > thr_scale, (m32, thr_scale)
    assert m_ext < 0.6 * thr_scale, (m_ext, thr_scale)

    sweep = ExtendedSweep(lyap)
    pts = np.asarray(lyap.discretization.all_points, np.float32)
    worst = float(np.max(np.abs(sweep.margins(pts)
                                - oracle_margins(lyap, pts))))
    assert m_ext >= worst, (m_ext, worst)
    assert worst < 1e-6, worst

    lyap.update_safe_set(extended=True)
    safe64, _ = oracle_safe_set(lyap)
    assert not (lyap.safe_set & ~safe64).any()
    # The derived-margin extended sweep certifies the FULL domain here
    # (the f32 derived margin certifies nothing beyond the exempt set).
    assert lyap.safe_set.all()


@pytest.mark.parametrize("project", [False, True])
def test_pwl_df_evaluation_matches_oracle_off_grid(project):
    """The df PWL evaluation agrees with the float64 lift at arbitrary
    (including extrapolated / projected) points to extended precision."""
    rng = np.random.default_rng(9)
    grid = sl.GridWorld([[-1.0, 1.0], [-0.5, 0.5]], [9, 7])
    theta = rng.normal(size=(grid.nindex, 1)).astype(np.float32)
    tri = sl.Triangulation(grid, theta, project=project)
    pts = np.column_stack([rng.uniform(-1.2, 1.2, 512),
                           rng.uniform(-0.7, 0.7, 512)]).astype(
                               np.float32)

    from safe_learning_tpu.ops.extended_verify import (_compile_candidate,
                                                       _split_np)
    params = []
    fn, sig = _compile_candidate(tri, params)
    assert sig[0] == "pwl"
    import jax

    vh, vl = jax.jit(lambda vp, x: fn(vp, x))(
        tuple(params), (jnp.asarray(pts), jnp.zeros_like(pts)))
    got = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    with _oracle_env():
        want = np.asarray(lift64(tri)(
            jnp.asarray(pts, jnp.float64)).reshape(-1), np.float64)
    # Agreement wherever the f64 and df locates picked the same
    # simplex; near faces they may differ, bounded by continuity — so
    # compare against the interpolant's Lipschitz bound instead of
    # failing on those.
    g_max = float(np.max(np.abs(np.diff(
        np.asarray(theta[:, 0]).reshape(9, 7), axis=0)))) / float(
            grid.unit_maxes[0])
    tol = 1e-6 + g_max * 1e-5
    assert np.max(np.abs(got - want)) < tol


def test_extended_sweep_on_device_mesh():
    """The df pipeline is per-point arithmetic, so SPMD over the grid
    axis must reproduce the single-device extended sweep exactly."""
    import jax

    from safe_learning_tpu.parallel import make_mesh

    assert jax.device_count() >= 8
    single = _ill_conditioned_instance()
    extended_certificate_margin(single, lv_matrix=_LV_MAT)
    single.update_safe_set(extended=True)

    meshed = _ill_conditioned_instance()
    meshed.mesh = make_mesh(8)
    extended_certificate_margin(meshed, lv_matrix=_LV_MAT)
    meshed.update_safe_set(extended=True)

    np.testing.assert_array_equal(meshed.safe_set, single.safe_set)
    assert meshed.c_max == single.c_max


def test_extended_margins_refused_by_f32_pipelines():
    """A U_EFF-derived margin cannot cover f32 rounding: the plain f32
    sweep and scorer refuse it loudly instead of silently certifying
    states whose exact condition fails; explicit assignment (the
    caller-takes-responsibility escape hatch) clears the restriction."""
    from safe_learning_tpu.explore import _margin_of
    from safe_learning_tpu.ops.extended_verify import (
        extended_exploration_margin)

    lyap = _ill_conditioned_instance()
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    with pytest.raises(RuntimeError, match="extended"):
        lyap.update_safe_set()
    # The f32 exploration scorer's certificate_margin fallback refuses
    # the tagged margin too.
    with pytest.raises(RuntimeError, match="extended"):
        _margin_of(lyap)
    # The extended pipeline consumes it fine.
    lyap.update_safe_set(extended=True)
    assert lyap.safe_set.any()

    # A dedicated U_EFF exploration margin is refused by the f32 scorer.
    perturb = np.linspace(-0.3, 0.3, 5)[:, None].astype(np.float32)
    extended_exploration_margin(lyap, perturbations=perturb,
                                limits=np.array([[-0.5, 0.5]]))
    with pytest.raises(RuntimeError, match="extended"):
        _margin_of(lyap)

    # Manual assignment takes responsibility and lifts both guards.
    lyap.exploration_margin = 1e-3
    assert _margin_of(lyap) == 1e-3
    lyap.certificate_margin = 1e-3
    lyap.update_safe_set()


def test_extended_update_matches_plain_update_semantics():
    """With the SAME margins installed, the extended sweep's safe set
    agrees with the plain f32 sweep's wherever both pipelines are far
    from the margin band (they certify the same condition)."""
    lyap_a = _random_instance(11)
    lyap_b = _random_instance(11)
    m = extended_certificate_margin(lyap_a, lv_matrix=_LV_MAT)
    lyap_b.certificate_margin = m
    lyap_b.level_margin = lyap_a.level_margin
    lyap_a.update_safe_set(extended=True)
    lyap_b.update_safe_set()
    agree = np.mean(lyap_a.safe_set == lyap_b.safe_set)
    assert agree > 0.99, agree
    assert U_EFF == 2.0 ** -40


def test_extended_backup_fallback_degrades_gracefully():
    """get_safe_sample(extended=True) under an installed U_EFF
    exploration margin must fall back to the backup policy with a
    RuntimeWarning when nothing is safe — NOT crash in the diagnostic
    path's f32 scorer (advisor round-3 finding #2)."""
    import warnings

    from safe_learning_tpu.ops.extended_verify import (
        extended_exploration_margin)

    lyap = _ill_conditioned_instance()
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    lyap.update_safe_set(extended=True)
    perturb = np.linspace(-0.3, 0.3, 5)[:, None].astype(np.float32)
    limits = np.array([[-0.5, 0.5]])
    extended_exploration_margin(lyap, perturbations=perturb,
                                limits=limits)
    # Force the no-safe-candidate branch: an (exactly representable)
    # tiny level admits no candidate.
    lyap.c_max = 2.0 ** -120
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sa, var = sl.get_safe_sample(lyap, perturbations=perturb,
                                     limits=limits, num_samples=32,
                                     rng=np.random.default_rng(0),
                                     extended=True)
    assert any(issubclass(w.category, RuntimeWarning) for w in caught)
    assert sa.shape == (1, 3) and np.isfinite(var)


def test_sharded_pipelines_refuse_extended_margin():
    """The multi-host sweep is the plain f32 pipeline: it must apply
    the same unit guard as update_safe_set (advisor round-3 #3)."""
    import jax

    from safe_learning_tpu.parallel import make_mesh
    from safe_learning_tpu.parallel.distributed import (
        sharded_certified_level, sharded_decrease_check)

    assert jax.device_count() >= 8
    lyap = _ill_conditioned_instance()
    extended_certificate_margin(lyap, lv_matrix=_LV_MAT)
    mesh = make_mesh(8)
    with pytest.raises(RuntimeError, match="extended"):
        sharded_decrease_check(lyap, mesh)
    with pytest.raises(RuntimeError, match="extended"):
        sharded_certified_level(lyap, mesh)


def test_extended_sweep_cache_keys_numpy_scalar_lf_by_value():
    """A value-equal np.float32 L_f reassignment reuses the compiled
    sweep instead of keying by id() (advisor round-3 finding #4)."""
    lyap = _ill_conditioned_instance()
    lyap.extended_lv_matrix = _LV_MAT
    lf = float(lyap._lipschitz_dynamics)
    lyap._lipschitz_dynamics = np.float32(lf)
    sweep_a = lyap._get_extended_sweep()
    lyap._lipschitz_dynamics = np.float32(lf)  # new object, same value
    assert lyap._get_extended_sweep() is sweep_a
    lyap._lipschitz_dynamics = np.float32(lf * 2.0)
    assert lyap._get_extended_sweep() is not sweep_a


def test_extended_sweep_cache_rebuilds_on_matrix_value_change():
    """The L_v / L_f linear-form models are baked into the compiled
    sweep as constants: replacing ``extended_lv_matrix`` with a
    different-valued matrix must rebuild instead of silently certifying
    with the stale model, even when the callable L_v object keeps its
    identity (its parameters updated in place, the refit scenario); an
    equal-valued new matrix object reuses the cache (round-4 review)."""
    lyap = _ill_conditioned_instance()
    scale = {"v": 2.0}
    lyap._lipschitz_lyapunov = sl.LambdaFunction(
        lambda x: scale["v"] * jnp.abs(x))
    lyap.extended_lv_matrix = np.array(_LV_MAT)
    sweep_a = lyap._get_extended_sweep()
    lyap.extended_lv_matrix = np.array(_LV_MAT)  # new object, same value
    assert lyap._get_extended_sweep() is sweep_a
    # In-place refit: same callable id, new linear form.
    scale["v"] = 3.0
    lyap.extended_lv_matrix = 1.5 * np.asarray(_LV_MAT)
    assert lyap._get_extended_sweep() is not sweep_a


def test_extended_sweep_accepts_constant_function_lf():
    """A ``ConstantFunction`` L_f (valid for the plain sweep through
    ``_eval_lipschitz``) compiles through the baked-scalar path and
    certifies identically to the raw scalar (round-4 review)."""
    lyap = _ill_conditioned_instance()
    lyap.extended_lv_matrix = _LV_MAT
    pts = np.asarray(lyap.discretization.all_points[:64], np.float32)
    dec_scalar = np.asarray(lyap._get_extended_sweep().negative_batch(pts))
    lf = float(lyap._lipschitz_dynamics)
    lyap._lipschitz_dynamics = sl.ConstantFunction(lf)
    dec_const = np.asarray(lyap._get_extended_sweep().negative_batch(pts))
    np.testing.assert_array_equal(dec_scalar, dec_const)


def test_gradnorm_unsupported_ord_refused():
    """``GradientNorm(tri, ord=2)`` is constructible (``evaluate``
    raises only when called); the extended compiler must refuse it too
    instead of silently certifying the ord-1 condition (round-4
    review)."""
    from safe_learning_tpu.ops.extended_verify import _compile_gradnorm_pwl

    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 5)
    tri = sl.Triangulation(
        grid, np.sum(grid.all_points ** 2, axis=1).astype(np.float32))
    with pytest.raises(NotImplementedError, match="ord"):
        _compile_gradnorm_pwl(sl.GradientNorm(tri, ord=2), 2, [])
    # The supported ords still compile.
    for ordv in (None, 1, np.inf):
        _compile_gradnorm_pwl(sl.GradientNorm(tri, ord=ordv), 2, [])


def test_trig_domain_guard_refuses_pathological_normalizer():
    """df_sin/df_cos are only rigorous for |x| < 2^22: a normalizer
    that denormalizes grid angles near that domain must fail loudly at
    compile time instead of certifying with out-of-contract trig values
    (round-4 review)."""
    from safe_learning_tpu.ops.extended_verify import _check_trig_domain

    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 5)
    bad = sl.InvertedPendulum(0.15, 0.5, 0.1, 1 / 80,
                              normalization=((2.0 ** 22, 1.0), (1.0,)))
    with pytest.raises(NotImplementedError, match="df_sin"):
        _check_trig_domain(bad, grid)
    ok = sl.InvertedPendulum(
        0.15, 0.5, 0.1, 1 / 80,
        normalization=((np.deg2rad(30), 1.0), (1.0,)))
    _check_trig_domain(ok, grid)  # physical instances pass
    _check_trig_domain(sl.VanDerPol(), grid)  # no trig: exempt
    # Only the ANGLE dim feeds df_sin/df_cos: a huge velocity
    # normalizer with a small angle normalizer must NOT be rejected
    # (r4 advisor: per-dim scaling, not the max over all dims).
    fast = sl.InvertedPendulum(
        0.15, 0.5, 0.1, 1 / 80,
        normalization=((np.deg2rad(30), 2.0 ** 22), (1.0,)))
    _check_trig_domain(fast, grid)
    # CartPole's angle is dim 1: big cart-position normalizer is fine,
    # a pathological angle normalizer is not.
    grid4 = sl.GridWorld([[-1.0, 1.0]] * 4, 3)
    cp_ok = sl.CartPole(0.1, 0.5, 0.5, 1 / 80,
                        normalization=((2.0 ** 22, np.deg2rad(30),
                                        1.0, 1.0), (1.0,)))
    _check_trig_domain(cp_ok, grid4)
    cp_bad = sl.CartPole(0.1, 0.5, 0.5, 1 / 80,
                         normalization=((1.0, 2.0 ** 22, 1.0, 1.0),
                                        (1.0,)))
    with pytest.raises(NotImplementedError, match="df_sin"):
        _check_trig_domain(cp_bad, grid4)


def test_auto_lv_probe_matches_hand_matrix():
    """The 2|Px| lambda pattern auto-derives lv_matrix (r5): building
    the sweep and margin WITHOUT any hand-installed matrix must equal
    the hand-installed construction bit for bit."""
    lyap = _ill_conditioned_instance(seed=9)
    m_auto = extended_certificate_margin(lyap, set_margin=False)
    m_hand = extended_certificate_margin(lyap, lv_matrix=_LV_MAT,
                                         set_margin=False)
    assert m_auto == m_hand
    pts = np.asarray(lyap.discretization.all_points[::13], np.float32)
    s_auto = np.asarray(ExtendedSweep(lyap).negative_batch(pts))
    s_hand = np.asarray(
        ExtendedSweep(lyap, lv_matrix=_LV_MAT).negative_batch(pts))
    assert (s_auto == s_hand).all()
    # A lambda NOT matching the quadratic's linear form is refused,
    # with the fallback named.
    lyap.lyapunov_function = sl.QuadraticFunction(2.0 * np.eye(2))
    lyap._ext_sweep = None
    with pytest.raises(NotImplementedError, match="fallback"):
        ExtendedSweep(lyap)


def test_function_stack_auto_batches():
    """A FunctionStack of single-output GPs compiles via its batched
    StackedGaussianProcess twin (r5) — verdicts and margins identical
    to the hand-built stacked construction."""
    lyap = _ill_conditioned_instance(seed=4)
    stacked = lyap.dynamics
    members = stacked.unstack()
    # Rebuild the members as standalone GPs (fresh factors) so the
    # FunctionStack path is a genuine user-side construction.
    gps = [sl.GaussianProcess(m.kernel, np.asarray(stacked.X),
                              np.asarray(stacked.Y[:, i:i + 1]),
                              float(stacked.noise_variances[i]),
                              beta=stacked.betas[i],
                              mean_function=m.mean_function,
                              capacity=stacked.capacity)
           for i, m in enumerate(members)]
    lyap.dynamics = sl.FunctionStack(gps)
    lyap._ext_sweep = None
    pts = np.asarray(lyap.discretization.all_points[::13], np.float32)
    s_stackfun = np.asarray(ExtendedSweep(lyap).negative_batch(pts))
    lyap2 = _ill_conditioned_instance(seed=4)
    s_direct = np.asarray(ExtendedSweep(lyap2).negative_batch(pts))
    assert (s_stackfun == s_direct).all()
    # The margin derivations accept the stack directly too.
    m_stackfun = extended_certificate_margin(lyap, set_margin=False)
    m_direct = extended_certificate_margin(lyap2, set_margin=False)
    assert np.isclose(m_stackfun, m_direct, rtol=1e-12)


def test_calibrate_extended_margin():
    """The MEASURED extended margin (the fallback for instances the
    derived model refuses) dominates the sweep-vs-oracle deviation,
    carries the U_EFF tag (plain sweeps refuse it), and keeps the
    containment property end to end."""
    from safe_learning_tpu.oracle import calibrate_extended_margin

    lyap = _ill_conditioned_instance(seed=6)
    m = calibrate_extended_margin(lyap, num_samples=512)
    assert m >= 0.0 and lyap.certificate_margin == m
    assert lyap._certificate_margin_unit == U_EFF
    sweep = ExtendedSweep(lyap)
    pts = np.asarray(lyap.discretization.all_points[::7], np.float32)
    # One-sided: only understatement of the margin is unsound (the
    # measurement deliberately ignores conservative overstatement).
    worst = float(np.max(np.maximum(
        oracle_margins(lyap, pts) - sweep.margins(pts), 0.0)))
    # safety=2 over the max of a 512-point sample: dominate a thinner
    # independent sample (the full-grid max is the property suite's
    # job; sampling noise makes strict full-grid domination flaky).
    assert m >= worst * 0.5, (m, worst)
    with pytest.raises(RuntimeError, match="extended"):
        lyap.update_safe_set()  # plain sweep refuses the U_EFF margin
    lyap.update_safe_set(extended=True)
    safe64, c64 = oracle_safe_set(lyap)
    assert not (np.array(lyap.safe_set) & ~safe64).any()
    assert lyap.c_max <= c64 + 1e-6 * max(abs(c64), 1.0)


def test_extended_matrix_snapshot_is_readonly():
    """Installed L_v/L_f model matrices are read-only snapshots: the
    identity-keyed sweep cache can never go stale through in-place
    mutation (the mutation raises), and mutating the ORIGINAL array
    after install does not change the installed model (r5 review)."""
    lyap = _ill_conditioned_instance()
    src = 2.0 * np.eye(2)
    lyap.extended_lv_matrix = src
    sweep_a = lyap._get_extended_sweep()
    with pytest.raises(ValueError):
        lyap.extended_lv_matrix[:] = 4.0 * np.eye(2)
    # Mutating the caller's array is invisible to the installed model.
    src[:] = 4.0 * np.eye(2)
    np.testing.assert_array_equal(lyap.extended_lv_matrix,
                                  2.0 * np.eye(2))
    assert lyap._get_extended_sweep() is sweep_a
    # Reassignment re-keys and rebuilds.
    lyap.extended_lv_matrix = src
    assert lyap._get_extended_sweep() is not sweep_a


def test_spotcheck_refuses_near_miss_callable():
    """A callable 1e-4 relative OFF the installed form — previously
    inside the probe tolerance, far above what the derived margins
    cover — is now refused; a reassociated-but-equal formula still
    passes, and the f32-unit rounding model carries the matching
    32-unit slack (r5 review)."""
    from safe_learning_tpu.ops.extended_verify import (
        ExtendedSweep, U_EFF, _lv_error_model)

    lyap = _ill_conditioned_instance()
    g = np.asarray(_LV_MAT, np.float64)
    lyap._lipschitz_lyapunov = sl.LambdaFunction(
        lambda x: (1.0 + 1e-4) * jnp.abs(x @ jnp.asarray(g.T, x.dtype)))
    lyap.extended_lv_matrix = g
    with pytest.raises(ValueError, match="lv_matrix"):
        lyap._get_extended_sweep()
    # Reassociated formula (|x (2G)^T| / 2): equal in exact arithmetic,
    # rounds within the tightened tolerance.
    lyap2 = _ill_conditioned_instance()
    lyap2._lipschitz_lyapunov = sl.LambdaFunction(
        lambda x: 0.5 * jnp.abs(x @ jnp.asarray(2.0 * g.T, x.dtype)))
    lyap2.extended_lv_matrix = g
    lyap2._get_extended_sweep()  # accepted
    # f32-unit model carries the spot-check slack on top of the matvec
    # gamma; the U_EFF model (the df pipeline computes the form itself)
    # does not.
    from safe_learning_tpu.errorbounds import _unit_roundoff
    u32 = _unit_roundoff()
    x = jnp.asarray(np.full((1, 2), 1.0, np.float32))
    scale = float((np.abs(np.ones((1, 2))) @ np.abs(g).T).max())
    b32 = float(np.max(np.asarray(
        _lv_error_model(lyap2, g, unit=u32).eval_bound(x))))
    bdf = float(np.max(np.asarray(
        _lv_error_model(lyap2, g, unit=U_EFF).eval_bound(x))))
    assert b32 >= 32.0 * u32 * scale
    assert bdf < 32.0 * u32 * scale
