"""Double-word float32 arithmetic vs float64 ground truth.

Every operation in ``ops/extended.py`` is checked against the same
computation in float64: the double-word result must stay within a few
2^-45 relative of it (the published Joldes/Muller/Popescu bounds with
slack), i.e. ~6 decimal digits beyond plain float32. The module is
dtype-explicit (always float32 pairs), so these tests run identically
in the x64 and f32 lanes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from safe_learning_tpu.ops import extended as ext


def _rel_err(df, truth64):
    got = np.asarray(df[0], np.float64) + np.asarray(df[1], np.float64)
    scale = np.maximum(np.abs(truth64), 1e-30)
    return np.max(np.abs(got - truth64) / scale)


def _rand_df(rng, shape, lo=-10.0, hi=10.0):
    v64 = rng.uniform(lo, hi, shape)
    return ext.df_from_f64(v64), v64


def test_eft_selfcheck_passes():
    assert ext.eft_selfcheck()


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1e5, 1e5, 256).astype(np.float32)
    b = rng.uniform(-1e-5, 1e-5, 256).astype(np.float32)
    s, e = jax.jit(ext.two_sum)(jnp.asarray(a), jnp.asarray(b))
    assert np.array_equal(np.asarray(s, np.float64)
                          + np.asarray(e, np.float64),
                          a.astype(np.float64) + b.astype(np.float64))
    p, e = jax.jit(ext.two_prod)(jnp.asarray(a), jnp.asarray(b))
    assert np.array_equal(np.asarray(p, np.float64)
                          + np.asarray(e, np.float64),
                          a.astype(np.float64) * b.astype(np.float64))


def test_df_from_f64_roundtrip():
    rng = np.random.default_rng(1)
    v64 = rng.uniform(-1e3, 1e3, 512)
    hi, lo = ext.df_from_f64(v64)
    back = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    assert np.max(np.abs(back - v64) / np.abs(v64)) < 2.0 ** -45


@pytest.mark.parametrize("op,ref", [
    (ext.df_add, lambda a, b: a + b),
    (ext.df_sub, lambda a, b: a - b),
    (ext.df_mul, lambda a, b: a * b),
    (ext.df_div, lambda a, b: a / b),
])
def test_df_binary_ops(op, ref):
    rng = np.random.default_rng(2)
    x, _ = _rand_df(rng, 512)
    y, _ = _rand_df(rng, 512, lo=0.5, hi=20.0)  # bounded away from 0
    # Compare against exact f64 arithmetic on the pair-REPRESENTED
    # inputs: subtraction can cancel to ~0, where the representation
    # error of the original f64 draw would swamp the op's own u^2.
    x64 = np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)
    y64 = np.asarray(y[0], np.float64) + np.asarray(y[1], np.float64)
    got = jax.jit(op)(x, y)
    truth = ref(x64, y64)
    err = np.abs(np.asarray(got[0], np.float64)
                 + np.asarray(got[1], np.float64) - truth)
    # Relative to the inputs' magnitude (the op error bound's scale),
    # not the possibly-cancelled result.
    scale = np.maximum(np.maximum(np.abs(x64), np.abs(y64)),
                       np.abs(truth))
    assert np.max(err / scale) < 2.0 ** -42


def test_df_add_cancellation():
    # The hard case for a plain f32 pipeline: near-total cancellation.
    x64 = np.full(64, 1.0) + np.linspace(0, 1e-9, 64)
    y64 = -np.ones(64)
    got = jax.jit(ext.df_add)(ext.df_from_f64(x64), ext.df_from_f64(y64))
    assert _rel_err(got, x64 + y64) < 2.0 ** -40


def test_df_sqrt():
    rng = np.random.default_rng(3)
    x, x64 = _rand_df(rng, 512, lo=1e-8, hi=1e6)
    got = jax.jit(ext.df_sqrt)(x)
    assert _rel_err(got, np.sqrt(x64)) < 2.0 ** -42
    zero = jax.jit(ext.df_sqrt)(ext.df_from_f64(np.zeros(4)))
    assert np.all(np.asarray(zero[0]) == 0)
    assert np.all(np.asarray(zero[1]) == 0)


def test_df_exp_accuracy_and_range():
    # Covariance range: exponents in [-69, 0] (the 2^-100 cutoff sits at
    # ~-69.3; a covariance that small is zero for any certificate).
    x64 = -np.concatenate([np.linspace(0, 30, 301),
                           np.linspace(30, 69, 100),
                           [0.34657, 0.5 * np.log(2.0)]])
    got = jax.jit(ext.df_exp)(ext.df_from_f64(x64))
    assert _rel_err(got, np.exp(x64)) < 2.0 ** -38


def test_df_exp_underflow_flushes_to_zero():
    got = jax.jit(ext.df_exp)(ext.df_from_f64(np.array([-60.0, -200.0])))
    hi = np.asarray(got[0])
    assert hi[0] > 0
    assert hi[1] == 0.0 and np.asarray(got[1])[1] == 0.0


def test_df_dot_beats_f32_on_ill_conditioned_sum():
    # Alternating large/small terms: the f32 dot loses ~n*u, the
    # double-word dot keeps ~n*u^2.
    rng = np.random.default_rng(4)
    n = 256
    a64 = rng.uniform(-1, 1, n) * np.where(np.arange(n) % 2, 1e4, 1e-4)
    b64 = rng.uniform(-1, 1, n)
    truth = np.dot(a64.astype(np.float64), b64)
    got = jax.jit(lambda x, y: ext.df_dot(x, y, axis=0))(
        ext.df_from_f64(a64), ext.df_from_f64(b64))
    df_err = abs(float(np.asarray(got[0], np.float64)
                       + np.asarray(got[1], np.float64)) - truth)
    f32_err = abs(float(np.dot(a64.astype(np.float32),
                               b64.astype(np.float32))) - truth)
    assert df_err < 1e-9 * np.sum(np.abs(a64 * b64))
    assert df_err < f32_err / 100.0


def test_df_matmul_matches_float64():
    rng = np.random.default_rng(5)
    a64 = rng.normal(0, 100.0, (24, 96))   # large entries: conditioning
    b64 = rng.normal(0, 1.0, (96, 17))
    got = jax.jit(ext.df_matmul)(ext.df_from_f64(a64),
                                 ext.df_from_f64(b64))
    truth = a64 @ b64
    err = np.abs(np.asarray(got[0], np.float64)
                 + np.asarray(got[1], np.float64) - truth)
    scale = np.abs(a64) @ np.abs(b64)
    assert np.max(err / scale) < 1e-10


def test_df_less_on_ties():
    a = ext.df_from_f64(np.array([1.0, 1.0, 1.0]))
    b = ext.df_from_f64(np.array([1.0 + 1e-12, 1.0, 1.0 - 1e-12]))
    got = np.asarray(jax.jit(ext.df_less)(a, b))
    assert got.tolist() == [True, False, False]


def test_extended_sweep_exact_at_f64_grid_points():
    """In float64 mode the sweep evaluates AT the f64 grid points.

    Regression: the pipeline used to round points and training rows to
    float32 (``xl = 0``), a ~2^-24 relative input perturbation that the
    2^-40-scale derived margins cannot cover. With the exact residual
    split the full-grid deviation from the float64 oracle stays at
    double-word scale even on a grid whose points are not
    f32-representable.
    """
    import safe_learning_tpu as sl
    from safe_learning_tpu.config import config
    from safe_learning_tpu.ops.extended_verify import ExtendedSweep
    from safe_learning_tpu.oracle import oracle_margins

    if config.np_dtype != np.float64:
        pytest.skip("float64-mode regression (x64 lane only)")

    rng = np.random.default_rng(7)
    # Spacings like 1.01/12 make every interior point f32-INEXACT.
    grid = sl.GridWorld([[-0.7, 0.31], [-0.9, 0.53]], 13)
    a = np.array([[0.4, 0.1], [0.0, 0.45]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    nt = 40
    xt = np.column_stack([rng.uniform(-0.6, 0.3, nt),
                          rng.uniform(-0.8, 0.5, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T
    st = sl.StackedGaussianProcess(
        [sl.RBF(1.0, [0.4] * 3, input_dim=3),
         sl.RBF(0.8, [0.5] * 3, input_dim=3)],
        xt, yt, [1e-4, 1e-4], betas=2.0)
    lyap = sl.Lyapunov(grid, v, st, 0.6, 2.0,
                       float(np.min(grid.unit_maxes)), policy)

    pts = np.asarray(grid.all_points, np.float64)
    # The points must actually be f32-inexact for this to regress.
    assert np.max(np.abs(pts - pts.astype(np.float32)
                         .astype(np.float64))) > 1e-9

    sweep = ExtendedSweep(lyap)
    dev = np.max(np.abs(sweep.margins(pts) - oracle_margins(lyap, pts)))
    # f32-rounded inputs deviate at ~L * 2^-24 * |x| ~ 1e-7 here; the
    # double-word split stays at pipeline scale (~1e-10).
    assert dev < 5e-9, dev


def _df_fn_error(fn, ref, xs, scale=None):
    xs64 = np.asarray(xs, np.float64)
    pair = ext.df_from_f64(xs64)
    h, low = jax.jit(fn)(pair)
    got = np.asarray(h, np.float64) + np.asarray(low, np.float64)
    want = ref(xs64)
    denom = np.maximum(np.abs(want), 1e-30) if scale is None else scale
    return float(np.max(np.abs(got - want) / denom))


def test_df_tanh_accuracy():
    """Both branches (Taylor / exp form) stay ~2^-44 relative — the
    neural policies' activation must not consume the 2^-40 margin."""
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.uniform(-10, 10, 4096), rng.uniform(-0.4, 0.4, 4096),
        np.linspace(-0.5, 0.5, 1001),
        [0.0, 0.375, -0.375, 20.0, -20.0, 1e-8, -1e-8, 60.0, -60.0]])
    assert _df_fn_error(ext.df_tanh, np.tanh, xs) < 2.0 ** -43


def test_df_sigmoid_accuracy():
    """Cancellation-free form: full relative accuracy even at very
    negative arguments where sigmoid ~ e^x."""
    rng = np.random.default_rng(1)
    xs = np.concatenate([
        rng.uniform(-25, 25, 8192), np.linspace(-1, 1, 1001),
        [0.0, -20.0, 20.0, -50.0, 50.0]])
    ref = lambda x: 1.0 / (1.0 + np.exp(-x))  # noqa: E731
    assert _df_fn_error(ext.df_sigmoid, ref, xs) < 2.0 ** -43


def test_df_sin_cos_accuracy():
    """Absolute error ~2^-44 across the dynamics range, including the
    sin zeros at +-pi (where relative error is meaningless)."""
    rng = np.random.default_rng(2)
    xs = np.concatenate([
        rng.uniform(-16, 16, 8192), np.linspace(-np.pi, np.pi, 2001),
        np.pi + np.linspace(-1e-3, 1e-3, 101),
        [0.0, np.pi, -np.pi, 2 * np.pi, np.pi / 2]])
    one = np.ones(1)
    assert _df_fn_error(ext.df_sin, np.sin, xs, scale=one) < 2.0 ** -43
    assert _df_fn_error(ext.df_cos, np.cos, xs, scale=one) < 2.0 ** -43


def test_df_relu_abs_max_exact():
    """The exact (select-only) pair ops: bitwise agreement with f64."""
    rng = np.random.default_rng(3)
    px = ext.df_from_f64(rng.normal(0, 10, 1024))
    py = ext.df_from_f64(rng.normal(0, 10, 1024))
    # Reference = the op applied to the PAIRS' exact values (the f64 ->
    # df split itself carries a ~2^-48 representation residual).
    xs = np.asarray(px[0], np.float64) + np.asarray(px[1], np.float64)
    ys = np.asarray(py[0], np.float64) + np.asarray(py[1], np.float64)
    for fn, want in ((lambda: ext.df_relu(px), np.maximum(xs, 0.0)),
                     (lambda: ext.df_abs(px), np.abs(xs)),
                     (lambda: ext.df_max(px, py), np.maximum(xs, ys))):
        h, low = jax.jit(fn)()
        got = np.asarray(h, np.float64) + np.asarray(low, np.float64)
        np.testing.assert_array_equal(got, want)
