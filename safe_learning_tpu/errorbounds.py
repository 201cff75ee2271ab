"""Analytic forward-error bound for the float32 verification pipeline.

:func:`~safe_learning_tpu.oracle.calibrate_certificate_margin` makes the
f32 certificate conservative by *measuring* the pipeline error on a grid
subsample and installing a safety multiple of the worst deviation. This
module supplies the complementary *derived* bound: a per-instance
Higham-style rounding-error analysis of the decrease-condition pipeline
(policy -> GP posterior -> Lyapunov values -> threshold), evaluated over
the FULL grid (optionally including the adaptive sweep's refined
sub-grid points), so the installed margin dominates the f32 error at
every checked point by construction rather than by sampling.

The analysis follows the standard model of floating-point arithmetic
(Higham, *Accuracy and Stability of Numerical Algorithms*, ch. 3):
every scalar operation is exact up to relative error ``u``, an inner
product of length ``n`` accumulates at most ``gamma_n = n u / (1 - n u)``
relative to the sum of absolute products — a bound that holds for ANY
summation order, so it covers both the XLA dot and the fused Pallas
kernel's tiled accumulation. The kernel-entry error is modeled per
(data, query) pair on the ``xx - 2 cross + zz`` squared-distance form
(``functions/gp.py:_sqdist``): its rounding scales with the CANCELLING
magnitudes ``xx + 2|cross| + zz``, not with the small distance itself —
the per-dim-difference form the Pallas kernel uses
(``ops/gp_kernel.py``) is strictly better conditioned, so the same
bound covers both paths. Further conservative choices keeping the model
honest on real hardware:

- ``u = config.fp_error_factor * 2^-24``: the factor (default 4) covers
  non-IEEE dot implementations (the TPU MXU's 6-pass bfloat16
  ``HIGHEST`` decomposition) and transcendental-function slack. The
  bound REQUIRES ``config.pallas_precision == "highest"`` (the 3-pass
  ``high`` mode rounds at ~2^-17 per op and voids the model; a
  ``RuntimeError`` enforces this).
- the bound sweep's own matmuls run through
  :func:`~safe_learning_tpu.functions.base.mxu_dot` (HIGHEST), and
  every magnitude anchor carries the two-sided slack ``|real| <=
  |anchor| + 2 * error`` (the bound sweep's f32 value and the real
  sweep's f32 value can sit on opposite sides of the exact value).
- the cached GP factors are treated as the CORRECT ROUNDING of the exact
  float64 factorization (``|C_32 - C_64| <= u |C_64|``); this is the
  framework's own invariant in float32 mode — ``chol``/``chol_inv``/
  ``alpha`` come from the float64 host island and are stored rounded
  (``functions/gp.py:_host_factorize``, ``_bordered_append``). A jitter
  retry changes the *model*, not just the rounding, and voids the bound
  (as it voids the empirical calibration).

Supported instance shape:

- **policies** — LinearSystem / Saturation / Constant, and
  :class:`~safe_learning_tpu.functions.neural.NeuralNetwork` MLPs with
  relu / tanh / sigmoid / linear activations (the NeurIPS-17 flagship
  policy);
- **dynamics** — :class:`GaussianProcess` / :class:`StackedGaussianProcess`
  over the full stationary kernel family (RBF, Matern 1/2 / 3/2 / 5/2),
  Linear kernels, and their sums / products / ActiveDims restrictions,
  with LinearSystem-or-None prior means; or DETERMINISTIC LinearSystem /
  InvertedPendulum / CartPole / VanDerPol (the CoRL-18 flagship; no
  error term — the bound propagates through the inner-Euler chain by
  interval arithmetic);
- **candidates** — QuadraticFunction, Triangulation (piecewise linear),
  :class:`~safe_learning_tpu.functions.neural.LyapunovNetwork`, scalar
  NeuralNetwork, each optionally scaled by a constant
  (``-value_function``);
- **L_f** — a real scalar, or (via ``lf_model``) any callable with an
  :class:`ErrorModel`;
- **L_v** — a constant, or an explicit :class:`ErrorModel` for a
  callable. :class:`ErrorModel` now carries optional one-sided fields
  (``anchor_bound``, ``max_input_shift``) used by the extended lane's
  conservatively-inflated ``GradientNorm``-of-PWL realization
  (``ops/extended_verify._lv_error_model``).

Anything else raises ``NotImplementedError`` — fall back to the
empirical calibrator, which handles arbitrary compositions by
measurement.

Reference context: the reference runs float64 end to end
(``/root/reference/safe_learning/configuration.py:16``) so its
threshold (``lyapunov.py:265-288``) absorbs only discretization error;
here the margin additionally absorbs a *derived* bound on dtype error.
"""

from __future__ import annotations

import itertools
from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .functions.base import (ConstantFunction, FunctionStack,
                             MultipliedFunction, Saturation, mxu_dot)
from .functions.neural import LyapunovNetwork, NeuralNetwork
from .functions.gp import (RBF, ActiveDims, GaussianProcess,
                           LinearKernel, Matern12, Matern32, Matern52,
                           ProductKernel, StackedGaussianProcess,
                           SumKernel, _StationaryKernel)
from .functions.linear import LinearSystem, QuadraticFunction

__all__ = ["ErrorModel", "analytic_certificate_margin",
           "analytic_exploration_margin"]

#: Explicit rounding model for an opaque (e.g. Lambda) function used as
#: the ``L_v`` / ``L_f`` Lipschitz bound. ``eval_bound(x) -> (N, dv)``
#: bounds the realization's deviation in the UNSOUND direction
#: (``L_exact - L_any``, which for symmetric rounding equals the
#: absolute evaluation error); ``input_lipschitz`` is a scalar (or
#: per-dim array) bound on the function's own Lipschitz constant over
#: the domain. Two optional fields support conservatively-INFLATED
#: realizations (the extended sweep's GradientNorm-of-PWL program,
#: ``ops/extended_verify._compile_gradnorm_pwl``), whose value can
#: EXCEED the plain evaluation by design: ``anchor_bound(x) -> (N, dv)``
#: bounds that one-sided excess ``L_any - L_plain`` (used only to anchor
#: magnitudes — overestimating L makes the certificate stricter, never
#: unsound), and ``max_input_shift`` is a per-dim cap (state units) on
#: the input uncertainty under which the inflation argument holds (the
#: trigger band must contain every realization's locate decision); the
#: analysis raises if an instance exceeds it.
ErrorModel = namedtuple(
    "ErrorModel",
    ["eval_bound", "input_lipschitz", "anchor_bound", "max_input_shift"],
    defaults=[None, None])

# max_t sqrt(t) e^{-t/2} (at t=1): the scale-free peak of the RBF
# derivative magnitude, used for the input-perturbation Lipschitz
# bounds (|dk/dq_d| = k |z_d| / ls_d <= k sqrt(t) / ls_d).
_MAX_STE = float(np.exp(-0.5))

# Stationary-family constants for the Matern kernels k = v g(r),
# r = sqrt(c t): (c, max_r |g'(r)|). The entry error is
# |delta k| <= v max|g'| sqrt(c delta_t) (|sqrt(a)-sqrt(b)| <=
# sqrt(|a-b|)); the per-unit-lengthscale derivative bound is
# sqrt(c) max|g'| (|z_d| <= r / sqrt(c)).
_MATERN = {
    Matern12: (1.0, 1.0),                      # g = e^{-r}
    Matern32: (3.0, float(np.exp(-1.0))),      # g' = -r e^{-r}
    Matern52: (5.0, 0.2801),                   # g' = -(r + r^2) e^{-r}/3
}


def _unit_roundoff():
    """Hardware-slack-adjusted unit roundoff of the working dtype."""
    base = float(np.finfo(config.np_dtype).eps) / 2.0
    return base * float(getattr(config, "fp_error_factor", 4.0))


def _gamma(n, u):
    """Higham's ``gamma_n`` (valid for any summation order)."""
    nu = float(n) * u
    if nu >= 1.0:
        raise ValueError("accumulation length too large for the dtype")
    return nu / (1.0 - nu)


def _shift_frac(dvec, cap):
    """Largest input shift as a fraction of an inflated-realization
    L model's trigger-band headroom (``ErrorModel.max_input_shift``).

    Shared by the certificate and exploration margins — the cap/shift
    computation must stay in lockstep for the GradientNorm model's
    simplex-agreement argument.
    """
    cap_dev = jnp.asarray(np.asarray(cap, np.float64),
                          dtype=config.dtype)
    return jnp.max(dvec / cap_dev[None, :])


def _linear_core(fn):
    """Unwrap a LinearSystem-family function to its matrix, or None."""
    if isinstance(fn, Saturation):
        fn = fn.fun
    if isinstance(fn, LinearSystem):
        return fn.matrix
    return None


# ---------------------------------------------------------------------------
# Interval scaffolding: (value, error) pairs under the Higham model
# ---------------------------------------------------------------------------
# An "iv" is a tuple ``(v, e)`` of same-shape arrays: ``v`` is the bound
# sweep's own (working-dtype) computed value — the magnitude ANCHOR —
# and ``e`` bounds ``|y_any - y_exact|`` for ANY realization ``y_any``
# rounding at ``u`` per op, evaluated at any input within the tracked
# input uncertainty, against the exact-real-arithmetic value ``y_exact``
# of the stored parameters. The anchor invariant every rule preserves:
# ``|y_any| <= |v| + 2 e`` (one ``e`` to the exact value, one more to
# any other realization); the anchor's own working-dtype rounding is a
# RELATIVE perturbation of a positive-sum circuit, absorbed by
# ``_finalize_margin``'s ``(1 + own)`` factor. These rules power the
# neural-network and deterministic-dynamics programs below the same way
# ``_kernel_program`` powers the GP chain.
def _iv_hi(a):
    """Anchor on |any realization| of an interval."""
    return jnp.abs(a[0]) + 2.0 * a[1]


def _iv_add(a, b, u):
    return (a[0] + b[0],
            a[1] + b[1] + u * (_iv_hi(a) + _iv_hi(b)))


def _iv_mul(a, b, u):
    hi_b = _iv_hi(b)
    return (a[0] * b[0],
            a[1] * hi_b + (jnp.abs(a[0]) + a[1]) * b[1]
            + u * _iv_hi(a) * hi_b)


def _iv_const_mul(a, c, u):
    """Multiply by an exactly-stored constant (array or scalar)."""
    c_abs = jnp.abs(c)
    return a[0] * c, c_abs * a[1] + u * c_abs * _iv_hi(a)


def _iv_matmul(a, w, u, bias=None, dw=None):
    """``a @ w (+ bias)`` for an (N, m) interval and an (m, k) constant.

    ``dw`` adds a per-entry parameter-construction error (e.g. the f32
    on-the-fly ``W0^T W0 + eps I`` assembly of a LyapunovNetwork layer).
    """
    w_abs = jnp.abs(w)
    v = mxu_dot(a[0], w)
    hi = _iv_hi(a)
    anchor = mxu_dot(hi, w_abs)
    e = mxu_dot(a[1], w_abs)
    if dw is not None:
        e = e + mxu_dot(hi, dw)
    if bias is not None:
        v = v + bias[None, :]
        anchor = anchor + jnp.abs(bias)[None, :]
    e = e + _gamma(w.shape[0] + (2 if bias is not None else 1), u) * anchor
    return v, e


def _iv_sin(a, u):
    """sin is 1-Lipschitz and |sin| <= 1 (same rule serves cos).

    The own-rounding anchor transports the anchor invariant through the
    activation: ``|sin(in_any)| <= |sin(v)| + 2 e`` (``|in_any - v| <=
    2 e``: one ``e`` to the exact input, one from ``v`` being itself a
    realization), capped at 1.

    Rounding charges TWO terms. ``u * mag`` covers the output rounding
    (relative to the result). ``u * arg`` covers argument reduction: the
    realizations compute ``sin(x - k * pi_approx)``, an ABSOLUTE
    perturbation of the reduced argument that scales with ``|x|``, not
    with ``|sin x|`` — at ``x ~= pi`` the output term alone would model
    ~0 error while the true deviation is ``~|x| * u_red``. For both
    consumers the reduction unit is below ``u``: ``df_sin``'s Cody-Waite
    residual is ``~2^-49 |k| = 2^-49.6 |x| < U_EFF |x|``
    (:func:`~safe_learning_tpu.ops.extended.df_sin`), and the f32
    ``jnp.sin`` reduction rounds the reduced argument at
    ``eps32 < u`` relative (the 4x ``fp_error_factor`` slack covers the
    residual-of-pi term)."""
    v = jnp.sin(a[0])
    mag = jnp.minimum(jnp.abs(v) + 2.0 * a[1], 1.0)
    arg = jnp.abs(a[0]) + 2.0 * a[1]
    return v, jnp.minimum(a[1], 2.0) + u * (mag + arg)


def _iv_cos(a, u):
    v = jnp.cos(a[0])
    mag = jnp.minimum(jnp.abs(v) + 2.0 * a[1], 1.0)
    arg = jnp.abs(a[0]) + 2.0 * a[1]
    return v, jnp.minimum(a[1], 2.0) + u * (mag + arg)


def _iv_div(a, b, u):
    """``a / b``; INF error when the denominator interval may reach 0
    (the caller's finite-margin check turns that into a loud failure)."""
    b_lo = jnp.abs(b[0]) - 2.0 * b[1]
    q = a[0] / b[0]
    qmag = _iv_hi(a) / jnp.maximum(b_lo, 1e-30)
    e = (a[1] / jnp.maximum(b_lo, 1e-30)
         + (jnp.abs(a[0]) + a[1]) * b[1] / jnp.maximum(b_lo, 1e-30) ** 2
         + u * qmag)
    return q, jnp.where(b_lo > 0.0, e, jnp.inf)


#: Activation rules ``name -> (fn, input-Lipschitz, |output| cap)``.
#: relu and clip are EXACT in floating point (max/min of representables)
#: and 1-Lipschitz, so they propagate the error untouched.
_IV_ACTS = {
    None: None, "linear": None,
    "relu": (jax.nn.relu, 1.0, None),
    "tanh": (jnp.tanh, 1.0, 1.0),
    "sigmoid": (jax.nn.sigmoid, 0.25, 1.0),
}


def _iv_activation(a, name, u):
    if name is None or name == "linear":
        return a
    try:
        rule = _IV_ACTS[name]
    except (KeyError, TypeError):
        raise NotImplementedError(
            "analytic margin supports relu/tanh/sigmoid/linear "
            "activations; got {!r} — use the empirical calibrator"
            .format(name))
    fn, lip, cap = rule
    v = fn(a[0])
    if name == "relu":
        return v, a[1]
    # Anchor on |act(in_any)|: the input invariant is |in_any - v| <= 2e
    # (one e to the exact input, one from v being itself a realization),
    # so |act(in_any)| <= |act(v)| + 2 lip e, capped at the range bound.
    mag = jnp.abs(v) + 2.0 * lip * a[1]
    if cap is not None:
        mag = jnp.minimum(mag, cap)
    return v, lip * a[1] + u * mag


def _mlp_program(net, u):
    """Interval forward pass of a :class:`NeuralNetwork`.

    Returns ``fn((pts, dx)) -> (acts, du)``: the working-dtype MLP
    output and a bound on ``|u_any(x') - u_exact(x)|`` for any
    realization at ``|x' - x| <= dx`` — covers the NeurIPS-17 flagship
    policy (reference ``functions.py:1665-1786``) in both the f32 and
    the extended (``U_EFF``) rounding model.
    """
    from .functions.neural import NeuralNetwork

    assert isinstance(net, NeuralNetwork)
    acts = list(net.nonlinearities)
    for name in acts:
        if not (name is None or name in _IV_ACTS):
            raise NotImplementedError(
                "analytic margin supports relu/tanh/sigmoid/linear "
                "activations; got {!r}".format(name))
    scale = float(net.output_scale)

    def fn(x_iv):
        iv = x_iv
        for w, b, name in zip(net.weights, net.biases, acts):
            iv = _iv_matmul(iv, jnp.asarray(w, config.dtype), u,
                            bias=(None if b is None
                                  else jnp.asarray(b, config.dtype)))
            iv = _iv_activation(iv, name, u)
        if scale != 1.0:
            iv = _iv_const_mul(iv, jnp.asarray(scale, config.dtype), u)
        return iv
    return fn


def _policy_program(policy, u):
    """``fn((pts, dx)) -> (acts, du)`` for a supported policy."""
    from .functions.neural import NeuralNetwork

    if isinstance(policy, Saturation):
        inner = _policy_program(policy.fun, u)
        lo = jnp.asarray(policy.lower, config.dtype)
        hi = jnp.asarray(policy.upper, config.dtype)

        def fn_sat(x_iv):
            v, e = inner(x_iv)
            # clip is exact (min/max of representables) and 1-Lipschitz.
            return jnp.clip(v, lo, hi), e
        return fn_sat

    if isinstance(policy, LinearSystem):
        mat_t = jnp.asarray(policy.matrix, config.dtype).T

        def fn_lin(x_iv):
            return _iv_matmul(x_iv, mat_t, u)
        return fn_lin

    if isinstance(policy, ConstantFunction):
        cval = jnp.atleast_2d(jnp.asarray(policy.constant, config.dtype))

        def fn_const(x_iv):
            n = x_iv[0].shape[0]
            v = jnp.broadcast_to(cval, (n, cval.shape[1]))
            return v, jnp.zeros_like(v)
        return fn_const

    if isinstance(policy, NeuralNetwork):
        return _mlp_program(policy, u)

    raise NotImplementedError(
        "analytic margin supports LinearSystem/Saturation/Constant/"
        "NeuralNetwork policies; got {} — use calibrate_certificate_margin"
        .format(type(policy).__name__))


def _det_dynamics_program(dyn, u):
    """Interval forward pass of deterministic dynamics ``f(x, u)``.

    Returns ``fn((q, dq)) -> (next, d_next)`` over state-action rows,
    mirroring the benchmark systems' denormalize -> inner-Euler ->
    normalize chain (``dynamics.py:_OdeDynamics.evaluate``) with the
    interval rules above, or a LinearSystem matmul. Division (cart-pole)
    yields an INF bound when the denominator interval may reach zero,
    which the margin's finiteness check turns into a loud failure.
    """
    from .dynamics import GRAVITY, CartPole, InvertedPendulum, VanDerPol

    if isinstance(dyn, LinearSystem):
        mat_t = jnp.asarray(dyn.matrix, config.dtype).T

        def fn_lin(q_iv):
            return _iv_matmul(q_iv, mat_t, u)
        return fn_lin

    if not isinstance(dyn, (InvertedPendulum, VanDerPol, CartPole)):
        raise NotImplementedError(
            "analytic margin supports GaussianProcess / "
            "StackedGaussianProcess (uncertain) or LinearSystem / "
            "InvertedPendulum / CartPole / VanDerPol (deterministic) "
            "dynamics; got {} — use calibrate_certificate_margin"
            .format(type(dyn).__name__))

    steps = int(dyn.inner_euler_steps)
    dt_i = jnp.asarray(float(dyn.dt) / steps, config.dtype)
    d = int(dyn.state_dim)
    has_act = int(dyn.action_dim) > 0
    norm = dyn._norm_arrays()
    if norm is None:
        tx = tu = itx = None
    else:
        tx64 = np.asarray(norm[0], np.float64)
        tx = jnp.asarray(tx64, config.dtype)
        itx = jnp.asarray(1.0 / tx64, config.dtype)
        tu = (None if norm[1] is None
              else jnp.asarray(np.asarray(norm[1], np.float64),
                               config.dtype))

    def col(iv, j):
        return iv[0][:, j:j + 1], iv[1][:, j:j + 1]

    def cat(ivs):
        return (jnp.concatenate([p[0] for p in ivs], axis=1),
                jnp.concatenate([p[1] for p in ivs], axis=1))

    if isinstance(dyn, InvertedPendulum):
        gl = jnp.asarray(GRAVITY / float(np.asarray(dyn.length)),
                         config.dtype)
        inertia = float(np.asarray(dyn.mass)) * float(
            np.asarray(dyn.length)) ** 2
        ii = jnp.asarray(1.0 / inertia, config.dtype)
        fi = jnp.asarray(float(np.asarray(dyn.friction)) / inertia,
                         config.dtype)

        def ode_iv(x, a):
            ang, om = col(x, 0), col(x, 1)
            acc = _iv_add(
                _iv_add(_iv_const_mul(_iv_sin(ang, u), gl, u),
                        _iv_const_mul(om, -fi, u), u),
                _iv_const_mul(a, ii, u), u)
            return cat([om, acc])

    elif isinstance(dyn, VanDerPol):
        damp = jnp.asarray(float(np.asarray(dyn.damping)), config.dtype)
        one = jnp.asarray(1.0, config.dtype)

        def ode_iv(x, a):
            del a
            xx, yy = col(x, 0), col(x, 1)
            x_dot = _iv_const_mul(yy, -one, u)
            x2m1 = _iv_add(_iv_mul(xx, xx, u),
                           (jnp.full_like(xx[0], -1.0),
                            jnp.zeros_like(xx[0])), u)
            y_dot = _iv_add(
                xx, _iv_const_mul(_iv_mul(x2m1, yy, u), damp, u), u)
            return cat([x_dot, y_dot])

    else:  # CartPole
        m = float(np.asarray(dyn.pendulum_mass))
        big_m = float(np.asarray(dyn.cart_mass))
        length = float(np.asarray(dyn.length))
        b = float(np.asarray(dyn.rot_friction))
        mp = jnp.asarray(m, config.dtype)
        bmp = jnp.asarray(big_m, config.dtype)
        lp = jnp.asarray(length, config.dtype)
        bml = jnp.asarray(b * (m + big_m) / (m * length), config.dtype)
        bp = jnp.asarray(b, config.dtype)
        mg = jnp.asarray((m + big_m) * GRAVITY, config.dtype)
        mgl_half = jnp.asarray(0.5 * m * GRAVITY * length, config.dtype)
        ml_half = jnp.asarray(0.5 * m * length, config.dtype)

        def ode_iv(x, a):
            theta, v, om = col(x, 1), col(x, 2), col(x, 3)
            sin_t = _iv_sin(theta, u)
            cos_t = _iv_cos(theta, u)
            sin_2t = _iv_sin(_iv_const_mul(theta, 2.0, 0.0), u)
            om2 = _iv_mul(om, om, u)
            det = _iv_const_mul(
                _iv_add((jnp.full_like(sin_t[0], big_m),
                         jnp.zeros_like(sin_t[0])),
                        _iv_const_mul(_iv_mul(sin_t, sin_t, u), mp, u),
                        u), lp, u)
            v_num = _iv_add(
                _iv_add(
                    a,
                    _iv_const_mul(
                        _iv_mul(_iv_const_mul(om2, 2.0, 0.0),
                                sin_t, u), -ml_half, u), u),
                _iv_add(
                    _iv_const_mul(_iv_mul(om, cos_t, u), -bp, u),
                    _iv_const_mul(sin_2t, mgl_half, u), u), u)
            v_dot = _iv_div(_iv_const_mul(v_num, lp, u), det, u)
            om_num = _iv_add(
                _iv_add(
                    _iv_mul(a, cos_t, u),
                    _iv_const_mul(_iv_mul(om2, sin_2t, u),
                                  -ml_half, u), u),
                _iv_add(_iv_const_mul(om, -bml, u),
                        _iv_const_mul(sin_t, mg, u), u), u)
            om_dot = _iv_div(om_num, det, u)
            return cat([v, om, v_dot, om_dot])

    def fn(q_iv):
        x = (q_iv[0][:, :d], q_iv[1][:, :d])
        if has_act:
            a = (q_iv[0][:, d:], q_iv[1][:, d:])
        else:
            a = (jnp.zeros((q_iv[0].shape[0], 1), config.dtype),) * 2
        if tx is not None:
            x = _iv_const_mul(x, tx[None, :], u)
        if tu is not None and has_act:
            a = _iv_const_mul(a, tu[None, :], u)
        for _ in range(steps):
            dxdt = ode_iv(x, a)
            x = _iv_add(x, _iv_const_mul(dxdt, dt_i, u), u)
        if itx is not None:
            x = _iv_const_mul(x, itx[None, :], u)
        return x
    return fn


def _lv_model(lyapunov, lipschitz_model, u):
    """Resolve the L_v rounding model (constant -> exact; derivable
    row-wise linear forms auto-modeled)."""
    if lipschitz_model is not None:
        return lipschitz_model
    lv = lyapunov._lipschitz_lyapunov
    if isinstance(lv, (int, float, ConstantFunction)):
        # A constant is stored with identical bits in both lanes and its
        # "evaluation" is an exact broadcast: zero rounding error.
        return ErrorModel(lambda x: jnp.zeros((x.shape[0], 1)), 0.0)
    # Auto-derivation (r5): a callable matching the row-wise absolute
    # linear form ``|x G^T|`` — GradientNorm of a quadratic, the
    # ubiquitous ``2|Px|`` lambda pattern (probed against the quadratic
    # candidate), or an installed ``extended_lv_matrix`` — gets the
    # (d+2)-op matvec model at this unit, the same resolution the
    # extended/hybrid margins use.
    from .ops.extended_verify import _lv_error_model

    model = _lv_error_model(lyapunov, None, unit=u)
    if model is not None:
        return model
    raise NotImplementedError(
        "analytic margin needs an ErrorModel for non-constant L_v "
        "functions with no derivable linear-form model (pass "
        "lipschitz_model=... or install extended_lv_matrix; the "
        "measured oracle.calibrate_certificate_margin covers any "
        "callable); got {}".format(type(lv).__name__))


def _candidate_model(v_fun, d, u):
    """Per-point magnitude/error rule for the Lyapunov candidate.

    Returns ``v_mag_err(y, y_abs, dy) -> (mag, err)``: an anchor on
    ``|v_any(y')|`` and a bound on ``|v_any(y') - v_exact(y)|`` for ANY
    realization rounding at ``u`` per op, evaluated at any
    ``|y' - y| <= dy`` elementwise (``y`` signed, ``y_abs = |y|``).

    Quadratic rule: the ``x^T P x`` chain (2d + 2 sequential roundings)
    against the positive anchor ``|y|^T |P| |y|`` plus the exact
    first-order perturbation ``dy^T (|P| + |P|^T) (|y| + dy)``.

    Piecewise-linear rule (:class:`Triangulation` candidates, the
    flagship/pendulum family): table reads are EXACT (vertex values are
    stored f32), so only the barycentric-weight arithmetic rounds —
    ``gamma_{3d+10} (d+1) A`` with ``A`` the interpolation anchor — and
    every input effect is Lipschitz: per-dim gradient bounds ``G_d``
    (max axis-d neighbor difference over the table: the Kuhn
    triangulation's simplex gradients ARE single-axis corner
    differences) absorb the query uncertainty ``dy``, the fractional-
    coordinate rounding (``3u (|y_d| + |offset_d|)`` in coordinate
    units), and cell misassignment near faces (the interpolant is
    continuous; the factor 2 covers evaluating the neighboring cell's
    linear extension). Outside the domain the interpolant extrapolates
    linearly, so the anchor grows by ``sum_d G_d out_d``.
    """
    from .functions.simplex import Triangulation

    if isinstance(v_fun, QuadraticFunction):
        p_abs = jnp.abs(jnp.asarray(v_fun.matrix, dtype=config.dtype))
        p_sym = p_abs + p_abs.T
        g_quad = _gamma(2 * d + 2, u)

        def v_mag_err(y, y_abs, dy):
            mag = jnp.sum(mxu_dot(y_abs, p_abs) * y_abs, axis=1)
            err = (jnp.sum(mxu_dot(dy, p_sym) * (y_abs + dy), axis=1)
                   + g_quad * mag)
            return mag, err
        return v_mag_err

    if isinstance(v_fun, Triangulation):
        if v_fun.output_dim != 1:
            raise NotImplementedError(
                "analytic margin needs a scalar PWL candidate")
        grid_v = v_fun.discretization
        if grid_v.ndim != d:
            raise ValueError("candidate grid dimension mismatch")
        theta = np.asarray(v_fun.parameters, dtype=np.float64)[:, 0]
        theta_max = float(np.max(np.abs(theta))) or 1.0
        shape = tuple(int(n) for n in grid_v.shape)
        vals_nd = theta.reshape(shape)
        unit = np.asarray(grid_v.unit_maxes, dtype=np.float64)
        g_per_dim = np.array([
            (float(np.max(np.abs(np.diff(vals_nd, axis=ax))))
             if shape[ax] > 1 else 0.0) / unit[ax]
            for ax in range(d)])
        g_dev = jnp.asarray(g_per_dim, dtype=config.dtype)
        off_abs = jnp.asarray(np.abs(np.asarray(grid_v.offset,
                                                np.float64)),
                              dtype=config.dtype)
        lo = jnp.asarray(np.asarray(grid_v.limits, np.float64)[:, 0],
                         dtype=config.dtype)
        hi = jnp.asarray(np.asarray(grid_v.limits, np.float64)[:, 1],
                         dtype=config.dtype)
        g_w = _gamma(3 * d + 10, u) * (d + 1)
        inv_unit = jnp.asarray(1.0 / unit, dtype=config.dtype)

        def v_mag_err(y, y_abs, dy):
            out = (jnp.maximum(lo[None, :] - y, 0.0)
                   + jnp.maximum(y - hi[None, :], 0.0))
            delta = dy + 3.0 * u * (y_abs + off_abs[None, :])
            reach = out + delta
            # Value anchor: the located cell's linear extension.
            mag = theta_max + mxu_dot(reach, g_dev[:, None])[:, 0]
            # Weight-arithmetic anchor: sum |w| <= 1 + 2 * out-of-cell
            # excess in CELL units (weights are affine in z).
            w_sum = 1.0 + 2.0 * mxu_dot(reach, inv_unit[:, None])[:, 0]
            err = g_w * theta_max * w_sum \
                + 2.0 * mxu_dot(delta, g_dev[:, None])[:, 0]
            return mag, err
        return v_mag_err

    if isinstance(v_fun, MultipliedFunction):
        const, inner = v_fun.split_scalar_factor("analytic margin")
        inner_rule = _candidate_model(inner, d, u)
        c_abs = abs(float(np.asarray(const.constant)))

        def v_mag_err_scaled(y, y_abs, dy):
            mag, err = inner_rule(y, y_abs, dy)
            return c_abs * mag, c_abs * (err + u * (mag + 2.0 * err))
        return v_mag_err_scaled

    if isinstance(v_fun, LyapunovNetwork):
        # The f32 pipeline assembles each layer kernel W0^T W0 + eps I
        # (+ free rows) ON THE FLY (functions/neural.py:200-214), so the
        # construction rounds at gamma per entry in the modeled unit;
        # the extended pipeline's host-f64 construction rounds at 2^-53
        # <= any supported u. Both are covered by the per-entry dw term.
        layers = []
        in_dim = v_fun.input_dim
        for w0, w1 in zip(v_fun.posdef_weights, v_fun.extra_weights):
            w0_c = np.asarray(w0, np.float64)
            kern = w0_c.T @ w0_c + v_fun.eps * np.eye(in_dim)
            gam_k = _gamma(w0_c.shape[0] + 2, u)
            dkern = gam_k * (np.abs(w0_c).T @ np.abs(w0_c)
                             + v_fun.eps * np.eye(in_dim))
            if w1 is not None:
                w1_c = np.asarray(w1, np.float64)
                kern = np.vstack([kern, w1_c])
                dkern = np.vstack([dkern, u * np.abs(w1_c)])
            layers.append((jnp.asarray(kern.T, config.dtype),
                           jnp.asarray(dkern.T, config.dtype)))
            in_dim = kern.shape[0]
        acts = list(v_fun.activations)

        def v_mag_err_lyapnet(y, y_abs, dy):
            iv = (y, dy)
            for (kern_t, dkern_t), name in zip(layers, acts):
                iv = _iv_activation(
                    _iv_matmul(iv, kern_t, u, dw=dkern_t), name, u)
            hi = _iv_hi(iv)
            mag = jnp.sum(hi * hi, axis=1)
            # |a_any^2 - a_exact^2| <= (|a_any| + |a_exact|) e.
            err = (jnp.sum((hi + jnp.abs(iv[0]) + iv[1]) * iv[1], axis=1)
                   + _gamma(hi.shape[1] + 1, u) * mag)
            return mag, err
        return v_mag_err_lyapnet

    if isinstance(v_fun, NeuralNetwork):
        if v_fun.output_dim != 1:
            raise NotImplementedError(
                "analytic margin needs a scalar NN candidate")
        prog = _mlp_program(v_fun, u)

        def v_mag_err_nn(y, y_abs, dy):
            v, e = prog((y, dy))
            return _iv_hi((v, e))[:, 0], e[:, 0]
        return v_mag_err_nn

    raise NotImplementedError(
        "analytic margin supports QuadraticFunction / Triangulation / "
        "LyapunovNetwork / NeuralNetwork candidates (optionally scaled "
        "by a constant); got {}".format(type(v_fun).__name__))


def _column_batch(vals, n_pts):
    """Normalize an L_v evaluation to ``(N, dv)``, broadcasting rows.

    Delegates the ``(N,)``-to-column hazard to the sweep's own
    ``lyapunov._as_column_batch`` (single source of the shape rule) and
    adds only the batch broadcast."""
    from .lyapunov import _as_column_batch

    vals = _as_column_batch(jnp.asarray(vals))
    if vals.shape[0] == 1 and n_pts > 1:
        vals = jnp.broadcast_to(vals, (n_pts, vals.shape[1]))
    return vals


def _kernel_program(kernel, dims, u):
    """Recursively build the per-pair kernel error program.

    Returns ``fn(X, q, dq) -> (val, dk, diag_abs, ddiag)`` for the
    kernel node restricted to the FULL-input columns ``dims``:

    - ``val (cap, N)``: the node's SIGNED f32 value at ``q`` (the top
      level reuses it as the kernel matrix, avoiding a second full
      evaluation);
    - ``dk (cap, N)``: bound on ``|k_any(q') - k_exact(q)|`` for ANY
      f32 realization ``k_any`` (this sweep's or the real sweep's) at
      any ``|q' - q| <= dq`` elementwise — evaluation rounding PLUS
      input perturbation, so the solve chain propagates both at once.
      The invariant every rule preserves: ``|k_any(q')| <= |val| + 2 dk``
      (one ``dk`` to reach the exact value, one more to any other
      realization), which is what the composition rules use as factor
      anchors;
    - ``diag_abs / ddiag (N,)``: the same pair for ``k.diag(q)``.

    Composition rules (sum / product / ActiveDims) mirror the kernel
    algebra the reference notebooks use (``Linear + Matern * Linear``).
    Raises ``NotImplementedError`` on unsupported node types.
    """
    dims = np.asarray(dims, dtype=int)

    if isinstance(kernel, ActiveDims):
        return _kernel_program(kernel.kernel, dims[list(kernel.dims)], u)

    if isinstance(kernel, SumKernel):
        f1 = _kernel_program(kernel.k1, dims, u)
        f2 = _kernel_program(kernel.k2, dims, u)

        def fn_sum(x, q, dq):
            v1, d1, g1, e1 = f1(x, q, dq)
            v2, d2, g2, e2 = f2(x, q, dq)
            # add rounding u |a + b| anchored on realization bounds
            dk = d1 + d2 + u * (jnp.abs(v1) + 2.0 * d1
                                + jnp.abs(v2) + 2.0 * d2)
            ddiag = e1 + e2 + u * (g1 + 2.0 * e1 + g2 + 2.0 * e2)
            return v1 + v2, dk, g1 + g2, ddiag
        return fn_sum

    if isinstance(kernel, ProductKernel):
        f1 = _kernel_program(kernel.k1, dims, u)
        f2 = _kernel_program(kernel.k2, dims, u)

        def fn_prod(x, q, dq):
            v1, d1, g1, e1 = f1(x, q, dq)
            v2, d2, g2, e2 = f2(x, q, dq)
            # |a' b' (1 + u) - a b| with |a'| <= |v1| + 2 d1 (any
            # realization at any perturbed point), |b_exact| <= |v2| + d2:
            # d1 |b'| + |a_exact| d2 + u |a'||b'|.
            big1 = jnp.abs(v1) + 2.0 * d1
            big2 = jnp.abs(v2) + 2.0 * d2
            dk = d1 * big2 + (jnp.abs(v1) + d1) * d2 + u * big1 * big2
            gb1 = g1 + 2.0 * e1
            gb2 = g2 + 2.0 * e2
            ddiag = e1 * gb2 + (g1 + e1) * e2 + u * gb1 * gb2
            return v1 * v2, dk, g1 * g2, ddiag
        return fn_prod

    if isinstance(kernel, _StationaryKernel):
        if isinstance(kernel, RBF):
            mat_c = mat_gp = 0.0
            deriv_const = _MAX_STE
        elif type(kernel) in _MATERN:
            mat_c, mat_gp = _MATERN[type(kernel)]
            deriv_const = float(np.sqrt(mat_c)) * mat_gp
        else:
            raise NotImplementedError(
                "analytic margin: unsupported stationary kernel {}"
                .format(type(kernel).__name__))
        m = len(dims)
        var = float(np.asarray(kernel.variance))
        ls = np.broadcast_to(np.atleast_1d(
            np.asarray(kernel.lengthscales, dtype=np.float64)), (m,))
        ls_dev = jnp.asarray(ls, dtype=config.dtype)
        lip = jnp.asarray(var * deriv_const / ls, dtype=config.dtype)
        g_sq = _gamma(3 * m + 8, u)
        cols = list(dims)

        def fn_stat(x, q, dq):
            xs = x[:, cols] / ls_dev
            qs = q[:, cols] / ls_dev
            dqs = dq[:, cols] / ls_dev
            xx = jnp.sum(xs * xs, axis=1, keepdims=True)
            qq = jnp.sum(qs * qs, axis=1)[None, :]
            cross_abs = mxu_dot(jnp.abs(xs), jnp.abs(qs).T)
            s_mag = xx + 2.0 * cross_abs + qq
            # Perturbed-point inflation: s_mag(q') <= s_mag(q) +
            # 2 |xs| dqs + (2 |qs| + dqs) dqs — the real sweep rounds
            # its squared distance AT q', not q.
            ds = (2.0 * mxu_dot(jnp.abs(xs), dqs.T)
                  + jnp.sum((2.0 * jnp.abs(qs) + dqs) * dqs,
                            axis=1)[None, :])
            dt = g_sq * (s_mag + ds)
            val = kernel(x[:, cols], q[:, cols])
            val_abs = jnp.abs(val)
            dpert = mxu_dot(dq[:, cols], lip[:, None])[None, :, 0]
            # |k_exact(q')| <= |val| e^{dt/2} (1 + 4u) + dpert
            val_infl = val_abs * (1.0 + jnp.expm1(0.5 * dt)) \
                * (1.0 + 4.0 * u) + dpert
            if isinstance(kernel, RBF):
                dval = val_infl * jnp.expm1(0.5 * dt) + 4.0 * u * val_infl
            else:
                # |delta k| <= v max|g'| sqrt(c dt): the sqrt-difference
                # inequality absorbs the r ~ 0 derivative blowup.
                dval = (var * mat_gp * jnp.sqrt(mat_c * dt)
                        + 8.0 * u * val_infl)
            n_q = q.shape[0]
            return (val, dval + dpert,
                    jnp.full((n_q,), var, dtype=q.dtype),
                    jnp.full((n_q,), u * var, dtype=q.dtype))
        return fn_stat

    if isinstance(kernel, LinearKernel):
        m = len(dims)
        cols = list(dims)
        vv = jnp.asarray(np.broadcast_to(
            np.atleast_1d(np.asarray(kernel.variances,
                                     dtype=np.float64)), (m,)),
            dtype=config.dtype)
        g_lin = _gamma(m + 2, u)

        def fn_lin(x, q, dq):
            xa = jnp.abs(x[:, cols]) * vv           # (cap, m)
            qa = jnp.abs(q[:, cols])
            dqa = dq[:, cols]
            # anchors at the PERTURBED point: |q'| <= |q| + dq
            abs_dot = mxu_dot(xa, (qa + dqa).T)     # (cap, N)
            val = kernel(x[:, cols], q[:, cols])
            dpert = mxu_dot(xa, dqa.T)              # per-pair
            dval = g_lin * abs_dot
            diag_abs = jnp.sum(qa * qa * vv, axis=1)
            ddiag = (g_lin * jnp.sum((qa + dqa) ** 2 * vv, axis=1)
                     + jnp.sum((2.0 * qa + dqa) * vv * dqa, axis=1))
            return val, dval + dpert, diag_abs, ddiag
        return fn_lin

    raise NotImplementedError(
        "analytic margin: unsupported kernel node {} — use "
        "calibrate_certificate_margin".format(type(kernel).__name__))


def _gp_statics(gp, u):
    """Precompute the per-GP constants of the error analysis.

    ``gp`` must be a (possibly multi-output) :class:`GaussianProcess`
    whose kernel the recursive error program supports (stationary
    RBF/Matern, Linear, and their sums/products/ActiveDims
    restrictions) and a ``LinearSystem``/``None`` prior mean.
    """
    mean_mat = None
    if gp.mean_function is not None:
        mean_mat = _linear_core(gp.mean_function)
        if mean_mat is None:
            raise NotImplementedError(
                "analytic margin supports LinearSystem prior means; "
                "got {}".format(type(gp.mean_function).__name__))

    nd = gp.input_dim
    s2 = float(gp.scale) ** 2
    mask = gp._mask()
    chol_abs = jnp.abs(gp.chol_inv)
    alpha_abs = jnp.abs(gp.alpha)
    return {
        "gp": gp, "mean_mat": mean_mat, "nd": nd, "s2": s2,
        "scale": float(gp.scale), "beta": float(gp.beta),
        "mask": mask, "chol_abs": chol_abs, "alpha_abs": alpha_abs,
        "entry": _kernel_program(gp.kernel, np.arange(nd), u),
        "g_dot": _gamma(gp.capacity + 2, u),
        "g_mean": 0.0 if mean_mat is None else _gamma(nd + 1, u),
    }


def _gp_terms(st, q, dq, u):
    """Per-point GP posterior magnitudes and error bounds.

    ``dq`` is the ``(N, nd)`` input-coordinate uncertainty (policy
    rounding on the action dims; refined-coordinate rounding on the
    state dims when the refined sweep is covered). Returns
    ``(mu_hat, d_mu, err_hat, d_err)``, each ``(N, S)``: the f32
    posterior mean / its total error bound, and the f32 confidence term
    ``beta * std`` / its error bound (via the exact identity
    ``|sqrt(a) - sqrt(b)| = |a - b| / (sqrt(a) + sqrt(b))``). Every
    magnitude anchor carries ``+2 error`` two-sided slack so it bounds
    the REAL sweep's f32 intermediates, not just this sweep's.
    """
    gp = st["gp"]
    s2, scale = st["s2"], st["scale"]
    g_dot = st["g_dot"]

    # -- kernel entries: recursive per-pair program -------------------
    # dk already contains the input-perturbation term (|k(q + dq) -
    # k(q)| folded in), so the solve chain below propagates evaluation
    # rounding AND coordinate uncertainty through mean and variance at
    # once — no separate Lipschitz machinery.
    val, dk_raw, diag_abs, ddiag = st["entry"](gp.X_buf, q, dq)
    kx = s2 * val * st["mask"][:, None]                     # (cap, N)
    kx_abs = jnp.abs(kx)
    dk = (s2 * dk_raw + 4.0 * u * kx_abs) * st["mask"][:, None]

    # -- solve chain --------------------------------------------------
    a_hat = mxu_dot(gp.chol_inv, kx)
    a_abs = jnp.abs(a_hat)
    r = mxu_dot(st["chol_abs"], kx_abs + 2.0 * dk)
    da = mxu_dot(st["chol_abs"], dk) + (g_dot + u) * r
    a_tot = a_abs + 2.0 * da

    # posterior-mean rounding per output: (N, S)
    e_mn = (mxu_dot(da.T, st["alpha_abs"])
            + (g_dot + 2.0 * u) * mxu_dot(a_tot.T, st["alpha_abs"]))
    mean_num = mxu_dot(a_hat.T, gp.alpha) / scale
    prior = 0.0 if gp.mean_function is None else gp.mean_function(q)
    mu_hat = mean_num + prior
    mean_mat = st["mean_mat"]
    e_prior = (0.0 if mean_mat is None
               else st["g_mean"] * mxu_dot(jnp.abs(q),
                                           jnp.abs(mean_mat).T))
    e_mu_eval = e_mn / scale + u * jnp.abs(mean_num) \
        + e_prior + 2.0 * u * jnp.abs(mu_hat)

    # The GP part of the input perturbation rode in through dk; only
    # the prior mean's own Lipschitz term remains.
    d_mu = e_mu_eval
    if mean_mat is not None:
        d_mu = d_mu + mxu_dot(dq, jnp.abs(mean_mat).T)

    # -- variance / std rounding --------------------------------------
    sum_a2 = jnp.sum(a_hat * a_hat, axis=0)                # (N,)
    var_hat = jnp.maximum(gp.kernel.diag(q) - sum_a2 / s2, 1e-12)
    d_sum_a2 = jnp.sum(2.0 * a_tot * da + g_dot * a_tot ** 2, axis=0)
    # The coordinate uncertainty of the solve side rode in through dk
    # (hence da / d_sum_a2); diag carries its own eval + pert bound.
    d_var_tot = (d_sum_a2 + u * sum_a2) / s2 + u * diag_abs + ddiag \
        + u * jnp.abs(var_hat)
    sig_hat = jnp.sqrt(var_hat)
    sig_lo = jnp.sqrt(jnp.maximum(var_hat - d_var_tot, 0.0))
    d_sig = jnp.where(sig_lo > 0.0, d_var_tot / (sig_hat + sig_lo),
                      jnp.sqrt(d_var_tot))
    n_out = mu_hat.shape[1]
    err_hat = jnp.broadcast_to((st["beta"] * sig_hat)[:, None],
                               (q.shape[0], n_out))
    d_err = st["beta"] * d_sig[:, None] + 2.0 * u * err_hat
    return mu_hat, d_mu, err_hat, d_err


def _gp_members(dyn):
    """Per-output GP list of an uncertain dynamics model, or None.

    Accepts the reference's per-dimension ``FunctionStack`` idiom
    (reference ``functions.py:254-307``) directly: a stack whose
    members are all GaussianProcesses contributes its member list —
    the fan-out evaluation is arithmetic-identical to the per-member
    predicts the statics model, so no hand-conversion to
    :class:`StackedGaussianProcess` is required.
    """
    if isinstance(dyn, StackedGaussianProcess):
        return dyn.unstack()
    if isinstance(dyn, GaussianProcess):
        return [dyn]
    if isinstance(dyn, FunctionStack) and dyn.functions and all(
            isinstance(f, GaussianProcess) for f in dyn.functions):
        return list(dyn.functions)
    return None


def _finalize_margin(worst, statics, d, u, safety):
    """Turn the worst measured bound into the installable margin.

    One source for BOTH margins' final slack (a drifting copy would
    silently under- or over-state one of them):

    - ``1/(1-4u)``: the f32 ``threshold - margin`` subtraction and the
      final comparison round at ``u * (|thr| + margin)``; solving for a
      margin that still dominates after its own rounding.
    - ``(1 + own)``: the bound sweep ITSELF runs in the working dtype,
      so the computed bound understates the exact-arithmetic bound by
      at most its own relative rounding. The per-point bound is a
      positive-sum circuit (no cancellation) whose longest sequential
      chains are the abs-value matvecs (length ~capacity) compounded
      through ~6 multiplicative stages; ``64 * (sum of capacities + d +
      16)`` over-counts that op count by an order of magnitude, and the
      MXU slack factor rides in via ``fp_error_factor``. Second-order
      when ``u`` is the f32 unit (bound ~ u, own rounding ~ u * bound);
      first-order — and required for rigor — when modeling a finer
      pipeline (``unit_roundoff << eps32``).
    """
    cap_total = sum(st["gp"].capacity for st in statics)
    u32_slack = (float(np.finfo(np.float32).eps) / 2.0
                 * float(getattr(config, "fp_error_factor", 4.0)))
    own = _gamma(64 * (cap_total + d + 16), u32_slack)
    scale = float(safety) * (1.0 + own) / (1.0 - 4.0 * u)
    if np.ndim(worst):
        return np.asarray(worst, np.float64) * scale
    return float(worst) * scale


def analytic_certificate_margin(lyapunov, batch_size=2 ** 14, safety=1.0,
                                lipschitz_model=None, refinement=1,
                                set_margin=True, unit_roundoff=None,
                                lf_model=None, per_point=False):
    """Derived (non-sampled) conservative margin for the f32 sweep.

    Runs an absolute-value sweep over the FULL grid computing, at every
    state, a rigorous bound on ``|margin_f32(x) - margin_f64(x)|`` under
    the rounding model in the module docstring, and returns
    ``safety * max_x bound(x)`` (inflated by ``1/(1-4u)`` for the
    comparison's own rounding). With ``set_margin=True`` also installs
    the companion level margin (``2 * max |v_f32 - v_f64|`` bound plus
    an ulp floor), mirroring
    :func:`~safe_learning_tpu.oracle.calibrate_certificate_margin`.

    ``refinement=R`` additionally evaluates the bound at the ``R^d``
    refined sub-grid points of EVERY cell — required when the margin
    will guard ``update_safe_set(..., max_refinement=R)``, whose
    refined checks run at points the base-grid maximum does not
    dominate (the sub-point coordinates' own f32 construction rounding
    is propagated through the state dims). With the default
    ``refinement=1`` the margin covers unrefined sweeps only.

    Unlike the calibrator this needs no float64 oracle pass and covers
    every checked point, at the price of supporting only the analyzed
    function types and overshooting the true error by the worst-case-
    analysis factor (the abs-value matvec bound scales with the cached
    factor's condition number: ~1000x on the ill-conditioned property
    instances, harmless in the well-conditioned regime — see
    ``docs/performance.md``).

    Parameters
    ----------
    lyapunov : Lyapunov
    batch_size : int, optional
        Grid states per device dispatch of the bound sweep.
    safety : float, optional
        Multiplier on the derived bound (1.0 is already rigorous under
        the stated model; keep >1 only for belt-and-braces).
    lipschitz_model : ErrorModel, optional
        Rounding model for a non-constant ``L_v`` function.
    refinement : int, optional
        Cover the refined sub-grid points up to this refinement level.
    set_margin : bool, optional
        Install ``certificate_margin`` / ``level_margin`` on the
        instance.
    unit_roundoff : float, optional
        Override the per-op rounding unit the analysis assumes. The
        default (``None``) models the f32 device sweep
        (``eps32/2 * config.fp_error_factor``); the extended-precision
        sweep (``ops/extended_verify``) passes its double-word unit
        ``2^-40`` — every magnitude anchor and gamma in the analysis is
        parametric in ``u``, so the same per-point bound sweep covers
        any pipeline whose ops round at ``u`` relative. Refined
        sub-point COORDINATE construction always rounds in f32
        regardless (the ``8 u32`` term below is deliberately
        independent of this parameter).
    lf_model : ErrorModel, optional
        Rounding model for a callable ``L_f`` (scalars need none).
    per_point : bool, optional
        Install (and return) the per-grid-point margin ARRAY instead of
        its grid-wide maximum: each state's comparison is tightened by
        ITS derived bound (max over the base point and, with
        ``refinement=R``, that state's refined sub-points), so frontier
        cells being actively learned are no longer trimmed by the worst
        cell's error — the sweep gathers the array alongside the states
        (``Lyapunov.update_safe_set``).

    Returns
    -------
    margin : float or (nindex,) ndarray
        The installed (or would-be) decrease-comparison margin
        (an array when ``per_point=True``).
    """
    if unit_roundoff is None:
        if getattr(config, "pallas_precision", "highest") != "highest":
            raise RuntimeError(
                "analytic_certificate_margin's rounding model requires "
                "config.pallas_precision == 'highest' (the 3-pass "
                "'high' mode rounds at ~2^-17 per op and voids the "
                "bound)")
        u = _unit_roundoff()
    else:
        u = float(unit_roundoff)
    dyn = lyapunov.dynamics
    grid = lyapunov.discretization
    d = grid.ndim
    det_prog = None
    gp_list = _gp_members(dyn)
    if gp_list is None:
        gp_list = []
        det_prog = _det_dynamics_program(dyn, u)
    v_fun = lyapunov.lyapunov_function
    v_mag_err = _candidate_model(v_fun, d, u)
    tau = float(lyapunov.tau)

    lfm = None
    lf = 0.0
    lf_raw = lyapunov._lipschitz_dynamics
    if isinstance(lf_raw, ConstantFunction) and np.size(lf_raw.constant) == 1:
        # Valid for the plain sweep via _eval_lipschitz; unwrap it here
        # the same way the extended sweep's baked-scalar path does.
        lf_raw = np.asarray(lf_raw.constant).reshape(()).item()
    if isinstance(lf_raw, (int, float, np.floating, np.integer)):
        lf = float(lf_raw)
    elif det_prog is not None and tau == 0.0:
        # thr = -L_v (1 + L_f) * 0 == 0 exactly in every realization:
        # a callable L_f multiplies nothing and needs no model (the
        # extended sweep elides it the same way).
        pass
    else:
        if lf_model is None:
            # Auto-derivation (r5): an installed extended_lf_matrix /
            # GradientNorm form gets the matvec model at this unit.
            from .ops.extended_verify import _lf_error_model

            lf_model = _lf_error_model(lyapunov, unit=u)
        if lf_model is None:
            raise NotImplementedError(
                "analytic margin needs a scalar L_f, or an ErrorModel "
                "via lf_model for a callable one (or install "
                "extended_lf_matrix; the measured "
                "oracle.calibrate_certificate_margin covers any "
                "callable)")
        lfm = lf_model
        lf_lip = jnp.asarray(lfm.input_lipschitz, dtype=config.dtype)

    pol_prog = _policy_program(lyapunov.policy, u)
    # At tau == 0 with deterministic dynamics L_v multiplies only the
    # exactly-zero threshold (finite * 0 == 0 in every realization) and
    # there is no error term: no L_v model is needed at all.
    lv_trivial = det_prog is not None and tau == 0.0
    if lv_trivial:
        lvm = None
    else:
        lvm = _lv_model(lyapunov, lipschitz_model, u)
        lv_lip = jnp.asarray(lvm.input_lipschitz, dtype=config.dtype)
    statics = [_gp_statics(gp, u) for gp in gp_list]

    def _lv_at(x, n_pts):
        return _column_batch(
            lyapunov._lipschitz_lyapunov(x)
            if callable(lyapunov._lipschitz_lyapunov)
            else lyapunov._lipschitz_lyapunov, n_pts)

    def _lv_err_at(x, n_pts):
        return _column_batch(lvm.eval_bound(x), n_pts)

    def _lv_anchor_at(x, n_pts):
        """One-sided inflation excess of the realization (see
        ``ErrorModel.anchor_bound``); zero for symmetric models."""
        if lvm.anchor_bound is None:
            return 0.0
        return _column_batch(lvm.anchor_bound(x), n_pts)

    def batch_bound(pts, dx):
        """Per-state bound on |margin_dev - margin_f64| (N,).

        ``dx`` is the state-coordinate uncertainty (zero on the base
        grid; f32 construction rounding at refined sub-points). Also
        returns the candidate-value error (for the level margin) and
        the worst input-shift fraction of any headroom-capped
        (inflated-realization) L model."""
        n_pts = pts.shape[0]
        shift = jnp.zeros(())
        # -- policy + its rounding ------------------------------------
        acts, du = pol_prog((pts, dx))
        q = jnp.concatenate([pts, acts], axis=1)
        dq = jnp.concatenate([dx, du], axis=1)

        # -- dynamics outputs -----------------------------------------
        if det_prog is not None:
            mu_hat, d_mu = det_prog((q, dq))
            err_hat = d_err = None
        else:
            # GP posterior (one multi-output GP, or stacked views).
            parts = [_gp_terms(st, q, dq, u) for st in statics]
            mu_hat = jnp.concatenate([p[0] for p in parts], axis=1)
            d_mu = jnp.concatenate([p[1] for p in parts], axis=1)
            err_hat = jnp.concatenate([p[2] for p in parts], axis=1)
            d_err = jnp.concatenate([p[3] for p in parts], axis=1)

        # -- Lyapunov value terms (candidate-model rule) ---------------
        mu_abs = jnp.abs(mu_hat)
        pts_abs = jnp.abs(pts)
        d_mu_l1 = jnp.sum(d_mu, axis=1)                       # (N,)
        v_next_mag, e_v_next = v_mag_err(mu_hat, mu_abs, d_mu)
        v_x_mag, e_v_x = v_mag_err(pts, pts_abs, dx)

        # -- L_v * err decrease term (uncertain dynamics only) ---------
        if err_hat is not None:
            lv_abs = jnp.abs(_lv_at(mu_hat, n_pts))           # (N, dv)
            if lv_abs.shape[1] == 1 and err_hat.shape[1] > 1:
                lv_abs = jnp.broadcast_to(lv_abs,
                                          (n_pts, err_hat.shape[1]))
            d_lv = _lv_err_at(mu_hat, n_pts) \
                + 2.0 * lv_lip * d_mu_l1[:, None]
            lv_hi = lv_abs + d_lv + _lv_anchor_at(mu_hat, n_pts)
            if lvm.max_input_shift is not None:
                shift = jnp.maximum(
                    shift, _shift_frac(d_mu, lvm.max_input_shift))
            errterm_anchor = jnp.sum(lv_hi * (err_hat + d_err), axis=1)
            d_errterm = (jnp.sum(lv_hi * d_err
                                 + d_lv * (err_hat + d_err), axis=1)
                         + _gamma(lv_abs.shape[1] + 1, u)
                         * errterm_anchor)
        else:
            errterm_anchor = 0.0
            d_errterm = 0.0

        # -- threshold ------------------------------------------------
        if lv_trivial or tau == 0.0:
            # thr = -L_v (1 + L_f) * 0 == 0 exactly in every
            # realization (finite * 0); no threshold error at all.
            d_thr = 0.0
        else:
            lv_x = _lv_at(pts, n_pts)
            dx_l1 = jnp.sum(dx, axis=1)
            d_lv_x = (_lv_err_at(pts, n_pts)
                      + 2.0 * lv_lip * dx_l1[:, None])
            lv_x_hi = (jnp.abs(lv_x) + d_lv_x
                       + _lv_anchor_at(pts, n_pts))
            if lvm.max_input_shift is not None:
                shift = jnp.maximum(
                    shift, _shift_frac(dx, lvm.max_input_shift))
            if lfm is None:
                lf_hi = lf
                d_lf = 0.0
            else:
                lf_val = _column_batch(
                    lyapunov._lipschitz_dynamics(pts), n_pts)[:, :1]
                d_lf = (_column_batch(lfm.eval_bound(pts),
                                      n_pts)[:, :1]
                        + 2.0 * lf_lip * jnp.sum(dx, axis=1)[:, None])
                lf_anchor_x = (0.0 if lfm.anchor_bound is None
                               else _column_batch(
                                   lfm.anchor_bound(pts), n_pts)[:, :1])
                lf_hi = jnp.abs(lf_val) + d_lf + lf_anchor_x
                if lfm.max_input_shift is not None:
                    shift = jnp.maximum(
                        shift, _shift_frac(dx, lfm.max_input_shift))
            one_plus_lf_hi = 1.0 + lf_hi
            thr_mag = jnp.sum(lv_x_hi * one_plus_lf_hi, axis=1) * tau
            d_thr = ((jnp.sum(d_lv_x * one_plus_lf_hi, axis=1)
                      + jnp.sum(lv_x_hi * d_lf, axis=1)
                      if lfm is not None else
                      jnp.sum(d_lv_x, axis=1) * (1.0 + lf)) * tau
                     + _gamma(lv_x.shape[1] + 4, u) * thr_mag)

        # -- assemble -------------------------------------------------
        final_sums = _gamma(4, u) * (v_next_mag + v_x_mag
                                     + errterm_anchor)
        return (e_v_next + e_v_x + d_errterm + d_thr + final_sums,
                e_v_x, shift)

    bound_jit = jax.jit(batch_bound)
    worst = 0.0
    worst_v = 0.0
    worst_shift = 0.0
    v_scale = 0.0
    per_point_bounds = (np.zeros(lyapunov.discretization.nindex)
                        if per_point else None)
    pts_all = grid.all_points
    refinement = int(refinement)
    if refinement < 1:
        raise ValueError("refinement must be >= 1")
    unit = np.asarray(grid.unit_maxes, dtype=np.float64)
    if refinement == 1:
        offset_list = [np.zeros(d)]
    else:
        # The refined sweep checks the R^d sub-grid covering each cell
        # (lyapunov._refined_negative_batch): offsets span the cell.
        steps = (np.arange(refinement) + 0.5) / refinement - 0.5
        offset_list = [np.array(c) * unit for c in
                       itertools.product(steps, repeat=d)]
        if refinement % 2 == 0:
            # Odd R's lattice already contains the zero offset.
            offset_list.append(np.zeros(d))

    for offset in offset_list:
        off_dev = jnp.asarray(offset, dtype=config.dtype)
        coord_rounding = float(np.any(offset != 0.0))
        # f32 construction rounding of refined coordinates: the unit
        # cast, two half_width multiplies, and the add each round
        # proportionally to |offset| OR |result| (a near-cancelling
        # state + offset rounds on |offset|, not the small result).
        # 8 * u32 covers both constructions two-sided INDEPENDENT of
        # fp_error_factor (this term must not shrink with the slack).
        u32 = float(np.finfo(config.np_dtype).eps) / 2.0
        off_abs = jnp.abs(off_dev)
        for start in range(0, grid.nindex, batch_size):
            pts = jnp.asarray(pts_all[start:start + batch_size],
                              dtype=config.dtype) + off_dev
            dx = coord_rounding * 8.0 * u32 * (jnp.abs(pts)
                                               + off_abs[None, :])
            eps_b, ev_b, shift_b = jax.device_get(bound_jit(pts, dx))
            worst = max(worst, float(np.max(eps_b)))
            worst_v = max(worst_v, float(np.max(ev_b)))
            worst_shift = max(worst_shift, float(shift_b))
            if per_point_bounds is not None:
                seg = slice(start, start + len(eps_b))
                # Per-state: max over the base point and that state's
                # refined sub-points (each offset pass visits the same
                # grid slice).
                per_point_bounds[seg] = np.maximum(
                    per_point_bounds[seg], np.asarray(eps_b, np.float64))
            vals = np.abs(np.asarray(lyapunov.lyapunov_function(pts)))
            v_scale = max(v_scale, float(np.max(vals)))

    if worst_shift >= 1.0:
        raise RuntimeError(
            "the instance's input uncertainty exceeds the inflated "
            "L model's trigger-band headroom (shift fraction "
            "{:.2f} >= 1): the simplex-agreement argument behind the "
            "GradientNorm rounding model does not hold — use the "
            "empirical calibrator".format(worst_shift))
    if not np.isfinite(worst):
        raise RuntimeError(
            "the derived bound is infinite (a denominator interval "
            "reached zero in the dynamics error propagation) — use "
            "the empirical calibrator")
    # Per-point bounds get the same final slack as the scalar worst
    # case (the finiteness check above already covers them: ``worst``
    # is their maximum).
    margin = _finalize_margin(
        per_point_bounds if per_point_bounds is not None else worst,
        statics, d, u, safety)
    eps_dtype = float(np.finfo(config.np_dtype).eps)
    level_margin = max(2.0 * float(safety) * worst_v,
                       4.0 * eps_dtype * (v_scale or 1.0))
    if set_margin:
        lyapunov.certificate_margin = margin
        lyapunov.level_margin = level_margin
        # Record the unit the margin covers: the f32 sweep refuses a
        # margin derived for a finer pipeline (U_EFF), which cannot
        # bound f32 rounding (Lyapunov._require_f32_margin).
        lyapunov._certificate_margin_unit = u
    return margin


def analytic_exploration_margin(lyapunov, perturbations=None,
                                actions=None, limits=None, safety=1.0,
                                batch_size=2 ** 14, lipschitz_model=None,
                                unit_roundoff=None, set_margin=True,
                                candidates=None, per_candidate=False):
    """Derived conservative margin for the EXPLORATION certificate.

    ``get_safe_sample`` certifies a candidate pair by
    ``v(mu) + sum_j |L_v_j| (beta sigma_j) < c_max - margin``
    (``explore._score_candidates``). This derives a rigorous bound on
    ``|future_any(q) - future_exact(q)|`` — the same Higham model as
    :func:`analytic_certificate_margin`, restricted to the
    future-value terms — maximized over

    - the EXACT candidate rows when ``candidates`` is given (the
      tightest form: the f32 rows ARE the model inputs, so there is no
      construction uncertainty at all; ``get_safe_sample(...,
      extended=True)`` derives its per-call margin this way), or
    - every candidate the runtime can construct: all grid states
      crossed with the explicit ``actions`` rows (exact f32 data) or
      with the policy's perturbed-and-clipped actions. Candidate
      CONSTRUCTION always happens in float32 regardless of the scoring
      pipeline, so the policy-evaluation and perturbation-add rounding
      terms use the f32 unit (times ``config.fp_error_factor``) even
      when ``unit_roundoff`` models a finer scorer — exactly like the
      refined-coordinate terms of the sweep margin.

    The margin is installed as ``lyapunov.exploration_margin``, which
    ``explore._margin_of`` prefers over ``certificate_margin`` (the
    decrease-pipeline margin is a structurally different quantity; the
    empirical calibrator's reuse of it for the level test is
    measurement-based, this one is derived). ``unit_roundoff`` follows
    :func:`analytic_certificate_margin` — pass ``U_EFF`` when the
    candidates will be scored by the extended double-word path.

    ``per_candidate=True`` (requires explicit ``candidates`` and
    ``set_margin=False``) returns the (N,) per-row margins instead of
    their max, so each candidate is trimmed by ITS OWN bound — the
    exploration-frontier analogue of the sweep's per-grid-point
    margins (``explore.get_safe_sample`` derives these automatically
    when the instance carries a per-point ``certificate_margin``).
    """
    if unit_roundoff is None:
        if getattr(config, "pallas_precision", "highest") != "highest":
            raise RuntimeError(
                "the rounding model requires config.pallas_precision == "
                "'highest'")
        u = _unit_roundoff()
    else:
        u = float(unit_roundoff)
    if candidates is None and (perturbations is None) == (actions is None):
        raise ValueError("provide candidates, or exactly one of "
                         "perturbations/actions")
    if per_candidate and candidates is None:
        raise ValueError("per_candidate margins need the explicit "
                         "candidate rows")
    if per_candidate and set_margin:
        raise ValueError("a per-candidate margin is keyed to one "
                         "candidate matrix and cannot be installed as "
                         "instance state; pass set_margin=False")
    dyn = lyapunov.dynamics
    grid = lyapunov.discretization
    d = grid.ndim
    gp_list = _gp_members(dyn)
    if gp_list is None:
        raise NotImplementedError(
            "exploration margin supports GaussianProcess / "
            "StackedGaussianProcess (or a FunctionStack of "
            "GaussianProcesses) dynamics; for anything else use the "
            "measurement-based oracle.calibrate_certificate_margin")
    v_mag_err = _candidate_model(lyapunov.lyapunov_function, d, u)
    lvm = _lv_model(lyapunov, lipschitz_model, u)
    lv_lip = jnp.asarray(lvm.input_lipschitz, dtype=config.dtype)
    statics = [_gp_statics(gp, u) for gp in gp_list]

    def _lv_at(x, n_pts):
        return _column_batch(
            lyapunov._lipschitz_lyapunov(x)
            if callable(lyapunov._lipschitz_lyapunov)
            else lyapunov._lipschitz_lyapunov, n_pts)

    def _lv_err_at(x, n_pts):
        return _column_batch(lvm.eval_bound(x), n_pts)

    def future_bound(q, dq):
        """Per-candidate bound on |future_any - future_exact| (N,)."""
        n_pts = q.shape[0]
        shift = jnp.zeros(())
        parts = [_gp_terms(st, q, dq, u) for st in statics]
        mu_hat = jnp.concatenate([p[0] for p in parts], axis=1)
        d_mu = jnp.concatenate([p[1] for p in parts], axis=1)
        err_hat = jnp.concatenate([p[2] for p in parts], axis=1)
        d_err = jnp.concatenate([p[3] for p in parts], axis=1)

        d_mu_l1 = jnp.sum(d_mu, axis=1)
        v_next_mag, e_v_next = v_mag_err(mu_hat, jnp.abs(mu_hat), d_mu)

        lv_abs = jnp.abs(_lv_at(mu_hat, n_pts))
        if lv_abs.shape[1] == 1 and err_hat.shape[1] > 1:
            lv_abs = jnp.broadcast_to(lv_abs, (n_pts, err_hat.shape[1]))
        d_lv = _lv_err_at(mu_hat, n_pts) + 2.0 * lv_lip * d_mu_l1[:, None]
        lv_hi = lv_abs + d_lv
        if lvm.anchor_bound is not None:
            lv_hi = lv_hi + _column_batch(lvm.anchor_bound(mu_hat),
                                          n_pts)
        if lvm.max_input_shift is not None:
            shift = jnp.maximum(
                shift, _shift_frac(d_mu, lvm.max_input_shift))
        errterm_anchor = jnp.sum(lv_hi * (err_hat + d_err), axis=1)
        d_errterm = (jnp.sum(lv_hi * d_err
                             + d_lv * (err_hat + d_err), axis=1)
                     + _gamma(lv_abs.shape[1] + 1, u) * errterm_anchor)
        # the final v + errterm add and the c_max comparison
        final = _gamma(3, u) * (v_next_mag + errterm_anchor)
        return e_v_next + d_errterm + final, shift

    bound_jit = jax.jit(future_bound)
    worst = 0.0
    worst_shift = 0.0
    eps_rows = []
    if candidates is not None:
        cands = np.asarray(candidates, dtype=config.np_dtype)
        for start in range(0, len(cands), batch_size):
            q = jnp.asarray(cands[start:start + batch_size])
            eps_b, shift_b = bound_jit(q, jnp.zeros_like(q))
            if per_candidate:
                eps_rows.append(np.asarray(eps_b, np.float64))
            worst = max(worst, float(jnp.max(eps_b)))
            worst_shift = max(worst_shift, float(shift_b))
        rows = np.zeros((0, 0))
    elif actions is not None:
        rows = np.atleast_2d(np.asarray(actions, dtype=config.np_dtype))
    else:
        rows = np.atleast_2d(np.asarray(perturbations,
                                        dtype=config.np_dtype))
    lim = (None if limits is None
           else np.atleast_2d(np.asarray(limits, dtype=np.float64)))
    pts_all = grid.all_points
    # Construction rounding is f32 regardless of the scoring pipeline:
    # do NOT let these terms shrink with unit_roundoff.
    u32s = (float(np.finfo(np.float32).eps) / 2.0
            * float(getattr(config, "fp_error_factor", 4.0)))
    u_con = max(u, u32s)
    # Candidate construction (policy evaluation + perturbation add)
    # happens in f32 regardless of the scoring pipeline: the policy
    # program runs at the construction unit, not the scoring unit.
    pol_prog_con = (_policy_program(lyapunov.policy, u_con)
                    if (candidates is None and actions is None) else None)
    for start in (range(0, grid.nindex, batch_size)
                  if candidates is None else ()):
        pts = jnp.asarray(pts_all[start:start + batch_size],
                          dtype=config.dtype)
        if actions is None:
            acts0, du_pol = pol_prog_con((pts, jnp.zeros_like(pts)))
        for j in range(rows.shape[0]):
            row = jnp.asarray(rows[j], dtype=config.dtype)
            if actions is not None:
                a = jnp.broadcast_to(row[None, :],
                                     (pts.shape[0], rows.shape[1]))
                du = jnp.zeros_like(a)
            else:
                a = acts0 + row[None, :]
                if lim is not None:
                    a = jnp.clip(a,
                                 jnp.asarray(lim[:, 0],
                                             dtype=config.dtype),
                                 jnp.asarray(lim[:, 1],
                                             dtype=config.dtype))
                du = du_pol + u_con * (jnp.abs(a)
                                       + jnp.abs(row)[None, :])
            q = jnp.concatenate([pts, a], axis=1)
            dq = jnp.concatenate([jnp.zeros_like(pts), du], axis=1)
            eps_b, shift_b = bound_jit(q, dq)
            worst = max(worst, float(jnp.max(eps_b)))
            worst_shift = max(worst_shift, float(shift_b))

    if worst_shift >= 1.0:
        raise RuntimeError(
            "the instance's input uncertainty exceeds the inflated "
            "L model's trigger-band headroom (shift fraction "
            "{:.2f} >= 1) — use the empirical calibrator"
            .format(worst_shift))
    margin = _finalize_margin(
        np.concatenate(eps_rows) if per_candidate else worst,
        statics, d, u, safety)
    if set_margin:
        lyapunov.exploration_margin = margin
        # Pipeline tag: the f32 scorer refuses a U_EFF-derived margin
        # (explore._margin_of); the extended scorer accepts either.
        lyapunov._exploration_margin_unit = u
    return margin
