"""Double-word float32 ("double-float") arithmetic for verified sweeps.

TPU hardware has no float64 execution units; the framework's float32
mode therefore certifies with a conservatism margin absorbing the f32
pipeline error (``config.certificate_margin``). The *derived* margin
(:func:`~safe_learning_tpu.errorbounds.analytic_certificate_margin`)
is rigorous but worst-case: on ill-conditioned GP instances its
abs-value matvec term scales with the cached factor's condition number
and the resulting margin can exceed the certificate's own threshold
(measured 0.27 on the ill-conditioned property instance —
``docs/performance.md``).

This module removes that conditioning term at the arithmetic level: a
value is represented as an unevaluated pair ``(hi, lo)`` of float32
words with ``|lo| <= ulp(hi)/2``, giving ~2^-48 effective precision,
and every operation is built from *error-free transformations* (EFT):

- ``two_sum`` (Knuth): ``a + b = s + err`` exactly, 6 flops;
- ``split`` / ``two_prod`` (Dekker): ``a * b = p + err`` exactly with
  no FMA requirement (12-bit mantissa halves multiply exactly in f32);
- double-word add/mul/div/sqrt per Joldes, Muller & Popescu,
  *Tight and rigorous error bounds for basic building blocks of
  double-word arithmetic* (ACM TOMS 2017): relative errors of a few
  ``u^2`` (u = 2^-24), i.e. each double-word op behaves like float
  arithmetic with unit roundoff ~2^-45;
- ``exp`` via exact range reduction (``x = k ln2 + r``) and a degree-13
  Horner polynomial in double-word arithmetic — no dependence on the
  hardware's transcendental approximations, so the accuracy is the
  polynomial's (~2^-41) on every backend.

Everything here is plain XLA float32 element arithmetic: it runs
unchanged on CPU and TPU (VPU adds/multiplies are IEEE round-to-nearest;
only the MXU's dot decompositions are non-IEEE, and this module never
uses a matmul). Correct rounding is load-bearing: :func:`eft_selfcheck`
verifies the EFT identities against float64 on the live backend and the
GP predict path calls it once per process before trusting the
arithmetic (a fast-math or flush-to-zero backend would fail loudly, not
certify wrongly). Sub-2^-102 magnitudes may lose the ``lo`` word to
denormal flushing on some backends; at that scale the absolute error is
irrelevant to any certificate and the documented ``u_eff`` slack covers
it.

No reference counterpart (the reference runs float64 end to end,
``/root/reference/safe_learning/configuration.py:16``); this is the
TPU-native answer to the same requirement.
"""

from __future__ import annotations

import functools
import math as _math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_sum", "fast_two_sum", "two_prod", "df_from_f64", "df_from_f32",
    "df_add", "df_sub", "df_neg", "df_mul", "df_mul_f32", "df_div",
    "df_sqrt", "df_exp", "df_to_f32", "df_less", "df_matmul", "df_dot",
    "df_pow2_scale", "df_select", "df_add_f32", "eft_selfcheck",
    "df_abs", "df_max", "df_tanh", "df_sigmoid", "df_relu", "df_sin",
    "df_cos",
]

_F32 = jnp.float32


def _f(x):
    return jnp.asarray(x, dtype=_F32)


# ---------------------------------------------------------------------------
# Error-free transformations
# ---------------------------------------------------------------------------
# Two compiler layers can silently void EFT identities (both measured
# on this machine's XLA:CPU, jax 0.9):
#
# 1. HLO passes may rewrite the expression graph. optimization_barrier
#    blocks them — but XLA expands barriers mid-pipeline
#    (cse_barrier_expander), so barriers alone do NOT protect codegen.
# 2. LLVM codegen contracts ``mul`` feeding ``add``/``sub`` into FMA
#    regardless of fast-math flags (measured ``vfmsub231ss`` in the
#    emitted object): ``t = s - p`` with ``p = x*y`` becomes
#    ``round(s - x*y)`` — using the UNROUNDED product — which breaks
#    two_sum exactness. Fusions re-materialize producer muls inside
#    every consumer kernel, so this hits any EFT consuming a product.
#
# The fix for (2): pass every EFT-critical product through
# ``copysign(abs(p), p)`` — an exact value identity (including ±0, inf,
# NaN) built from sign-bit ops that neither XLA folds nor LLVM's FMA
# former pattern-matches through. eft_selfcheck() verifies both
# protections hold on the live backend before any certificate trusts
# this module.
_ob = jax.lax.optimization_barrier


def _hard(x):
    """Contraction shield: exact identity opaque to FMA formation."""
    return jnp.copysign(jnp.abs(x), x)


def two_sum(a, b):
    """Knuth two-sum: ``a + b = s + err`` exactly (any magnitudes)."""
    s = _ob(a + b)
    bb = _ob(s - a)
    t = _ob(s - bb)
    err = (a - t) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker two-sum requiring ``|a| >= |b|`` (3 flops)."""
    s = _ob(a + b)
    t = _ob(s - a)
    err = b - t
    return s, err


def _split(a):
    """Split a float32 into halves whose products are exact in f32.

    Masks the low 12 mantissa bits instead of Dekker's ``(c = 4097a;
    hi = c - (c - a))``: LLVM contracts Dekker's multiply-subtract into
    one FMA (measured ``vfmsub231ss`` in the emitted object code —
    ``4097*a - a`` becomes the EXACT ``4096*a``, leaving ``hi`` with a
    full 24-bit mantissa and silently voiding every two_prod), and XLA
    expands ``optimization_barrier`` before codegen so barriers cannot
    prevent it. Bit masking has no mul-add pattern to contract: ``hi``
    keeps 12 significant bits, ``lo = a - hi`` is exact (Sterbenz) with
    at most 12 bits, so all half-products fit float32's 24-bit mantissa
    exactly on any backend.
    """
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        bits & np.uint32(0xFFFFF000), _F32)
    return hi, a - hi


def two_prod(a, b):
    """Dekker two-product: ``a * b = p + err`` exactly, no FMA needed.

    ``p`` and ``q`` are hardened: both are re-materialized as raw muls
    inside consumer fusions, where ``q - p`` / ``s - p`` would
    otherwise contract to an FMA on the unrounded product.
    """
    p = _hard(_ob(a * b))
    ah, al = _split(a)
    bh, bl = _split(b)
    q = _hard(_ob(ah * bh))
    err = ((q - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------------
# Double-word constructors / accessors
# ---------------------------------------------------------------------------
def df_from_f64(value):
    """Split a float64 host array into an exact (hi, lo) float32 pair.

    ``hi + lo`` reproduces the float64 value to ~2^-48 relative (the
    two-word representable neighborhood).
    """
    v64 = np.asarray(value, dtype=np.float64)
    hi = v64.astype(np.float32)
    lo = (v64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def df_from_f32(value):
    """Promote an exact float32 array to a double-word pair."""
    v = _f(value)
    return v, jnp.zeros_like(v)


def df_to_f32(x):
    """Round a double-word pair to one float32 (the normalized hi word)."""
    return x[0] + x[1]


# ---------------------------------------------------------------------------
# Double-word arithmetic (AccurateDW variants, Joldes et al. 2017)
# ---------------------------------------------------------------------------
def df_add(x, y):
    """Double-word addition (relative error <= 3 u^2)."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    return fast_two_sum(s, e)


def df_neg(x):
    """Negation (exact)."""
    return -x[0], -x[1]


def df_sub(x, y):
    """Double-word subtraction."""
    return df_add(x, df_neg(y))


def df_add_f32(x, b):
    """Double-word + float32 (error <= 2 u^2)."""
    s, e = two_sum(x[0], b)
    e = e + x[1]
    return fast_two_sum(s, e)


def df_mul(x, y):
    """Double-word multiplication (relative error <= 5 u^2)."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_mul_f32(x, b):
    """Double-word times exact float32 (relative error <= 2 u^2)."""
    p, e = two_prod(x[0], b)
    e = e + x[1] * b
    return fast_two_sum(p, e)


def df_div(x, y):
    """Double-word division (relative error <= 10 u^2)."""
    q0 = x[0] / y[0]
    r = df_sub(x, df_mul_f32(y, q0))
    q1 = (r[0] + r[1]) / y[0]
    return fast_two_sum(q0, q1)


def df_sqrt(x):
    """Double-word square root (one Newton step from the f32 root).

    Zero (or negative ``hi``, which only arises from clamped variances)
    maps to exact zero.
    """
    s0 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    safe = jnp.where(s0 > 0, s0, 1.0)
    p, e = two_prod(safe, safe)
    r = df_sub(x, (p, e))
    corr = (r[0] + r[1]) / (2.0 * safe)
    hi, lo = fast_two_sum(safe, corr)
    zero = s0 <= 0
    return jnp.where(zero, 0.0, hi), jnp.where(zero, 0.0, lo)


def df_pow2_scale(x, s):
    """Scale by an exact power of two (exact; hardened outputs).

    ``s`` must be a (possibly negative) power of two — the word-wise
    products are then exact. Outputs are hardened: they are raw
    products whose consumers' two_sums would otherwise be FMA-fodder.
    """
    s = np.float32(s)
    if s == 0 or np.log2(abs(float(s))) % 1 != 0:
        raise ValueError("df_pow2_scale needs a power of two")
    return _hard(x[0] * s), _hard(x[1] * s)


def df_select(pred, x, y):
    """Elementwise ``where`` on double-word pairs (exact)."""
    return jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1])


def df_less(x, y):
    """Strict ``x < y`` on double-word pairs (sign of the difference)."""
    d_hi, d_lo = df_sub(x, y)
    return (d_hi < 0) | ((d_hi == 0) & (d_lo < 0))


# ---------------------------------------------------------------------------
# exp
# ---------------------------------------------------------------------------
#: ln 2 split into exact f32 words (hi+mid exactly representable split of
#: the f64 value; lo carries the residual to ~2^-72).
_LN2_F64 = float(np.log(np.float64(2.0)))
_LN2_HI = np.float32(_LN2_F64)
_LN2_LO = np.float32(_LN2_F64 - float(_LN2_HI))
_INV_LN2 = np.float32(1.0 / _LN2_F64)

#: 1/k! for the degree-13 Taylor polynomial of exp on |r| <= ln2/2
#: (remainder 0.347^14/14! ~ 2^-56), split into double-word pairs.
_EXP_COEFFS = [(np.float32(c), np.float32(c - np.float64(np.float32(c))))
               for c in [1.0 / float(_math.factorial(k))
                         for k in range(13, -1, -1)]]

#: Below this power of two the result is flushed to exact zero (the
#: margin analysis accounts for the 2^-100 absolute cutoff).
_EXP_MIN_K = np.float32(-100.0)


def df_exp(x):
    """Double-word ``exp`` via range reduction + Horner (rel. ~2^-41).

    Uses no hardware transcendental: accuracy is backend-independent.
    Arguments are expected in the covariance range (``x <= ~0``; large
    positive arguments overflow float32 like any exp would). Results
    smaller than ``2^-100`` return exact zero.
    """
    k = jnp.round(df_to_f32(x) * _INV_LN2)
    # r = x - k*ln2, with k*ln2 as an exact double-word product (k is a
    # small integer, exactly representable).
    kl_hi, kl_e = two_prod(k, _LN2_HI)
    kl = df_add((kl_hi, kl_e), df_mul_f32((jnp.full_like(k, _LN2_LO),
                                           jnp.zeros_like(k)), k))
    r = df_sub(x, kl)

    acc = (jnp.full_like(k, _EXP_COEFFS[0][0]),
           jnp.full_like(k, _EXP_COEFFS[0][1]))
    for c_hi, c_lo in _EXP_COEFFS[1:]:
        acc = df_mul(acc, r)
        acc = df_add(acc, (jnp.full_like(k, c_hi), jnp.full_like(k, c_lo)))

    # Scale by 2^k (exact for the clamped range) and flush the underflow
    # tail to exact zero.
    # 2^k built from the exponent bits: the backend's f32 exp2 is an
    # approximation even at integer arguments (measured 3e-6 relative
    # at 2^-94 on XLA:CPU), while the bit construction is exact by
    # definition for the clamped range [-100, 127].
    k_clamped = jnp.minimum(jnp.maximum(k, _EXP_MIN_K),
                            jnp.asarray(127.0, _F32))
    k_int = k_clamped.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jnp.left_shift(k_int + 127, 23).astype(jnp.uint32), _F32)
    # Hardened: these raw products escape into downstream two_sums.
    hi = _hard(acc[0] * scale)
    lo = _hard(acc[1] * scale)
    dead = k < _EXP_MIN_K
    # Overflow honestly: k above the exact-scale range would silently
    # return a finite ~2^127-scale value; exp overflows to +inf instead
    # (matching the docstring and float32 ``exp`` semantics).
    over = k > 127.0
    hi = jnp.where(over, jnp.asarray(np.inf, _F32), hi)
    lo = jnp.where(over, 0.0, lo)
    return jnp.where(dead, 0.0, hi), jnp.where(dead, 0.0, lo)


def df_abs(x):
    """``|x|`` on double-word pairs (exact: sign flip only)."""
    neg = (x[0] < 0) | ((x[0] == 0) & (x[1] < 0))
    return df_select(neg, df_neg(x), x)


def df_max(x, y):
    """Elementwise maximum of two double-word pairs (exact select)."""
    lt = df_less(x, y)
    return df_select(lt, y, x)


def df_relu(x):
    """``max(x, 0)`` on double-word pairs (exact select)."""
    neg = (x[0] < 0) | ((x[0] == 0) & (x[1] < 0))
    return (jnp.where(neg, 0.0, x[0]), jnp.where(neg, 0.0, x[1]))


# ---------------------------------------------------------------------------
# tanh / sigmoid
# ---------------------------------------------------------------------------
def _tanh_taylor():
    """Exact-rational Taylor coefficients of ``tanh`` in ``y = x^2``.

    ``tanh(x) = x * T(x^2)`` with ``T`` obtained by dividing the sinh
    series by the cosh series in :class:`fractions.Fraction` arithmetic
    (T_k = S_k - sum_j T_j C_{k-j}); 14 terms bound the truncation tail
    below ``2^-54`` relative on ``|x| <= 0.375`` (coefficient magnitudes
    decay like ``2 (2/pi)^{2k+2}``).
    """
    from fractions import Fraction

    n = 14
    s = [Fraction(1, _math.factorial(2 * k + 1)) for k in range(n)]
    c = [Fraction(1, _math.factorial(2 * k)) for k in range(n)]
    t = []
    for k in range(n):
        t.append(s[k] - sum(t[j] * c[k - j] for j in range(k)))
    return [float(v) for v in t]


_TANH_COEFFS = [(np.float32(c), np.float32(c - np.float64(np.float32(c))))
                for c in _tanh_taylor()]
#: Branch point: below it the Taylor series carries the accuracy; above
#: it the exp form's ``1 - e^{-2a}`` cancellation is bounded
#: (``t/(1-t) <= 0.9`` at 0.375).
_TANH_SMALL = np.float32(0.375)


def df_tanh(x):
    """Double-word ``tanh`` (relative error ~2^-41, backend-independent).

    ``|x| < 0.375``: degree-27 odd Taylor polynomial (exact-rational
    coefficients, double-word Horner). ``|x| >= 0.375``:
    ``(1 - t) / (1 + t)`` with ``t = exp(-2|x|)`` from :func:`df_exp` —
    the ``1 - t`` cancellation is benign there (``t <= e^{-0.75}``).
    Sign symmetry is exact. No hardware transcendental is used, so the
    accuracy is the polynomials', on every backend.
    """
    a = df_abs(x)
    neg = (x[0] < 0) | ((x[0] == 0) & (x[1] < 0))

    # Small branch: x * T(x^2), double-word Horner.
    y = df_mul(a, a)
    acc = (jnp.full_like(a[0], _TANH_COEFFS[-1][0]),
           jnp.full_like(a[1], _TANH_COEFFS[-1][1]))
    for c_hi, c_lo in reversed(_TANH_COEFFS[:-1]):
        acc = df_mul(acc, y)
        acc = df_add(acc, (jnp.full_like(a[0], c_hi),
                           jnp.full_like(a[1], c_lo)))
    small = df_mul(a, acc)

    # Large branch: (1 - e^{-2a}) / (1 + e^{-2a}). Clamp the small-a
    # side of the input so df_exp's range reduction never sees the tiny
    # arguments the branch select discards anyway.
    a_big = df_select(a[0] < _TANH_SMALL,
                      (jnp.full_like(a[0], _TANH_SMALL),
                       jnp.zeros_like(a[1])), a)
    t = df_exp(df_neg(df_pow2_scale(a_big, 2.0)))
    one = (jnp.ones_like(a[0]), jnp.zeros_like(a[1]))
    large = df_div(df_sub(one, t), df_add_f32(t, np.float32(1.0)))

    r = df_select(a[0] < _TANH_SMALL, small, large)
    return df_select(neg, df_neg(r), r)


def df_sigmoid(x):
    """Double-word logistic sigmoid (relative error ~2^-41).

    Computed from ``t = exp(-|x|)`` as ``t / (1 + t)`` (negative side)
    or ``1 / (1 + t)`` (positive side) — both cancellation-free, unlike
    the ``(1 + tanh(x/2)) / 2`` identity whose ``1 + tanh`` difference
    amplifies the tanh absolute error at very negative arguments.
    """
    t = df_exp(df_neg(df_abs(x)))
    denom = df_add_f32(t, np.float32(1.0))
    small = df_div(t, denom)
    one = (jnp.ones_like(t[0]), jnp.zeros_like(t[1]))
    large = df_div(one, denom)
    pos = (x[0] > 0) | ((x[0] == 0) & (x[1] > 0))
    return df_select(pos, large, small)


# ---------------------------------------------------------------------------
# sin / cos
# ---------------------------------------------------------------------------
_PIO2_F64 = float(np.pi) / 2.0
_PIO2 = (np.float32(_PIO2_F64),
         np.float32(_PIO2_F64 - float(np.float32(_PIO2_F64))))
_INV_PIO2 = np.float32(1.0 / _PIO2_F64)

#: 1/(2k+1)! and 1/(2k)! for the degree-17/16 sin/cos Taylor polynomials
#: on |r| <= pi/4 (truncation tails (pi/4)^19/19! ~ 2^-64).
_SIN_COEFFS = [(np.float32(c), np.float32(c - np.float64(np.float32(c))))
               for c in [(-1.0) ** k / float(_math.factorial(2 * k + 1))
                         for k in range(9)]]
_COS_COEFFS = [(np.float32(c), np.float32(c - np.float64(np.float32(c))))
               for c in [(-1.0) ** k / float(_math.factorial(2 * k))
                         for k in range(9)]]


def _sincos_core(x):
    """Shared reduction + both Taylor kernels: ``(sin r, cos r, q)``.

    ``x = k * pi/2 + r`` with ``|r| <= pi/4 (+eps)`` and ``q = k mod 4``.
    The double-word ``pi/2`` representation is exact to ~2^-49 relative,
    so the reduced argument carries absolute error ``~|k| 2^-49`` — for
    the dynamics-range arguments (``|x| <~ 2 pi``) that is ~2^-51,
    far below the module's 2^-40 certification unit. Arguments must stay
    below ``2^22`` (k must be exactly representable in float32).
    """
    k = jnp.round(df_to_f32(x) * _INV_PIO2)
    kp = df_mul_f32(( jnp.full_like(k, _PIO2[0]),
                      jnp.full_like(k, _PIO2[1])), k)
    r = df_sub(x, kp)
    q = jnp.mod(k.astype(jnp.int32), 4)

    y = df_mul(r, r)

    acc_s = (jnp.full_like(k, _SIN_COEFFS[-1][0]),
             jnp.full_like(k, _SIN_COEFFS[-1][1]))
    for c_hi, c_lo in reversed(_SIN_COEFFS[:-1]):
        acc_s = df_mul(acc_s, y)
        acc_s = df_add(acc_s, (jnp.full_like(k, c_hi),
                               jnp.full_like(k, c_lo)))
    sin_r = df_mul(r, acc_s)

    acc_c = (jnp.full_like(k, _COS_COEFFS[-1][0]),
             jnp.full_like(k, _COS_COEFFS[-1][1]))
    for c_hi, c_lo in reversed(_COS_COEFFS[:-1]):
        acc_c = df_mul(acc_c, y)
        acc_c = df_add(acc_c, (jnp.full_like(k, c_hi),
                               jnp.full_like(k, c_lo)))
    return sin_r, acc_c, q


def df_sin(x):
    """Double-word ``sin`` (abs. error ~2^-49 |k|; rel. ~2^-41).

    Cody-Waite style reduction against a double-word ``pi/2`` plus
    degree-17/16 Taylor kernels; quadrant recombination is an exact
    select. No hardware transcendental. Valid for ``|x| < 2^22``.
    """
    s, c, q = _sincos_core(x)
    hi = jnp.select([q == 0, q == 1, q == 2], [s[0], c[0], -s[0]], -c[0])
    lo = jnp.select([q == 0, q == 1, q == 2], [s[1], c[1], -s[1]], -c[1])
    return hi, lo


def df_cos(x):
    """Double-word ``cos`` (see :func:`df_sin` for the contract)."""
    s, c, q = _sincos_core(x)
    hi = jnp.select([q == 0, q == 1, q == 2], [c[0], -s[0], -c[0]], s[0])
    lo = jnp.select([q == 0, q == 1, q == 2], [c[1], -s[1], -c[1]], s[1])
    return hi, lo


# ---------------------------------------------------------------------------
# Contractions
# ---------------------------------------------------------------------------
def df_dot(x, y, axis=-1):
    """Double-word inner product along ``axis`` (sequential two-sum).

    ``x`` and ``y`` are double-word pairs of broadcast-compatible
    arrays. The contraction runs as a ``lax.scan`` over the axis with a
    double-word accumulator, so the result error is ~n * u^2 instead of
    the float32 dot's n * u.
    """
    xh = jnp.moveaxis(x[0], axis, 0)
    xl = jnp.moveaxis(x[1], axis, 0)
    yh = jnp.moveaxis(y[0], axis, 0)
    yl = jnp.moveaxis(y[1], axis, 0)

    def body(acc, term):
        """Accumulate one product term into the df carry."""
        txh, txl, tyh, tyl = term
        prod = df_mul((txh, txl), (tyh, tyl))
        return df_add(acc, prod), None

    shape = jnp.broadcast_shapes(xh.shape[1:], yh.shape[1:])
    init = (jnp.zeros(shape, dtype=_F32), jnp.zeros(shape, dtype=_F32))
    (hi, lo), _ = jax.lax.scan(body, init, (xh, xl, yh, yl))
    return hi, lo


def df_matmul(a, b):
    """Double-word matrix product ``A (m,k) @ B (k,n)``.

    Both operands are double-word pairs. Runs as one ``lax.scan`` over
    the contraction axis on the VPU (the MXU's pass decomposition is
    not IEEE and cannot carry the lo words).
    """
    ah, al = a
    bh, bl = b

    def body(acc, term):
        """Accumulate one rank-1 outer product into the df carry."""
        cah, cal, rbh, rbl = term
        prod = df_mul((cah[:, None], cal[:, None]),
                      (rbh[None, :], rbl[None, :]))
        return df_add(acc, prod), None

    m, n = ah.shape[0], bh.shape[1]
    init = (jnp.zeros((m, n), dtype=_F32), jnp.zeros((m, n), dtype=_F32))
    (hi, lo), _ = jax.lax.scan(
        body, init, (ah.T, al.T, bh, bl))
    return hi, lo


# ---------------------------------------------------------------------------
# Backend self-check
# ---------------------------------------------------------------------------
@functools.cache
def eft_selfcheck():
    """Verify the EFT identities hold on the live backend (once).

    Computes two_sum / two_prod on adversarial float32 values and checks
    the reconstructed float64 sums/products are EXACT. A backend with
    fast-math contraction, value reassociation, or non-IEEE rounding in
    plain f32 add/mul fails here — before any certificate trusts the
    double-word arithmetic.
    """
    rng = np.random.default_rng(20240817)
    a64 = np.concatenate([
        rng.uniform(-1e6, 1e6, 64), rng.uniform(-1e-6, 1e-6, 64),
        np.array([1.0, 1e-8, 3.0, 1.0 / 3.0, 4097.0, 2.0 ** 20])])
    b64 = np.concatenate([
        rng.uniform(-1e-6, 1e-6, 64), rng.uniform(-1e6, 1e6, 64),
        np.array([1e-8, 1.0, 1.0 / 3.0, 3.0, 2.0 ** -20, 4097.0])])
    a = jnp.asarray(a64, dtype=_F32)
    b = jnp.asarray(b64, dtype=_F32)
    s, es = jax.jit(lambda u, v: two_sum(u, v))(a, b)
    p, ep = jax.jit(lambda u, v: two_prod(u, v))(a, b)
    a64 = np.asarray(a, dtype=np.float64)
    b64 = np.asarray(b, dtype=np.float64)
    sum_ok = np.array_equal(np.asarray(s, np.float64)
                            + np.asarray(es, np.float64), a64 + b64)
    prod_ok = np.array_equal(np.asarray(p, np.float64)
                             + np.asarray(ep, np.float64), a64 * b64)
    if not (sum_ok and prod_ok):
        raise RuntimeError(
            "error-free transformations do not hold on this backend "
            "(fast-math contraction or non-IEEE f32 rounding?) — the "
            "extended-precision pipeline cannot run here")

    # The compiled-composition check: XLA rewrites (not raw-op rounding)
    # are what actually broke EFT here — specifically fused broadcast
    # df_mul. Verify the full double-word product stays at ~u^2 inside
    # one jitted program.
    x64 = rng.normal(0.0, 1e3, 33)
    y64 = rng.normal(0.0, 1.0, 17)
    x = df_from_f64(x64)
    y = df_from_f64(y64)
    got = jax.jit(lambda u, v: df_mul(
        (u[0][:, None], u[1][:, None]),
        (v[0][None, :], v[1][None, :])))(x, y)
    xr = np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)
    yr = np.asarray(y[0], np.float64) + np.asarray(y[1], np.float64)
    truth = xr[:, None] * yr[None, :]
    err = np.abs(np.asarray(got[0], np.float64)
                 + np.asarray(got[1], np.float64) - truth)
    if np.max(err / np.maximum(np.abs(truth), 1e-30)) > 2.0 ** -40:
        raise RuntimeError(
            "double-word multiplication degraded under compilation "
            "(XLA simplified an error-free transformation away) — the "
            "extended-precision pipeline cannot run here")
    return True
